"""Link transport: throttling math, UDP/TCP framing, recv_exact
(reference: backend/tests/test_transport_layer.py)."""

import socket
import threading
import time

import numpy as np
import pytest

from janus_tpu.common.config import LinkConfig
from janus_tpu.common.protocol import JanusPacket
from janus_tpu.runtime.link import (
    LinkSimulator,
    PacketListener,
    frame,
    recv_exact,
    unframe_header,
)


def test_framing_roundtrip():
    payload = b"hello janus"
    framed = frame(payload)
    assert len(framed) == 4 + len(payload)
    assert unframe_header(framed[:4]) == len(payload)
    assert framed[4:] == payload


def test_airtime_math():
    # 150 B at 37.5 B/s = 4 s (reference: test_transport_layer.py:207-229)
    link = LinkSimulator(LinkConfig(target_port=59999))
    assert link.airtime(150) == pytest.approx(4.0)
    link.close()


def test_udp_transmit_throttles_and_delivers():
    listener = PacketListener(0, use_tcp=False)
    cfg = LinkConfig(baud_rate=4800, target_ip="127.0.0.1",
                     target_port=listener.port, use_tcp=False)
    link = LinkSimulator(cfg)
    payload = JanusPacket(text="udp test", timestamp=1.0).serialize()
    t0 = time.monotonic()
    link.transmit(payload)
    elapsed = time.monotonic() - t0
    expected = len(payload) / cfg.bytes_per_second
    assert elapsed >= expected * 0.9
    got = listener.receive()
    assert got == payload
    assert link.bytes_sent == len(payload)
    link.close()
    listener.close()


def test_tcp_transmit_framed():
    listener = PacketListener(0, use_tcp=True)
    cfg = LinkConfig(baud_rate=48_000, target_ip="127.0.0.1",
                     target_port=listener.port, use_tcp=True)
    received = []

    def rx():
        for _ in range(20):
            p = listener.receive()
            if p is not None:
                received.append(p)
                return

    t = threading.Thread(target=rx)
    t.start()
    time.sleep(0.05)
    link = LinkSimulator(cfg)
    payload = JanusPacket(text="tcp framed", timestamp=2.0).serialize()
    link.transmit(payload)
    t.join(timeout=5)
    assert received == [payload]
    # TCP airtime includes the 4-byte header
    assert link.bytes_sent == len(payload) + 4
    link.close()
    listener.close()


def test_recv_exact_fragmented_and_closed():
    a, b = socket.socketpair()
    try:
        b.sendall(b"abc")
        threading.Timer(0.05, lambda: b.sendall(b"defg")).start()
        got = recv_exact(a, 7)
        assert got == b"abcdefg"
        b.close()
        assert recv_exact(a, 1) is None
    finally:
        a.close()


def test_udp_connection_refused_is_swallowed():
    cfg = LinkConfig(baud_rate=480_000, target_ip="127.0.0.1",
                     target_port=1, use_tcp=False)
    link = LinkSimulator(cfg)
    link.transmit(b"x" * 10)  # must not raise
    link.close()


def test_tcp_connect_refused_is_swallowed():
    cfg = LinkConfig(target_ip="127.0.0.1", target_port=1, use_tcp=True)
    link = LinkSimulator(cfg)  # reference warns and continues
    link.close()


def test_listener_timeout_returns_none():
    listener = PacketListener(0, use_tcp=False, timeout=0.1)
    assert listener.receive() is None
    listener.close()


def test_progress_callback_ticks():
    ticks = []
    listener = PacketListener(0, use_tcp=False)
    cfg = LinkConfig(baud_rate=192_000, target_ip="127.0.0.1",
                     target_port=listener.port)
    link = LinkSimulator(cfg, progress=ticks.append)
    link.transmit(b"x" * 24)
    assert len(ticks) == cfg.progress_ticks
    assert ticks[-1] == pytest.approx(1.0)
    link.close()
    listener.close()
