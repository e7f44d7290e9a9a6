"""Native host-runtime library (libjanus_host): ring buffer, deframer,
pacer — exercised through the ctypes bindings, plus the pure-Python
fallback paths."""

import threading

import numpy as np
import pytest

from janus_tpu.native import HAVE_NATIVE, Deframer, Pacer, RingBuffer
from janus_tpu.runtime.link import frame


def test_native_library_built():
    # the toolchain is baked into this image; the native path must be live
    assert HAVE_NATIVE


def test_ring_buffer_push_pop():
    rb = RingBuffer(1024)
    data = np.arange(256, dtype=np.float32)
    assert rb.push(data)
    assert len(rb) == 256
    out = rb.pop(256)
    np.testing.assert_array_equal(out, data)
    assert len(rb) == 0
    assert rb.pop(1) is None  # empty


def test_ring_buffer_wraparound():
    rb = RingBuffer(300)
    for i in range(10):  # 10 * 100 = 1000 samples through a 300-cap ring
        d = np.full(100, float(i), dtype=np.float32)
        assert rb.push(d)
        out = rb.pop(100)
        assert out[0] == float(i)


def test_ring_buffer_all_or_none():
    rb = RingBuffer(100)
    assert rb.push(np.zeros(80, np.float32))
    assert not rb.push(np.zeros(30, np.float32))  # would overflow
    assert rb.push(np.zeros(20, np.float32))      # exactly fits


def test_ring_buffer_threaded_spsc():
    rb = RingBuffer(1 << 14)
    total = 200_000
    chunk = 512
    received = []

    def producer():
        sent = 0
        while sent < total:
            d = np.arange(sent, sent + chunk, dtype=np.float32)
            if rb.push(d):
                sent += chunk

    def consumer():
        got = 0
        while got < total:
            out = rb.pop(chunk)
            if out is not None:
                received.append(out[0])
                got += chunk

    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=consumer)
    tp.start(); tc.start()
    tp.join(timeout=30); tc.join(timeout=30)
    assert len(received) == -(-total // chunk)
    # strict FIFO ordering
    np.testing.assert_array_equal(
        np.asarray(received), np.arange(0, total, chunk, dtype=np.float32)
    )


def test_deframer_fragmented_stream():
    d = Deframer()
    packets = [b"alpha", b"x" * 300, b"", b"final"]
    stream = b"".join(frame(p) for p in packets)
    # feed in awkward 7-byte fragments
    for i in range(0, len(stream), 7):
        d.feed(stream[i : i + 7])
    got = []
    while (p := d.pop()) is not None:
        got.append(p)
    assert got == packets


def test_deframer_incomplete_returns_none():
    d = Deframer()
    d.feed(frame(b"hello")[:6])  # header + partial payload
    assert d.pop() is None
    d.feed(frame(b"hello")[6:])
    assert d.pop() == b"hello"


def test_pacer_rate():
    p = Pacer(bytes_per_second=1000.0, burst_bytes=0.0)
    # first acquire owes the full airtime
    owed = p.acquire(500)
    assert owed == pytest.approx(0.5, abs=0.05)
    # immediate second acquire accumulates
    owed2 = p.acquire(500)
    assert owed2 > owed * 1.5


def test_pacer_burst_allowance():
    p = Pacer(bytes_per_second=37.5, burst_bytes=1000.0)
    assert p.acquire(140) == 0.0  # within burst: no sleep owed


def test_python_fallbacks_match(monkeypatch):
    """Force the pure-Python path and re-check core semantics."""
    import janus_tpu.native as native

    monkeypatch.setattr(native, "load_library", lambda: None)
    rb = native.RingBuffer(128)
    assert rb.push(np.ones(100, np.float32))
    assert not rb.push(np.ones(40, np.float32))
    np.testing.assert_array_equal(rb.pop(100), np.ones(100, np.float32))

    d = native.Deframer()
    d.feed(frame(b"abc"))
    assert d.pop() == b"abc"
    assert d.pop() is None

    p = native.Pacer(1000.0)
    assert p.acquire(1000) == pytest.approx(1.0, abs=0.05)
