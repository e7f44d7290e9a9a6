"""Wire-format bit-exactness tests.

Golden bytes were captured from the reference serialization behavior
(reference: backend/common/protocol.py:61-121 — compact keys in insertion
order t, m, p, ts, with 'o' appended only when override != "Auto";
msgpack use_bin_type=True / raw=False).
"""

import math
import time

import msgpack
import pytest

from janus_tpu.common.protocol import JanusMode, JanusPacket

GOLDEN = [
    (
        JanusPacket(
            text="hello world",
            mode=JanusMode.SEMANTIC_VOICE,
            prosody={"energy": "Normal", "pitch": "High"},
            timestamp=1700000000.123456,
        ),
        b"\x84\xa1t\xabhello world\xa1m\x00\xa1p\x82\xa6energy\xa6Normal"
        b"\xa5pitch\xa4High\xa2ts\xcbA\xd9T\xfc@\x07\xe6\xb4",
    ),
    (
        JanusPacket(text="", mode=JanusMode.TEXT_ONLY, prosody={}, timestamp=0.0),
        b"\x84\xa1t\xa0\xa1m\x01\xa1p\x80\xa2ts\xcb\x00\x00\x00\x00\x00\x00\x00\x00",
    ),
    (
        JanusPacket(
            text="sos",
            mode=JanusMode.MORSE_CODE,
            prosody={"energy": "Loud", "pitch": "Deep"},
            override_emotion="panicked",
            timestamp=1700000001.5,
        ),
        b"\x85\xa1t\xa3sos\xa1m\x02\xa1p\x82\xa6energy\xa4Loud\xa5pitch"
        b"\xa4Deep\xa2ts\xcbA\xd9T\xfc@`\x00\x00\xa1o\xa8panicked",
    ),
]


@pytest.mark.parametrize("packet,expected", GOLDEN)
def test_golden_bytes(packet, expected):
    assert packet.serialize() == expected


@pytest.mark.parametrize("packet,expected", GOLDEN)
def test_golden_roundtrip(packet, expected):
    back = JanusPacket.deserialize(expected)
    assert back.text == packet.text
    assert back.mode == packet.mode
    assert back.prosody == packet.prosody
    assert back.override_emotion == packet.override_emotion
    assert math.isclose(back.timestamp, packet.timestamp)


def test_prosody_key_order_is_canonicalized():
    # Even if the caller builds the dict pitch-first, bytes must match the
    # canonical energy-then-pitch layout.
    a = JanusPacket(
        text="x", prosody={"pitch": "High", "energy": "Loud"}, timestamp=1.0
    )
    b = JanusPacket(
        text="x", prosody={"energy": "Loud", "pitch": "High"}, timestamp=1.0
    )
    assert a.serialize() == b.serialize()


def test_override_key_only_when_not_auto():
    auto = JanusPacket(text="x", timestamp=1.0)
    assert b"\xa1o" not in auto.serialize()
    over = JanusPacket(text="x", override_emotion="relaxed", timestamp=1.0)
    unpacked = msgpack.unpackb(over.serialize(), raw=False)
    assert list(unpacked.keys()) == ["t", "m", "p", "ts", "o"]
    assert unpacked["o"] == "relaxed"


def test_default_timestamp_is_now():
    before = time.time()
    p = JanusPacket(text="x")
    assert before - 1 <= p.timestamp <= time.time() + 1


def test_deserialize_garbage_raises():
    with pytest.raises(Exception):
        JanusPacket.deserialize(b"\x00\x01\x02not-msgpack")


def test_mode_coercion_and_defaults():
    p = JanusPacket.from_dict({"t": "hi"})
    assert p.mode is JanusMode.SEMANTIC_VOICE
    assert p.override_emotion == "Auto"
    assert p.prosody == {}


def test_wire_size_and_airtime():
    p = JanusPacket(
        text="hello world",
        prosody={"energy": "Normal", "pitch": "High"},
        timestamp=1700000000.123456,
    )
    n = p.wire_size()
    assert n == len(p.serialize())
    # 300 baud -> 37.5 B/s (reference: backend/services/link_simulator.py:19-20)
    assert math.isclose(p.payload_seconds_at(37.5), n / 37.5)


def test_typical_packet_under_140_bytes():
    # ~140 B typical packet claim (reference: docs/API.md:78)
    p = JanusPacket(
        text="The quick brown fox jumps over the lazy dog.",
        prosody={"energy": "Normal", "pitch": "Normal"},
    )
    assert p.wire_size() < 140
