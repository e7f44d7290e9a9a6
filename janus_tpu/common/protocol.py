"""Wire protocol: the Janus semantic packet.

This module is the bit-exactness contract of the framework. A packet
serialized here must be byte-identical to one produced by the reference
implementation (reference: ``backend/common/protocol.py:15-121``): a
MessagePack map with compact keys inserted in the order ``t`` (text),
``m`` (mode int), ``p`` (prosody map), ``ts`` (float seconds), and ``o``
(override emotion) appended last and only when it differs from ``"Auto"``.
Packing uses ``use_bin_type=True``; unpacking uses ``raw=False``.

Everything here is host-side and tiny — it never touches the accelerator.
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Mapping, Optional

import msgpack

__all__ = ["JanusMode", "JanusPacket", "PROSODY_KEYS"]

# Canonical insertion order for the prosody sub-map. The reference's
# prosody extractor emits {'energy': ..., 'pitch': ...} in this order
# (reference: backend/services/prosody.py:100-103), and MessagePack maps
# preserve insertion order, so this ordering is part of the wire contract.
PROSODY_KEYS = ("energy", "pitch")


class JanusMode(enum.IntEnum):
    """Transmission modes (reference: backend/common/protocol.py:15-21)."""

    SEMANTIC_VOICE = 0  # text + categorical prosody
    TEXT_ONLY = 1       # text only; receiver uses default voice
    MORSE_CODE = 2      # receiver synthesizes morse tones locally


def _canonical_prosody(prosody: Mapping[str, Any]) -> Dict[str, Any]:
    """Order prosody keys canonically (energy, pitch, then extras in
    insertion order) so serialization is deterministic."""
    out: Dict[str, Any] = {}
    for k in PROSODY_KEYS:
        if k in prosody:
            out[k] = prosody[k]
    for k, v in prosody.items():
        if k not in out:
            out[k] = v
    return out


@dataclass
class JanusPacket:
    """The semantic packet exchanged between peers.

    Attributes mirror the reference packet exactly
    (reference: backend/common/protocol.py:30-59).
    """

    text: str
    mode: JanusMode = JanusMode.SEMANTIC_VOICE
    prosody: Dict[str, Any] = field(default_factory=dict)
    override_emotion: str = "Auto"
    timestamp: float = field(default_factory=time.time)

    def __post_init__(self) -> None:
        self.mode = JanusMode(self.mode)
        if self.override_emotion is None:
            self.override_emotion = "Auto"
        if self.timestamp is None:
            self.timestamp = time.time()

    # -- dict round-trip ---------------------------------------------------

    def to_dict(self) -> Dict[str, Any]:
        """Compact-key dict; insertion order is the wire contract
        (reference: backend/common/protocol.py:61-80)."""
        result: Dict[str, Any] = {
            "t": self.text,
            "m": int(self.mode),
            "p": _canonical_prosody(self.prosody),
            "ts": self.timestamp,
        }
        if self.override_emotion != "Auto":
            result["o"] = self.override_emotion
        return result

    @classmethod
    def from_dict(cls, data: Mapping[str, Any]) -> "JanusPacket":
        return cls(
            text=data.get("t", ""),
            mode=JanusMode(data.get("m", 0)),
            prosody=dict(data.get("p", {}) or {}),
            override_emotion=data.get("o", "Auto"),
            timestamp=data.get("ts", time.time()),
        )

    # -- bytes round-trip --------------------------------------------------

    def serialize(self) -> bytes:
        """MessagePack-encode (reference: backend/common/protocol.py:97-107)."""
        return msgpack.packb(self.to_dict(), use_bin_type=True)

    @classmethod
    def deserialize(cls, payload: bytes) -> "JanusPacket":
        """Decode bytes; raises on malformed input
        (reference: backend/common/protocol.py:109-121)."""
        return cls.from_dict(msgpack.unpackb(payload, raw=False))

    # -- convenience -------------------------------------------------------

    def wire_size(self) -> int:
        """True serialized size in bytes (the reference UI shows the
        estimate ``len(text)+16`` instead — a quirk we do not repeat;
        reference: backend/services/engine.py:615)."""
        return len(self.serialize())

    def payload_seconds_at(self, bytes_per_second: float) -> float:
        """Airtime of this packet on a throttled link."""
        return self.wire_size() / float(bytes_per_second)
