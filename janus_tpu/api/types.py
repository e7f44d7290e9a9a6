"""WebSocket/REST message schemas (pydantic), mirroring the reference's
API types exactly (reference: backend/api/types.py:13-68) so the original
Next.js dashboard works against this backend unchanged.
"""

from __future__ import annotations

from enum import Enum
from typing import Literal, Optional, Union

from pydantic import BaseModel

__all__ = [
    "ApiMode",
    "EmotionOverride",
    "ControlMessage",
    "TranscriptMessage",
    "PacketSummaryMessage",
    "ControlStateMessage",
]


class ApiMode(str, Enum):
    SEMANTIC = "semantic"
    TEXT_ONLY = "text_only"
    MORSE = "morse"


class EmotionOverride(str, Enum):
    AUTO = "auto"
    RELAXED = "relaxed"
    PANICKED = "panicked"


class ControlMessage(BaseModel):
    """Frontend → backend; None fields mean "no change"."""

    type: Literal["control"]
    is_streaming: Optional[bool] = None
    is_recording: Optional[bool] = None
    mode: Optional[ApiMode] = None
    emotion_override: Optional[EmotionOverride] = None


class TranscriptMessage(BaseModel):
    type: Literal["transcript"] = "transcript"
    text: str
    start_ms: Optional[int] = None
    end_ms: Optional[int] = None
    avg_pitch_hz: Optional[float] = None
    avg_energy: Optional[float] = None


class PacketSummaryMessage(BaseModel):
    type: Literal["packet_summary"] = "packet_summary"
    bytes: int
    mode: ApiMode
    created_at_ms: int
    emotion: Optional[str] = None
    snippet: Optional[str] = None


class ControlStateMessage(BaseModel):
    type: Literal["control_state"] = "control_state"
    is_streaming: bool
    is_recording: bool
    mode: ApiMode
    emotion_override: EmotionOverride
