"""Shared engine control state and UI event queues.

Mirrors the observable semantics of the reference's module-global state
(reference: backend/common/engine_state.py:21-81): a mutable control block
written by the WebSocket handler and read by the engine loops, plus lazily
created asyncio queues carrying transcript and packet-summary events to the
UI. Unlike the reference we scope state to an :class:`EngineState` instance
(the module-global singleton remains available for API-compat), which makes
multi-session servers and tests trivially isolated.
"""

from __future__ import annotations

import asyncio
from dataclasses import dataclass, field
from typing import Optional

__all__ = [
    "ControlState",
    "EngineState",
    "engine_state",
    "get_transcript_queue",
    "get_packet_queue",
    "reset_queues",
]


@dataclass
class ControlState:
    """Live engine controls (reference: backend/common/engine_state.py:21-36).

    ``mode`` / ``emotion_override`` use the API string enums ("semantic",
    "text_only", "morse"; "auto", "relaxed", "panicked") — the wire protocol
    uses the int enum, mapped in :mod:`janus_tpu.runtime.engine`.
    """

    mode: str = "semantic"
    is_streaming: bool = False
    is_recording: bool = False
    emotion_override: str = "auto"
    ducking_enabled: bool = True
    ducking_level: float = 0.25
    is_talking: bool = False

    def reset_transient(self) -> None:
        """Reset per-connection flags on WS disconnect
        (reference: backend/api/socket_manager.py:75-83)."""
        self.is_streaming = False
        self.is_recording = False
        self.is_talking = False


class EngineState:
    """A control block plus lazily-created event queues bound to the running
    event loop (reference: backend/common/engine_state.py:42-81)."""

    def __init__(self) -> None:
        self.control = ControlState()
        self._transcript_queue: Optional[asyncio.Queue] = None
        self._packet_queue: Optional[asyncio.Queue] = None

    def transcript_queue(self) -> asyncio.Queue:
        if self._transcript_queue is None:
            self._transcript_queue = asyncio.Queue()
        return self._transcript_queue

    def packet_queue(self) -> asyncio.Queue:
        if self._packet_queue is None:
            self._packet_queue = asyncio.Queue()
        return self._packet_queue

    def reset_queues(self) -> None:
        """Drop queues so the next accessor rebinds to the current loop —
        the reference exposes the same hook for tests
        (reference: backend/common/engine_state.py:72-81)."""
        self._transcript_queue = None
        self._packet_queue = None
        self.control = ControlState()


# Module-global singleton, for parity with the reference's import pattern.
engine_state = EngineState()


def get_transcript_queue() -> asyncio.Queue:
    return engine_state.transcript_queue()


def get_packet_queue() -> asyncio.Queue:
    return engine_state.packet_queue()


def reset_queues() -> None:
    engine_state.reset_queues()
