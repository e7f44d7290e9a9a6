"""Deterministic synthetic-audio generators for tests and benchmarks.

Generalizes the reference e2e suite's conversation patterns (reference:
backend/tests/test_e2e_local.py:156-257 — alternating 2 s speech sine /
1 s silence turns) into parameterized, seedable generators usable both for
correctness tests and for load benchmarks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence

import numpy as np

__all__ = ["tone", "voiced_phrase", "conversation", "chunk_stream"]


def tone(freq: float, seconds: float, sample_rate: int = 48_000,
         amp: float = 0.5) -> np.ndarray:
    t = np.arange(int(seconds * sample_rate)) / sample_rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def voiced_phrase(f0: float = 180.0, seconds: float = 1.5,
                  sample_rate: int = 48_000, amp: float = 0.1,
                  harmonics: int = 3, vibrato_hz: float = 5.0,
                  seed: int = 0) -> np.ndarray:
    """Speech-like signal: harmonic stack on f0 with mild vibrato and an
    amplitude envelope — voiced enough for YIN, energetic enough for VAD."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sample_rate)
    t = np.arange(n) / sample_rate
    phase = 2 * np.pi * f0 * t + 0.3 * np.sin(2 * np.pi * vibrato_hz * t)
    x = np.zeros(n, dtype=np.float64)
    for h in range(1, harmonics + 1):
        x += (amp / h) * np.sin(h * phase)
    env = 0.6 + 0.4 * np.sin(np.pi * np.minimum(t / seconds, 1.0))
    x *= env
    x += 0.002 * rng.standard_normal(n)
    return x.astype(np.float32)


def conversation(turns: int = 3, speech_seconds: float = 2.0,
                 silence_seconds: float = 1.0, sample_rate: int = 48_000,
                 f0: float = 200.0, amp: float = 0.3,
                 seed: int = 0) -> np.ndarray:
    """Alternating speech/silence turns (reference pattern)."""
    parts: List[np.ndarray] = []
    for i in range(turns):
        parts.append(voiced_phrase(f0 + 20 * i, speech_seconds, sample_rate,
                                   amp, seed=seed + i))
        parts.append(np.zeros(int(silence_seconds * sample_rate), np.float32))
    return np.concatenate(parts)


def chunk_stream(audio: np.ndarray, chunk_samples: int = 1536
                 ) -> Iterator[np.ndarray]:
    """Slice a signal into mic-cadence chunks (last partial chunk dropped,
    like a real capture stream)."""
    for i in range(0, len(audio) - chunk_samples + 1, chunk_samples):
        yield audio[i : i + chunk_samples]
