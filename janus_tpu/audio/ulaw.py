"""G.711-style μ-law 8-bit companding for the host→device audio wire.

The encode batch is the dominant host→device transfer in serving (the
r5 session-scaling decomposition measured the remote tunnel's ~17 MB/s
h2d as the b=32→64 scaling wall while the device program stayed flat —
BENCH_NOTES.md). μ-law halves the int16 wire to one byte per sample at
~35–38 dB quantization SNR for speech-level signals — far above the hard
corpus's gated additive-noise floors (WER holds at 0 dB SNR), but not
bit-exact, so it is opt-in (``RuntimeConfig.encode_transfer_ulaw``).

Continuous-curve μ-law (μ=255), not the segmented G.711 bit layout: the
decoder is a handful of VPU ops inside the already-fused encode program.
"""

from __future__ import annotations

import numpy as np

_MU = 255.0

__all__ = ["ulaw_encode", "ulaw_decode"]


def ulaw_encode(x: np.ndarray) -> np.ndarray:
    """float32 waveform in [-1, 1] → uint8 codes (host side, numpy)."""
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
    return np.round((y + 1.0) * 127.5).astype(np.uint8)


def ulaw_decode(q):
    """uint8 codes → float32 waveform (device side, jax.numpy)."""
    import jax.numpy as jnp

    y = q.astype(jnp.float32) / 127.5 - 1.0
    return jnp.sign(y) * ((1.0 + _MU) ** jnp.abs(y) - 1.0) / _MU
