"""Anti-aliased polyphase resampling.

The reference decimates 48 kHz capture with a naive ``[::3]`` stride and no
anti-alias filter (reference: backend/services/transcriber.py:51,
backend/services/vad.py:53 — a documented quirk we deliberately fix). Here
resampling is a windowed-sinc FIR evaluated in polyphase form: for integer
down-factors the computation is one reshaped matmul, which XLA maps
straight onto the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fir_lowpass_taps", "resample_poly", "decimate_48k_to_16k", "naive_decimate"]


@functools.lru_cache(maxsize=None)
def fir_lowpass_taps(num_taps: int, cutoff: float, beta: float = 8.0) -> np.ndarray:
    """Kaiser-windowed sinc low-pass taps. ``cutoff`` is in normalized
    frequency (1.0 = Nyquist of the input rate)."""
    n = np.arange(num_taps) - (num_taps - 1) / 2.0
    h = cutoff * np.sinc(cutoff * n)
    h *= np.kaiser(num_taps, beta)
    h /= np.sum(h)
    return h.astype(np.float32)


def naive_decimate(x: jax.Array, factor: int) -> jax.Array:
    """Plain strided decimation — provided only for parity experiments with
    the reference's ``[::3]`` path; aliases by design."""
    return x[..., ::factor]


def resample_poly(
    x: jax.Array, up: int, down: int, num_taps_per_phase: int = 32
) -> jax.Array:
    """Rational-rate polyphase resampler for ``[..., T]`` signals.

    A zero-phase windowed-sinc FIR is designed at the virtual upsampled
    rate; evaluation never materializes the upsampled signal. Output sample
    m is ``y[m] = Σ_j h[m·down + D − j·up] · x[j]`` with D the filter
    center, gathered into a ``[out_len, taps_per_phase]`` matmul.
    """
    if up == 1:
        return _decimate_fir(x, down, num_taps_per_phase * down)

    num_taps = num_taps_per_phase * up + 1  # odd length, exact center D
    taps = fir_lowpass_taps(num_taps, min(1.0 / down, 1.0 / up)) * up
    taps_j = jnp.asarray(taps)
    delay = (num_taps - 1) // 2

    t = x.shape[-1]
    out_len = (t * up) // down
    nt = num_taps // up + 2  # source samples contributing per output

    m = np.arange(out_len)
    c = m * down + delay  # convolution tap center per output sample
    j_min = -(-(c - num_taps + 1) // up)  # ceil division
    j = j_min[:, None] + np.arange(nt)[None, :]  # [out_len, nt] source index
    i = c[:, None] - j * up  # tap index
    valid = (i >= 0) & (i < num_taps) & (j >= 0) & (j < t)
    tap_idx = np.clip(i, 0, num_taps - 1)
    src_idx = np.clip(j, 0, t - 1)

    gathered = x[..., src_idx]  # [..., out_len, nt]
    w = jnp.where(jnp.asarray(valid), taps_j[tap_idx], 0.0)
    return jnp.einsum("...ot,ot->...o", gathered, w)


def _decimate_fir(x: jax.Array, factor: int, num_taps: int) -> jax.Array:
    """Integer decimation: anti-alias FIR + stride, fused as a polyphase
    matmul ``[T//factor, taps] @ [taps]``."""
    num_taps = int(np.ceil(num_taps / factor) * factor) + 1
    taps = jnp.asarray(fir_lowpass_taps(num_taps, 1.0 / factor))
    half = num_taps // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, half)])
    out_len = x.shape[-1] // factor
    idx = factor * np.arange(out_len)[:, None] + np.arange(num_taps)[None, :]
    return jnp.einsum("...ot,t->...o", xp[..., idx], taps[::-1])


def decimate_48k_to_16k(x: jax.Array) -> jax.Array:
    """48 kHz → 16 kHz with anti-aliasing (the fixed version of the
    reference's ``[::3]``)."""
    return _decimate_fir(x, 3, 96)
