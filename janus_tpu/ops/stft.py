"""Short-time Fourier transform primitives.

Framing is expressed as a gather + batched rFFT so XLA lowers it to one
fused kernel; there is no Python loop over frames. All entry points accept
either a single signal ``[T]`` or a batch ``[B, T]`` and are jit-stable
for fixed lengths.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["hann_window", "frame_signal", "stft", "istft"]


@functools.lru_cache(maxsize=None)
def _hann_np(n_fft: int) -> np.ndarray:
    # Periodic Hann, the analysis window used by Whisper-style frontends.
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))).astype(
        np.float32
    )


def hann_window(n_fft: int, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(_hann_np(n_fft), dtype=dtype)


def frame_signal(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """Slice ``x[..., T]`` into overlapping frames ``[..., n_frames, frame_length]``.

    Uses a static index gather — XLA turns this into a strided load, which
    tiles cleanly into the downstream FFT/matmul.
    """
    t = x.shape[-1]
    n_frames = 1 + (t - frame_length) // hop if t >= frame_length else 0
    idx = (
        np.arange(frame_length)[None, :] + hop * np.arange(max(n_frames, 0))[:, None]
    )
    return x[..., idx]


def _reflect_pad(x: jax.Array, pad: int) -> jax.Array:
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


def stft(
    x: jax.Array,
    n_fft: int,
    hop: int,
    window: Optional[jax.Array] = None,
    center: bool = True,
) -> jax.Array:
    """Complex STFT ``[..., n_frames, n_fft//2 + 1]``."""
    if window is None:
        window = hann_window(n_fft, dtype=x.dtype)
    if center:
        x = _reflect_pad(x, n_fft // 2)
    frames = frame_signal(x, n_fft, hop)
    return jnp.fft.rfft(frames * window, n=n_fft, axis=-1)


def istft(
    spec: jax.Array,
    n_fft: int,
    hop: int,
    window: Optional[jax.Array] = None,
    length: Optional[int] = None,
) -> jax.Array:
    """Inverse STFT with windowed overlap-add and COLA normalization.

    ``spec`` is ``[..., n_frames, n_fft//2+1]`` complex. This is the
    waveform head of the vocoder, so it is written as a scatter-add that
    XLA fuses with the preceding irfft.
    """
    if window is None:
        window = hann_window(n_fft, dtype=jnp.float32)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window
    n_frames = frames.shape[-2]
    out_len = n_fft + hop * (n_frames - 1)
    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, n_fft))

    if n_fft % hop == 0:
        # Overlap-add by phase decomposition: with ratio = n_fft/hop each
        # hop-slot of the output receives exactly ``ratio`` frame chunks,
        # so OLA is ``ratio`` frame-axis-shifted elementwise adds — no
        # scatter (the scatter formulation measured 24 ms of a 25 ms
        # flagship iSTFT on a v5e; this path ~1 ms). Ascending-m add
        # order is position-independent, so chunked evaluation stays
        # bit-identical to full-signal evaluation (streaming TTS parity).
        ratio = n_fft // hop
        n_slots = n_frames + ratio - 1
        chunks = flat.reshape(-1, n_frames, ratio, hop)
        acc = None
        w2 = (window.astype(jnp.float32) ** 2).reshape(ratio, hop)
        wacc = None
        for m in range(ratio):
            fm = jnp.pad(chunks[:, :, m, :],
                         ((0, 0), (m, n_slots - n_frames - m), (0, 0)))
            acc = fm if acc is None else acc + fm
            wm = jnp.pad(jnp.broadcast_to(w2[m], (n_frames, hop)),
                         ((m, n_slots - n_frames - m), (0, 0)))
            wacc = wm if wacc is None else wacc + wm
        wav = acc.reshape(-1, n_slots * hop)
        wsq = wacc.reshape(n_slots * hop)  # constant-folds for fixed windows
    else:
        starts = hop * np.arange(n_frames)
        idx = starts[:, None] + np.arange(n_fft)[None, :]  # [n_frames, n_fft]

        def overlap_add(fr):
            out = jnp.zeros((out_len,), dtype=fr.dtype)
            return out.at[idx.reshape(-1)].add(fr.reshape(-1))

        wav = jax.vmap(overlap_add)(flat)
        wsq = jnp.zeros((out_len,), dtype=jnp.float32)
        wsq = wsq.at[idx.reshape(-1)].add(jnp.tile(window**2, (n_frames,)))
    # Normalize by summed squared window (COLA denominator).
    wav = wav / jnp.maximum(wsq, 1e-8)

    wav = wav.reshape(batch_shape + (out_len,))
    # Trim the centering pad.
    wav = wav[..., n_fft // 2 : out_len - n_fft // 2]
    if length is not None:
        wav = wav[..., :length]
    return wav
