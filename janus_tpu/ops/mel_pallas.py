"""Fused log-mel frontend as a Pallas matmul-DFT kernel.

On TPU an FFT is the wrong tool for a 400-point STFT: XLA lowers FFTs to
chains of small ops that neither tile onto the MXU nor fuse with the mel
projection (and the SPMD partitioner can't shard them — see the shard_map
frontend in :mod:`janus_tpu.runtime.codec`). This kernel expresses the
whole frontend as three MXU matmuls per frame block, entirely in VMEM:

    re  = frames @ (window * cos)       # [n_fft, n_freqs]
    im  = frames @ (window * -sin)
    mel = (re*re + im*im) @ fb.T        # [n_freqs, n_mels]
    out = log10(max(mel, 1e-10))

A 400x201 DFT costs ~160 K MACs per frame — noise on a 197-TFLOP MXU —
and the power spectrum never round-trips to HBM. The global floor/scale
((max - 8) over the whole signal, then (x+4)/4) needs a cross-frame
reduction, so it stays in XLA after the kernel.

The reference computed this inside faster-whisper's C++ runtime
(reference: backend/services/transcriber.py:23-57); numerics match
:func:`janus_tpu.ops.mel.log_mel_spectrogram` (FFT path) to ~1e-5 in f32
(tested in interpret mode) and ≤1e-3 against the on-TPU FFT path
(matmuls run precision=HIGHEST; without it the MXU's bf16 truncation
costs ~1e-2 — measured on v5e).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from janus_tpu.ops.mel import _mel_filterbank_np
from janus_tpu.ops.stft import _hann_np, _reflect_pad, frame_signal

__all__ = ["log_mel_spectrogram_fused"]

_BLOCK_F = 256  # frames per grid step
_LANE = 128


@functools.lru_cache(maxsize=None)
def _dft_mats_np(n_fft: int, sample_rate: int, n_mels: int):
    """Window-folded DFT matrices + transposed filterbank, lane-padded."""
    n_freqs = n_fft // 2 + 1
    window = _hann_np(n_fft).astype(np.float64)
    n = np.arange(n_fft)[:, None]
    f = np.arange(n_freqs)[None, :]
    ang = 2.0 * np.pi * n * f / n_fft
    cos = (window[:, None] * np.cos(ang)).astype(np.float32)
    sin = (window[:, None] * -np.sin(ang)).astype(np.float32)
    fbt = _mel_filterbank_np(sample_rate, n_fft, n_mels, 0.0,
                             sample_rate / 2.0).T.astype(np.float32)

    def pad(a, rows, cols):
        return np.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))

    kpad = n_fft + (-n_fft) % _LANE         # n_fft up to lane multiple
    fpad = n_freqs + (-n_freqs) % _LANE
    mpad = n_mels + (-n_mels) % _LANE
    return (pad(cos, kpad, fpad), pad(sin, kpad, fpad),
            pad(fbt, fpad, mpad), n_freqs)


def _kernel(fr_ref, c_ref, s_ref, fb_ref, o_ref):
    # precision=HIGHEST: the MXU's default f32 matmul truncates inputs to
    # bf16, which costs ~1e-2 of log-mel accuracy vs the FFT reference
    # (measured on v5e); 3-pass f32 emulation keeps parity at ~1e-5 and
    # these matmuls are tiny (400x201)
    hi = jax.lax.Precision.HIGHEST
    fr = fr_ref[...].astype(jnp.float32)
    re = jnp.dot(fr, c_ref[...], precision=hi,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(fr, s_ref[...], precision=hi,
                 preferred_element_type=jnp.float32)
    mel = jnp.dot(re * re + im * im, fb_ref[...], precision=hi,
                  preferred_element_type=jnp.float32)
    o_ref[...] = jnp.log10(jnp.maximum(mel, 1e-10))


def log_mel_spectrogram_fused(
    audio: jax.Array,
    sample_rate: int = 16_000,
    n_fft: int = 400,
    hop: int = 160,
    n_mels: int = 80,
    force: bool = False,
) -> jax.Array:
    """Drop-in for :func:`janus_tpu.ops.mel.log_mel_spectrogram`.

    Off-TPU this delegates to the FFT path unless ``force=True`` (which
    runs the kernel in interpreter mode, for tests).
    """
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu and not force:
        from janus_tpu.ops.mel import log_mel_spectrogram

        return log_mel_spectrogram(audio, sample_rate, n_fft, hop, n_mels)

    cos, sin, fbt, n_freqs = _dft_mats_np(n_fft, sample_rate, n_mels)
    kpad, mpad = cos.shape[0], fbt.shape[1]

    x = _reflect_pad(audio.astype(jnp.float32), n_fft // 2)
    frames = frame_signal(x, n_fft, hop)[..., :-1, :]  # drop final frame
    batch_shape = frames.shape[:-2]
    t = frames.shape[-2]
    flat = frames.reshape(-1, n_fft)
    n_rows = flat.shape[0]
    block_f = min(_BLOCK_F, max(8, n_rows))
    rpad = (-n_rows) % block_f
    flat = jnp.pad(flat, ((0, rpad), (0, kpad - n_fft)))

    out = pl.pallas_call(
        _kernel,
        grid=(flat.shape[0] // block_f,),
        in_specs=[
            pl.BlockSpec((block_f, kpad), lambda i: (i, 0)),
            pl.BlockSpec((kpad, cos.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((kpad, sin.shape[1]), lambda i: (0, 0)),
            pl.BlockSpec((cos.shape[1], mpad), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_f, mpad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((flat.shape[0], mpad), jnp.float32),
        interpret=not on_tpu,
    )(flat, jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(fbt))

    log_spec = out[:n_rows, :n_mels].reshape(batch_shape + (t, n_mels))
    peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    return (log_spec + 4.0) / 4.0
