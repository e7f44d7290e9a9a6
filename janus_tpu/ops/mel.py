"""Mel filterbank and the Whisper-style log-mel frontend.

The filterbank uses the Slaney mel scale with Slaney area normalization —
numerically identical to the filters the reference's STT dependency applies
inside faster-whisper (reference: backend/services/transcriber.py:23-57
delegates to Whisper `base.en`, whose frontend is hann(400)/hop 160/80 mel,
log10-clamped and (x+4)/4-scaled). The filterbank is a dense ``[n_mels,
n_freqs]`` matrix so mel projection is a single MXU matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.ops.stft import stft, hann_window

__all__ = ["mel_filterbank", "log_mel_spectrogram"]


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    above = m >= min_log_mel
    f = np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)
    return f


@functools.lru_cache(maxsize=None)
def _mel_filterbank_np(
    sample_rate: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(np.array(fmin)), _hz_to_mel_slaney(np.array(fmax)), n_mels + 2
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style area normalization.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def mel_filterbank(
    sample_rate: int = 16_000,
    n_fft: int = 400,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Dense ``[n_mels, n_fft//2+1]`` Slaney filterbank matrix."""
    if fmax is None:
        fmax = sample_rate / 2.0
    return jnp.asarray(
        _mel_filterbank_np(sample_rate, n_fft, n_mels, float(fmin), float(fmax)),
        dtype=dtype,
    )


def log_mel_spectrogram(
    audio: jax.Array,
    sample_rate: int = 16_000,
    n_fft: int = 400,
    hop: int = 160,
    n_mels: int = 80,
) -> jax.Array:
    """Whisper-frontend log-mel features ``[..., n_frames, n_mels]``.

    Matches the canonical pipeline: periodic Hann, centered reflect-padded
    STFT, power spectrum with the final frame dropped, Slaney mel matmul,
    log10 clamped at 1e-10, floored at (max - 8), then ``(x + 4) / 4``.
    """
    window = hann_window(n_fft, dtype=jnp.float32)
    spec = stft(audio.astype(jnp.float32), n_fft=n_fft, hop=hop, window=window)
    power = jnp.abs(spec[..., :-1, :]) ** 2  # drop the final frame
    fb = mel_filterbank(sample_rate, n_fft, n_mels)
    mel = jnp.einsum("...tf,mf->...tm", power, fb)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # Global floor over frames+mels per signal in the batch.
    peak = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    return (log_spec + 4.0) / 4.0
