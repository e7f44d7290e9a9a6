"""Fused Pallas matmul-DFT log-mel kernel vs the FFT reference path."""

import numpy as np
import pytest

import jax.numpy as jnp

from janus_tpu.ops.mel import log_mel_spectrogram
from janus_tpu.ops.mel_pallas import log_mel_spectrogram_fused


@pytest.mark.parametrize("shape", [(16000,), (2, 32000), (3, 8000)])
def test_fused_matches_fft_path(shape):
    rng = np.random.default_rng(hash(shape) % 2**31)
    audio = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)
    ref = np.asarray(log_mel_spectrogram(audio))
    out = np.asarray(log_mel_spectrogram_fused(audio, force=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-5)


def test_fused_128_mels_flagship_frontend():
    """large-v3 uses 128 mels — exercise the non-default filterbank."""
    rng = np.random.default_rng(7)
    audio = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    ref = np.asarray(log_mel_spectrogram(audio, n_mels=128))
    out = np.asarray(log_mel_spectrogram_fused(audio, n_mels=128, force=True))
    np.testing.assert_allclose(out, ref, atol=5e-5)


def test_fused_sine_peak_bin():
    """A pure tone must light up the same mel band as the FFT path."""
    sr = 16000
    t = np.arange(sr) / sr
    audio = jnp.asarray(np.sin(2 * np.pi * 440.0 * t).astype(np.float32))
    out = np.asarray(log_mel_spectrogram_fused(audio, force=True))
    ref = np.asarray(log_mel_spectrogram(audio))
    assert int(out.mean(axis=0).argmax()) == int(ref.mean(axis=0).argmax())
