"""DSP frontend correctness: STFT/mel vs independent references, resampler
anti-aliasing, RMS classification."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from janus_tpu.ops.stft import frame_signal, hann_window, stft, istft
from janus_tpu.ops.mel import log_mel_spectrogram, mel_filterbank
from janus_tpu.ops.resample import decimate_48k_to_16k, naive_decimate, resample_poly
from janus_tpu.ops.energy import classify_energy, rms_energy, ENERGY_TAGS


def test_frame_signal_shapes_and_content(rng):
    x = jnp.asarray(rng.standard_normal(1000), dtype=jnp.float32)
    frames = frame_signal(x, 400, 160)
    assert frames.shape == (1 + (1000 - 400) // 160, 400)
    np.testing.assert_array_equal(np.asarray(frames[1]), np.asarray(x[160:560]))


def test_stft_matches_scipy(rng):
    from scipy import signal as sps

    x = rng.standard_normal(4000).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), n_fft=400, hop=160, center=False))
    win = np.asarray(hann_window(400))
    # direct numpy reference
    n_frames = 1 + (4000 - 400) // 160
    ref = np.stack(
        [np.fft.rfft(x[i * 160 : i * 160 + 400] * win) for i in range(n_frames)]
    )
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_istft_reconstructs(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    spec = stft(jnp.asarray(x), n_fft=512, hop=128)
    y = np.asarray(istft(spec, n_fft=512, hop=128, length=4096))
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_mel_filterbank_matches_transformers():
    # transformers implements the same Slaney filterbank used by Whisper's
    # frontend; cross-check numerics exactly.
    from transformers.audio_utils import mel_filter_bank

    theirs = mel_filter_bank(
        num_frequency_bins=201,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    )
    ours = np.asarray(mel_filterbank(16000, 400, 80))
    np.testing.assert_allclose(ours, theirs.T, atol=1e-6)


def test_log_mel_matches_whisper_feature_extractor():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()  # offline: pure-config construction
    rng = np.random.default_rng(1)
    audio = (0.5 * np.sin(2 * np.pi * 220 * np.arange(16000) / 16000)).astype(
        np.float32
    ) + 0.01 * rng.standard_normal(16000).astype(np.float32)
    theirs = fe(audio, sampling_rate=16000, return_tensors="np", padding="max_length")
    ref = theirs.input_features[0].T  # [frames, mels]
    ours = np.asarray(
        log_mel_spectrogram(jnp.asarray(np.pad(audio, (0, 480000 - 16000))))
    )
    assert ours.shape == ref.shape == (3000, 80)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_decimate_antialiases_better_than_stride():
    # A 10 kHz tone at 48 kHz is above the 16 kHz Nyquist: after proper
    # decimation it must (mostly) vanish; the reference's [::3] folds it to
    # 6 kHz at full amplitude.
    sr = 48000
    t = np.arange(sr) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 10000 * t).astype(np.float32))
    ours = np.asarray(decimate_48k_to_16k(x))
    naive = np.asarray(naive_decimate(x, 3))
    assert ours.shape[0] == 16000
    assert np.sqrt(np.mean(ours[200:-200] ** 2)) < 0.02
    assert np.sqrt(np.mean(naive**2)) > 0.5


def test_decimate_passband_flat():
    sr = 48000
    t = np.arange(sr) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 1000 * t).astype(np.float32))
    y = np.asarray(decimate_48k_to_16k(x))[200:-200]
    rms = np.sqrt(np.mean(y**2))
    assert abs(rms - 1 / np.sqrt(2)) < 0.01


def test_decimate_matmul_matches_conv_formulation():
    """The framed-matmul decimator (serving path) must match the
    conv-engine formulation at float epsilon for odd lengths, small
    chunks, and batches."""
    from janus_tpu.ops.resample import _decimate_fir, _decimate_fir_conv

    rng = np.random.default_rng(0)
    for shape in [(48_000,), (3, 48_000), (2, 1536), (5, 48_007)]:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        a = np.asarray(_decimate_fir(x, 3, 96))
        b = np.asarray(_decimate_fir_conv(x, 3, 96))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)
    # factor-2 path reached through resample_poly(up=1, down=2)
    x = jnp.asarray(rng.standard_normal((4, 24_000)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(resample_poly(x, 1, 2)),
        np.asarray(_decimate_fir_conv(x, 2, 64)), rtol=0, atol=2e-5)


def test_upsample_chunk_bitwise_invariance():
    """The per-phase shifted-FMA upsampler must give BIT-identical interior
    outputs for chunked evaluation with halo — the property the streaming
    TTS parity contract relies on (runtime/streaming_tts.py)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    full = np.asarray(resample_poly(x, 2, 1))
    halo = 128
    for lo, hi in ((0, 512), (512, 1024), (1000, 2500), (3500, 4096)):
        s0, s1 = max(0, lo - halo), min(4096, hi + halo)
        out = np.asarray(resample_poly(x[:, s0:s1], 2, 1))
        seg = out[:, (lo - s0) * 2 : (lo - s0) * 2 + (hi - lo) * 2]
        np.testing.assert_array_equal(seg, full[:, lo * 2 : hi * 2])


def test_istft_fast_ola_matches_scatter():
    """When hop divides n_fft the scatter-free overlap-add must match the
    scatter formulation (kept for non-dividing hops) at float epsilon."""
    from janus_tpu.ops.stft import hann_window

    rng = np.random.default_rng(5)
    for n_fft, hop in ((1024, 256), (512, 128), (400, 160)):
        x = rng.standard_normal((2, 6000)).astype(np.float32)
        s = stft(jnp.asarray(x), n_fft=n_fft, hop=hop)
        window = hann_window(n_fft)
        frames = jnp.fft.irfft(s, n=n_fft, axis=-1) * window
        n_frames = frames.shape[-2]
        out_len = n_fft + hop * (n_frames - 1)
        idx = (hop * np.arange(n_frames))[:, None] + np.arange(n_fft)[None, :]
        flat = frames.reshape((-1, n_frames, n_fft))

        def ola(fr):
            return jnp.zeros((out_len,), fr.dtype).at[idx.reshape(-1)].add(
                fr.reshape(-1))

        ref = jax.vmap(ola)(flat)
        wsq = jnp.zeros((out_len,), jnp.float32).at[idx.reshape(-1)].add(
            jnp.tile(window**2, (n_frames,)))
        ref = (ref / jnp.maximum(wsq, 1e-8))[..., n_fft // 2 : out_len - n_fft // 2]
        got = istft(s, n_fft=n_fft, hop=hop)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=2e-5)


def test_resample_poly_upsample():
    sr = 16000
    t = np.arange(sr) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 440 * t).astype(np.float32))
    y = np.asarray(resample_poly(x, up=3, down=2))
    assert y.shape[0] == sr * 3 // 2
    # same tone at the new rate
    t2 = np.arange(y.shape[0]) / (sr * 1.5)
    ref = np.sin(2 * np.pi * 440 * t2)
    seg = slice(500, -500)
    corr = np.corrcoef(y[seg], ref[seg])[0, 1]
    assert corr > 0.999


def test_rms_energy_and_classes(rng):
    quiet = jnp.asarray(0.01 * rng.standard_normal(4800).astype(np.float32))
    normal = jnp.asarray(0.1 * np.sign(rng.standard_normal(4800)).astype(np.float32))
    loud = jnp.asarray(0.5 * np.sign(rng.standard_normal(4800)).astype(np.float32))
    r = rms_energy(jnp.stack([quiet, normal, loud]))
    codes = np.asarray(classify_energy(r))
    assert [ENERGY_TAGS[c] for c in codes] == ["Quiet", "Normal", "Loud"]


def test_rms_energy_masked():
    x = jnp.asarray(np.concatenate([np.full(100, 0.5), np.zeros(100)]).astype(np.float32))
    mask = jnp.asarray(np.concatenate([np.ones(100), np.zeros(100)]))
    assert abs(float(rms_energy(x, mask)) - 0.5) < 1e-6
    assert abs(float(rms_energy(x)) - 0.5 / np.sqrt(2)) < 1e-6


def test_frontend_jits_and_batches(rng):
    xb = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    f = jax.jit(lambda a: log_mel_spectrogram(a))
    out = f(xb)
    assert out.shape == (2, 8000 // 160, 80)
    single = log_mel_spectrogram(xb[0])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single), atol=1e-5)
