"""YIN pitch tracker: accuracy on synthetic tones, aubio-streaming-window
semantics, categorical thresholds (reference: backend/services/prosody.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from janus_tpu.ops.yin import (
    PITCH_TAGS,
    classify_pitch,
    mean_voiced_pitch,
    yin_frame,
    yin_track,
)


def tone(freq, sr=48000, seconds=0.5, amp=0.6):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def naive_yin_reference(window, sr, tol=0.8):
    """Literal O(W^2) transcription of the YIN algorithm (difference fn,
    CMNDF, first-local-min-below-tolerance, parabolic interp)."""
    w = window.astype(np.float64)
    n = len(w) // 2
    d = np.zeros(n)
    for tau in range(1, n):
        diff = w[:n] - w[tau : tau + n]
        d[tau] = np.dot(diff, diff)
    y = np.ones(n)
    run = 0.0
    for tau in range(1, n):
        run += d[tau]
        y[tau] = d[tau] * tau / run if run > 0 else 1.0
    pos = None
    for tau in range(5, n):
        p = tau - 3
        if y[p] < tol and y[p] < y[p + 1]:
            pos = p
            break
    if pos is None:
        pos = int(np.argmin(y))
    if 0 < pos < n - 1:
        s0, s1, s2 = y[pos - 1], y[pos], y[pos + 1]
        denom = s0 - 2 * s1 + s2
        period = pos + (0.5 * (s0 - s2) / denom if abs(denom) > 1e-12 else 0.0)
    else:
        period = float(pos)
    return sr / period if period > 0 else 0.0


@pytest.mark.parametrize("freq", [110.0, 220.0, 440.0])
def test_yin_frame_matches_naive_reference(freq):
    sr = 48000
    w = tone(freq, sr, seconds=4096 / sr)[:4096]
    ours = float(yin_frame(jnp.asarray(w), sr))
    ref = naive_yin_reference(w, sr)
    assert abs(ours - ref) < 0.5, (ours, ref)
    assert abs(ours - freq) / freq < 0.01


def test_yin_frame_silence_is_unvoiced():
    w = jnp.zeros(4096)
    assert float(yin_frame(w, 48000)) == 0.0


def test_yin_frame_noise_is_unvoiced_or_untrusted():
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    ours = float(yin_frame(w, 48000, tolerance=0.1))
    ref = naive_yin_reference(np.asarray(w), 48000, tol=0.1)
    assert abs(ours - ref) < 1.0


def test_yin_track_streaming_windows():
    # 440 Hz for 0.5 s: early hops see mostly zero-padding, later hops lock
    # onto the tone; the voiced mean must land near 440.
    sr = 48000
    x = jnp.asarray(tone(440.0, sr, 0.5))
    track = yin_track(x, sr)
    assert track.shape == (-(-x.shape[0] // 512),)
    mean = float(mean_voiced_pitch(track))
    assert abs(mean - 440.0) / 440.0 < 0.05


def test_yin_track_batched_jit():
    sr = 48000
    xb = jnp.stack([jnp.asarray(tone(110.0, sr, 0.25)), jnp.asarray(tone(330.0, sr, 0.25))])
    f = jax.jit(lambda a: mean_voiced_pitch(yin_track(a, sr)))
    m = np.asarray(f(xb))
    assert abs(m[0] - 110) < 6
    assert abs(m[1] - 330) < 10


@pytest.mark.parametrize(
    "f0,expected",
    [(0.0, "Normal"), (80.0, "Deep"), (119.9, "Deep"), (120.0, "Normal"),
     (199.9, "Normal"), (200.0, "High"), (440.0, "High")],
)
def test_classify_pitch_thresholds(f0, expected):
    code = int(classify_pitch(jnp.asarray(f0)))
    assert PITCH_TAGS[code] == expected


def test_mean_voiced_pitch_filters_zeros():
    track = jnp.asarray([0.0, 100.0, 0.0, 200.0])
    assert float(mean_voiced_pitch(track)) == 150.0
    assert float(mean_voiced_pitch(jnp.zeros(4))) == 0.0


def test_mean_voiced_pitch_masks_padding():
    track = jnp.asarray([100.0, 100.0, 900.0, 900.0])
    m = float(mean_voiced_pitch(track, n_valid=jnp.asarray(2)))
    assert m == 100.0


def test_bounded_truncated_fft_exact_vs_full_length():
    """The bounded search computes d(tau) with a shrunken FFT
    (fft_len >= buf + n_lags_out makes linear correlation exact) — results
    must be identical to slicing a full-length computation."""
    import jax.numpy as jnp

    from janus_tpu.ops.yin import _difference_function, _fast_fft_len, yin_frame

    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((3, 4096)).astype(np.float32))
    full = np.asarray(_difference_function(w, 2048))
    trunc = np.asarray(_difference_function(w, 2048, n_lags_out=1202))
    np.testing.assert_allclose(trunc, full[..., :1202], rtol=1e-4, atol=1e-3)

    # end-to-end: bounded pitch on a tone must equal the pre-truncation
    # behavior (here: simply detect the tone accurately)
    t = np.arange(4096) / 48000.0
    tone = jnp.asarray(np.sin(2 * np.pi * 170.0 * t).astype(np.float32))[None]
    f0 = float(np.asarray(yin_frame(tone, 48000, fmin=40.0, fmax=1000.0))[0])
    assert abs(f0 - 170.0) < 1.0, f0

    assert _fast_fft_len(5304) == 5400
    assert _fast_fft_len(4097) == 4320
    assert _fast_fft_len(8192) == 8192


@pytest.mark.parametrize("bounded", [False, True])
def test_fast_path_matches_fft_fallback(bounded):
    """yin_track's signal-level block-sum fast path (taken for the default
    4096/512 geometry) must equal the per-window FFT fallback
    (_hop_windows + yin_frame) on mixed tone/noise input."""
    from janus_tpu.ops.yin import _hop_windows, yin_frame, yin_track

    rng = np.random.default_rng(11)
    sr = 48_000
    t = np.arange(sr) / sr
    tone = 0.2 * np.sin(2 * np.pi * 196.0 * t)
    noise = 0.05 * rng.standard_normal(sr)
    sig = np.stack([tone + noise, noise, tone]).astype(np.float32)
    x = jnp.asarray(sig)

    kw = {"fmin": 40.0, "fmax": 1000.0} if bounded else {}
    fast = np.asarray(yin_track(x, sr, buf=4096, hop=512, **kw))
    windows = _hop_windows(x.astype(jnp.float32), 4096, 512)
    slow = np.asarray(yin_frame(windows, sr, 0.8, **kw))
    assert fast.shape == slow.shape
    # same voicing decisions, near-identical F0 where voiced
    voiced_fast, voiced_slow = fast > 0, slow > 0
    np.testing.assert_array_equal(voiced_fast, voiced_slow)
    np.testing.assert_allclose(fast[voiced_fast], slow[voiced_slow],
                               rtol=0, atol=0.01)


def test_serving_16k_geometry_matches_48k():
    """The serving encoder tracks pitch on the anti-aliased 16 kHz stream
    with duration-matched geometry (ProsodyConfig.yin_rate=16000: window
    1360 ≈ 85 ms, hop 170 ≈ 10.6 ms): mean voiced f0 must agree with
    native 48 kHz / 4096 / 512 tracking to well under a percent, and the
    categorical class must agree on off-boundary material."""
    from janus_tpu.ops.resample import decimate_48k_to_16k
    from janus_tpu.train.synthetic_task import render_text

    kw = {"fmin": 40.0, "fmax": 1000.0}

    def f48(x48):
        return float(mean_voiced_pitch(yin_track(jnp.asarray(x48), 48_000,
                                                 4096, 512, **kw)))

    def f16(x48):
        x16 = decimate_48k_to_16k(jnp.asarray(x48))
        return float(mean_voiced_pitch(yin_track(x16, 16_000, 1360, 170, **kw)))

    for freq in (90.0, 140.0, 300.0, 700.0):
        x = tone(freq, 48_000, seconds=1.0)
        a, b = f48(x), f16(x)
        assert abs(a - b) / freq < 0.005, (freq, a, b)
        assert int(classify_pitch(jnp.asarray(a))) == int(
            classify_pitch(jnp.asarray(b)))

    # rendered multi-tone corpus utterance: classes agree
    w48 = render_text("alpha bravo", 48_000, seed=0)
    a, b = f48(w48), f16(w48)
    assert abs(a - b) / max(a, 1.0) < 0.02, (a, b)
    assert int(classify_pitch(jnp.asarray(a))) == int(
        classify_pitch(jnp.asarray(b)))

    # silence/noise stays unvoiced on both paths
    rng = np.random.default_rng(7)
    noise = (0.05 * rng.standard_normal(48_000)).astype(np.float32)
    assert f16(noise) == 0.0 or abs(f16(noise) - f48(noise)) < 5.0


def test_pallas_block_sums_match_xla_path():
    """The Pallas YIN block-sum kernel (interpret mode off-TPU) must match
    the XLA per-tau path on both serving geometries."""
    import jax.numpy as jnp

    from janus_tpu.ops.yin import _block_sums_xla, _pad_stream
    from janus_tpu.ops.yin_pallas import block_sums

    rng = np.random.default_rng(11)
    for buf, hop, n_lags_out, t in ((1360, 170, 402, 16_000),
                                    (4096, 512, 1202, 24_000)):
        audio = jnp.asarray(rng.standard_normal((2, t)).astype(np.float32))
        padded, n_hops = _pad_stream(audio, buf, hop)
        nblk = n_hops + (buf // 2) // hop - 1
        ref = np.asarray(_block_sums_xla(padded, nblk, hop, n_lags_out))
        out = np.asarray(block_sums(padded, nblk, hop, n_lags_out,
                                    interpret=True))
        np.testing.assert_allclose(out[..., :n_lags_out],
                                   ref[..., :n_lags_out],
                                   rtol=2e-4, atol=2e-4)


def test_dft_block_sums_match_xla_path():
    """The matmul-DFT block-sum route (the TPU serving default) must match
    the XLA per-tau direct-sum path on both serving geometries."""
    import jax.numpy as jnp

    from janus_tpu.ops.yin import _block_sums_dft, _block_sums_xla, _pad_stream

    rng = np.random.default_rng(11)
    for buf, hop, n_lags_out, t in ((1360, 170, 402, 16_000),
                                    (4096, 512, 1202, 24_000)):
        audio = jnp.asarray(rng.standard_normal((2, t)).astype(np.float32))
        padded, n_hops = _pad_stream(audio, buf, hop)
        nblk = n_hops + (buf // 2) // hop - 1
        ref = np.asarray(_block_sums_xla(padded, nblk, hop, n_lags_out))
        out = np.asarray(_block_sums_dft(padded, nblk, hop, n_lags_out))
        assert out.shape[:-1] == ref.shape[:-1]
        np.testing.assert_allclose(out[..., :n_lags_out],
                                   ref[..., :n_lags_out],
                                   rtol=2e-4, atol=2e-3)


def test_track_difference_dft_route_matches():
    """yin_track's d(tau) via the DFT route equals the XLA route end to
    end, and tone F0 agrees to well under the interp resolution."""
    import jax.numpy as jnp

    from janus_tpu.ops.yin import _track_difference

    rng = np.random.default_rng(12)
    audio = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    ref = np.asarray(_track_difference(audio, 1360, 170, 402, route="xla"))
    out = np.asarray(_track_difference(audio, 1360, 170, 402, route="dft"))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=5e-3)

    sr = 16_000
    for freq in (90.0, 300.0, 700.0):
        t = np.arange(sr) / sr
        x = jnp.asarray((0.6 * np.sin(2 * np.pi * freq * t)).astype(np.float32))
        kw = {"fmin": 40.0, "fmax": 1000.0}
        d_ref = _track_difference(x, 1360, 170, 402, route="xla")
        d_dft = _track_difference(x, 1360, 170, 402, route="dft")
        from janus_tpu.ops.yin import _cmndf, _search_bounds, _select_pitch
        p_lo, p_hi, nlo, bounded = _search_bounds(1360, sr, 40.0, 1000.0)
        f_ref = float(mean_voiced_pitch(_select_pitch(
            _cmndf(d_ref)[..., :nlo], sr, 0.8, p_lo, p_hi, bounded)))
        f_dft = float(mean_voiced_pitch(_select_pitch(
            _cmndf(d_dft)[..., :nlo], sr, 0.8, p_lo, p_hi, bounded)))
        assert abs(f_ref - f_dft) < 0.01, (freq, f_ref, f_dft)


def test_track_difference_pallas_route_matches():
    """yin_track's d(tau) via the Pallas route (interpret) equals the XLA
    route end to end."""
    import jax.numpy as jnp

    from janus_tpu.ops.yin import _track_difference

    rng = np.random.default_rng(12)
    audio = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    ref = np.asarray(_track_difference(audio, 1360, 170, 402,
                                       use_pallas=False))
    out = np.asarray(_track_difference(audio, 1360, 170, 402,
                                       use_pallas=True))
    # d(tau) ~ O(100); near-zero entries (perfect periodicity) amplify f32
    # accumulation-order differences into large RELATIVE error, so the
    # bound is absolute at d's scale
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=5e-3)
