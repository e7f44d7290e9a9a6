"""Hard-corpus synthetic task: the zero-egress stand-in for real-speech
difficulty (VERDICT r2 missing-1). Covers the 256-word vocabulary
generator, open-set speaker timbres, emotion renderings that preserve the
character F0 ladder (content), additive-noise SNR calibration, and the
corpus plumbing through sample_batch / the ASR train pool."""

import numpy as np
import pytest

from janus_tpu.models.tokenizer import ByteTokenizer
from janus_tpu.train.synthetic_task import (
    EMOTION_RENDERING,
    HARD_WORDS,
    SPEAKER_TIMBRES,
    WORDS,
    add_noise_snr,
    char_frequency,
    make_word_list,
    render_text,
    sample_batch,
    speaker_timbre,
)


def test_word_list_deterministic_and_unique():
    assert make_word_list(256) == HARD_WORDS
    assert len(set(HARD_WORDS)) == 256
    # pronounceable CV structure drawn from the renderable character set
    for w in HARD_WORDS:
        assert 4 <= len(w) <= 8
        assert all(char_frequency(c) > 0 for c in w)
    # disjoint seeds give different vocabularies
    assert make_word_list(64, seed=1) != make_word_list(64, seed=2)


def test_speaker_timbre_fixed_and_open_set():
    for s in range(len(SPEAKER_TIMBRES)):
        assert speaker_timbre(s) == SPEAKER_TIMBRES[s]
    t8a, t8b = speaker_timbre(8), speaker_timbre(8)
    assert t8a == t8b  # deterministic
    assert speaker_timbre(8) != speaker_timbre(9)
    h1, h2, h3 = speaker_timbre(23)
    assert 0.3 <= h1 <= 1.2 and 0.0 <= h2 <= 2.2 and 0.0 <= h3 <= 2.2


def test_neutral_render_unchanged_by_emotion_model():
    """Neutral rendering must be the identity transform (amp 1, rate 1, no
    vibrato/tremolo): committed checkpoints trained on the neutral corpus
    stay in-distribution across emotion-model revisions."""
    assert EMOTION_RENDERING["neutral"] == (1.00, 1.00, 0.000, 0.00)
    a = render_text("alpha bravo", 16_000, seed=5)
    b = render_text("alpha bravo", 16_000, seed=5, emotion="neutral", rate=1.0)
    np.testing.assert_array_equal(a, b)


def test_emotion_rendering_preserves_char_f0():
    """Emotions modulate amplitude/rate/vibrato/tremolo but NOT the
    character F0 ladder — in the tone language F0 IS the text content, so
    any F0 scaling corrupts the transcript (the round-2 regression)."""
    for emo, (amp, rate, vib, trem) in EMOTION_RENDERING.items():
        assert vib <= 0.015, f"{emo}: vibrato crosses the 3.3% ladder step"
        w = render_text("kilo", 16_000, seed=2, emotion=emo)
        # dominant frequency of the first character segment must stay on
        # the ladder: measure via FFT peak of the first char's samples
        n_char = max(16, int(0.06 / rate * 16_000))
        seg = w[:n_char] * np.hanning(n_char)
        spec = np.abs(np.fft.rfft(seg, n=4 * n_char))
        peak_hz = np.argmax(spec) * 16_000 / (4 * n_char)
        want = char_frequency("k")
        assert abs(peak_hz - want) / want < 0.05, (emo, peak_hz, want)


def test_emotion_rate_and_amplitude_scale():
    w_fast = render_text("alpha", 16_000, seed=1, emotion="panicked")
    w_neut = render_text("alpha", 16_000, seed=1)
    rate = EMOTION_RENDERING["panicked"][1]
    assert len(w_fast) < len(w_neut)
    assert abs(len(w_fast) * rate - len(w_neut)) / len(w_neut) < 0.1
    w_shout = render_text("alpha", 16_000, seed=1, emotion="shouting")
    rms = lambda x: float(np.sqrt(np.mean(x**2)))  # noqa: E731
    assert rms(w_shout) > 1.5 * rms(w_neut)
    w_whisper = render_text("alpha", 16_000, seed=1, emotion="whispering")
    assert rms(w_whisper) < 0.5 * rms(w_neut)


def test_hop_quantize_puts_onsets_on_grid():
    """With hop_quantize, every char/gap duration is a hop multiple, so
    every tone onset lands on the mel analysis grid — the phase-
    determinism invariant the vocoder recipe depends on (render_text
    docstring). Neutral rate-1.0 renders are unchanged (0.06 s = 6 hops)."""
    hop = 160
    for emo in ("neutral", "excited", "panicked", "sad", "whispering"):
        w = render_text("kilo lima", 16_000, seed=3, emotion=emo,
                        hop_quantize=hop)
        assert len(w) % hop == 0, emo
    a = render_text("alpha bravo", 16_000, seed=5)
    b = render_text("alpha bravo", 16_000, seed=5, hop_quantize=hop)
    np.testing.assert_array_equal(a, b)


def test_add_noise_snr_calibrated():
    w = render_text("golf hotel", 16_000, seed=9)
    for target in (0.0, 10.0, 20.0):
        noisy = add_noise_snr(w, target, seed=4)
        got = 10 * np.log10(np.mean(w**2) / np.mean((noisy - w) ** 2))
        assert abs(got - target) < 0.5, (target, got)


def test_sample_batch_hard_corpus_knobs():
    tok = ByteTokenizer()
    rng = np.random.default_rng(0)
    audio, tokens, mask, texts = sample_batch(
        rng, 8, tok, max_seconds=3.84, max_tokens=64,
        vocab=HARD_WORDS, n_speakers=16, rate_range=(0.8, 1.25),
        snr_db_range=(8.0, 30.0), max_words=5,
        emotions=("neutral", "excited", "whispering"),
    )
    assert audio.shape == (8, int(3.84 * 16_000))
    assert tokens.shape == mask.shape == (8, 64)
    for t in texts:
        for w in t.split():
            assert w in HARD_WORDS
    # noise actually applied: same seed with/without snr_db_range differs
    # only by the additive noise on the first row (identical rng draws up
    # to the noise sampling), at roughly the requested SNR
    kn = dict(max_seconds=3.84, max_tokens=64, vocab=HARD_WORDS,
              n_speakers=16, rate_range=(0.8, 1.25), max_words=5)
    clean, _, _, _ = sample_batch(np.random.default_rng(7), 1, tok, **kn)
    noisy, _, _, _ = sample_batch(np.random.default_rng(7), 1, tok,
                                  snr_db_range=(0.0, 0.0), **kn)
    sup = np.abs(clean[0]) > 0
    diff = noisy[0] - clean[0]
    assert np.abs(diff).max() > 0
    got = 10 * np.log10(np.mean(clean[0][sup] ** 2) / np.mean(diff[sup] ** 2))
    assert abs(got - 0.0) < 1.0, got

    # default corpus unchanged: tone-language WORDS, single speaker
    audio2, _, _, texts2 = sample_batch(rng, 4, tok, max_seconds=2.0)
    for t in texts2:
        for w in t.split():
            assert w in WORDS
    assert np.abs(audio2[:, -16:]).max() == 0  # no noise injected


def test_build_asr_pool_shapes_and_decimation():
    import jax

    from janus_tpu.train.demo import HARD_CORPUS, build_asr_pool, hard_asr_config

    tok = ByteTokenizer()
    cfg = hard_asr_config()
    rng = np.random.default_rng(1)
    audio16, tokens, mask, texts = build_asr_pool(
        rng, 4, tok, cfg, 3.84, HARD_CORPUS)
    assert audio16.shape == (4, int(3.84 * 16_000))
    assert len(texts) == 4
    assert np.isfinite(audio16).all()
    # round-tripped through 48k and back: energy preserved (anti-aliased
    # decimation, not [::3] striding — SURVEY known-quirks list)
    assert 0.01 < float(np.sqrt(np.mean(audio16**2))) < 1.0


@pytest.mark.slow
def test_hard_corpus_is_learnable():
    """A few hundred steps must move hard-corpus loss decisively (sanity
    that the task is learnable, not noise). Runs in ~90 s on CPU."""
    from janus_tpu.train import demo as demo_mod

    params, cfg, tok, hist = demo_mod.train_demo_asr(
        40, 8, cfg=demo_mod.hard_asr_config(), corpus=demo_mod.HARD_CORPUS,
        max_seconds=3.84, pool_n=64, log_every=0)
    assert hist[-1] < 0.7 * hist[0], (hist[0], hist[-1])
