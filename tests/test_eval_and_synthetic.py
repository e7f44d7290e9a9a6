"""Evaluation metrics and the synthetic tone-language corpus."""

import numpy as np
import pytest

from janus_tpu.eval.metrics import (
    character_error_rate,
    prosody_agreement,
    snr_db,
    word_error_rate,
)
from janus_tpu.models.tokenizer import ByteTokenizer
from janus_tpu.train.synthetic_task import (
    WORDS,
    char_frequency,
    mel_targets_for,
    render_text,
    sample_batch,
    sample_text,
)


def test_wer_basics():
    assert word_error_rate(["a b c"], ["a b c"]) == 0.0
    assert word_error_rate(["a b c"], ["a x c"]) == pytest.approx(1 / 3)
    assert word_error_rate(["a b"], [""]) == 1.0
    assert word_error_rate(["a"], ["a b"]) == 1.0  # insertion
    # corpus-level pooling
    assert word_error_rate(["a b", "c d"], ["a b", "c x"]) == pytest.approx(0.25)


def test_cer():
    assert character_error_rate(["abc"], ["abc"]) == 0.0
    assert character_error_rate(["abc"], ["adc"]) == pytest.approx(1 / 3)


def test_snr():
    x = np.sin(np.linspace(0, 100, 48000))
    assert snr_db(x, x) == float("inf")
    noisy = x + 0.1 * np.random.default_rng(0).standard_normal(len(x))
    assert 15 < snr_db(x, noisy) < 20


def test_prosody_agreement():
    refs = [("Normal", "High"), ("Loud", "Deep")]
    assert prosody_agreement(refs, refs) == 1.0
    assert prosody_agreement(refs, [("Normal", "High"), ("Quiet", "Deep")]) == 0.5


def test_char_frequencies_distinct():
    freqs = [char_frequency(c) for c in "abcdefghijklmnopqrstuvwxyz"]
    assert len(set(freqs)) == 26
    assert min(freqs) >= 120.0


def test_render_text_deterministic():
    a = render_text("alpha bravo", seed=7)
    b = render_text("alpha bravo", seed=7)
    np.testing.assert_array_equal(a, b)
    # duration: 10 chars * 0.06s + 1 gap * 0.04s
    assert len(a) == int(10 * 0.06 * 16000) + int(0.04 * 16000)


def test_sample_batch_shapes():
    tok = ByteTokenizer()
    rng = np.random.default_rng(0)
    audio, tokens, mask, texts = sample_batch(rng, 4, tok, max_seconds=1.5,
                                              max_tokens=24)
    assert audio.shape == (4, 24000)
    assert tokens.shape == mask.shape == (4, 24)
    for i, text in enumerate(texts):
        ids = tokens[i][mask[i] > 0]
        assert ids[0] == tok.sot and ids[-1] == tok.eot
        assert tok.decode(ids[1:-1]) == text
        assert all(w in WORDS for w in text.split())


def test_mel_targets():
    mels, mask = mel_targets_for(["alpha", "bravo charlie"], n_mels=40,
                                 reduction=2, max_groups=64)
    assert mels.shape == (2, 64, 80)
    assert mask.shape == (2, 64)
    assert mask[1].sum() > mask[0].sum()  # longer text -> more groups
