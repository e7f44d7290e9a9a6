"""Quality gates on the COMMITTED zoo checkpoints (VERDICT r2 weak-7).

Every other test builds tiny random models; these load
``checkpoints/demo_*.npz`` — the artifacts the eval report advertises —
and assert the floors, so a bad retrain cannot ship green:

- demo ASR: WER 0 on fresh neutral tone-language utterances, low WER
  across emotion renderings (the standard corpus it is trained on)
- demo vocoder: copy-synthesis SNR >= 18 dB (the documented gate)
- demo TTS (+ vocoder + ASR): full packet->speech->text round trip on
  wire-reachable emotion tags
- hard ASR: WER floors on the 256-word/16-speaker/noise corpus

Reference bar: intelligible round-trip audio
(backend/services/synthesizer.py:106-207). Skipped wholesale when the
checkpoints are absent (fresh clone before training).
"""

import numpy as np
import pytest

from janus_tpu.models import zoo

pytestmark = pytest.mark.slow

needs_zoo = pytest.mark.skipif(
    not zoo.demo_available(), reason="demo checkpoints not present")


@pytest.fixture(scope="module")
def bundle():
    if not zoo.demo_available():
        pytest.skip("demo checkpoints not present")
    return zoo.load_demo()


@needs_zoo
def test_demo_asr_wer_floor_neutral(bundle):
    from janus_tpu.train.demo import demo_asr_config, evaluate_asr
    from janus_tpu.models.tokenizer import ByteTokenizer

    wer, pairs = evaluate_asr(bundle.asr_params, demo_asr_config(),
                              ByteTokenizer(), n_utterances=16, seed=123)
    assert wer == 0.0, pairs[:4]


@needs_zoo
def test_demo_asr_wer_floor_emotion_renderings(bundle):
    from janus_tpu.train.demo import STANDARD_CORPUS, demo_asr_config, evaluate_asr
    from janus_tpu.models.tokenizer import ByteTokenizer

    wer, pairs = evaluate_asr(bundle.asr_params, demo_asr_config(),
                              ByteTokenizer(), n_utterances=24, seed=77,
                              corpus=STANDARD_CORPUS)
    assert wer <= 0.08, (wer, pairs[:4])


@needs_zoo
def test_demo_vocoder_snr_floor(bundle):
    from janus_tpu.train.demo import demo_vocoder_config
    from janus_tpu.train.retrain_demo import quick_copy_snr

    # r5: d256/L8 retrain + correct end-flush context moved the probe from
    # ~19 dB to ~29 dB; the floor moves up with it (VERDICT r4 weak-6
    # asked for >= 23 mean / >= 21 min with headroom over the old 18 gate)
    snr = quick_copy_snr(bundle.vocoder_params, demo_vocoder_config())
    assert snr >= 24.0, snr


@needs_zoo
def test_roundtrip_through_wire_reachable_emotions(bundle):
    """Packet -> synthesizer (per-emotion style) -> ASR must return the
    original text for every wire-reachable emotion tag (the round-2
    regression shipped 0/5 here)."""
    from janus_tpu.eval.roundtrip import REACHABLE_EMOTIONS, evaluate_emotion_roundtrip
    from janus_tpu.runtime.codec import SemanticEncoder
    from janus_tpu.runtime.synthesizer import Synthesizer
    from janus_tpu.train.demo import demo_speaker_vectors

    cfg = bundle.config
    encoder = SemanticEncoder(cfg, asr_params=bundle.asr_params,
                              buckets=(48_000 * 2,))
    _sp, vecs = demo_speaker_vectors(cfg.tts)
    synth = Synthesizer(cfg, tts_params=bundle.tts_params,
                        vocoder_params=bundle.vocoder_params,
                        default_speaker_vec=vecs[0])
    # r5: the bar is ALL wire-reachable tags — the r4 ">= 4/5" loosening
    # (a gate tuned to the artifact) must not return (VERDICT r4 weak-1);
    # the reference renders every reachable combo through the same TTS
    # (backend/services/synthesizer.py:158-177)
    out = evaluate_emotion_roundtrip(synth, encoder)
    assert out["emotion_roundtrip_match"] == 1.0, out


@needs_zoo
def test_voice_clone_identity_floor(bundle):
    from janus_tpu.eval.roundtrip import evaluate_voice_clone_identity

    out = evaluate_voice_clone_identity(
        bundle.tts_params, bundle.config.tts,
        bundle.vocoder_params, bundle.config.vocoder)
    assert out["voice_clone_identity_frac"] == 1.0, out


def test_hard_asr_wer_floors():
    import os

    from janus_tpu.eval.roundtrip import load_npz_params
    from janus_tpu.models.tokenizer import ByteTokenizer
    from janus_tpu.train.demo import HARD_CORPUS, evaluate_asr, hard_asr_config

    path = os.path.join(zoo.REPO_ROOT, "checkpoints", "demo_asr_hard.npz")
    if not os.path.exists(path):
        pytest.skip("hard ASR checkpoint not present")
    params = load_npz_params(path)
    cfg = hard_asr_config()
    tok = ByteTokenizer()

    clean = dict(HARD_CORPUS)
    clean.pop("snr_db_range", None)
    clean["clean_prob"] = 0.0
    wer_clean, pairs = evaluate_asr(params, cfg, tok, n_utterances=24,
                                    seed=321, corpus=clean, max_seconds=3.84)
    assert wer_clean <= 0.05, (wer_clean, pairs[:4])

    # all four noise floors are gated (r4 gated only clean+snr10, so a
    # snr0 regression to 0.5 would have shipped green — VERDICT r4 weak-5)
    for snr, floor in (((10.0, 10.0), 0.15), ((5.0, 5.0), 0.05),
                       ((0.0, 0.0), 0.15)):
        noisy = dict(HARD_CORPUS)
        noisy["snr_db_range"] = snr
        noisy["clean_prob"] = 0.0
        wer, pairs = evaluate_asr(params, cfg, tok, n_utterances=24,
                                  seed=321, corpus=noisy, max_seconds=3.84)
        assert wer <= floor, (snr, wer, pairs[:4])


def test_hard_roundtrip_wer_floor():
    """Hard packet→speech→text round trip (VERDICT r4 task 1): the decode
    half of the codec must speak the 256-word corpus, not just the toy
    16-utterance tone language. Reference bar: the synthesizer renders
    arbitrary text (backend/services/synthesizer.py:106-207)."""
    from janus_tpu.eval.roundtrip import evaluate_hard_roundtrip

    if not zoo.hard_available():
        pytest.skip("hard checkpoints not present")
    out = evaluate_hard_roundtrip(n_utterances=12, seed=555)
    assert out["hard_roundtrip_wer"] <= 0.10, out
