"""Segmentation state machine semantics (reference:
backend/services/engine.py:439-509) and VAD gate behavior."""

import numpy as np
import pytest

from janus_tpu.common.config import SegmenterConfig, VADConfig
from janus_tpu.models.vad import VoiceActivityDetector
from janus_tpu.runtime.segmenter import PhraseSegmenter, SegmenterEvent

CHUNK = 1536


def chunk(value=0.1):
    return np.full(CHUNK, value, dtype=np.float32)


def test_streaming_basic_trigger():
    seg = PhraseSegmenter()
    # 3 pre-roll silence chunks
    for _ in range(3):
        r = seg.push_streaming(chunk(0.0), is_speech=False)
        assert r.event is SegmenterEvent.NONE
    # speech onset pulls pre-roll in
    r = seg.push_streaming(chunk(0.5), is_speech=True)
    assert r.event is SegmenterEvent.PHRASE_START
    for _ in range(5):
        seg.push_streaming(chunk(0.5), is_speech=True)
    # 15 silence chunks: still buffering (threshold is strictly greater)
    for i in range(15):
        r = seg.push_streaming(chunk(0.0), is_speech=False)
        assert r.event is SegmenterEvent.NONE, i
    # 16th silent chunk triggers
    r = seg.push_streaming(chunk(0.0), is_speech=False)
    assert r.event is SegmenterEvent.PHRASE_READY
    # 3 pre-roll + 6 speech + 16 trailing silence chunks
    assert r.phrase.shape[0] == (3 + 6 + 16) * CHUNK
    assert not seg.is_open


def test_streaming_short_phrase_dropped():
    seg = PhraseSegmenter()
    seg.push_streaming(chunk(0.5), is_speech=True)  # 1 chunk < 6 chunks min
    r = None
    for _ in range(16):
        r = seg.push_streaming(chunk(0.0), is_speech=False)
    # 1 speech + 16 silence = 17 chunks > 9216 samples -> actually READY.
    # Silence chunks count toward length (reference appends them), so this
    # phrase is long enough.
    assert r.event is SegmenterEvent.PHRASE_READY

    # A genuinely short phrase: PTT pressed for 2 chunks
    seg2 = PhraseSegmenter()
    seg2.push_ptt(chunk(0.5), held=True)
    seg2.push_ptt(chunk(0.5), held=True)
    r2 = seg2.push_ptt(chunk(0.0), held=False)
    assert r2.event is SegmenterEvent.PHRASE_DROPPED


def test_silence_resets_on_speech():
    seg = PhraseSegmenter()
    seg.push_streaming(chunk(0.5), is_speech=True)
    for _ in range(10):
        seg.push_streaming(chunk(0.0), is_speech=False)
    seg.push_streaming(chunk(0.5), is_speech=True)  # resets counter
    for i in range(15):
        r = seg.push_streaming(chunk(0.0), is_speech=False)
        assert r.event is SegmenterEvent.NONE
    r = seg.push_streaming(chunk(0.0), is_speech=False)
    assert r.event is SegmenterEvent.PHRASE_READY


def test_pre_roll_capped_at_10():
    seg = PhraseSegmenter()
    for i in range(25):
        seg.push_streaming(chunk(float(i)), is_speech=False)
    r = seg.push_streaming(chunk(99.0), is_speech=True)
    assert r.event is SegmenterEvent.PHRASE_START
    for _ in range(16):
        r = seg.push_streaming(chunk(0.0), is_speech=False)
    # 10 pre-roll + 1 speech + 16 silence
    assert r.phrase.shape[0] == 27 * CHUNK
    # pre-roll content is the LAST 10 silent chunks (values 15..24)
    assert r.phrase[0] == 15.0


def test_ptt_hold_and_release():
    seg = PhraseSegmenter()
    for _ in range(8):
        r = seg.push_ptt(chunk(0.3), held=True)
    r = seg.push_ptt(chunk(0.0), held=False)
    assert r.event is SegmenterEvent.PHRASE_READY
    assert r.phrase.shape[0] == 8 * CHUNK  # release chunk NOT buffered


def test_flush():
    seg = PhraseSegmenter()
    for _ in range(7):
        seg.push_streaming(chunk(0.5), is_speech=True)
    r = seg.flush()
    assert r.event is SegmenterEvent.PHRASE_READY
    assert seg.flush().event is SegmenterEvent.NONE


# -- VAD -------------------------------------------------------------------


def test_energy_vad_gates_speech_vs_silence():
    vad = VoiceActivityDetector(VADConfig(backend="energy"))
    sr = 48000
    t = np.arange(CHUNK) / sr
    speech = (0.2 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    noise = (0.001 * np.random.default_rng(0).standard_normal(CHUNK)).astype(np.float32)
    # prime the noise floor with background
    for _ in range(5):
        vad.is_speech(noise)
    assert vad.is_speech(speech) is True
    assert vad.is_speech(noise) is False


def test_energy_vad_adapts_to_loud_background():
    vad = VoiceActivityDetector(VADConfig(backend="energy"))
    rng = np.random.default_rng(1)
    loud_noise = (0.05 * rng.standard_normal((60, CHUNK))).astype(np.float32)
    results = [vad.is_speech(c) for c in loud_noise]
    # after adaptation, steady noise is classified silence
    assert not any(results[-10:])


def test_model_vad_runs_and_thresholds():
    import jax

    from janus_tpu.models.vad import init_vad, vad_model_prob

    params = init_vad(0)
    chunk16 = np.zeros((4, 512), dtype=np.float32)
    probs = np.asarray(vad_model_prob(params, chunk16))
    assert probs.shape == (4,)
    assert np.all((probs >= 0) & (probs <= 1))

    vad = VoiceActivityDetector(VADConfig(backend="model"), params=params)
    assert isinstance(vad.is_speech(np.zeros(CHUNK, np.float32)), bool)


def test_vad_reset():
    vad = VoiceActivityDetector(VADConfig(backend="energy"))
    for _ in range(10):
        vad.is_speech(np.full(CHUNK, 0.2, np.float32))
    vad.reset()
    assert float(vad._floor) == pytest.approx(1e-3)
