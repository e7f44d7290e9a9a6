"""Decode side: TTS generation, vocoder, synthesizer routing/fallbacks,
morse bit-parity (reference: backend/services/synthesizer.py,
backend/tests/test_synthesis.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from janus_tpu.common.config import JanusConfig
from janus_tpu.common.protocol import JanusMode, JanusPacket
from janus_tpu.models import tts as tts_mod
from janus_tpu.models import vocoder as voc_mod
from janus_tpu.models.speaker import init_speaker_encoder, speaker_embed
from janus_tpu.ops.morse import MORSE_TABLE, morse_audio, text_to_morse
from janus_tpu.runtime.synthesizer import Synthesizer


def small_cfg():
    return JanusConfig().override(**{
        "tts.d_model": 64,
        "tts.layers": 2,
        "tts.num_heads": 4,
        "tts.n_mels": 16,
        "tts.max_text_tokens": 32,
        "tts.max_mel_frames": 32,
        "vocoder.d_model": 64,
        "vocoder.layers": 2,
        "vocoder.n_fft": 256,
        "vocoder.hop_length": 64,
    })


# -- morse (bit-parity with the reference generator) ------------------------


def reference_morse(text):
    """Literal transcription of the reference's generator
    (backend/services/synthesizer.py:257-326) used as golden oracle."""
    SR, FREQ = 48000, 800
    segs = []
    tu = text.upper()
    for ch in tu:
        if ch not in MORSE_TABLE:
            continue
        pat = MORSE_TABLE[ch]
        if pat == " ":
            segs.append(np.zeros(int(0.7 * SR), np.int16))
            continue
        for i, sym in enumerate(pat):
            dur = 0.1 if sym == "." else 0.3 if sym == "-" else None
            if dur is None:
                continue
            n = int(dur * SR)
            t = np.linspace(0, dur, n, False)
            segs.append((np.sin(2 * np.pi * FREQ * t) * 32767 * 0.5).astype(np.int16))
            if i < len(pat) - 1:
                segs.append(np.zeros(int(0.1 * SR), np.int16))
        if ch != tu[-1]:
            segs.append(np.zeros(int(0.3 * SR), np.int16))
    return np.concatenate(segs).tobytes() if segs else b""


@pytest.mark.parametrize("text", ["SOS", "hello world", "A1 B2", "", "!!!"])
def test_morse_bit_parity(text):
    assert morse_audio(text) == reference_morse(text)


def test_morse_sos_length():
    # S = 3 dots + 2 gaps = 0.5 s; O = 3 dashes + 2 gaps = 1.1 s; S = 0.5 s.
    # Reference quirk (kept for parity): the letter gap is skipped whenever
    # the character VALUE equals the final character, so "SOS" gets no gap
    # after the first S — only after O. Total 0.5 + 1.1 + 0.3 + 0.5 = 2.4 s.
    audio = np.frombuffer(morse_audio("SOS"), dtype=np.int16)
    assert len(audio) == int(2.4 * 48000)


def test_text_to_morse():
    assert text_to_morse("SOS") == "... --- ..."
    assert text_to_morse("AB CD") == ".- -... / -.-. -.."


# -- TTS model --------------------------------------------------------------


def test_tts_forward_shapes():
    cfg = small_cfg().tts
    params = tts_mod.init_tts(0, cfg, text_vocab=261)
    text = jnp.zeros((2, 8), dtype=jnp.int32)
    emo = jnp.asarray([1, 2], dtype=jnp.int32)
    mel_groups = jnp.zeros((2, 5, cfg.reduction * cfg.n_mels))
    mel_pred, stop = tts_mod.tts_forward(params, cfg, text, emo, mel_groups)
    assert mel_pred.shape == (2, 5, cfg.reduction * cfg.n_mels)
    assert stop.shape == (2, 5)


def test_tts_generate_static_shapes_and_determinism():
    cfg = small_cfg().tts
    params = tts_mod.init_tts(0, cfg, text_vocab=261)
    text = jnp.asarray([[72, 105, 0, 0]], dtype=jnp.int32)
    emo = jnp.asarray([3], dtype=jnp.int32)
    f = jax.jit(lambda t, e: tts_mod.tts_generate(params, cfg, t, e, text_vocab=261))
    mel1, n1 = f(text, emo)
    mel2, n2 = f(text, emo)
    assert mel1.shape == (1, cfg.max_mel_frames, cfg.n_mels)
    np.testing.assert_array_equal(np.asarray(mel1), np.asarray(mel2))
    assert int(n1[0]) == int(n2[0])
    assert int(n1[0]) % cfg.reduction == 0


def test_tts_teacher_forcing_matches_generation_first_step():
    """The first generated group must equal the teacher-forced prediction
    at position 0 (same prompt, no mel context yet). Generation stores its
    KV caches in the compute dtype (bf16 — r5b: the f32 default doubled
    every flagship cache byte) while the training forward keeps f32
    scratch, so the comparison carries bf16-level drift."""
    cfg = small_cfg().tts
    params = tts_mod.init_tts(0, cfg, text_vocab=261)
    text = jnp.asarray([[65, 66, 67]], dtype=jnp.int32)
    emo = jnp.asarray([0], dtype=jnp.int32)
    tf_mel, _ = tts_mod.tts_forward(
        params, cfg, text, emo, jnp.zeros((1, 3, cfg.reduction * cfg.n_mels))
    )
    gen_mel, _ = tts_mod.tts_generate(params, cfg, text, emo, max_groups=4,
                                      text_vocab=261)
    first_group = np.asarray(gen_mel)[0, : cfg.reduction, :].reshape(-1)
    np.testing.assert_allclose(
        first_group, np.asarray(tf_mel)[0, 0], atol=4e-3
    )


def test_emotion_ids():
    assert tts_mod.emotion_id("excited") == 1
    assert tts_mod.emotion_id("EXCITED") == 1
    assert tts_mod.emotion_id("unknown-tag") == 0


# -- vocoder ----------------------------------------------------------------


def test_vocoder_shapes_and_finite():
    cfg = small_cfg().vocoder
    params = voc_mod.init_vocoder(0, cfg, n_mels=16)
    mel = jnp.zeros((2, 20, 16))
    wav = voc_mod.vocoder_waveform(params, cfg, mel)
    assert wav.shape == (2, 20 * cfg.hop_length)
    assert np.all(np.isfinite(np.asarray(wav)))


def test_speaker_embed_normalized():
    params = init_speaker_encoder(0, n_mels=80, d_out=64)
    audio = jnp.asarray(np.random.default_rng(0).standard_normal(16000).astype(np.float32))
    v = speaker_embed(params, audio)
    assert v.shape == (64,)
    assert abs(float(jnp.linalg.norm(v)) - 1.0) < 1e-4


# -- synthesizer service ----------------------------------------------------


@pytest.fixture(scope="module")
def synth():
    return Synthesizer(small_cfg())


def test_synthesize_routes_morse(synth):
    pkt = JanusPacket(text="SOS", mode=JanusMode.MORSE_CODE)
    assert synth.synthesize(pkt) == reference_morse("SOS")


def test_synthesize_semantic_produces_pcm(synth):
    pkt = JanusPacket(
        text="hello", mode=JanusMode.SEMANTIC_VOICE,
        prosody={"energy": "Loud", "pitch": "High"},
    )
    audio = synth.synthesize(pkt)
    assert isinstance(audio, bytes)
    assert len(audio) > 0
    assert len(audio) % 2 == 0  # int16


def test_synthesize_text_only(synth):
    pkt = JanusPacket(text="hi there", mode=JanusMode.TEXT_ONLY)
    audio = synth.synthesize(pkt)
    assert isinstance(audio, bytes) and len(audio) > 0


def test_synthesize_unknown_mode_raises(synth):
    pkt = JanusPacket(text="x")
    pkt.mode = 99  # force invalid
    with pytest.raises(ValueError):
        synth.synthesize(pkt)


def test_semantic_failure_falls_back(synth, monkeypatch):
    calls = []

    def boom(*a, **k):
        calls.append("semantic")
        raise RuntimeError("tts down")

    monkeypatch.setattr(synth, "_run_tts", boom)
    pkt = JanusPacket(text="x", mode=JanusMode.SEMANTIC_VOICE)
    out = synth.synthesize(pkt)
    # semantic tried, fast fallback also fails -> b'' (reference ladder)
    assert out == b""
    assert len(calls) == 2


def test_voice_clone_hot_reload(tmp_path):
    from janus_tpu.audio.wav import write_wav
    from janus_tpu.audio.synthetic import voiced_phrase

    ref = tmp_path / "ref.wav"
    syn = Synthesizer(small_cfg(), reference_audio_path=str(ref))
    assert syn._speaker_vec is None  # not present yet

    write_wav(str(ref), voiced_phrase(seconds=0.5), 48000)
    syn._check_and_reload_reference_audio()
    assert syn._speaker_vec is not None
    first = np.asarray(syn._speaker_vec).copy()

    # overwrite with different audio -> mtime changes -> new embedding
    import os, time as _t

    write_wav(str(ref), voiced_phrase(f0=320.0, seconds=0.5), 48000)
    os.utime(ref, (os.path.getmtime(ref) + 5, os.path.getmtime(ref) + 5))
    syn._check_and_reload_reference_audio()
    second = np.asarray(syn._speaker_vec)
    assert not np.allclose(first, second)


def test_tts_scan_layers_matches_unrolled():
    """scan_layers TTS (stacked caches, lax.scan block body) must generate
    the same mel frames as the unrolled decoder."""
    import dataclasses

    import jax.numpy as jnp

    from janus_tpu.common.config import TTSConfig
    from janus_tpu.models import tts as tts_mod

    cfg = TTSConfig(d_model=64, layers=3, num_heads=4, n_mels=8,
                    reduction=2, max_text_tokens=8, max_mel_frames=16)
    params = tts_mod.init_tts(0, cfg, text_vocab=261)
    text = jnp.asarray([[5, 6, 7, 0, 0, 0, 0, 0]], dtype=jnp.int32)
    emo = jnp.zeros((1,), dtype=jnp.int32)

    mel_u, n_u = tts_mod.tts_generate(params, cfg, text, emo, max_groups=8,
                                      stop_threshold=2.0)
    scfg = dataclasses.replace(cfg, scan_layers=True)
    mel_s, n_s = tts_mod.tts_generate(params, scfg, text, emo, max_groups=8,
                                      stop_threshold=2.0)
    np.testing.assert_array_equal(np.asarray(n_s), np.asarray(n_u))
    np.testing.assert_allclose(np.asarray(mel_s), np.asarray(mel_u), atol=2e-5)

    # teacher-forced training pass parity too
    groups = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 5, 16)).astype(np.float32))
    mu, su = tts_mod.tts_forward(params, cfg, text, emo, groups)
    ms, ss = tts_mod.tts_forward(params, scfg, text, emo, groups)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(mu), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(su), atol=2e-5)
