"""Fused encode path (BASELINE config 2): phrase audio -> JanusPacket with
text + categorical prosody, all compute in one jitted program."""

import numpy as np
import pytest

from janus_tpu.common.config import ASRConfig, JanusConfig
from janus_tpu.common.protocol import JanusMode, JanusPacket
from janus_tpu.runtime.codec import DEFAULT_BUCKETS, SemanticEncoder, duration_bucket
from janus_tpu.runtime.emotion import (
    api_emotion_to_protocol,
    api_mode_to_protocol,
    protocol_mode_to_api,
    tts_emotion_tag,
    ui_emotion_tag,
)


@pytest.fixture(scope="module")
def encoder():
    cfg = JanusConfig().override(**{
        "asr.d_model": 64,
        "asr.encoder_layers": 1,
        "asr.decoder_layers": 1,
        "asr.num_heads": 4,
        "asr.n_mels": 16,
        "asr.vocab_size": 261,
        "asr.max_source_positions": 512,
        "asr.max_target_positions": 64,
        "asr.max_decode_tokens": 6,
    })
    return SemanticEncoder(cfg, buckets=(48_000 * 2,))


def voiced_phrase(f0=180.0, amp=0.08, seconds=1.2, sr=48000):
    t = np.arange(int(sr * seconds)) / sr
    return (
        amp * np.sin(2 * np.pi * f0 * t) + amp / 2 * np.sin(2 * np.pi * 2 * f0 * t)
    ).astype(np.float32)


def test_duration_bucket():
    assert duration_bucket(1) == DEFAULT_BUCKETS[0]
    assert duration_bucket(48_000 * 2) == 48_000 * 2
    assert duration_bucket(48_000 * 3) == 48_000 * 4
    assert duration_bucket(10**9) == DEFAULT_BUCKETS[-1]


def test_encode_batch_prosody(encoder):
    quiet_deep = voiced_phrase(f0=100.0, amp=0.03)
    loud_high = voiced_phrase(f0=300.0, amp=0.3)
    out = encoder.encode_batch([quiet_deep, loud_high])
    assert out[0]["prosody"] == {"energy": "Quiet", "pitch": "Deep"}
    assert out[1]["prosody"] == {"energy": "Loud", "pitch": "High"}
    assert abs(out[0]["f0"] - 100.0) < 6.0
    assert abs(out[1]["f0"] - 300.0) < 15.0


def test_encode_batch_ragged_lengths_consistent(encoder):
    """A phrase's result must not depend on its neighbors in the batch."""
    a = voiced_phrase(f0=150.0, amp=0.1, seconds=0.8)
    b = voiced_phrase(f0=250.0, amp=0.2, seconds=1.5)
    solo = encoder.encode_batch([a])[0]
    joint = encoder.encode_batch([a, b])[0]
    assert solo["prosody"] == joint["prosody"]
    assert solo["text"] == joint["text"]
    assert abs(solo["f0"] - joint["f0"]) < 1e-3


def test_encode_packet_roundtrip(encoder, monkeypatch):
    """Both encode_packet branches, deterministically (no untrained-model
    skip): a non-empty transcript round-trips through the wire; an empty
    transcript produces no packet (reference: engine.py:536-552)."""
    phrase = voiced_phrase()
    real = encoder.encode_batch([phrase])[0]  # real prosody, maybe-empty text

    monkeypatch.setattr(
        encoder, "encode_batch",
        lambda phrases: [{**real, "text": "status report follows"}],
    )
    pkt = encoder.encode_packet(phrase, mode=JanusMode.SEMANTIC_VOICE)
    assert pkt is not None
    back = JanusPacket.deserialize(pkt.serialize())
    assert back.text == "status report follows"
    assert back.prosody == pkt.prosody == real["prosody"]
    assert back.mode == JanusMode.SEMANTIC_VOICE

    monkeypatch.setattr(
        encoder, "encode_batch", lambda phrases: [{**real, "text": "  "}]
    )
    assert encoder.encode_packet(phrase) is None


def test_mode_mappings():
    assert api_mode_to_protocol("semantic") == JanusMode.SEMANTIC_VOICE
    assert api_mode_to_protocol("text_only") == JanusMode.TEXT_ONLY
    assert api_mode_to_protocol("morse") == JanusMode.MORSE_CODE
    assert api_mode_to_protocol("bogus") == JanusMode.SEMANTIC_VOICE
    for m in JanusMode:
        assert api_mode_to_protocol(protocol_mode_to_api(m)) == m


def test_emotion_mappings():
    assert api_emotion_to_protocol("auto") == "Auto"
    assert api_emotion_to_protocol("relaxed") == "relaxed"
    # 'o' must be absent from the wire for auto
    pkt = JanusPacket(text="x", override_emotion=api_emotion_to_protocol("auto"))
    assert b"\xa1o" not in pkt.serialize()

    # send-side table (reference: synthesizer.py:158-175)
    assert tts_emotion_tag("High", "Loud") == "excited"
    assert tts_emotion_tag("High", "Normal") == "joyful"
    assert tts_emotion_tag("High", "Quiet") == "whispering"
    assert tts_emotion_tag("Deep", "Loud") == "shouting"
    assert tts_emotion_tag("Deep", "Quiet") == "whispering"
    assert tts_emotion_tag("Normal", "Normal") == "relaxed"

    # receive-side table (reference: engine.py:240-251)
    assert ui_emotion_tag("High", "Loud") == "Excited"
    assert ui_emotion_tag("High", "Normal") == "Joyful"
    assert ui_emotion_tag("Low", "Loud") == "Panicked"
    assert ui_emotion_tag("Low", "Quiet") == "Serious"
    assert ui_emotion_tag("Deep", "Loud") == "Neutral"


def test_mesh_sharded_encoder_matches_single_device(encoder):
    """DP+TP-sharded serving must produce identical packets."""
    from janus_tpu.common.config import MeshConfig
    from janus_tpu.parallel.mesh import build_mesh

    mesh = build_mesh(MeshConfig(data=2, model=4, seq=1))
    sharded = SemanticEncoder(encoder.cfg, asr_params=encoder.params,
                              buckets=encoder.buckets, mesh=mesh)
    phrases = [voiced_phrase(f0=140.0 + 40 * i, amp=0.15, seconds=1.0)
               for i in range(4)]
    ref = encoder.encode_batch(phrases)
    out = sharded.encode_batch(phrases)
    for r, o in zip(ref, out):
        assert r["text"] == o["text"]
        assert r["prosody"] == o["prosody"]
        assert abs(r["f0"] - o["f0"]) < 1e-2


def test_mesh_sharded_encoder_single_phrase(encoder):
    """A batch-1 encode through a data>1 mesh must pad lanes up to the
    data-axis size instead of failing the sharding divisibility check."""
    from janus_tpu.common.config import MeshConfig
    from janus_tpu.parallel.mesh import build_mesh

    mesh = build_mesh(MeshConfig(data=4, model=1, seq=1))
    sharded = SemanticEncoder(encoder.cfg, asr_params=encoder.params,
                              buckets=encoder.buckets, mesh=mesh)
    phrase = voiced_phrase(f0=180.0, amp=0.15, seconds=1.0)
    ref = encoder.encode_batch([phrase])[0]
    out = sharded.encode_batch([phrase])[0]
    assert out["text"] == ref["text"]
    assert out["prosody"] == ref["prosody"]
    assert abs(out["f0"] - ref["f0"]) < 1e-2


def test_int16_transfer_exact_for_capture_native_audio():
    """RuntimeConfig.encode_transfer_int16 ships int16 PCM and converts
    on-device with the exact capture-side scaling (float = i/32768): for
    audio on the int16 grid (everything a real capture produces), the
    encode outputs must be IDENTICAL to the float32 wire format."""
    import numpy as np

    from janus_tpu.common.config import JanusConfig
    from janus_tpu.runtime.codec import SemanticEncoder
    from janus_tpu.audio.synthetic import voiced_phrase

    cfg = JanusConfig().override(**{
        "asr.d_model": 64, "asr.encoder_layers": 1, "asr.decoder_layers": 1,
        "asr.num_heads": 4, "asr.n_mels": 16, "asr.vocab_size": 300,
        "asr.max_source_positions": 64, "asr.max_target_positions": 16,
        "asr.max_decode_tokens": 4})
    wav = np.asarray(voiced_phrase(f0=150.0, seconds=1.0, amp=0.2, seed=3))
    native = np.round(wav * 32768.0).clip(-32768, 32767) / 32768.0
    native = native.astype(np.float32)

    enc_i16 = SemanticEncoder(cfg, buckets=(48_000,))
    enc_f32 = SemanticEncoder(
        cfg.override(**{"runtime.encode_transfer_int16": False}),
        buckets=(48_000,))
    a = enc_i16.encode_batch([native])[0]
    b = enc_f32.encode_batch([native])[0]
    assert a["prosody"] == b["prosody"]
    assert a["text"] == b["text"]
    np.testing.assert_allclose(a["f0"], b["f0"], rtol=0, atol=1e-4)
    np.testing.assert_allclose(a["rms"], b["rms"], rtol=0, atol=1e-7)


def test_ulaw_wire_roundtrip_snr():
    """mu-law encode/decode quantization SNR must exceed 30 dB on
    speech-level signals (the opt-in 8-bit wire format)."""
    import jax.numpy as jnp

    from janus_tpu.audio.ulaw import ulaw_decode, ulaw_encode
    from janus_tpu.train.synthetic_task import render_text

    w = render_text("alpha bravo charlie", 48_000, seed=3)
    rec = np.asarray(ulaw_decode(jnp.asarray(ulaw_encode(w))))
    p_sig = float(np.mean(w**2))
    p_err = float(np.mean((rec - w) ** 2)) + 1e-20
    snr = 10 * np.log10(p_sig / p_err)
    assert snr > 30.0, snr


def test_ulaw_wire_through_encoder():
    """encode_batch with the mu-law wire produces the same prosody codes
    as the exact int16 wire (tiny random ASR; text is degenerate there,
    prosody is the numeric surface)."""
    from janus_tpu.common.config import JanusConfig
    from janus_tpu.runtime.codec import SemanticEncoder
    from janus_tpu.train.synthetic_task import render_text

    cfg = JanusConfig().override(**{
        "asr.n_mels": 16, "asr.d_model": 32, "asr.encoder_layers": 1,
        "asr.decoder_layers": 1, "asr.num_heads": 2, "asr.vocab_size": 300,
        "asr.max_source_positions": 64, "asr.max_target_positions": 8,
        "asr.max_decode_tokens": 4, "asr.dtype": "float32",
    })
    w = render_text("echo lima", 48_000, seed=5)
    a = SemanticEncoder(cfg, buckets=(48_000,)).encode_batch([w])[0]
    ucfg = cfg.override(**{"runtime.encode_transfer_ulaw": True})
    b = SemanticEncoder(ucfg, buckets=(48_000,)).encode_batch([w])[0]
    assert a["prosody"] == b["prosody"]
    assert abs(a["f0"] - b["f0"]) < 2.0  # Hz; 8-bit quantization noise
    assert abs(a["rms"] - b["rms"]) < 2e-3
