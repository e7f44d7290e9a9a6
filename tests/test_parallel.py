"""Mesh parallelism on the virtual 8-device CPU platform: TP sharding
rules, ring attention & Ulysses exactness, sharded train steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from janus_tpu.common.config import ASRConfig, MeshConfig, TTSConfig
from janus_tpu.models import asr as asr_mod
from janus_tpu.models import tts as tts_mod
from janus_tpu.models.params import flatten_with_paths
from janus_tpu.ops.attention import attend
from janus_tpu.parallel.mesh import best_mesh_shape, build_mesh
from janus_tpu.parallel.ring_attention import ring_attention
from janus_tpu.parallel.sharding import (
    ASR_PARTITION_RULES,
    TTS_PARTITION_RULES,
    partition_spec_for,
    shard_params,
)
from janus_tpu.parallel.ulysses import ulysses_attention
from janus_tpu.train.losses import asr_loss, tts_loss
from janus_tpu.train.trainer import Trainer


def small_asr_cfg():
    return ASRConfig(
        n_mels=16, d_model=64, encoder_layers=2, decoder_layers=2, num_heads=8,
        vocab_size=261, max_source_positions=64, max_target_positions=32,
    )


def test_mesh_shapes():
    assert best_mesh_shape(8, model=2, seq=2) == (2, 2, 2)
    assert best_mesh_shape(8) == (8, 1, 1)
    with pytest.raises(ValueError):
        best_mesh_shape(8, model=3)
    mesh = build_mesh(MeshConfig(data=2, model=2, seq=2))
    assert mesh.shape == {"data": 2, "model": 2, "seq": 2}


def test_partition_rules_hit_expected_paths():
    assert partition_spec_for(
        "encoder/blocks/0/attn/q/w", ASR_PARTITION_RULES
    ) == P(None, "model")
    assert partition_spec_for(
        "decoder/blocks/3/cross/out/w", ASR_PARTITION_RULES
    ) == P("model", None)
    assert partition_spec_for(
        "encoder/blocks/0/mlp/fc1/b", ASR_PARTITION_RULES
    ) == P("model")
    assert partition_spec_for("decoder/token_emb", ASR_PARTITION_RULES) == P()


def test_sharded_asr_forward_matches_single_device():
    """TP-sharded forward must be numerically identical (up to fp tolerance)
    to the unsharded one."""
    cfg = small_asr_cfg()
    params = asr_mod.init_asr(0, cfg)
    mesh = build_mesh(MeshConfig(data=2, model=4, seq=1))
    sharded = shard_params(params, mesh, ASR_PARTITION_RULES)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 128, 16)).astype(np.float32))

    ref = np.asarray(asr_mod.encode_audio(params, cfg, mel))
    out = np.asarray(asr_mod.encode_audio(sharded, cfg, mel))
    np.testing.assert_allclose(out, ref, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_exact(causal):
    mesh = build_mesh(MeshConfig(data=1, model=1, seq=8))
    rng = np.random.default_rng(1)
    b, h, t, d = 2, 4, 64, 16
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))

    mask = None
    if causal:
        qi = jnp.arange(t)[:, None]
        kj = jnp.arange(t)[None, :]
        mask = kj <= qi
    ref = np.asarray(attend(q, k, v, mask))
    out = np.asarray(ring_attention(q, k, v, mesh, causal=causal))
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_attention_exact(causal):
    mesh = build_mesh(MeshConfig(data=1, model=1, seq=8))
    rng = np.random.default_rng(2)
    b, h, t, d = 2, 8, 64, 16
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))

    mask = None
    if causal:
        qi = jnp.arange(t)[:, None]
        kj = jnp.arange(t)[None, :]
        mask = kj <= qi
    ref = np.asarray(attend(q, k, v, mask))
    out = np.asarray(ulysses_attention(q, k, v, mesh, causal=causal))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_ulysses_head_divisibility():
    mesh = build_mesh(MeshConfig(data=1, model=1, seq=8))
    q = jnp.zeros((1, 6, 64, 8))
    with pytest.raises(ValueError):
        ulysses_attention(q, q, q, mesh)


def test_asr_train_step_dp_tp():
    cfg = small_asr_cfg()
    params = asr_mod.init_asr(0, cfg)
    mesh = build_mesh(MeshConfig(data=2, model=4, seq=1))

    def loss_fn(p, mel, tokens, mask):
        return asr_loss(p, cfg, mel, tokens, mask)

    trainer = Trainer(loss_fn, mesh, ASR_PARTITION_RULES, learning_rate=1e-3)
    state = trainer.create_state(params)

    rng = np.random.default_rng(3)
    mel = rng.standard_normal((4, 128, 16)).astype(np.float32)
    tokens = rng.integers(0, 260, size=(4, 12)).astype(np.int32)
    mask = np.ones((4, 12), dtype=np.float32)

    state, m1 = trainer.train_step(state, mel, tokens, mask)
    state, m2 = trainer.train_step(state, mel, tokens, mask)
    assert int(state.step) == 2
    assert np.isfinite(m1["loss"]) and np.isfinite(m2["loss"])
    assert m2["loss"] < m1["loss"]  # same batch twice -> loss must drop

    # params keep their TP sharding through the step
    flat = dict(flatten_with_paths(state.params))
    leaf = flat["encoder/blocks/0/mlp/fc1/w"]
    assert leaf.sharding.spec == P(None, "model")


def test_tts_train_step():
    cfg = TTSConfig(d_model=64, layers=2, num_heads=4, n_mels=16,
                    max_text_tokens=16, max_mel_frames=16)
    params = tts_mod.init_tts(0, cfg, text_vocab=261)
    mesh = build_mesh(MeshConfig(data=2, model=4, seq=1))

    def loss_fn(p, text, emo, mels, mask):
        return tts_loss(p, cfg, text, emo, mels, mask, text_vocab=261)

    trainer = Trainer(loss_fn, mesh, TTS_PARTITION_RULES, learning_rate=1e-3)
    state = trainer.create_state(params)

    rng = np.random.default_rng(4)
    text = rng.integers(0, 255, size=(4, 8)).astype(np.int32)
    emo = rng.integers(0, 8, size=(4,)).astype(np.int32)
    mels = rng.standard_normal((4, 6, cfg.reduction * cfg.n_mels)).astype(np.float32)
    mask = np.ones((4, 6), dtype=np.float32)

    state, m1 = trainer.train_step(state, text, emo, mels, mask)
    for _ in range(3):
        state, m2 = trainer.train_step(state, text, emo, mels, mask)
    assert m2["loss"] < m1["loss"]


def test_sharded_serving_synthesis_matches_unsharded():
    """The decode stack sharded IN SERVING (Synthesizer(mesh=tp)) must
    produce the same audio as the unsharded synthesizer — the tp layout
    the encode path already had (VERDICT r4 task 4)."""
    from janus_tpu.common.config import JanusConfig
    from janus_tpu.common.protocol import JanusPacket
    from janus_tpu.models import vocoder as voc_mod
    from janus_tpu.runtime.synthesizer import Synthesizer

    cfg = JanusConfig().override(**{
        "tts.d_model": 64, "tts.layers": 2, "tts.num_heads": 4,
        "tts.n_mels": 16, "tts.max_text_tokens": 16, "tts.max_mel_frames": 16,
        "vocoder.n_fft": 64, "vocoder.hop_length": 16, "vocoder.d_model": 32,
        "vocoder.layers": 2, "vocoder.sample_rate": 16_000,
    })
    tts_params = tts_mod.init_tts(0, cfg.tts, text_vocab=261)
    # pin the stop head hard negative: random-weight stop logits sit near
    # the 0.5 threshold, where a low-order cross-device fp difference
    # could fork the generation length (we are testing numerics, not the
    # stop policy)
    tts_params["stop_head"]["b"] = jnp.full_like(
        tts_params["stop_head"]["b"], -5.0)
    voc_params = voc_mod.init_vocoder(1, cfg.vocoder, n_mels=cfg.tts.n_mels)

    mesh = build_mesh(MeshConfig(data=1, model=2, seq=1))
    ref = Synthesizer(cfg, tts_params=tts_params, vocoder_params=voc_params)
    tp = Synthesizer(cfg, tts_params=tts_params, vocoder_params=voc_params,
                     mesh=mesh)
    flat = dict(flatten_with_paths(tp.tts_params))
    assert flat["blocks/0/mlp/fc1/w"].sharding.spec == P(None, "model")

    pkt = JanusPacket(text="hello there", prosody={"energy": "Loud",
                                                   "pitch": "High"},
                      timestamp=0.0)
    a = np.frombuffer(ref.synthesize(pkt), dtype=np.int16)
    b = np.frombuffer(tp.synthesize(pkt), dtype=np.int16)
    assert a.shape == b.shape and len(a) > 0
    np.testing.assert_allclose(a, b, atol=1)  # ≤1 int16 LSB of fp noise


def test_sequence_parallel_encoder_matches_dense():
    """encode_audio with a seq mesh (ring attention + GSPMD conv halos)
    must match the single-device encoder."""
    cfg = small_asr_cfg()
    params = asr_mod.init_asr(0, cfg)
    mesh = build_mesh(MeshConfig(data=1, model=1, seq=8))

    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.standard_normal((2, 128, 16)).astype(np.float32))
    ref = np.asarray(asr_mod.encode_audio(params, cfg, mel))
    out = np.asarray(
        jax.jit(lambda m: asr_mod.encode_audio(params, cfg, m, sp_mesh=mesh))(mel)
    )
    np.testing.assert_allclose(out, ref, atol=3e-4)
