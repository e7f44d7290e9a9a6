"""Int8 quantization: round-trip accuracy, transparent linear consumption,
end-to-end quantized ASR forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from janus_tpu.common.config import ASRConfig
from janus_tpu.models import asr as asr_mod
from janus_tpu.models.params import flatten_with_paths
from janus_tpu.ops.layers import linear
from janus_tpu.ops.quant import (
    QuantizedWeight,
    dequant,
    linear_int8_dynamic,
    quantize_tree,
    quantize_weight,
)


def test_quantize_roundtrip_error(rng):
    w = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32)) * 0.05
    qw = quantize_weight(w)
    assert qw.q.dtype == jnp.int8
    assert qw.scale.shape == (128,)
    err = np.abs(np.asarray(dequant(qw)) - np.asarray(w))
    # quantization step is scale = amax/127; error bounded by scale/2
    bound = np.asarray(qw.scale) * 0.5 + 1e-8
    assert np.all(err <= bound[None, :] + 1e-7)


def test_linear_accepts_quantized_weight(rng):
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.standard_normal((32,)).astype(np.float32))
    ref = np.asarray(linear(x, w, b))
    out = np.asarray(linear(x, quantize_weight(w), b))
    assert np.abs(out - ref).max() < 0.05
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.01


def test_dynamic_int8_linear(rng):
    x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32)) * 0.05
    ref = np.asarray(linear(x, w))
    out = np.asarray(linear_int8_dynamic(x, quantize_weight(w)))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02


def test_linear_dispatches_dyn_quantized_weight(rng):
    """linear() must route DynQuantizedWeight through the int8 MXU path
    (identical numerics to calling linear_int8_dynamic directly)."""
    from janus_tpu.ops.quant import DynQuantizedWeight

    x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32)) * 0.05
    b = jnp.asarray(rng.standard_normal((64,)).astype(np.float32)) * 0.1
    qw = DynQuantizedWeight(*quantize_weight(w))
    via_linear = np.asarray(linear(x, qw, b))
    direct = np.asarray(linear_int8_dynamic(x, qw, b))
    np.testing.assert_array_equal(via_linear, direct)
    rel = (np.linalg.norm(via_linear - np.asarray(linear(x, w, b)))
           / np.linalg.norm(np.asarray(linear(x, w, b))))
    assert rel < 0.02


def test_dynamic_int8_uses_int8_dot(rng):
    """The compiled dynamic path must actually carry s8 x s8 -> s32 dot
    ops (not dequantize into a float matmul)."""
    w = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32)) * 0.05
    qw = quantize_tree({"proj": {"w": w}}, min_size=1, mode="dynamic")["proj"]["w"]
    x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float32))
    hlo = jax.jit(lambda a, q: linear(a, q)).lower(x, qw).as_text()
    assert "tensor<8x128xi8>" in hlo  # quantized activations
    assert "tensor<8x64xi32>" in hlo  # int32 MXU accumulator


def test_quantize_tree_dynamic_mode():
    from janus_tpu.ops.quant import DynQuantizedWeight

    cfg = ASRConfig(n_mels=16, d_model=64, encoder_layers=1, decoder_layers=1,
                    num_heads=4, vocab_size=300, max_source_positions=32,
                    max_target_positions=16)
    params = asr_mod.init_asr(0, cfg)
    qparams = quantize_tree(params, mode="dynamic")
    assert isinstance(
        _lookup(qparams, "encoder/blocks/0/mlp/fc1/w"), DynQuantizedWeight
    )
    with pytest.raises(ValueError):
        quantize_tree(params, mode="int4")


def test_dynamic_quantized_asr_forward_close_to_fp32(rng):
    cfg = ASRConfig(n_mels=16, d_model=64, encoder_layers=2, decoder_layers=1,
                    num_heads=4, vocab_size=300, max_source_positions=32,
                    max_target_positions=16)
    params = asr_mod.init_asr(0, cfg)
    qparams = quantize_tree(params, mode="dynamic")
    rng_l = np.random.default_rng(3)
    mel = jnp.asarray(rng_l.standard_normal((1, 64, 16)).astype(np.float32))
    ref = np.asarray(asr_mod.encode_audio(params, cfg, mel))
    out = np.asarray(asr_mod.encode_audio(qparams, cfg, mel))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.08


def test_quantize_tree_selectivity():
    cfg = ASRConfig(n_mels=16, d_model=64, encoder_layers=1, decoder_layers=1,
                    num_heads=4, vocab_size=300, max_source_positions=32,
                    max_target_positions=16)
    params = asr_mod.init_asr(0, cfg)
    qparams = quantize_tree(params)
    flat = dict(flatten_with_paths(qparams))
    # matmul weights quantized... (flatten descends into the NamedTuple)
    assert any("attn/q/w" in k for k in flat)
    # embeddings / norms / convs untouched
    assert not isinstance(
        _lookup(qparams, "decoder/token_emb"), QuantizedWeight
    )
    assert not isinstance(
        _lookup(qparams, "encoder/conv1/w"), QuantizedWeight
    )
    assert isinstance(
        _lookup(qparams, "encoder/blocks/0/mlp/fc1/w"), QuantizedWeight
    )


def _lookup(tree, path):
    node = tree
    for p in path.split("/"):
        node = node[int(p)] if p.isdigit() else node[p]
    return node


def test_quantized_asr_forward_close_to_fp32(rng):
    cfg = ASRConfig(n_mels=16, d_model=64, encoder_layers=2, decoder_layers=1,
                    num_heads=4, vocab_size=300, max_source_positions=32,
                    max_target_positions=16)
    params = asr_mod.init_asr(0, cfg)
    qparams = quantize_tree(params)
    mel = jnp.asarray(rng.standard_normal((1, 64, 16)).astype(np.float32))
    ref = np.asarray(asr_mod.encode_audio(params, cfg, mel))
    out = np.asarray(asr_mod.encode_audio(qparams, cfg, mel))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.05


def test_cross_attention_kv_kernel_matches_dequant_path(rng):
    """The fused int8-operand Pallas kernel (interpret mode off-TPU) must
    match attend() over the dequantized K/V — same math, different
    dequant placement (folded into score/prob columns)."""
    import jax.numpy as jnp

    from janus_tpu.ops.attention import attend
    from janus_tpu.ops.cross_attn import cross_attention_kv
    from janus_tpu.ops.quant import dequant_kv, quantize_kv_t

    b, h, tq, t, dh = 2, 4, 3, 50, 64
    q = jnp.asarray(rng.standard_normal((b, h, tq, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, dh)).astype(np.float32))
    qk, qv = quantize_kv_t(k), quantize_kv_t(v)
    assert qk.q.shape == (b, h, dh, t) and qk.scale.shape == (b, h, t)

    ref = np.asarray(attend(q, dequant_kv(qk, jnp.float32),
                            dequant_kv(qv, jnp.float32)))
    out = np.asarray(cross_attention_kv(q, qk, qv, force=True))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)
    # and close to the unquantized attention (int8 error only)
    exact = np.asarray(attend(q, k, v))
    assert float(np.sqrt(np.mean((out - exact) ** 2))) < 0.02


def test_cross_attention_kv_dense_passthrough(rng):
    """Dense K/V route to the plain XLA path unchanged."""
    import jax.numpy as jnp

    from janus_tpu.ops.attention import attend
    from janus_tpu.ops.cross_attn import cross_attention_kv

    q = jnp.asarray(rng.standard_normal((1, 2, 1, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 2, 9, 16)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, 2, 9, 16)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(cross_attention_kv(q, k, v)),
                               np.asarray(attend(q, k, v)), atol=1e-6)


def test_greedy_decode_int8_kernel_path_matches_bf16(rng):
    """End-to-end: greedy_decode with int8 cross-KV (kernel path forced in
    interpret mode via the asr module) stays token-identical to the bf16
    cache path on a trained-free random model."""
    import jax.numpy as jnp

    from janus_tpu.common.config import ASRConfig
    from janus_tpu.models import asr as asr_mod

    cfg = ASRConfig(n_mels=16, d_model=64, encoder_layers=2, decoder_layers=2,
                    num_heads=4, vocab_size=120, max_source_positions=32,
                    max_target_positions=16, max_decode_tokens=8)
    params = asr_mod.init_asr(0, cfg)
    mel = jnp.asarray(rng.standard_normal((2, 64, 16)).astype(np.float32))
    enc = asr_mod.encode_audio(params, cfg, mel)
    prompt = jnp.full((2, 1), 100, dtype=jnp.int32)
    ref = np.asarray(asr_mod.greedy_decode(params, cfg, enc, prompt, 99,
                                           max_new=8))
    out = np.asarray(asr_mod.greedy_decode(params, cfg, enc, prompt, 99,
                                           max_new=8, cross_kv_int8=True))
    # int8 KV introduces ~0.4% rms activation error; on a random model the
    # argmax token stream still matches at these sizes
    assert out.shape == ref.shape
    assert (out == ref).mean() > 0.7, (out, ref)
