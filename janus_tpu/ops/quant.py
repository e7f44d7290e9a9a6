"""Int8 quantization (AQT-style) for inference.

The reference ran its recognizer int8 through CTranslate2 (reference:
backend/services/transcriber.py:26 — ``compute_type='int8'``). Here the
same capability is native:

- :class:`QuantizedWeight` — per-output-channel symmetric int8 weights +
  fp32 scales, a registered pytree so quantized trees flow through jit /
  sharding like any other params;
- weight-only mode (``dequant`` inside the matmul): halves HBM traffic for
  bandwidth-bound decode steps, MXU math stays bf16;
- dynamic full-int8 mode: activations quantized per-row at runtime,
  int8×int8→int32 on the MXU, rescaled to fp32 — for the compute-bound
  encoder at large model sizes.

``janus_tpu.ops.layers.linear`` consumes :class:`QuantizedWeight`
transparently, so ``quantize_tree`` is the only call a model needs.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from janus_tpu.models.params import map_with_paths

__all__ = [
    "QuantizedWeight",
    "DynQuantizedWeight",
    "QuantKV",
    "QuantKVT",
    "quantize_weight",
    "quantize_kv",
    "quantize_kv_t",
    "dequant",
    "dequant_kv",
    "linear_int8_dynamic",
    "quantize_tree",
]


class QuantizedWeight(NamedTuple):
    """``q[d_in, d_out] int8`` with per-output-channel ``scale[d_out]``.

    Weight-only mode: consumed by :func:`janus_tpu.ops.layers.linear` via
    on-the-fly dequantization (halves weight HBM traffic vs bf16; MXU math
    stays bf16)."""

    q: jax.Array
    scale: jax.Array


class DynQuantizedWeight(NamedTuple):
    """Same storage as :class:`QuantizedWeight`, but tagged for the full
    int8 path: activations are quantized per-row at runtime and the matmul
    runs int8 x int8 -> int32 on the MXU (2x the bf16 MXU throughput on
    v5e) before the fp32 rescale. The type IS the dispatch tag — linear()
    routes on it, so one ``quantize_tree(mode=...)`` call flips a whole
    model between the two regimes."""

    q: jax.Array
    scale: jax.Array


class QuantKV(NamedTuple):
    """int8 attention K or V tensor ``q[..., T, Dh]`` with per-position
    fp32 scales ``scale[..., T, 1]``.

    The decode-loop HBM diet (VERDICT r3 task 2): at flagship scale the
    token loop re-reads every layer's cross-attention K/V each step
    (32 L x B x H x T_enc x Dh, the dominant per-step stream after the
    weights), so storing them int8 halves that traffic. Per-position
    scales cost T floats and keep the quantization error of each key/value
    vector independent (~0.4% rms). Dequantization happens at the
    attention matmul (:func:`dequant_kv`), where XLA fuses the
    convert+scale into the operand read — the bf16 copy is never
    materialized in HBM. Reference analog: CTranslate2's int8 decode
    (reference backend/services/transcriber.py:26)."""

    q: jax.Array
    scale: jax.Array


class QuantKVT(NamedTuple):
    """int8 attention K or V stored head-dim-major: ``q[..., Dh, T]`` with
    per-position scales ``scale[..., T]``.

    The layout the fused Pallas decode kernel consumes
    (:func:`janus_tpu.ops.cross_attn.cross_attention_kv`): int8 VMEM tiles
    are (32, 128)-granular, so the long encoder-time axis must ride the
    lane dimension — Dh (64) would waste half of every int8 tile. Built
    ONCE at decode-state init (outside the token while_loop); both score
    and output matmuls contract against it without any in-loop
    transpose."""

    q: jax.Array
    scale: jax.Array


def quantize_kv(x: jax.Array) -> QuantKV:
    """Symmetric per-position int8 quantization over the head dim."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return QuantKV(q=q, scale=scale)


def quantize_kv_t(x: jax.Array) -> QuantKVT:
    """Per-position int8 quantization of ``[..., T, Dh]`` into the
    transposed (kernel) layout ``q[..., Dh, T]``, ``scale[..., T]``."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)            # [..., T]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127)
    return QuantKVT(q=jnp.swapaxes(q, -1, -2).astype(jnp.int8), scale=scale)


def dequant_kv(x, dtype=jnp.bfloat16) -> jax.Array:
    """QuantKV/QuantKVT -> dense ``[..., T, Dh]`` in ``dtype``; passes
    plain arrays through unchanged (so attention code is layout-agnostic)."""
    if isinstance(x, QuantKV):
        return (x.q.astype(jnp.float32) * x.scale).astype(dtype)
    if isinstance(x, QuantKVT):
        dense = x.q.astype(jnp.float32) * x.scale[..., None, :]
        return jnp.swapaxes(dense, -1, -2).astype(dtype)
    return x


def quantize_weight(w: jax.Array) -> QuantizedWeight:
    """Symmetric per-output-channel int8 quantization of ``[d_in, d_out]``."""
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QuantizedWeight(q=q, scale=scale.astype(jnp.float32))


def dequant(qw: QuantizedWeight, dtype=jnp.float32) -> jax.Array:
    return (qw.q.astype(jnp.float32) * qw.scale).astype(dtype)


def linear_int8_dynamic(x: jax.Array, qw, b: jax.Array | None = None) -> jax.Array:
    """Full int8 path: per-row dynamic activation quantization,
    int8 × int8 → int32 accumulate, fp32 rescale. ``qw`` is any
    ``(q, scale)`` pair (:class:`QuantizedWeight` or
    :class:`DynQuantizedWeight`)."""
    xf = x.astype(jnp.float32)
    x_amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(x_amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, qw.q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * x_scale * qw.scale
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_tree(params: Any, min_size: int = 4096,
                  mode: str = "weight") -> Any:
    """Replace every 2-D float weight leaf named ``.../w`` with a
    quantized pair (embeddings, norms, biases, convs untouched).

    ``mode='weight'`` (default): :class:`QuantizedWeight` — int8 storage,
    bf16 MXU math. ``mode='dynamic'``: :class:`DynQuantizedWeight` —
    int8 x int8 MXU math with per-row dynamic activation scales (the
    AQT-style inference path; reference analog CTranslate2
    ``compute_type='int8'``, reference backend/services/transcriber.py:26).
    """
    if mode not in ("weight", "dynamic"):
        raise ValueError(f"unknown quantization mode: {mode!r}")
    cls = QuantizedWeight if mode == "weight" else DynQuantizedWeight

    def maybe_quant(path: str, leaf):
        if (
            path.endswith("/w")
            and getattr(leaf, "ndim", 0) == 2
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            and leaf.size >= min_size
        ):
            return cls(*quantize_weight(leaf))
        return leaf

    return map_with_paths(maybe_quant, params)
