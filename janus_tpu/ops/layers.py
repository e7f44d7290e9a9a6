"""Functional NN primitives.

Thin, explicit wrappers over lax/jnp chosen for clean XLA lowering on TPU:
matmuls carry ``preferred_element_type=float32`` so the MXU accumulates in
fp32 even under bf16 params; layer norm runs in fp32 regardless of the
activation dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "linear",
    "layer_norm",
    "gelu",
    "conv1d",
    "embedding_lookup",
    "sinusoid_positions",
]


def linear(x: jax.Array, w, b: Optional[jax.Array] = None) -> jax.Array:
    """``x[..., d_in] @ w[d_in, d_out] (+ b)`` with fp32 MXU accumulation.

    ``w`` may be a :class:`janus_tpu.ops.quant.QuantizedWeight` (weight-only
    int8: dequantized on the fly, halving weight HBM traffic) or a
    :class:`janus_tpu.ops.quant.DynQuantizedWeight` (full int8: dynamic
    per-row activation quantization, int8 x int8 -> int32 on the MXU)."""
    if type(w).__name__ == "DynQuantizedWeight":
        from janus_tpu.ops.quant import linear_int8_dynamic

        return linear_int8_dynamic(x, w, b)
    if type(w).__name__ == "QuantizedWeight":
        w = (w.q.astype(jnp.float32) * w.scale).astype(x.dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(
    x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5
) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    # Exact (erf) GELU — matches the reference-architecture checkpoints.
    return jax.nn.gelu(x, approximate=False)


def conv1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """1-D convolution over ``x[..., T, C_in]`` with kernel
    ``w[K, C_in, C_out]``. Batched over any leading axes; lowers to a single
    conv_general_dilated that XLA tiles onto the MXU."""
    lead = x.shape[:-2]
    xb = x.reshape((-1,) + x.shape[-2:])
    y = jax.lax.conv_general_dilated(
        xb,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype).reshape(lead + y.shape[-2:])


def embedding_lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
    return jnp.take(table, ids, axis=0)


def sinusoid_positions(length: int, channels: int, max_timescale: float = 10_000.0):
    """Whisper-style sinusoidal position embedding ``[length, channels]``:
    first half sin, second half cos, log-spaced timescales."""
    assert channels % 2 == 0
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    emb = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)
    return jnp.asarray(emb, dtype=jnp.float32)
