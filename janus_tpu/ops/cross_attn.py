"""Pallas fused cross-attention with int8 K/V operands (decode loop).

The flagship greedy-decode loop re-reads every layer's cross-attention
K/V each token — at large-v3 scale 0.65 GB/step bf16, the dominant
non-weight HBM stream (docs/ROOFLINE.md §1). Storing K/V int8
(:class:`janus_tpu.ops.quant.QuantKVT`) halves that read, but the XLA
dequant path measured ~20 % SLOWER than bf16: the convert+scale does not
fuse into the attention matmul operand on this backend, so a bf16 copy of
the whole K/V materializes in HBM every step (r4 finding).

This kernel closes that loop: K and V stream from HBM **as int8** and are
dequantized in VMEM registers, fused with QKᵀ → softmax → PV in one Pallas
program per (batch·head). The per-position scales fold into the score
columns (for K) and the probability columns (for V), so no dense bf16
copy of K/V ever exists anywhere:

    s[tq, T]  = (q · k_int8[Dh, T]) ⊙ k_scale[T]
    p         = softmax_fp32(s · Dh^-1/2)
    o[tq, Dh] = (p ⊙ v_scale[T]) ·_T v_int8[Dh, T]

K/V are stored head-dim-major (``[..., Dh, T]``, built once at
decode-state init): int8 VMEM tiles are (32, 128)-granular, so the long
encoder-time axis must ride the lane dimension, and both matmuls contract
against the transposed layout without any in-loop transpose.

Numerically identical (fp32 associativity aside) to
``attend(q, dequant_kv(k), dequant_kv(v))``; parity is asserted in
tests/test_quant.py. Off-TPU the XLA dequant path is used (or the kernel
runs in interpreter mode for tests). Reference analog: CTranslate2's int8
decode (reference backend/services/transcriber.py:26).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from janus_tpu.ops.attention import attend
from janus_tpu.ops.quant import QuantKV, QuantKVT, dequant_kv

__all__ = ["cross_attention_kv"]

_LANE = 128


def _kernel(q_ref, kq_ref, ks_ref, vq_ref, vs_ref, o_ref, *, scale: float,
            t_valid: int, h: int, dh: int):
    # one grid program per batch row; heads are a STATIC in-kernel loop —
    # a (batch·head) grid at flagship shape means 160 tiny programs per
    # layer, all launch overhead
    for head in range(h):
        q = q_ref[0, head].astype(jnp.float32)       # [tq, Dh]
        kt = kq_ref[0, head * dh:(head + 1) * dh, :].astype(jnp.float32)
        ks = ks_ref[0, head:head + 1, :].astype(jnp.float32)   # [1, T]

        s = jax.lax.dot_general(
            q, kt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                    # [tq, T]
        s = s * ks                                   # fold K dequant in

        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < t_valid, s, -1e30)       # lane padding

        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)

        vs = vs_ref[0, head:head + 1, :].astype(jnp.float32)   # [1, T]
        vt = vq_ref[0, head * dh:(head + 1) * dh, :].astype(jnp.float32)
        o = jax.lax.dot_general(
            p * vs, vt, (((1,), (1,)), ((), ())),    # contract over T
            preferred_element_type=jnp.float32,
        )                                            # [tq, Dh]
        o_ref[0, head] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cross_bh(q, kq, ks, vq, vs, interpret: bool):
    """``q[B, H, tq, Dh]``, int8 ``kq/vq[B, H·Dh, T]``, scales
    ``ks/vs[B, H, T]``."""
    b, h, tq, dh = q.shape
    t = kq.shape[-1]
    scale = dh**-0.5

    kq = _pad_to(kq, 2, _LANE)
    vq = _pad_to(vq, 2, _LANE)
    ks = _pad_to(ks, 2, _LANE)
    vs = _pad_to(vs, 2, _LANE)
    tp = kq.shape[-1]

    kernel = functools.partial(_kernel, scale=scale, t_valid=t, h=h, dh=dh)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, tq, dh), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h * dh, tp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, tp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h * dh, tp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, tp), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, tq, dh), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, tq, dh), q.dtype),
        interpret=interpret,
    )(q, kq, ks, vq, vs)


def cross_attention_kv(q: jax.Array, k, v, force: bool = False) -> jax.Array:
    """Cross-attention ``[..., H, tq, Dh]`` over (possibly int8) K/V.

    ``k``/``v`` may be :class:`QuantKVT` (``q[..., H, Dh, T]`` int8 +
    ``scale[..., H, T]`` — the kernel layout), :class:`QuantKV`, or dense
    ``[..., H, T, Dh]`` arrays. Dense and :class:`QuantKV` inputs and
    off-TPU int8 inputs route to the XLA path; ``force=True`` runs the
    Pallas kernel in interpreter mode off-TPU (tests).
    """
    if not isinstance(k, QuantKVT):
        if isinstance(k, QuantKV):
            return attend(q, dequant_kv(k, q.dtype), dequant_kv(v, q.dtype))
        return attend(q, k, v)
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu and not force:
        return attend(q, dequant_kv(k, q.dtype), dequant_kv(v, q.dtype))

    *lead, h, tq, dh = q.shape
    t = k.q.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    out = _cross_bh(
        q.reshape(b, h, tq, dh),
        k.q.reshape(b, h * dh, t), k.scale.reshape(b, h, t),
        v.q.reshape(b, h * dh, t), v.scale.reshape(b, h, t),
        not on_tpu,
    )
    return out.reshape(*lead, h, tq, dh)
