"""Pallas fused attention for TPU.

The encoder's self-attention over mel frames is the FLOPs center of the
encode path. This kernel fuses QKᵀ → masked softmax → PV into one Pallas
program per (batch·head, q-block): scores never round-trip to HBM, the
softmax runs in fp32 in VMEM, and both matmuls hit the MXU. K/V for one
(b,h) row fit comfortably in VMEM at phrase scale (T ≤ 4k, Dh ≤ 128), so
no streaming K loop is needed — one pass, numerically exact.

Falls back to the XLA reference implementation
(:func:`janus_tpu.ops.attention.attend`) off-TPU or for shapes the kernel
doesn't serve; on CPU tests the kernel runs in interpreter mode.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled installs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from janus_tpu.ops.attention import attend

__all__ = ["flash_attention"]

_BLOCK_Q = 256
_LANE = 128


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool,
            t_valid: int, block_q: int):
    j = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)        # [BQ, D]
    k = k_ref[0].astype(jnp.float32)        # [T, D]
    v = v_ref[0]                            # [T, D]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                               # [BQ, T]

    t_pad = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    mask = col < t_valid
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * block_q
        mask = mask & (col <= row)
    s = jnp.where(mask, s, -1e30)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("causal", "interpret"))
def _flash_bh(q, k, v, causal: bool, interpret: bool):
    """[BH, Tq, D] x [BH, Tk, D] fused attention."""
    bh, t, d = q.shape
    t_kv = k.shape[1]  # key length may differ from query length
    scale = d**-0.5
    block_q = min(_BLOCK_Q, max(8, t))

    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, _LANE)
    vp = _pad_to(v, 1, _LANE)
    t_q = qp.shape[1]
    t_k = kp.shape[1]

    grid = (bh, t_q // block_q)
    kernel = functools.partial(
        _kernel, scale=scale, causal=causal, t_valid=t_kv, block_q=block_q
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t_k, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t_k, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, t_q, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :t, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_bh_diff(q, k, v, causal: bool, interpret: bool):
    """Differentiable wrapper: Pallas kernel forward, exact XLA attention
    gradient backward (Pallas kernels have no automatic JVP/VJP — without
    this, ``grad`` through an on-TPU encoder train step crashes). The
    backward recomputes the [Tq, Tk] probabilities in fp32, which is fine
    at phrase scale; residuals are just (q, k, v)."""
    return _flash_bh(q, k, v, causal, interpret)


def _flash_fwd(q, k, v, causal, interpret):
    return _flash_bh(q, k, v, causal, interpret), (q, k, v)


def _flash_bwd(causal, interpret, res, g):
    q, k, v = res
    mask = _causal_mask(q.shape[1], k.shape[1]) if causal else None

    def ref(q, k, v):
        # attend expects a heads axis; [BH, T, D] rides as one head each
        return attend(q[:, None], k[:, None], v[:, None], mask)[:, 0]

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


_flash_bh_diff.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    mask: Optional[jax.Array] = None,
    force: bool = False,
) -> jax.Array:
    """Drop-in for :func:`attend` on ``[..., H, T, Dh]`` tensors.

    Custom boolean masks fall back to the XLA path (the kernel serves the
    two hot cases: full and causal). ``force=True`` runs the kernel in
    interpreter mode off-TPU (tests). Differentiable: the backward pass is
    the exact XLA attention gradient (see :func:`_flash_bh_diff`).
    """
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    if mask is not None or (not on_tpu and not force):
        return attend(q, k, v, mask if mask is not None else (
            None if not causal else _causal_mask(q.shape[-2], k.shape[-2])
        ))

    *lead, h, t, dh = q.shape
    bh = int(np.prod(lead)) * h if lead else h
    qf = q.reshape(bh, t, dh)
    kf = k.reshape(bh, k.shape[-2], dh)
    vf = v.reshape(bh, v.shape[-2], dh)
    out = _flash_bh_diff(qf, kf, vf, causal, not on_tpu)
    return out.reshape(*lead, h, t, dh)


def _causal_mask(tq: int, tk: int) -> jax.Array:
    qi = jnp.arange(tq)[:, None]
    kj = jnp.arange(tk)[None, :]
    return kj <= qi
