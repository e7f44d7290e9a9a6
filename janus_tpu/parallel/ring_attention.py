"""Ring attention: sequence-parallel exact attention via ICI KV rotation.

For utterances whose mel sequence is sharded along the ``seq`` mesh axis,
each device holds a Q/K/V block ``[B, H, T/s, Dh]``. K/V blocks rotate
around the ring with ``ppermute`` while each device accumulates its queries'
attention in streaming-softmax (flash) form — numerically exact, with
O(T/s) memory and all communication riding neighbor-to-neighbor ICI links
(this is the "chunk-boundary mel context over ICI" capability from
BASELINE; the reference buffered whole phrases on one host instead —
reference: backend/services/engine.py:499-509).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

__all__ = ["ring_attention", "ring_self_attention_sharded"]


def _local_ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          axis_name: str, axis_size: int,
                          causal: bool = False) -> jax.Array:
    """Per-device body under shard_map. Blocks are [B, H, T_blk, Dh]."""
    scale = q.shape[-1] ** -0.5
    my_idx = jax.lax.axis_index(axis_name)
    t_blk = q.shape[-2]

    qf = q.astype(jnp.float32) * scale
    acc = jnp.zeros(q.shape[:-1] + (v.shape[-1],), dtype=jnp.float32)
    m = jnp.full(q.shape[:-1], -jnp.inf, dtype=jnp.float32)   # running max
    l = jnp.zeros(q.shape[:-1], dtype=jnp.float32)            # running denom

    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    k_blk, v_blk = k, v
    for step in range(axis_size):
        src_idx = (my_idx - step) % axis_size  # which shard this block is
        s = jnp.einsum("bhtd,bhsd->bhts", qf, k_blk.astype(jnp.float32))
        if causal:
            qi = my_idx * t_blk + jnp.arange(t_blk)[:, None]
            kj = src_idx * t_blk + jnp.arange(t_blk)[None, :]
            s = jnp.where(kj <= qi, s, -jnp.inf)
        blk_max = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m, blk_max)
        # guard fully-masked rows (m_new == -inf)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(s - m_safe[..., None])
        p = jnp.where(jnp.isfinite(s), p, 0.0)
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - m_safe), 0.0)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhts,bhsd->bhtd", p, v_blk.astype(jnp.float32)
        )
        m = m_new
        if step < axis_size - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)

    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(q.dtype)


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   mesh: jax.sharding.Mesh, axis_name: str = "seq",
                   causal: bool = False) -> jax.Array:
    """Exact attention over ``[B, H, T, Dh]`` tensors sharded on T.

    Inputs/outputs are global arrays; shard_map handles the T-sharding and
    the ppermute ring runs over ``axis_name``.
    """
    axis_size = mesh.shape[axis_name]
    body = functools.partial(
        _local_ring_attention, axis_name=axis_name, axis_size=axis_size,
        causal=causal,
    )
    # On a hybrid serving mesh (data × seq) the batch dim stays sharded
    # over "data" — each data-group runs its own independent KV ring.
    batch_axis = ("data" if ("data" in mesh.shape and mesh.shape["data"] > 1
                             and axis_name != "data") else None)
    spec = P(batch_axis, None, axis_name, None)
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def ring_self_attention_sharded(x_parts, axis_name: str = "seq"):
    """Raw shard_map body export for composition inside larger sharded
    programs (e.g. a fully sharded encoder block)."""
    return functools.partial(_local_ring_attention, axis_name=axis_name)
