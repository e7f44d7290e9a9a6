"""Ulysses-style sequence parallelism: all-to-all head↔sequence resharding.

Alternative to ring attention for encoder self-attention: instead of
rotating KV blocks, one ``all_to_all`` re-shards ``[B, H, T/s, Dh]`` (all
heads, local sequence) into ``[B, H/s, T, Dh]`` (local heads, full
sequence), runs ordinary full-sequence attention per local head group, and
a second ``all_to_all`` restores sequence sharding. Two collectives total
per attention — cheaper than a ring when the head count divides well and
T is moderate; pick per benchmark (SURVEY.md §2.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from janus_tpu.ops.attention import attend

__all__ = ["ulysses_attention"]


def _local_body(q, k, v, axis_name: str, causal: bool):
    # [B, H, T_loc, Dh] -> all_to_all over heads -> [B, H_loc, T, Dh]
    def seq_to_head(x):
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                                  tiled=True)

    def head_to_seq(x):
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                                  tiled=True)

    qh, kh, vh = seq_to_head(q), seq_to_head(k), seq_to_head(v)
    mask = None
    if causal:
        t = qh.shape[-2]
        qi = jnp.arange(t)[:, None]
        kj = jnp.arange(t)[None, :]
        mask = kj <= qi
    out = attend(qh, kh, vh, mask)
    return head_to_seq(out)


def ulysses_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                      mesh: jax.sharding.Mesh, axis_name: str = "seq",
                      causal: bool = False) -> jax.Array:
    """Exact attention over ``[B, H, T, Dh]`` global tensors, T sharded on
    ``axis_name``; H must be divisible by the axis size."""
    if q.shape[1] % mesh.shape[axis_name] != 0:
        raise ValueError(
            f"heads={q.shape[1]} not divisible by |{axis_name}|={mesh.shape[axis_name]}"
        )
    body = functools.partial(_local_body, axis_name=axis_name, causal=causal)
    spec = P(None, None, axis_name, None)
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
