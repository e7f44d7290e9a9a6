"""Pipeline parallelism: GPipe-style microbatch schedule over a mesh axis.

Layer groups (stages) live on different devices along the ``stage`` axis;
microbatches flow stage-to-stage with ``ppermute`` in the classic
S + M − 1 step schedule, so at steady state every stage computes a
different microbatch concurrently. Stage functions must be homogeneous
(same computation, per-stage params) — the natural fit is a transformer
split into equal layer groups, which is how :func:`split_encoder_stages`
carves the ASR encoder.

The reference has nothing comparable (its "pipeline" was two OS threads);
this realizes the optional PP capability from SURVEY.md §2.4.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, List, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

__all__ = ["pipeline_apply", "split_encoder_stages", "stack_stage_params"]


def stack_stage_params(stage_params: List[Any]) -> Any:
    """Stack per-stage param trees along a new leading stage axis."""
    from janus_tpu.models.params import stack_layer_params

    return stack_layer_params(stage_params)


def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
    mesh: jax.sharding.Mesh,
    axis_name: str = "stage",
    n_microbatches: int | None = None,
) -> jax.Array:
    """Run ``x[B, ...]`` through S pipelined stages.

    ``stacked_params`` has a leading stage axis (see
    :func:`stack_stage_params`) sharded over ``axis_name``;
    ``stage_fn(params_for_stage, microbatch)`` must preserve the
    microbatch shape. Microbatches default to the stage count.
    """
    s = mesh.shape[axis_name]
    m = n_microbatches or s
    b = x.shape[0]
    if b % m != 0:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")

    micro = x.reshape(m, b // m, *x.shape[1:])

    # Output strategy: the last stage deposits each finished microbatch into
    # a zero buffer; a psum over the stage axis then replicates the result
    # everywhere (other stages contribute zeros).
    def body_psum(params_local, micro_all):
        params_here = jax.tree.map(lambda a: a[0], params_local)
        stage_idx = jax.lax.axis_index(axis_name)
        perm = [(i, (i + 1) % s) for i in range(s)]
        buf = jnp.zeros_like(micro_all[0])
        out = jnp.zeros_like(micro_all)
        for t in range(s + m - 1):
            mb = t - stage_idx
            active = (mb >= 0) & (mb < m)
            mb_c = jnp.clip(mb, 0, m - 1)
            inp = jnp.where(stage_idx == 0, micro_all[mb_c], buf)
            y = stage_fn(params_here, inp)
            y = jnp.where(active, y, buf)
            deposit = (active & (stage_idx == s - 1)).astype(y.dtype)
            out = out.at[mb_c].add(y * deposit)
            buf = jax.lax.ppermute(y, axis_name, perm)
        return jax.lax.psum(out, axis_name)

    spec_params = jax.tree.map(lambda _: P(axis_name), stacked_params)
    result = jax.shard_map(
        body_psum,
        mesh=mesh,
        in_specs=(spec_params, P()),
        out_specs=P(),
        check_vma=False,
    )(stacked_params, micro)
    return result.reshape(b, *x.shape[1:])


def split_encoder_stages(params: dict, n_stages: int) -> Tuple[List[dict], Callable]:
    """Carve ASR encoder blocks into ``n_stages`` equal layer groups.

    Returns (per-stage params list, stage_fn). The conv stem / positional
    embedding / final LN stay outside the pipeline (run on stage 0 input
    and after the last stage respectively by the caller).
    """
    from janus_tpu.models.asr import _attention, _mlp
    from janus_tpu.ops.layers import layer_norm

    blocks = params["encoder"]["blocks"]
    if len(blocks) % n_stages != 0:
        raise ValueError(f"{len(blocks)} blocks not divisible into {n_stages} stages")
    per = len(blocks) // n_stages
    stage_params = [
        {"blocks": blocks[i * per : (i + 1) * per]} for i in range(n_stages)
    ]

    def stage_fn(p, x, num_heads: int):
        for blk in p["blocks"]:
            x = x + _attention(blk["attn"], layer_norm(x, **blk["attn_ln"]), num_heads)
            x = x + _mlp(blk["mlp"], layer_norm(x, **blk["mlp_ln"]))
        return x

    return stage_params, stage_fn
