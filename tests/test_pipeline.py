"""Pipeline parallelism: GPipe microbatch schedule must equal sequential
stage composition."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from janus_tpu.common.config import ASRConfig, MeshConfig
from janus_tpu.models import asr as asr_mod
from janus_tpu.parallel.mesh import build_mesh
from janus_tpu.parallel.pipeline import (
    pipeline_apply,
    split_encoder_stages,
    stack_stage_params,
)


def test_pipeline_matches_sequential_linear_stages():
    """4 pipelined linear stages == applying them in order."""
    mesh = build_mesh(MeshConfig(data=1, model=1, seq=8, axis_names=("a", "b", "stage")))
    # build a mesh whose last axis is the stage axis of size 8
    rng = np.random.default_rng(0)
    s, d = 8, 16
    ws = [rng.standard_normal((d, d)).astype(np.float32) * 0.2 for _ in range(s)]
    stage_params = [{"w": jnp.asarray(w)} for w in ws]
    stacked = stack_stage_params(stage_params)

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"])

    x = jnp.asarray(rng.standard_normal((16, d)).astype(np.float32))

    ref = x
    for w in ws:
        ref = jnp.tanh(ref @ jnp.asarray(w))

    out = pipeline_apply(stage_fn, stacked, x, mesh, axis_name="stage")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_microbatch_count_validation():
    mesh = build_mesh(MeshConfig(data=1, model=1, seq=8, axis_names=("a", "b", "stage")))
    stacked = stack_stage_params([{"w": jnp.eye(4)} for _ in range(8)])
    with pytest.raises(ValueError):
        pipeline_apply(lambda p, x: x, stacked, jnp.zeros((10, 4)), mesh,
                       axis_name="stage")


def test_encoder_stage_split_matches_full_forward():
    """Pipelined encoder blocks == the monolithic encoder forward."""
    cfg = ASRConfig(
        n_mels=16, d_model=64, encoder_layers=4, decoder_layers=1, num_heads=4,
        vocab_size=261, max_source_positions=32, max_target_positions=16,
    )
    params = asr_mod.init_asr(0, cfg)
    mesh = build_mesh(MeshConfig(data=1, model=1, seq=4, axis_names=("a", "b", "stage")))

    stage_params, stage_fn = split_encoder_stages(params, n_stages=4)
    stacked = stack_stage_params(stage_params)
    fn = functools.partial(stage_fn, num_heads=cfg.num_heads)
    # wrap to match (params, x) signature
    wrapped = lambda p, x: stage_fn(p, x, cfg.num_heads)

    rng = np.random.default_rng(1)
    # x: post-conv-stem activations [B, T, D]
    x = jnp.asarray(rng.standard_normal((8, 32, 64)).astype(np.float32))

    ref = x
    for sp in stage_params:
        ref = stage_fn(sp, ref, cfg.num_heads)

    out = pipeline_apply(wrapped, stacked, x, mesh, axis_name="stage")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
