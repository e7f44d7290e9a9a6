"""Multi-host layer: hybrid mesh construction, dp specs, DCN-aware trainer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from janus_tpu.parallel.distributed import (
    HYBRID_AXES,
    build_hybrid_mesh,
    dp_spec,
    initialize_from_env,
    num_slices,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_initialize_noop_without_env():
    assert initialize_from_env(env={}) is False


def test_num_slices_cpu_is_one():
    assert num_slices() == 1


def test_build_hybrid_mesh_axes_and_shape():
    mesh = build_hybrid_mesh(replica=2, data=2, model=2, seq=1)
    assert mesh.axis_names == HYBRID_AXES
    assert mesh.shape == {"replica": 2, "data": 2, "model": 2, "seq": 1}
    with pytest.raises(ValueError):
        build_hybrid_mesh(replica=16, data=1)


def test_dp_spec_shapes():
    hybrid = build_hybrid_mesh(replica=2, data=2, model=2, seq=1)
    assert dp_spec(hybrid, 3) == P(("replica", "data"), None, None)
    from janus_tpu.common.config import MeshConfig
    from janus_tpu.parallel.mesh import build_mesh

    plain = build_mesh(MeshConfig(data=4, model=2, seq=1))
    assert dp_spec(plain, 2) == P("data", None)


def test_trainer_on_hybrid_mesh_matches_single_device():
    """One ASR train step on a replica=2 x data=2 x model=2 hybrid mesh must
    produce the same loss as the unsharded step (grad all-reduce over the
    replica axis is derived by GSPMD, bit-matching up to reduction order)."""
    from janus_tpu.common.config import ASRConfig
    from janus_tpu.models import asr
    from janus_tpu.parallel.sharding import ASR_PARTITION_RULES
    from janus_tpu.train.losses import asr_loss
    from janus_tpu.train.trainer import Trainer

    cfg = ASRConfig(
        n_mels=16, d_model=64, encoder_layers=2, decoder_layers=2,
        num_heads=8, vocab_size=300, max_source_positions=32,
        max_target_positions=16,
    )
    params = asr.init_asr(0, cfg)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((8, 64, cfg.n_mels)).astype(np.float32)
    tokens = rng.integers(0, 299, size=(8, 8)).astype(np.int32)
    mask = np.ones_like(tokens, dtype=np.float32)

    def loss_fn(p, *b):
        return asr_loss(p, cfg, *b)

    mesh = build_hybrid_mesh(replica=2, data=2, model=2, seq=1)
    tr = Trainer(loss_fn, mesh, ASR_PARTITION_RULES, learning_rate=1e-3)
    state = tr.create_state(params)
    state, metrics = tr.train_step(state, mel, tokens, mask)
    assert np.isfinite(metrics["loss"])

    ref_loss, _ = asr_loss(asr.init_asr(0, cfg), cfg, jnp.asarray(mel),
                           jnp.asarray(tokens), jnp.asarray(mask))
    np.testing.assert_allclose(metrics["loss"], float(ref_loss), rtol=1e-4)
