"""Mesh-sharded trainer.

One :class:`Trainer` owns an optax optimizer and a jitted train step.
Parameters are committed to the mesh with tensor-parallel NamedShardings
(``model`` axis) and batches with data shardings (``data`` axis); jit's
sharding propagation then lays out optimizer state like the params and
derives every collective (psum of TP partials, gradient all-reduce over
data) from the input shardings — no hand-written communication.

Works identically on 1 device (trivial mesh) and N-chip meshes; the driver
validates the multi-chip path via ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from janus_tpu.parallel.sharding import Rules, shard_params

__all__ = ["TrainState", "Trainer"]


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


class Trainer:
    def __init__(
        self,
        loss_fn: Callable[..., Tuple[jax.Array, Dict]],
        mesh: jax.sharding.Mesh,
        rules: Rules,
        learning_rate: float = 3e-4,
        weight_decay: float = 0.01,
        grad_clip: float = 1.0,
    ) -> None:
        """``loss_fn(params, *batch) -> (loss, metrics)``."""
        self.mesh = mesh
        self.rules = rules
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(learning_rate, weight_decay=weight_decay),
        )
        self._loss_fn = loss_fn

        def step(params, opt_state, step_no, *batch):
            (loss, metrics), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True
            )(params, *batch)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = dict(metrics, loss=loss,
                           grad_norm=optax.global_norm(grads))
            return params, opt_state, step_no + 1, metrics

        self._step_fn = jax.jit(step, donate_argnums=(0, 1))

    # -- state -------------------------------------------------------------

    def create_state(self, params: Any) -> TrainState:
        """Shard params per the TP rules and build matching opt state
        (sharding propagation lays adamw moments out like the params)."""
        params = shard_params(params, self.mesh, self.rules)
        opt_state = jax.jit(self.optimizer.init)(params)
        return TrainState(
            params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32)
        )

    def shard_batch(self, *batch) -> Tuple:
        """Commit batch arrays to the mesh, leading axis over every
        data-parallel mesh axis (``('replica','data')`` on hybrid multi-
        slice meshes — the gradient all-reduce over ``replica`` is the one
        collective that rides DCN)."""
        from janus_tpu.parallel.distributed import dp_spec

        out = []
        for b in batch:
            arr = jnp.asarray(b)
            spec = dp_spec(self.mesh, arr.ndim) if arr.ndim >= 1 else P()
            out.append(jax.device_put(arr, NamedSharding(self.mesh, spec)))
        return tuple(out)

    # -- step --------------------------------------------------------------

    def train_step(self, state: TrainState, *batch) -> Tuple[TrainState, Dict]:
        batch = self.shard_batch(*batch)
        params, opt_state, step_no, metrics = self._step_fn(
            state.params, state.opt_state, state.step, *batch
        )
        return TrainState(params, opt_state, step_no), jax.device_get(metrics)
