"""Checkpointing: Orbax-backed save/restore for param trees and train state.

The reference's only persistence is a reference-audio WAV with mtime
hot-reload (reference: backend/api/endpoints.py:64-66,
backend/services/synthesizer.py:90-104). The framework adds real model
checkpoints: any param pytree (ASR/TTS/vocoder/VAD) plus optimizer state
and step counter, restored onto whatever mesh/sharding the restore-side
template carries.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_params", "load_params", "save_train_state", "load_train_state"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_params(path: str, params: Any) -> None:
    """Write a param pytree. ``path`` is a directory (Orbax layout)."""
    _checkpointer().save(os.path.abspath(path), jax.device_get(params), force=True)


def load_params(path: str, template: Optional[Any] = None) -> Any:
    """Restore a param pytree. With a ``template`` (e.g. freshly-initialized
    sharded params), leaves are restored directly onto its shardings."""
    ckptr = _checkpointer()
    if template is None:
        return ckptr.restore(os.path.abspath(path))
    import orbax.checkpoint as ocp

    restore_args = jax.tree.map(
        lambda x: ocp.ArrayRestoreArgs(sharding=getattr(x, "sharding", None)),
        template,
    )
    return ckptr.restore(
        os.path.abspath(path),
        restore_args=restore_args,
    )


def save_train_state(path: str, state) -> None:
    """Persist a :class:`janus_tpu.train.trainer.TrainState`."""
    tree = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    save_params(path, tree)


def load_train_state(path: str, state_template):
    from janus_tpu.train.trainer import TrainState

    tree_template = {
        "params": state_template.params,
        "opt_state": state_template.opt_state,
        "step": state_template.step,
    }
    tree = load_params(path, tree_template)
    return TrainState(
        params=tree["params"], opt_state=tree["opt_state"], step=tree["step"]
    )
