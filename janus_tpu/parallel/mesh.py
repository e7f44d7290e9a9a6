"""Device mesh construction.

Axes (see :class:`janus_tpu.common.config.MeshConfig`):

- ``data``  — concurrent sessions / batch (DP)
- ``model`` — attention heads + MLP hidden (TP), rides ICI
- ``seq``   — mel-frame/sequence dimension (SP/CP: ring attention, Ulysses)

The reference had no device parallelism at all — its "mesh" was producer/
consumer threads on one CPU (reference: backend/services/engine.py:428-436);
here the mesh is the first-class scaling primitive.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from janus_tpu.common.config import MeshConfig

__all__ = ["build_mesh", "best_mesh_shape", "local_device_count"]


def local_device_count() -> int:
    return len(jax.devices())


def best_mesh_shape(n_devices: int, model: int = 1, seq: int = 1) -> Tuple[int, int, int]:
    """Fill the data axis with whatever model/seq don't use."""
    if n_devices % (model * seq) != 0:
        raise ValueError(f"{n_devices} devices not divisible by model*seq={model*seq}")
    return (n_devices // (model * seq), model, seq)


def build_mesh(cfg: Optional[MeshConfig] = None,
               devices: Optional[Sequence] = None) -> jax.sharding.Mesh:
    cfg = cfg or MeshConfig()
    if devices is None:
        devices = jax.devices()
    n = cfg.data * cfg.model * cfg.seq
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(cfg.data, cfg.model, cfg.seq)
    return jax.sharding.Mesh(dev_array, cfg.axis_names)
