"""Multi-host deployment: ``jax.distributed`` bootstrap + hybrid DCN x ICI
meshes.

The reference's only cross-machine story is two peers on UDP/TCP sockets
(reference: backend/services/link_simulator.py:87-116, docs/SETUP.md
ngrok tunnels); model-scale communication did not exist. Here multi-host
is first-class, following the standard multi-slice recipe:

- one process per host calls :func:`initialize_from_env` (coordinator
  address/process count/process id from env), after which ``jax.devices()``
  is the global device set;
- :func:`build_hybrid_mesh` lays devices out as
  ``('replica', 'data', 'model', 'seq')`` — ``replica`` is the
  slowest-varying axis and is the ONLY axis that crosses slice boundaries
  (gradient/metric all-reduces ride DCN); ``data``/``model``/``seq``
  stay inside a slice so TP/SP collectives ride ICI;
- batches shard over ``('replica', 'data')`` jointly (:func:`dp_spec`),
  params/TP over ``model``, long sequences over ``seq``.

Real multi-slice topology comes from device ``slice_index`` attributes via
``jax.experimental.mesh_utils.create_hybrid_device_mesh``; on single-slice
or CPU test fleets the same logical mesh is built by reshaping the flat
device list, so every code path above it is identical in tests and pods.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

__all__ = [
    "initialize_from_env",
    "num_slices",
    "build_hybrid_mesh",
    "dp_spec",
    "HYBRID_AXES",
]

logger = logging.getLogger("janus.distributed")

# Set once initialize_from_env succeeds; paired with
# jax.distributed.is_initialized() so a re-import doesn't double-init.
_initialized = False

HYBRID_AXES: Tuple[str, str, str, str] = ("replica", "data", "model", "seq")


def initialize_from_env(env: Optional[dict] = None) -> bool:
    """Bootstrap ``jax.distributed`` from environment variables.

    Reads ``JANUS_COORDINATOR_ADDRESS``, ``JANUS_NUM_PROCESSES``,
    ``JANUS_PROCESS_ID`` (falling back to the standard JAX auto-detection
    when only the coordinator is given). No-op — returning False — when
    unset (single-process dev/test) or when already initialized.
    """
    global _initialized
    env = dict(os.environ if env is None else env)
    addr = env.get("JANUS_COORDINATOR_ADDRESS")
    if not addr:
        return False
    if _initialized or getattr(jax.distributed, "is_initialized", lambda: False)():
        return False  # already initialized
    kwargs = {"coordinator_address": addr}
    if env.get("JANUS_NUM_PROCESSES"):
        kwargs["num_processes"] = int(env["JANUS_NUM_PROCESSES"])
    if env.get("JANUS_PROCESS_ID"):
        kwargs["process_id"] = int(env["JANUS_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), len(jax.devices()),
    )
    return True


def num_slices(devices: Optional[Sequence] = None) -> int:
    """Number of distinct accelerator slices (1 on CPU/single-slice)."""
    devices = jax.devices() if devices is None else devices
    return len({getattr(d, "slice_index", 0) for d in devices})


def build_hybrid_mesh(
    replica: int = 1,
    data: int = 1,
    model: int = 1,
    seq: int = 1,
    devices: Optional[Sequence] = None,
) -> jax.sharding.Mesh:
    """``('replica', 'data', 'model', 'seq')`` mesh over the global device
    set. With >1 real slices and ``replica`` == the slice count, devices are
    laid out so ``replica`` is exactly the DCN boundary
    (``create_hybrid_device_mesh``); otherwise the flat device list is
    reshaped — topologically fine within one slice, and what CPU test
    fleets use."""
    devices = list(jax.devices() if devices is None else devices)
    want = replica * data * model * seq
    if want > len(devices):
        raise ValueError(f"mesh needs {want} devices, have {len(devices)}")
    devices = devices[:want]

    n_slices = num_slices(devices)
    if n_slices > 1 and replica == n_slices:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, data, model, seq),
            dcn_mesh_shape=(replica, 1, 1, 1),
            devices=devices,
        )
    else:
        if n_slices > 1:
            logger.warning(
                "replica=%d != slice count %d: data/model/seq collectives "
                "may cross DCN", replica, n_slices,
            )
        dev_array = np.asarray(devices).reshape(replica, data, model, seq)
    return jax.sharding.Mesh(dev_array, HYBRID_AXES)


def dp_spec(mesh: jax.sharding.Mesh, ndim: int = 1) -> jax.sharding.PartitionSpec:
    """Batch PartitionSpec: leading axis over every data-parallel mesh axis
    present (``('replica', 'data')`` on hybrid meshes, ``'data'`` on plain
    ones), remaining axes replicated."""
    from jax.sharding import PartitionSpec as P

    names = [n for n in ("replica", "data") if n in mesh.axis_names]
    lead = tuple(names) if len(names) > 1 else (names[0] if names else None)
    return P(lead, *([None] * (ndim - 1)))
