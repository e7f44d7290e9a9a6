"""Device-mesh parallelism: sharding rules, ring attention, Ulysses SP."""

from janus_tpu.parallel.mesh import build_mesh, best_mesh_shape  # noqa: F401
from janus_tpu.parallel.sharding import (  # noqa: F401
    ASR_PARTITION_RULES,
    TTS_PARTITION_RULES,
    partition_spec_for,
    shard_params,
    tree_partition_specs,
)
