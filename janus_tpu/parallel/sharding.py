"""Parameter partition rules: path-regex → PartitionSpec.

Tensor parallelism follows the Megatron pattern mapped onto the ``model``
mesh axis: QKV and MLP-up project *onto* the sharded dimension (column
parallel), attention-out and MLP-down project *from* it (row parallel), so
each transformer block needs exactly one all-reduce per sublayer — XLA
inserts it automatically from these shardings under ``jit``. Embeddings
and norms stay replicated (phrase-scale vocab projections are cheap
relative to attention; revisit for large-v3 if profiles say otherwise).

Rules match the slash-joined param paths produced by
:func:`janus_tpu.models.params.map_with_paths`.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Sequence, Tuple

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from janus_tpu.models.params import map_with_paths

__all__ = [
    "ASR_PARTITION_RULES",
    "TTS_PARTITION_RULES",
    "VOCODER_PARTITION_RULES",
    "partition_spec_for",
    "tree_partition_specs",
    "shard_params",
]

Rules = Sequence[Tuple[str, P]]

# fmt: off
ASR_PARTITION_RULES: Rules = (
    # attention: column-parallel QKV, row-parallel out
    (r".*/(attn|cross)/(q|k|v)/w$",   P(None, "model")),
    (r".*/(attn|cross)/(q|k|v)/b$",   P("model")),
    (r".*/(attn|cross)/out/w$",       P("model", None)),
    (r".*/(attn|cross)/out/b$",       P()),
    # MLP: column-parallel up, row-parallel down
    (r".*/mlp/fc1/w$",                P(None, "model")),
    (r".*/mlp/fc1/b$",                P("model")),
    (r".*/mlp/fc2/w$",                P("model", None)),
    (r".*/mlp/fc2/b$",                P()),
    # conv stem / embeddings / norms replicated
    (r".*",                           P()),
)

TTS_PARTITION_RULES: Rules = (
    (r".*/attn/(q|k|v)/w$",           P(None, "model")),
    (r".*/attn/(q|k|v)/b$",           P("model")),
    (r".*/attn/out/w$",               P("model", None)),
    (r".*/mlp/fc1/w$",                P(None, "model")),
    (r".*/mlp/fc1/b$",                P("model")),
    (r".*/mlp/fc2/w$",                P("model", None)),
    (r".*",                           P()),
)

VOCODER_PARTITION_RULES: Rules = (
    (r".*/pw1/w$",                    P(None, "model")),
    (r".*/pw1/b$",                    P("model")),
    (r".*/pw2/w$",                    P("model", None)),
    (r".*/(mag_head|phase_head)/w$",  P(None, "model")),
    (r".*/(mag_head|phase_head)/b$",  P("model")),
    (r".*",                           P()),
)
# fmt: on


def partition_spec_for(path: str, rules: Rules) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def tree_partition_specs(params: Any, rules: Rules) -> Any:
    """Pytree of PartitionSpec mirroring ``params``. Specs whose sharded
    dimension does not divide evenly fall back to replicated."""

    def spec_for(path: str, leaf: Any) -> P:
        spec = partition_spec_for(path, rules)
        # sanity: drop specs that don't fit the leaf's rank
        if len(spec) > getattr(leaf, "ndim", 0):
            return P()
        return spec

    return map_with_paths(spec_for, params)


def shard_params(params: Any, mesh: jax.sharding.Mesh, rules: Rules) -> Any:
    """Materialize params onto the mesh with NamedShardings."""
    specs = tree_partition_specs(params, rules)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )
