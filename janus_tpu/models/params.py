"""Parameter-tree utilities.

Models in janus_tpu are pure functions over nested-dict parameter pytrees
(``{"encoder": {"blocks": [{"attn": {"q": {"w": ..., "b": ...}}}]}}``).
No module framework: initializers build the tree, ``apply`` functions
consume it. Path-aware helpers below drive sharding-rule matching and
weight import.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "stack_layer_params",
    "KeyGen",
    "normal_init",
    "flatten_with_paths",
    "unflatten_from_paths",
    "map_with_paths",
    "param_count",
    "cast_floating",
]


class KeyGen:
    """Splits a PRNG key on demand: ``kg = KeyGen(key); kg()`` → fresh key."""

    def __init__(self, key: jax.Array | int):
        if isinstance(key, int):
            key = jax.random.PRNGKey(key)
        self._key = key

    def __call__(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub


def normal_init(key: jax.Array, shape, scale: float = 0.02, dtype=jnp.float32):
    return scale * jax.random.normal(key, shape, dtype=dtype)


def flatten_with_paths(tree: Any, prefix: str = "") -> Iterator[Tuple[str, Any]]:
    """Yield ``('encoder/blocks/0/attn/q/w', array)`` pairs."""
    if isinstance(tree, dict):
        for k in tree:
            yield from flatten_with_paths(tree[k], f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from flatten_with_paths(v, f"{prefix}{i}/")
    else:
        yield prefix[:-1], tree


def unflatten_from_paths(pairs: Dict[str, Any]) -> Any:
    """Inverse of :func:`flatten_with_paths` (lists re-materialized from
    integer path segments)."""
    root: Dict[str, Any] = {}
    for path, value in pairs.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def map_with_paths(fn: Callable[[str, Any], Any], tree: Any, prefix: str = "") -> Any:
    """Structure-preserving map where ``fn`` sees the slash-joined path."""
    if isinstance(tree, dict):
        return {k: map_with_paths(fn, v, f"{prefix}{k}/") for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        t = type(tree)
        return t(map_with_paths(fn, v, f"{prefix}{i}/") for i, v in enumerate(tree))
    return fn(prefix[:-1], tree)


def param_count(tree: Any) -> int:
    return sum(int(np.prod(a.shape)) for _, a in flatten_with_paths(tree))


def cast_floating(tree: Any, dtype) -> Any:
    """Cast floating leaves only (int embeddings/indices untouched)."""

    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree.map(cast, tree)


def stack_layer_params(blocks) -> Any:
    """List of per-layer param trees → one tree with a leading layer axis,
    the layout ``lax.scan``-over-layers consumes (used by the ASR and TTS
    scan paths). Stack ONCE per forward program, outside any decode loop —
    re-stacking inside a while_loop body relies on XLA hoisting a full
    weight copy out of the loop."""
    import jax as _jax
    import jax.numpy as _jnp

    return _jax.tree.map(lambda *leaves: _jnp.stack(leaves), *blocks)
