"""Platform selection guard.

This container's PJRT bootstrap registers the TPU plugin at interpreter
start and re-asserts ``jax_platforms`` through ``jax.config``, which makes
a plain ``JAX_PLATFORMS=cpu`` environment override silently ineffective.
Every CLI entry point calls :func:`apply_env_platform` so the user's
environment choice actually wins.
"""

from __future__ import annotations

import os

__all__ = ["apply_env_platform", "enable_compile_cache"]


def enable_compile_cache(min_compile_secs: float = 1.0) -> str:
    """Point JAX at the repo-level persistent compilation cache
    (``$JANUS_COMPILE_CACHE``, default ``<repo>/.jax_cache``) and return
    the directory. First compiles through the remote-compile tunnel cost
    minutes; every CLI entry point (bench, tools) shares this one cache."""
    import jax

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    cache_dir = os.environ.get(
        "JANUS_COMPILE_CACHE", os.path.join(repo_root, ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return cache_dir


def apply_env_platform() -> None:
    """Re-assert the JAX_PLATFORMS env var through jax.config (no-op when
    the variable is unset)."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass
