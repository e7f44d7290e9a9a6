"""Platform selection guard.

This container's PJRT bootstrap registers the TPU plugin at interpreter
start and re-asserts ``jax_platforms`` through ``jax.config``, which makes
a plain ``JAX_PLATFORMS=cpu`` environment override silently ineffective.
Every CLI entry point calls :func:`apply_env_platform` so the user's
environment choice actually wins.
"""

from __future__ import annotations

import os

__all__ = ["apply_env_platform"]


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
