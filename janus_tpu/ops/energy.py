"""RMS energy extraction and categorical classification.

Matches the reference's full-buffer RMS and its Quiet/Normal/Loud cutoffs
(reference: backend/services/prosody.py:67-74). Batched over leading axes;
the classifier returns int codes so it stays inside jit — string tags are
applied host-side via :data:`ENERGY_TAGS`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rms_energy", "classify_energy", "ENERGY_TAGS", "energy_tag"]

ENERGY_TAGS = ("Quiet", "Normal", "Loud")


def rms_energy(x: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """Root-mean-square of ``[..., T]``; with an optional validity mask so a
    padded batch of phrases computes per-phrase RMS over true samples only."""
    x = x.astype(jnp.float32)
    if mask is None:
        return jnp.sqrt(jnp.mean(x * x, axis=-1))
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m, axis=-1), 1.0)
    return jnp.sqrt(jnp.sum(x * x * m, axis=-1) / denom)


def classify_energy(
    rms: jax.Array, quiet: float = 0.05, loud: float = 0.15
) -> jax.Array:
    """0=Quiet (<quiet), 1=Normal, 2=Loud (>=loud)
    (reference: backend/services/prosody.py:69-74)."""
    return jnp.where(rms < quiet, 0, jnp.where(rms < loud, 1, 2)).astype(jnp.int32)


def energy_tag(code: int) -> str:
    return ENERGY_TAGS[int(code)]
