"""Multi-head attention with KV caching.

The XLA path below is written so the two matmuls hit the MXU at full tile
size and the softmax stays in fp32. A Pallas flash-attention kernel
(``janus_tpu.ops.flash``) handles long encoder sequences; this module is
the semantics reference and the fallback for short/odd shapes.

Head-split layout is ``[..., heads, T, head_dim]`` everywhere, which is
also the axis tensor parallelism shards (heads ↔ "model" mesh axis).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["split_heads", "merge_heads", "attend", "KVCache", "causal_mask"]


def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """``[..., T, D] -> [..., H, T, D/H]``"""
    *lead, t, d = x.shape
    x = x.reshape(*lead, t, num_heads, d // num_heads)
    return jnp.moveaxis(x, -2, -3)


def merge_heads(x: jax.Array) -> jax.Array:
    """``[..., H, T, Dh] -> [..., T, H*Dh]``"""
    x = jnp.moveaxis(x, -3, -2)
    *lead, t, h, dh = x.shape
    return x.reshape(*lead, t, h * dh)


def causal_mask(q_len: int, k_len: int, offset: int = 0) -> jax.Array:
    """Boolean ``[q_len, k_len]``: query i attends keys j <= i + offset."""
    qi = jnp.arange(q_len)[:, None] + offset
    kj = jnp.arange(k_len)[None, :]
    return kj <= qi


def attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Scaled dot-product attention over ``[..., H, T, Dh]`` tensors.

    ``mask`` broadcasts against ``[..., H, Tq, Tk]``; True = attend.
    Softmax runs in fp32; output returns to q.dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "...htd,...hsd->...hts", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "...hts,...hsd->...htd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


class KVCache(NamedTuple):
    """Static-shape decode cache: ``k``/``v`` are ``[..., H, T_max, Dh]``,
    ``length`` is the per-sequence fill count ``[...]`` (int32).

    Fixed capacity keeps every decode step the same compiled program —
    the autoregressive loop is a ``lax.while_loop`` with zero reshapes.
    Unfilled slots hold zeros and are masked out of attention.
    """

    k: jax.Array
    v: jax.Array
    length: jax.Array

    @classmethod
    def create(
        cls,
        batch_shape: Tuple[int, ...],
        num_heads: int,
        max_len: int,
        head_dim: int,
        dtype=jnp.bfloat16,
    ) -> "KVCache":
        shape = batch_shape + (num_heads, max_len, head_dim)
        return cls(
            k=jnp.zeros(shape, dtype=dtype),
            v=jnp.zeros(shape, dtype=dtype),
            length=jnp.zeros(batch_shape, dtype=jnp.int32),
        )

    def append(self, k_new: jax.Array, v_new: jax.Array) -> "KVCache":
        """Write ``[..., H, T_new, Dh]`` at the fill point, advance length.

        General path: per-lane fill points (one-hot scatter-add, which
        works under vmap where dynamic_update_slice's scalar start cannot).
        The lockstep decode loops use :meth:`append_lockstep` instead.

        Capacity contract: writes past ``t_max`` are dropped (the one-hot
        of an out-of-range position is all-zero) while ``length`` still
        advances — callers must size ``t_max`` to their decode budget, as
        ``greedy_decode``/``tts_generate`` do.
        """
        t_max = self.k.shape[-2]
        t_new = k_new.shape[-2]
        pos = self.length[..., None] + jnp.arange(t_new)  # [..., T_new]
        onehot = jax.nn.one_hot(pos, t_max, dtype=jnp.float32)  # [..., T_new, T_max]
        k = self.k + jnp.einsum(
            "...hnd,...nm->...hmd", k_new.astype(jnp.float32), onehot
        ).astype(self.k.dtype)
        v = self.v + jnp.einsum(
            "...hnd,...nm->...hmd", v_new.astype(jnp.float32), onehot
        ).astype(self.v.dtype)
        return KVCache(k=k, v=v, length=self.length + t_new)

    def append_lockstep(self, k_new: jax.Array, v_new: jax.Array) -> "KVCache":
        """Fast-path append when every batch lane is at the same fill point
        (true in greedy/AR decode loops, where lanes advance together):
        one ``dynamic_update_slice`` instead of the one-hot contraction —
        O(T_new) writes instead of O(T_max) MACs per step."""
        t_new = k_new.shape[-2]
        start = self.length.reshape(-1)[0]  # scalar; lanes are in lockstep
        zeros = [jnp.int32(0)] * (self.k.ndim - 2)
        idx = (*zeros, start, jnp.int32(0))
        k = jax.lax.dynamic_update_slice(self.k, k_new.astype(self.k.dtype), idx)
        v = jax.lax.dynamic_update_slice(self.v, v_new.astype(self.v.dtype), idx)
        return KVCache(k=k, v=v, length=self.length + t_new)

    def valid_mask(self, q_len: int, causal: bool = True) -> jax.Array:
        """Attention mask ``[..., 1, q_len, T_max]`` for queries appended at
        the end of the filled region (post-append ``length`` assumed)."""
        t_max = self.k.shape[-2]
        kj = jnp.arange(t_max)
        filled = kj[None, :] < self.length[..., None, None]  # [..., 1, T_max]
        if not causal:
            return filled[..., None, :, :]
        qi = self.length[..., None, None] - q_len + jnp.arange(q_len)[:, None]
        mask = (kj[None, :] <= qi) & filled
        return mask[..., None, :, :]
