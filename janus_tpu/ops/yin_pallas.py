"""Pallas TPU kernel for the YIN block-sum correlation.

The serving YIN path (:func:`janus_tpu.ops.yin._track_difference`)
decomposes every analysis window's difference function into hop-aligned
block sums of the shifted product:

    bs[b, blk, τ] = Σ_{i<hop} x[b, blk·hop + i] · x[b, blk·hop + τ + i]

The XLA formulation computes this with one shifted dynamic-slice of the
whole signal **per lag** — exact, but ~n_lags_out re-reads of the signal
(~2 GB of effective HBM traffic at flagship batch for a ~1 ms-of-math
problem; ROOFLINE §2 put the r4 kernel at 29 ms on a ~1 ms floor).

This kernel inverts the loop structure: each grid program holds a tile of
``TILE_BLK`` frame-aligned signal rows in VMEM (``x4[blk] =
x[blk·hop : blk·hop + span]``, built once by XLA as a strided reshape)
and iterates over the ``hop`` in-window offsets, accumulating **all lags
at once** with one dynamically-sliced row read per offset:

    acc[blk, τ] += x4[blk, i] · x4[blk, i + τ]   for all τ, one i per step

HBM traffic: the framed signal once in, the block sums once out. The lag
axis lives on VMEM lanes for the whole accumulation. Numerically the same
f32 sum as the XLA path (identical term order over i), asserted in
tests/test_ops_yin.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["block_sums"]

_LANE = 128
_TILE_BLK = 64


def _kernel(x4_ref, o_ref, *, hop: int, tau_pad: int):
    x4 = x4_ref[0]                                   # [TILE, span_pad]
    tile = x4.shape[0]
    # STATIC unroll over the in-window offsets: Mosaic only lowers
    # lane-axis slices with statically-known offsets (dynamic lane offsets
    # must be provably 128-aligned); hop is a compile-time constant, so
    # each iteration is a static slice + FMA over the whole lag tile.
    # Accumulate in groups so the live temporary chain stays bounded
    # (one long unrolled sum chain blew the 16 MB scoped-VMEM stack).
    group = 16
    acc = jnp.zeros((tile, tau_pad), jnp.float32)
    for g0 in range(0, hop, group):
        part = jnp.zeros((tile, tau_pad), jnp.float32)
        for i in range(g0, min(g0 + group, hop)):
            part = part + x4[:, i : i + 1] * x4[:, i : i + tau_pad]
        acc = acc + part
    o_ref[0] = acc


@functools.partial(jax.jit,
                   static_argnames=("nblk", "hop", "n_lags_out", "interpret"))
def block_sums(padded: jax.Array, nblk: int, hop: int, n_lags_out: int,
               interpret: bool = False) -> jax.Array:
    """``padded[..., T] → bs[..., nblk, tau_pad]`` (``tau_pad ≥ n_lags_out``,
    callers slice). ``padded`` is the aubio slide-block stream layout
    (see ``yin._pad_stream``); requires ``T ≥ nblk·hop``."""
    batch = padded.shape[:-1]
    b = 1
    for s in batch:
        b *= s
    x = padded.reshape(b, padded.shape[-1]).astype(jnp.float32)

    tau_pad = -(-n_lags_out // _LANE) * _LANE
    # row blk must expose x[blk·hop + i + τ] for i < hop, τ < tau_pad
    span = hop - 1 + tau_pad
    span_pad = -(-span // _LANE) * _LANE
    n_tiles = -(-nblk // _TILE_BLK)
    rows = n_tiles * _TILE_BLK

    # frame-aligned rows via ONE strided reshape: row blk = frames
    # blk..blk+f_need-1 of a hop-framed view, then lane-pad to span_pad
    f_need = -(-span_pad // hop)
    total_needed = (rows - 1 + f_need) * hop
    t = x.shape[-1]
    if t < total_needed:
        x = jnp.pad(x, ((0, 0), (0, total_needed - t)))
    frames = x[:, : (rows - 1 + f_need) * hop].reshape(b, -1, hop)
    x4 = jnp.concatenate(
        [frames[:, m : m + rows, :] for m in range(f_need)], axis=-1
    )[..., :span_pad]                                 # [b, rows, span_pad]

    out = pl.pallas_call(
        functools.partial(_kernel, hop=hop, tau_pad=tau_pad),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, _TILE_BLK, span_pad), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, _TILE_BLK, tau_pad), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, rows, tau_pad), jnp.float32),
        interpret=interpret,
    )(x4)
    return out[:, :nblk, :].reshape(*batch, nblk, tau_pad)
