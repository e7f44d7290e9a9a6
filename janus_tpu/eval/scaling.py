"""Multi-chip scaling analysis for the sharded encode program.

The BASELINE target is ≥ 80 % frames/s scaling efficiency at N ≥ 2 hosts,
but this container attaches ONE real TPU v5e — wall-clock multi-chip
scaling cannot be measured here. This module measures what *can* be
measured without N chips, at every mesh size N:

- the exact per-device FLOP count of the compiled SPMD program
  (``Compiled.cost_analysis()``), and
- the exact GSPMD-inserted collective traffic (all-reduce / all-gather /
  reduce-scatter / collective-permute / all-to-all operand bytes, parsed
  from the optimized HLO),

and combines them with a TPU v5e roofline (peak bf16 FLOP/s, HBM and ICI
bandwidth — public chip specs) into a *modeled* weak-scaling efficiency:

    t_N  = max(flops_N / peak_flops, hbm_N / bw_hbm) + ici_N / bw_ici
    eff  = t_1 / t_N          (per-device work is held constant)

The collective-byte counts are real properties of the program that would
run on an N-chip mesh (GSPMD partitioning is device-count-exact, virtual
CPU devices compile the same comm pattern); only the time conversion is a
model. The reference has no analog — its transport is two peers on UDP
sockets (reference: backend/services/link_simulator.py:87-116).

Run: ``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
python -m janus_tpu.eval.scaling``
"""

from __future__ import annotations

import dataclasses
import json
import re
import sys
from typing import Dict, List, Optional, Sequence

import numpy as np

__all__ = ["V5eRoofline", "collective_bytes", "analyze_encode_scaling", "main"]


@dataclasses.dataclass(frozen=True)
class V5eRoofline:
    """Public TPU v5e per-chip peaks (Cloud TPU docs / scaling book)."""

    peak_bf16_flops: float = 197e12      # MXU bf16 FLOP/s
    hbm_bw: float = 819e9                # HBM B/s
    ici_bw: float = 9e10                 # B/s per chip (2 torus axes x 45 GB/s)
    mxu_util: float = 0.5                # achievable fraction of peak
    hbm_util: float = 0.8


_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

_COLL_OPS = r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
# array result: `bf16[8,1500,1280]{...} all-gather(` — sync, `-start`, or `-done`
_COLL_RE = re.compile(
    r"(\w+)\[([0-9,]*)\][^ ]*\s+" + _COLL_OPS + r"(-start|-done)?\(",
)
# async start with tuple result: `(bf16[..]{..}, bf16[..]{..}) all-gather-start(`
# — the LAST tuple element is the destination buffer
_COLL_TUPLE_RE = re.compile(
    r"\(([^()]*\])\)\s+" + _COLL_OPS + r"-start\(",
)
_SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")


def _shape_bytes(dtype: str, dims: str) -> int:
    if dtype not in _DTYPE_BYTES:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dtype]


def collective_bytes(hlo_text: str) -> Dict[str, int]:
    """Result bytes of every collective in optimized HLO, by op.

    Each async pair is counted once: via its ``-done`` result when
    present, else via its ``-start`` (array-shaped result, or the
    destination buffer — the last tuple element — of tuple-shaped
    starts). Synchronous forms count directly."""
    out: Dict[str, int] = {}
    done_seen: Dict[str, int] = {}
    starts: Dict[str, List[int]] = {}
    for dtype, dims, op, suffix in _COLL_RE.findall(hlo_text):
        if suffix == "-start":
            starts.setdefault(op, []).append(_shape_bytes(dtype, dims))
            continue
        out[op] = out.get(op, 0) + _shape_bytes(dtype, dims)
        if suffix == "-done":
            done_seen[op] = done_seen.get(op, 0) + 1
    for tup, op in _COLL_TUPLE_RE.findall(hlo_text):
        shapes = _SHAPE_RE.findall(tup)
        if shapes:
            dtype, dims = shapes[-1]
            starts.setdefault(op, []).append(_shape_bytes(dtype, dims))
    # count only starts beyond the dones already counted for that op
    for op, sizes in starts.items():
        extra = sizes[done_seen.get(op, 0):]
        if extra:
            out[op] = out.get(op, 0) + sum(extra)
    return out


def _modeled_time(flops: float, hbm: float, ici: float, rl: V5eRoofline) -> float:
    compute = max(flops / (rl.peak_bf16_flops * rl.mxu_util),
                  hbm / (rl.hbm_bw * rl.hbm_util))
    return compute + ici / rl.ici_bw


def analyze_encode_scaling(
    device_counts: Sequence[int] = (1, 2, 4, 8),
    seconds: float = 4.0,
    tp: int = 1,
    roofline: Optional[V5eRoofline] = None,
    cfg=None,
    per_device_batch: int = 8,
) -> List[Dict]:
    """Weak scaling of the fused semantic-encode program: per-device batch
    held at 8 phrases x ``seconds``; the ``data`` mesh axis grows with N
    (``tp`` > 1 carves a fixed tensor-parallel axis out of each N)."""
    import jax
    import jax.numpy as jnp

    from janus_tpu.common.config import JanusConfig, MeshConfig
    from janus_tpu.parallel.mesh import build_mesh
    from janus_tpu.runtime.codec import SemanticEncoder

    rl = roofline or V5eRoofline()
    base_cfg = cfg
    bucket = int(48_000 * seconds)
    rows: List[Dict] = []
    device_counts = sorted(set(device_counts) | {1})  # always keep the
    # N=1 baseline: efficiency is defined relative to a single chip, even
    # when tp > 1 (a tp>1 mesh can't run on 1 device, but the unsharded
    # program can)
    for n in device_counts:
        if n > len(jax.devices()) or (n > 1 and n % tp):
            continue
        cfg = base_cfg or JanusConfig()
        mesh = (build_mesh(MeshConfig(data=n // tp, model=tp, seq=1))
                if n > 1 else None)
        enc = SemanticEncoder(cfg, buckets=(bucket,), mesh=mesh)
        batch = per_device_batch * n
        audio = jnp.zeros((batch, bucket), dtype=jnp.float32)
        n_valid = jnp.full((batch,), bucket, dtype=jnp.int32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P("data"))
            audio = jax.device_put(audio, sh)
            n_valid = jax.device_put(n_valid, sh)
        # the exact serving program: same jit wrapper + frame budget as
        # SemanticEncoder.encode_batch, so cost analysis measures what runs
        n16 = enc.mel_frame_budget(bucket)
        compiled = (
            enc._encode_jit
            .lower(enc.params, audio, n_valid, n_16k_frames=n16)
            .compile()
        )
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        hbm = float(cost.get("bytes accessed", 0.0))
        coll = collective_bytes(compiled.as_text())
        ici = float(sum(coll.values()))
        rows.append({
            "devices": n,
            "tp": tp,
            "batch": batch,
            "per_device_flops": flops,
            "per_device_hbm_bytes": hbm,
            "collective_bytes": coll,
            "ici_bytes": ici,
            "modeled_step_s": _modeled_time(flops, hbm, ici, rl),
        })
    if rows:
        t1 = rows[0]["modeled_step_s"]
        for r in rows:
            r["modeled_weak_scaling_efficiency"] = round(
                t1 / r["modeled_step_s"], 4)
    return rows


def main(argv: Optional[list] = None) -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--out", default=None, help="write JSON artifact here")
    args = ap.parse_args(argv)

    rows = analyze_encode_scaling(seconds=args.seconds, tp=args.tp)
    for r in rows:
        print(
            f"N={r['devices']:>2} (tp={r['tp']}) batch={r['batch']:>3}  "
            f"flops/dev={r['per_device_flops']:.3g}  "
            f"ici={r['ici_bytes']:.3g}B  "
            f"eff={r['modeled_weak_scaling_efficiency']:.3f}",
            file=sys.stderr, flush=True,
        )
    payload = {"metric": "modeled_weak_scaling", "rows": rows}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
    largest = rows[-1]["devices"] if rows else 0
    print(json.dumps({
        "metric": f"modeled_weak_scaling_efficiency_at_{largest}",
        "value": rows[-1]["modeled_weak_scaling_efficiency"] if rows else None,
        "unit": "fraction",
        "devices": largest,
        "vs_baseline": (rows[-1]["modeled_weak_scaling_efficiency"] / 0.8
                        if rows else None),
    }))


if __name__ == "__main__":
    main()
