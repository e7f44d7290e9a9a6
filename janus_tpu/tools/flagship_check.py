"""On-chip validation of the flagship (large-v3-class) encoder.

The reference runs Whisper ``base.en`` through CTranslate2 on CPU
(reference: backend/services/transcriber.py:23-27); the framework's
flagship geometry is large-v3 (635M-param encoder). A straight-line
32-layer unrolled compile previously overwhelmed the remote-compile
tunnel, so this check compiles the ``scan_layers`` variant — one block
body under ``lax.scan`` — which is the supported path for deep models.

Usage::

    python -m janus_tpu.tools.flagship_check [--layers N] [--batch B]

Prints one JSON line: compile seconds, step milliseconds, encode RTF.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=None,
                    help="override encoder layer count (default: full 32)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--frames", type=int, default=3000,
                    help="mel frames (3000 = canonical 30 s window)")
    ap.add_argument("--decode", action="store_true",
                    help="also run KV-cached greedy decode (scan decoder)")
    ap.add_argument("--int8", action="store_true",
                    help="per-channel int8 weights (reference STT parity: "
                         "CTranslate2 compute_type='int8')")
    ap.add_argument("--max-new", type=int, default=16)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from janus_tpu.common.platform import enable_compile_cache

    enable_compile_cache()

    from janus_tpu.common.config import ASRConfig
    from janus_tpu.models import asr

    dev = jax.devices()[0]
    log(f"device: {dev} (platform={dev.platform})")

    cfg = ASRConfig.large_v3()
    if args.layers is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, encoder_layers=args.layers)
    log(f"geometry: d_model={cfg.d_model} layers={cfg.encoder_layers} "
        f"heads={cfg.num_heads} n_mels={cfg.n_mels}")

    t0 = time.time()
    params = asr.init_asr(0, cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    if args.int8:
        from janus_tpu.ops.quant import quantize_tree

        params = quantize_tree(params)
    enc_params = {"encoder": params["encoder"]}
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(enc_params))
    log(f"encoder params: {n_params/1e6:.1f}M (bf16, {time.time()-t0:.1f}s init)")

    fn = jax.jit(lambda p, m: asr.encode_audio(p, cfg, m, scan_layers=True))
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((args.batch, args.frames, cfg.n_mels)),
        dtype=jnp.bfloat16)

    log("compiling encoder (scan_layers)...")
    t0 = time.time()
    out = fn(enc_params, mel)
    out.block_until_ready()
    compile_s = time.time() - t0
    log(f"compile+first-run: {compile_s:.1f}s, out shape {out.shape}")

    # Through the remote-device tunnel block_until_ready can return before
    # the step truly finishes; amortize K chained steps per sync and force a
    # host fetch of a data-dependent scalar so the timing is honest.
    def timed(k: int = 10) -> float:
        t0 = time.perf_counter()
        acc = None
        for _ in range(k):
            acc = fn(enc_params, mel)
        _ = float(jnp.asarray(acc)[0, 0, 0])  # host fetch = hard sync
        return (time.perf_counter() - t0) / k

    timed(2)  # warm the dispatch path
    times = [timed() for _ in range(3)]
    for i, t in enumerate(times):
        log(f"iter-group {i}: {t*1e3:.1f} ms/step (10-step amortized)")
    step_ms = min(times) * 1e3
    audio_s = args.batch * args.frames * cfg.hop_length / 16_000
    result = {
        "metric": "flagship_encode_rtf",
        "value": round(min(times) / audio_s, 6),
        "unit": "compute_s_per_audio_s",
        "geometry": f"large-v3/{cfg.encoder_layers}L",
        "params_m": round(n_params / 1e6, 1),
        "compile_s": round(compile_s, 1),
        "step_ms": round(step_ms, 1),
        "platform": dev.platform,
    }

    if args.decode:
        dec_params = params
        dfn = jax.jit(lambda p, m, pr: asr.transcribe_mel(
            p, cfg, m, pr, eot_id=50257, max_new=args.max_new,
            scan_layers=True))
        prompt = jnp.zeros((args.batch, 1), dtype=jnp.int32)
        log("compiling full transcribe (scan enc+dec)...")
        t0 = time.time()
        toks = dfn(dec_params, mel, prompt)
        toks.block_until_ready()
        result["transcribe_compile_s"] = round(time.time() - t0, 1)
        def timed_dec(k: int = 5) -> float:
            t0 = time.perf_counter()
            acc = None
            for _ in range(k):
                acc = dfn(dec_params, mel, prompt)
            _ = int(jnp.asarray(acc)[0, 0])
            return (time.perf_counter() - t0) / k

        timed_dec(1)
        ts = [timed_dec() for _ in range(3)]
        for i, t in enumerate(ts):
            log(f"transcribe iter-group {i}: {t*1e3:.1f} ms (5-step amortized)")
        result["transcribe_rtf"] = round(min(ts) / audio_s, 6)

    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
