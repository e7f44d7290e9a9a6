"""Per-stage on-chip profile of the fused encode program.

Times each stage of :meth:`SemanticEncoder._encode_impl` as its own jitted
program (prosody/YIN, decimate+mel, encoder, greedy decode) with the
amortized-K timing methodology (the remote tunnel's block_until_ready is
unreliable — see CLAUDE.md), so optimization effort goes where the
milliseconds are. The reference had no profiler at all (SURVEY §5);
the in-process analog is :mod:`janus_tpu.runtime.profiling`.

Usage: ``python -m janus_tpu.tools.encode_profile [--batch 8] [--seconds 10]``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _timed(fn, args, fetch, k=10, reps=3):
    """Best amortized seconds/step over reps groups of k chained calls."""
    import jax.numpy as jnp

    fn(*args)  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--flagship", action="store_true",
                    help="large-v3 geometry instead of the default tiny")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from janus_tpu.common.platform import enable_compile_cache

    enable_compile_cache()

    from janus_tpu.common.config import ASRConfig, JanusConfig
    from janus_tpu.models import asr as asr_mod
    from janus_tpu.models.params import cast_floating
    from janus_tpu.models.tokenizer import ByteTokenizer
    from janus_tpu.ops.energy import rms_energy
    from janus_tpu.ops.resample import decimate_48k_to_16k
    from janus_tpu.ops.yin import yin_track

    cfg = JanusConfig()
    if args.flagship:
        import dataclasses

        cfg = dataclasses.replace(cfg, asr=ASRConfig.large_v3())
    cfg = cfg.override(**{"asr.max_decode_tokens": 24})
    acfg, pcfg = cfg.asr, cfg.prosody

    dev = jax.devices()[0]
    log(f"device: {dev} geometry d={acfg.d_model} L={acfg.encoder_layers}")

    bucket = int(48_000 * args.seconds)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((args.batch, bucket)).astype(np.float32) * 0.1)
    audio_s = args.batch * args.seconds

    tok = ByteTokenizer()
    params = cast_floating(asr_mod.init_asr(0, acfg), jnp.dtype(acfg.dtype))
    scan = acfg.scan_layers

    from janus_tpu.runtime.codec import mel_frame_budget

    n16 = mel_frame_budget(acfg, bucket)  # same program as serving

    stages = {}

    if pcfg.yin_rate == 16_000:
        # serving path: YIN on the anti-aliased 16 kHz stream
        # (ProsodyConfig.yin_rate; docs/PARITY.md prosody row)
        audio16_for_yin = jax.jit(decimate_48k_to_16k)(audio)
        yin_fn = jax.jit(lambda a: yin_track(
            a, 16_000, pcfg.yin_window_16k, pcfg.yin_hop_16k,
            pcfg.yin_tolerance, fmin=pcfg.fmin_hz, fmax=pcfg.fmax_hz))
        yin_args = (audio16_for_yin,)
    else:
        yin_fn = jax.jit(lambda a: yin_track(
            a, cfg.audio.sample_rate, pcfg.yin_window, pcfg.hop,
            pcfg.yin_tolerance, fmin=pcfg.fmin_hz, fmax=pcfg.fmax_hz))
        yin_args = (audio,)
    stages["yin"] = _timed(
        yin_fn, yin_args, lambda o: float(jnp.asarray(o)[0, 0]))

    rms_fn = jax.jit(lambda a: rms_energy(a, None))
    stages["rms"] = _timed(
        rms_fn, (audio,), lambda o: float(jnp.asarray(o)[0]))

    mel_fn = jax.jit(lambda a: asr_mod.prepare_mel(
        decimate_48k_to_16k(a), acfg, pad_to_frames=n16))
    stages["decimate+mel"] = _timed(
        mel_fn, (audio,), lambda o: float(jnp.asarray(o)[0, 0, 0]))

    mel = mel_fn(audio)
    enc_fn = jax.jit(lambda w, m: asr_mod.encode_audio(
        w, acfg, m.astype(jnp.dtype(acfg.dtype)), scan_layers=scan))
    stages["encoder"] = _timed(
        enc_fn, (params, mel), lambda o: float(jnp.asarray(o)[0, 0, 0]))

    enc = enc_fn(params, mel)
    prompt = jnp.broadcast_to(
        jnp.asarray(tok.sot_sequence(), dtype=jnp.int32),
        (args.batch, len(tok.sot_sequence())))
    dec_fn = jax.jit(lambda w, e, p: asr_mod.greedy_decode(
        w, acfg, e, p, tok.eot, max_new=acfg.max_decode_tokens,
        scan_layers=scan))
    stages["greedy_decode"] = _timed(
        dec_fn, (params, enc, prompt), lambda o: int(jnp.asarray(o)[0, 0]), k=5)

    total = sum(stages.values())
    for name, s in stages.items():
        log(f"{name:>14}: {s*1e3:8.2f} ms  ({100*s/total:5.1f}%)  "
            f"rtf={s/audio_s:.6f}")
    log(f"{'sum':>14}: {total*1e3:8.2f} ms  rtf={total/audio_s:.6f}")
    print(json.dumps({
        "metric": "encode_stage_profile",
        "stages_ms": {k: round(v * 1e3, 2) for k, v in stages.items()},
        "sum_rtf": round(total / audio_s, 6),
        "batch": args.batch, "seconds": args.seconds,
        "flagship": bool(args.flagship), "platform": dev.platform,
    }))


if __name__ == "__main__":
    main()
