"""Benchmark: encode-side real-time factor per chip.

Runs the fused semantic-encode program (anti-aliased decimation + log-mel
+ Whisper-class encoder + KV-cached greedy decode + YIN + RMS) on a batch
of synthetic 48 kHz phrases and reports compute seconds per audio second.

The reference never measured RTF (BASELINE.md: "not published"); the
framework target is RTF < 0.1 per chip, so ``vs_baseline`` is reported as
``0.1 / rtf`` (>1 means better than target).

Prints exactly one JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: first-compile through the remote tunnel
    # costs ~9 min; subsequent runs (e.g. the driver's) hit the cache.
    from janus_tpu.common.platform import enable_compile_cache

    enable_compile_cache()

    from janus_tpu.common.config import JanusConfig
    from janus_tpu.runtime.codec import SemanticEncoder
    from janus_tpu.audio.synthetic import voiced_phrase

    platform = jax.devices()[0].platform
    log(f"devices: {jax.devices()} (platform={platform})")

    cfg = JanusConfig()  # flagship tiny ASR geometry, full 80-mel frontend
    cfg = cfg.override(**{"asr.max_decode_tokens": 24})
    enc = SemanticEncoder(cfg, buckets=(48_000 * 10,))

    batch = 8
    seconds = 10.0
    phrases = [
        voiced_phrase(f0=140.0 + 15 * i, seconds=seconds, amp=0.12, seed=i)
        for i in range(batch)
    ]
    audio_seconds = batch * seconds

    log("compiling + warmup...")
    t0 = time.time()
    enc.encode_batch(phrases)
    log(f"warmup done in {time.time() - t0:.1f}s")

    iters = 5
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        enc.encode_batch(phrases)
        dt = time.perf_counter() - t0
        times.append(dt)
        log(f"iter {i}: {dt*1e3:.1f} ms  rtf={dt/audio_seconds:.5f}")

    best = min(times)
    rtf = best / audio_seconds
    result = {
        "metric": "encode_rtf_per_chip",
        "value": round(rtf, 6),
        "unit": "compute_s_per_audio_s",
        "vs_baseline": round(0.1 / rtf, 3),
        "platform": platform,
        "batch": batch,
        "phrase_seconds": seconds,
    }

    # Optional decode-side benchmark (KV-cached TTS sampling + vocoder at a
    # fixed frame budget so the workload is deterministic regardless of the
    # stop head). Adds a second large compile — opt-in.
    if os.environ.get("JANUS_BENCH_DECODE") == "1":
        import jax.numpy as jnp

        from janus_tpu.models import tts as tts_mod
        from janus_tpu.models import vocoder as voc_mod
        from janus_tpu.models.tokenizer import ByteTokenizer

        tok = ByteTokenizer()
        tts_params = tts_mod.init_tts(0, cfg.tts, text_vocab=tok.vocab_size)
        voc_params = voc_mod.init_vocoder(1, cfg.vocoder, n_mels=cfg.tts.n_mels)
        dec_batch = 8
        max_groups = 256  # 512 mel frames ≈ 5.5 s at 24 kHz hop 256

        @jax.jit
        def decode(tp, vp, text_ids, emo):
            # params as traced args (closure capture would inline them as
            # HLO constants — see codec._encode_impl)
            mel, _ = tts_mod.tts_generate(
                tp, cfg.tts, text_ids, emo, max_groups=max_groups,
                text_vocab=tok.vocab_size, stop_threshold=2.0,  # never stop
            )
            return voc_mod.vocoder_waveform(vp, cfg.vocoder, mel)

        text = jnp.zeros((dec_batch, 64), dtype=jnp.int32)
        emo = jnp.zeros((dec_batch,), dtype=jnp.int32)
        log("decode: compiling...")
        t0 = time.time()
        decode(tts_params, voc_params, text, emo).block_until_ready()
        log(f"decode warmup {time.time()-t0:.1f}s")
        dts = []
        gen_seconds = (
            dec_batch * max_groups * cfg.tts.reduction * cfg.vocoder.hop_length
            / cfg.vocoder.sample_rate
        )
        for i in range(3):
            t0 = time.perf_counter()
            decode(tts_params, voc_params, text, emo).block_until_ready()
            dts.append(time.perf_counter() - t0)
            log(f"decode iter {i}: {dts[-1]*1e3:.1f} ms "
                f"rtf={dts[-1]/gen_seconds:.5f}")
        result["decode_rtf_per_chip"] = round(min(dts) / gen_seconds, 6)
        result["codec_rtf_per_chip"] = round(
            rtf + min(dts) / gen_seconds, 6
        )

    # Optional concurrent-session scaling: encode throughput vs batch size
    # (the BASELINE "concurrent sessions/s" axis). Opt-in: extra compiles.
    if os.environ.get("JANUS_BENCH_SESSIONS") == "1":
        sess_seconds = 2.0
        scaling = {}
        for b in (1, 8, 32, 64):
            ph = [
                voiced_phrase(f0=150.0 + 3 * i, seconds=sess_seconds,
                              amp=0.12, seed=i)
                for i in range(b)
            ]
            enc.encode_batch(ph)  # compile + warm
            t0 = time.perf_counter()
            iters = 3
            for _ in range(iters):
                enc.encode_batch(ph)
            dt = (time.perf_counter() - t0) / iters
            scaling[str(b)] = round(b * sess_seconds / dt, 1)  # audio-s/s
            log(f"batch {b}: {dt*1e3:.1f} ms -> {scaling[str(b)]} audio-s/s")
        result["session_scaling_audio_s_per_s"] = scaling

    # Optional flagship benchmark: the large-v3 geometry (635M-param
    # encoder, 32+32 layers, scan_layers) through the same fused encode
    # path. Opt-in: ~1 min of extra on-chip compiles.
    if os.environ.get("JANUS_BENCH_FLAGSHIP") == "1":
        from janus_tpu.common.config import ASRConfig

        import dataclasses

        fcfg = dataclasses.replace(JanusConfig(), asr=ASRConfig.large_v3())
        fcfg = fcfg.override(**{"asr.max_decode_tokens": 24})
        fenc = SemanticEncoder(fcfg, buckets=(48_000 * 10,))
        log("flagship: compiling large-v3 encode path...")
        t0 = time.time()
        fenc.encode_batch(phrases)
        log(f"flagship warmup {time.time()-t0:.1f}s")
        fts = []
        for i in range(3):
            t0 = time.perf_counter()
            fenc.encode_batch(phrases)
            fts.append(time.perf_counter() - t0)
            log(f"flagship iter {i}: {fts[-1]*1e3:.1f} ms "
                f"rtf={fts[-1]/audio_seconds:.5f}")
        result["flagship_encode_rtf_per_chip"] = round(
            min(fts) / audio_seconds, 6)

    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
