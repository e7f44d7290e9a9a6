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
    cache_dir = os.environ.get(
        "JANUS_COMPILE_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
