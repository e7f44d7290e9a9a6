"""Benchmark: semantic-codec real-time factors per chip.

Primary metric: encode RTF (anti-aliased decimation + log-mel +
Whisper-class encoder + KV-cached greedy decode + YIN + RMS, one fused
jitted program). The reference never measured RTF (BASELINE.md: "not
published"); the framework target is RTF < 0.1 per chip, so
``vs_baseline`` is ``0.1 / rtf`` (>1 = better than target).

Default run also records (each section fails soft, so a tunnel hiccup in
an extra never loses the core metric):
- decode RTF (KV-cached TTS sampling + vocoder) and the full-codec sum
- int8 encode RTF (per-channel int8 weights — the reference ran its
  recognizer int8: reference backend/services/transcriber.py:26)
- concurrent-session scaling (encode audio-s/s at batch 1/8/32/64)
- runtime-overlap speedup: SessionManager serving 32 sessions with
  double-buffered VAD + async encode dispatch vs fully synchronous ticks
- flagship (large-v3, 635M encoder, scan-over-layers) encode RTF

``JANUS_BENCH_FAST=1`` runs only the core metric;
``JANUS_BENCH_SKIP=decode,int8,sessions,overlap,flagship`` skips
individual sections.

Timing note: values are min-of-N (N in each section) because dispatch
through the remote-device tunnel has high variance (driver-observed
941→2395 ms for identical iterations); min is the honest steady-state
compute estimate. Prints exactly ONE JSON line on stdout; diagnostics go
to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _skip(section: str) -> bool:
    if os.environ.get("JANUS_BENCH_FAST") == "1":
        return True
    skips = os.environ.get("JANUS_BENCH_SKIP", "")
    return section in {s.strip() for s in skips.split(",") if s.strip()}


def _section(result: dict, name: str, fn) -> None:
    if _skip(name):
        log(f"[{name}] skipped")
        return
    t0 = time.time()
    try:
        fn(result)
        log(f"[{name}] done in {time.time()-t0:.1f}s")
    except Exception as e:  # never lose the core metric to an extra
        log(f"[{name}] FAILED: {type(e).__name__}: {e}")
        result.setdefault("failed_sections", []).append(name)


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: first-compile through the remote tunnel
    # costs ~9 min; subsequent runs (e.g. the driver's) hit the cache.
    from janus_tpu.common.platform import enable_compile_cache

    enable_compile_cache()

    from janus_tpu.audio.synthetic import voiced_phrase
    from janus_tpu.common.config import JanusConfig
    from janus_tpu.runtime.codec import SemanticEncoder

    platform = jax.devices()[0].platform
    log(f"devices: {jax.devices()} (platform={platform})")

    cfg = JanusConfig()  # tiny ASR geometry, full 80-mel frontend
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
        "timing": "min_of_n (tunnel dispatch variance; see bench.py docstring)",
        "iter_ms_all": [round(t * 1e3, 1) for t in times],
    }

    # -- decode: KV-cached TTS sampling + vocoder at a fixed frame budget --
    def bench_decode(result):
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
            result["value"] + min(dts) / gen_seconds, 6
        )

    # -- int8: per-channel int8 weights through the same encode program ----
    def bench_int8(result):
        from janus_tpu.models import asr as asr_mod
        from janus_tpu.ops.quant import quantize_tree

        q_params = quantize_tree(asr_mod.init_asr(0, cfg.asr))
        qenc = SemanticEncoder(cfg, asr_params=q_params,
                               buckets=(48_000 * 10,))
        log("int8: compiling...")
        t0 = time.time()
        qenc.encode_batch(phrases)
        log(f"int8 warmup {time.time()-t0:.1f}s")
        qts = []
        for i in range(5):
            t0 = time.perf_counter()
            qenc.encode_batch(phrases)
            qts.append(time.perf_counter() - t0)
            log(f"int8 iter {i}: {qts[-1]*1e3:.1f} ms "
                f"rtf={qts[-1]/audio_seconds:.5f}")
        result["int8_encode_rtf_per_chip"] = round(min(qts) / audio_seconds, 6)
        result["int8_vs_bf16"] = round(result["value"] / (min(qts) / audio_seconds), 3)

    def _retry(fn, tries=3, label=""):
        """The remote-compile tunnel 500s sporadically; retry compiles."""
        for attempt in range(tries):
            try:
                return fn()
            except Exception as e:
                if attempt == tries - 1:
                    raise
                log(f"retry {label} after: {type(e).__name__}: {e}")
                time.sleep(5.0)

    # -- sessions: encode throughput vs concurrent batch size --------------
    def bench_sessions(result):
        sess_seconds = 2.0
        scaling = {}
        for b in (1, 8, 32, 64):
            ph = [
                voiced_phrase(f0=150.0 + 3 * i, seconds=sess_seconds,
                              amp=0.12, seed=i)
                for i in range(b)
            ]
            _retry(lambda: enc.encode_batch(ph), label=f"sessions b={b}")
            t0 = time.perf_counter()
            it = 3
            for _ in range(it):
                enc.encode_batch(ph)
            dt = (time.perf_counter() - t0) / it
            scaling[str(b)] = round(b * sess_seconds / dt, 1)  # audio-s/s
            log(f"batch {b}: {dt*1e3:.1f} ms -> {scaling[str(b)]} audio-s/s")
        result["session_scaling_audio_s_per_s"] = scaling

    # -- overlap: double-buffered serving loop vs synchronous --------------
    def bench_overlap(result):
        from janus_tpu.audio.synthetic import conversation
        from janus_tpu.runtime.sessions import SessionManager

        # Micro: pipelined encode dispatch (submit window 2) vs serial
        # encode_batch calls — isolates the async-dispatch overlap (batch
        # N's device time hidden behind batch N+1's host prep + dispatch).
        k, window = 8, 2
        groups = [
            [voiced_phrase(f0=140.0 + 5 * (g * 4 + i), seconds=2.0,
                           amp=0.12, seed=g * 4 + i) for i in range(8)]
            for g in range(k)
        ]
        penc = SemanticEncoder(cfg, buckets=(48_000 * 2,))
        _retry(lambda: penc.encode_batch(groups[0]), label="overlap warm")
        t0 = time.perf_counter()
        for g in groups:
            penc.encode_batch(g)
        t_serial = time.perf_counter() - t0
        t0 = time.perf_counter()
        pend = []
        for g in groups:
            pend.append(penc.encode_batch_submit(g))
            while len(pend) > window:
                pend.pop(0).result()
        for p in pend:
            p.result()
        t_pipe = time.perf_counter() - t0
        result["encode_pipeline_speedup"] = round(t_serial / t_pipe, 3)
        log(f"encode pipelining: serial {t_serial:.2f}s vs windowed "
            f"{t_pipe:.2f}s -> {t_serial/t_pipe:.2f}x")

        # Macro: the full serving tick loop at 32 sessions. Text is
        # injected at the host-decode hook so packet assembly runs (the
        # untrained demo ASR would emit empty transcripts and no packets).
        class _FixedText(SemanticEncoder):
            def _finalize(self, arrays, b_real):
                out = super()._finalize(arrays, b_real)
                for r in out:
                    r["text"] = "status report follows"
                return out

        n_sessions = 32
        # staggered turn boundaries -> encode batches land on different
        # ticks, which is what the overlap window pipelines
        streams = [
            conversation(
                turns=2, speech_seconds=0.8 + 0.05 * (i % 8),
                silence_seconds=0.7, f0=130.0 + 4 * i, amp=0.3, seed=i,
            )
            for i in range(n_sessions)
        ]
        total_audio = sum(len(a) for a in streams) / 48_000
        max_ticks = max(len(a) for a in streams) // cfg.audio.chunk_samples + 40

        # small bucket bounds compile count; shared encoder reuses programs
        serve_enc = _FixedText(cfg, buckets=(48_000 * 2,))

        def run_mode(mode_cfg) -> tuple:
            mgr = SessionManager(mode_cfg, encoder=serve_enc)
            for i, a in enumerate(streams):
                mgr.add_session(f"s{i}")
                mgr.push_audio(f"s{i}", a)
            t0 = time.perf_counter()
            got = 0
            for _ in range(max_ticks):
                got += len(mgr.tick())
            got += len(mgr.flush())
            dt = time.perf_counter() - t0
            log(f"overlap bench [{mode_cfg.runtime.max_inflight_encodes} inflight, "
                f"pipelined_vad={mode_cfg.runtime.pipelined_vad}]: "
                f"{dt:.2f}s, {got} packets")
            return dt, got

        sync_cfg = cfg.override(**{
            "runtime.max_inflight_encodes": 0, "runtime.pipelined_vad": False})
        over_cfg = cfg.override(**{
            "runtime.max_inflight_encodes": 2, "runtime.pipelined_vad": True})
        _retry(lambda: run_mode(sync_cfg), label="overlap macro warm")
        t_sync = min(run_mode(sync_cfg)[0] for _ in range(2))
        t_over, got = sorted(run_mode(over_cfg) for _ in range(2))[0]
        assert got > 0, "serving loop produced no packets"
        result["overlap_serve_s_sync"] = round(t_sync, 3)
        result["overlap_serve_s_overlapped"] = round(t_over, 3)
        result["overlap_speedup"] = round(t_sync / t_over, 3)
        result["overlap_throughput_audio_s_per_s"] = round(total_audio / t_over, 1)
        result["overlap_packets"] = got

    # -- flagship: large-v3 (635M encoder) through the same encode path ----
    def bench_flagship(result):
        import dataclasses

        from janus_tpu.common.config import ASRConfig

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

        # int8 at flagship scale: 635M weights make the encode HBM-heavy,
        # the regime where the reference's CTranslate2 int8 mattered
        # (reference: backend/services/transcriber.py:26)
        from janus_tpu.models import asr as asr_mod
        from janus_tpu.ops.quant import quantize_tree

        fq = quantize_tree(asr_mod.init_asr(0, fcfg.asr))
        fqenc = SemanticEncoder(fcfg, asr_params=fq, buckets=(48_000 * 10,))
        log("flagship int8: compiling...")
        _retry(lambda: fqenc.encode_batch(phrases), label="flagship int8")
        qts = []
        for i in range(3):
            t0 = time.perf_counter()
            fqenc.encode_batch(phrases)
            qts.append(time.perf_counter() - t0)
            log(f"flagship int8 iter {i}: {qts[-1]*1e3:.1f} ms "
                f"rtf={qts[-1]/audio_seconds:.5f}")
        result["flagship_int8_encode_rtf_per_chip"] = round(
            min(qts) / audio_seconds, 6)
        result["flagship_int8_vs_bf16"] = round(min(fts) / min(qts), 3)

    _section(result, "decode", bench_decode)
    _section(result, "int8", bench_int8)
    _section(result, "sessions", bench_sessions)
    _section(result, "overlap", bench_overlap)
    _section(result, "flagship", bench_flagship)

    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
