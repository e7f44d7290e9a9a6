"""Benchmark: semantic-codec real-time factors per chip.

Primary metric: encode RTF (anti-aliased decimation + log-mel +
Whisper-class encoder + KV-cached greedy decode + YIN + RMS, one fused
jitted program). The reference never measured RTF (BASELINE.md: "not
published"); the framework target is RTF < 0.1 per chip, so
``vs_baseline`` is ``0.1 / rtf`` (>1 = better than target).

Default run also records (each section fails soft AND records partial
results before raising, so a tunnel hiccup never loses a whole section):
- decode RTF (KV-cached TTS sampling + vocoder) and the full-codec sum
- int8 encode RTF (per-channel int8 weights — the reference ran its
  recognizer int8: reference backend/services/transcriber.py:26)
- concurrent-session scaling (encode audio-s/s at batch 1/8/32/64)
- runtime-overlap: a dispatch-bound regime (batch-1 phrases through the
  ~300 ms remote-dispatch tunnel with an inflight window) plus the
  32-session serving-loop macro comparison
- flagship (large-v3, 635M encoder, scan-over-layers) encode RTF with
  weight-only int8 AND full int8x8 (dynamic activation quant) variants
- flagship decode (Fish-Audio-class ~0.6B TTS + vocoder): generation RTF
  at batch 8 and 1, prefill/AR-step/vocoder stage split, and streaming
  first-audio turnaround (reference walkie-talkie turnaround: 2.8-3.0 s
  against the cloud TTS)
- MFU / utilization: analytic FLOPs + HBM bytes of each compiled encode
  program (``Compiled.cost_analysis``) divided by measured step time,
  against TPU v5e peaks, plus a per-stage on-chip breakdown at flagship
  scale (frontend / encoder / greedy decode)

``JANUS_BENCH_FAST=1`` runs only the core metric;
``JANUS_BENCH_SKIP=decode,int8,sessions,overlap,flagship`` skips
individual sections.

Timing note: sections time K chained async dispatches per host-fetch sync
(amortized), because (a) per-call dispatch through the remote-device
tunnel costs ~300 ms of pure host latency and (b) ``block_until_ready``
through the tunnel can return early (CLAUDE.md); the host fetch inside
``PendingEncode.result`` is the only hard sync. Best-of-reps is reported —
the honest steady-state throughput estimate. Prints exactly ONE JSON line
on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# TPU v5e public per-chip peaks (Cloud TPU docs): bf16 MXU FLOP/s, int8
# OP/s, HBM bandwidth. Used only to convert measured FLOP/s into MFU.
V5E_PEAK_BF16 = 197e12
V5E_PEAK_INT8 = 394e12
V5E_HBM_BPS = 819e9


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
        # the artifact must stay diagnosable post-hoc (VERDICT r3 task 4a)
        result.setdefault("failed_section_errors", {})[name] = (
            f"{type(e).__name__}: {e}"[:500])


def _retry(fn, tries=3, label=""):
    """The remote tunnel 500s sporadically; retry compiles AND timed
    bodies (a retried timing group re-measures, it doesn't accumulate)."""
    for attempt in range(tries):
        try:
            return fn()
        except Exception as e:
            if attempt == tries - 1:
                raise
            log(f"retry {label} after: {type(e).__name__}: {e}")
            time.sleep(5.0)


def _amortized_encode(enc, phrases, k=4, reps=3, label="",
                      result=None, stats_key=None) -> float:
    """Best amortized seconds per encode_batch over reps groups of k
    chained async dispatches (one host sync per group). With ``result`` +
    ``stats_key``, also records mean/std/samples across the rep groups —
    best-of stays the headline (steady-state throughput), the spread says
    whether two runs' numbers are distinguishable through the ~300 ms
    dispatch tunnel (VERDICT r3 task 4c/7)."""
    times = []
    for r in range(reps):
        def group():
            t0 = time.perf_counter()
            pend = [enc.encode_batch_submit(phrases) for _ in range(k)]
            for p in pend:
                p.result()  # host fetch = hard sync
            return (time.perf_counter() - t0) / k
        dt = _retry(group, label=f"{label} group{r}")
        times.append(dt)
        log(f"{label} group {r}: {dt*1e3:.1f} ms/call ({k}-chained)")
    if result is not None and stats_key is not None:
        result[stats_key] = {
            "best_ms": round(min(times) * 1e3, 2),
            "mean_ms": round(float(np.mean(times)) * 1e3, 2),
            "std_ms": round(float(np.std(times)) * 1e3, 2),
            "groups_ms": [round(t * 1e3, 1) for t in times],
        }
    return min(times)


def _encode_program_cost(enc, batch: int, bucket: int):
    """(flops, hbm_bytes) of the exact compiled serving program."""
    import jax.numpy as jnp

    dtype = (jnp.int16 if enc.cfg.runtime.encode_transfer_int16
             else jnp.float32)
    audio = jnp.zeros((batch, bucket), dtype)
    nv = jnp.full((batch,), bucket, jnp.int32)
    compiled = enc._encode_jit.lower(
        enc.params, audio, nv, n_16k_frames=enc.mel_frame_budget(bucket)
    ).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    return float(cost.get("flops", 0.0)), float(cost.get("bytes accessed", 0.0))


def _mfu_fields(result: dict, prefix: str, flops: float, hbm: float,
                step_s: float, platform: str, peak: float = V5E_PEAK_BF16):
    """Attach measured FLOP/s, MFU and HBM utilization for one program."""
    if step_s <= 0 or flops <= 0:
        return
    result[f"{prefix}_model_tflops_per_s"] = round(flops / step_s / 1e12, 2)
    result[f"{prefix}_hbm_gbps"] = round(hbm / step_s / 1e9, 1)
    if platform == "tpu":
        result[f"{prefix}_mfu"] = round(flops / step_s / peak, 4)
        result[f"{prefix}_hbm_util"] = round(hbm / step_s / V5E_HBM_BPS, 4)


def main() -> None:
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: first-compile through the remote tunnel
    # costs ~9 min; subsequent runs (e.g. the driver's) hit the cache.
    from janus_tpu.common.platform import apply_env_platform, enable_compile_cache

    apply_env_platform()
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
    _retry(lambda: enc.encode_batch(phrases), label="core warmup")
    log(f"warmup done in {time.time() - t0:.1f}s")

    stats: dict = {}
    best = _amortized_encode(enc, phrases, k=4, reps=3, label="core",
                             result=stats, stats_key="encode_ms_stats")
    rtf = best / audio_seconds
    result = {
        "metric": "encode_rtf_per_chip",
        "value": round(rtf, 6),
        "unit": "compute_s_per_audio_s",
        "vs_baseline": round(0.1 / rtf, 3),
        "platform": platform,
        "batch": batch,
        "phrase_seconds": seconds,
        "timing": "amortized k-chained dispatch, best-of-reps "
                  "(tunnel dispatch ~300ms/call; see bench.py docstring)",
        **stats,
    }
    try:
        flops, hbm = _encode_program_cost(enc, batch, 48_000 * 10)
        _mfu_fields(result, "encode", flops, hbm, best, platform)
    except Exception as e:
        log(f"encode cost analysis failed (non-fatal): {e}")

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
        _retry(lambda: decode(tts_params, voc_params, text, emo)
               .block_until_ready(), label="decode warmup")
        log(f"decode warmup {time.time()-t0:.1f}s")
        gen_seconds = (
            dec_batch * max_groups * cfg.tts.reduction * cfg.vocoder.hop_length
            / cfg.vocoder.sample_rate
        )
        k = 3
        best = float("inf")
        for r in range(3):
            def group():
                t0 = time.perf_counter()
                out = None
                for _ in range(k):
                    out = decode(tts_params, voc_params, text, emo)
                _ = float(jnp.asarray(out)[0, 0])  # hard sync
                return (time.perf_counter() - t0) / k
            dt = _retry(group, label=f"decode group{r}")
            best = min(best, dt)
            log(f"decode group {r}: {dt*1e3:.1f} ms rtf={dt/gen_seconds:.5f}")
        result["decode_rtf_per_chip"] = round(best / gen_seconds, 6)
        result["codec_rtf_per_chip"] = round(
            result["value"] + best / gen_seconds, 6
        )

    # -- int8: per-channel int8 weights through the same encode program ----
    def bench_int8(result):
        from janus_tpu.models import asr as asr_mod
        from janus_tpu.ops.quant import quantize_tree

        q_params = quantize_tree(asr_mod.init_asr(0, cfg.asr))
        qenc = SemanticEncoder(cfg, asr_params=q_params,
                               buckets=(48_000 * 10,))
        log("int8: compiling...")
        _retry(lambda: qenc.encode_batch(phrases), label="int8 warmup")
        best = _amortized_encode(qenc, phrases, k=4, reps=3, label="int8")
        result["int8_encode_rtf_per_chip"] = round(best / audio_seconds, 6)
        result["int8_vs_bf16"] = round(result["value"] / (best / audio_seconds), 3)

    # -- sessions: encode throughput vs concurrent batch size --------------
    def bench_sessions(result):
        sess_seconds = 2.0
        scaling: dict = {}
        result["session_scaling_audio_s_per_s"] = scaling  # partials stick
        errors: dict = {}
        # compile-only pre-pass for EVERY batch bucket first (generous
        # retries): the b=64 program is the biggest compile through the
        # tunnel and died un-diagnosed in r2+r3 — warm it before any
        # timing so a compile hiccup can retry without corrupting timings
        for b in (1, 8, 32, 64):
            ph = [voiced_phrase(f0=150.0, seconds=sess_seconds, amp=0.12,
                                seed=0)] * b
            try:
                _retry(lambda: enc.encode_batch(ph), tries=4,
                       label=f"sessions b={b} warm")
            except Exception as e:
                errors[str(b)] = f"warmup: {type(e).__name__}: {e}"[:300]
        for b in (1, 8, 32, 64):
            if str(b) in errors:
                continue
            ph = [
                voiced_phrase(f0=150.0 + 3 * i, seconds=sess_seconds,
                              amp=0.12, seed=i)
                for i in range(b)
            ]
            try:
                dt = _amortized_encode(enc, ph, k=3, reps=2,
                                       label=f"sessions b={b}",
                                       result=result,
                                       stats_key=f"sessions_b{b}_ms_stats")
            except Exception as e:  # one batch point must not kill the rest
                errors[str(b)] = f"{type(e).__name__}: {e}"[:300]
                continue
            scaling[str(b)] = round(b * sess_seconds / dt, 1)  # audio-s/s
            log(f"batch {b}: {dt*1e3:.1f} ms -> {scaling[str(b)]} audio-s/s")
        # b=32 vs b=64 stage breakdown (VERDICT r4 task 6): the driver's
        # r4 artifact showed zero marginal throughput from b=32 -> 64
        # (per-batch time exactly doubling). Decompose one encode_batch
        # call into host assembly / host->device transfer / device program
        # at both batch points to name the saturating resource.
        def sessions_stage_profile():
            import jax as _jax

            bucket = int(48_000 * sess_seconds)
            n16 = enc.mel_frame_budget(bucket)
            stages: dict = {}
            for b in (32, 64):
                row: dict = {}
                ph = [voiced_phrase(f0=150.0 + 3 * i, seconds=sess_seconds,
                                    amp=0.12, seed=i) for i in range(b)]

                def assemble():
                    batch = np.zeros((b, bucket), dtype=np.float32)
                    nv = np.zeros((b,), dtype=np.int32)
                    for i, p in enumerate(ph):
                        batch[i, : len(p)] = p[:bucket]
                        nv[i] = min(len(p), bucket)
                    if cfg.runtime.encode_transfer_int16:
                        batch = np.clip(np.round(batch * 32768.0),
                                        -32768, 32767).astype(np.int16)
                    return batch, nv

                t0 = time.perf_counter()
                batch_np, nv_np = assemble()
                row["host_assemble_ms"] = round(
                    (time.perf_counter() - t0) * 1e3, 1)

                def put_once():
                    t0 = time.perf_counter()
                    x = _jax.device_put(batch_np)
                    x.block_until_ready()
                    return time.perf_counter() - t0, x
                _retry(lambda: put_once(), label=f"stage h2d b={b}")
                row["h2d_transfer_ms"] = round(min(
                    put_once()[0] for _ in range(3)) * 1e3, 1)
                row["h2d_bytes_mb"] = round(batch_np.nbytes / 1e6, 1)

                # device program alone: pre-stage k fresh input copies
                # (the jit donates its audio buffers), then chain k calls
                # with one host fetch
                k = 3
                def prog_group():
                    staged = [(_jax.device_put(batch_np),
                               _jax.device_put(nv_np)) for _ in range(k)]
                    for x, _ in staged:
                        x.block_until_ready()
                    t0 = time.perf_counter()
                    outs = [enc._encode_jit(enc.params, x, nv,
                                            n_16k_frames=n16)
                            for x, nv in staged]
                    for o in outs:
                        np.asarray(o[0])  # host fetch = hard sync
                    return (time.perf_counter() - t0) / k
                row["device_program_ms"] = round(min(
                    _retry(prog_group, label=f"stage prog b={b}")
                    for _ in range(2)) * 1e3, 1)
                stages[str(b)] = row
                log(f"sessions stage b={b}: {row}")
            result["sessions_stage_ms"] = stages

        try:
            sessions_stage_profile()
        except Exception as e:
            log(f"sessions stage profile failed (non-fatal): {e}")

        # Deployable-configuration rows at the transfer-bound batch point:
        # the legacy rows above push 2 s phrases through the 10 s single-
        # bucket program (kept for cross-round comparability), padding the
        # wire 5x. A real deployment's DEFAULT_BUCKETS picks the 2 s
        # bucket; the opt-in mu-law wire halves the remaining bytes.
        def tight_rows():
            ph64 = [voiced_phrase(f0=150.0 + 3 * i, seconds=sess_seconds,
                                  amp=0.12, seed=i) for i in range(64)]
            for label, rcfg in (
                    ("tight", cfg),
                    ("tight_ulaw", cfg.override(
                        **{"runtime.encode_transfer_ulaw": True}))):
                tenc = SemanticEncoder(rcfg, buckets=(48_000 * 2,))
                _retry(lambda: tenc.encode_batch(ph64), tries=3,
                       label=f"sessions {label} warm")
                dt = _amortized_encode(tenc, ph64, k=3, reps=2,
                                       label=f"sessions b=64 {label}")
                result[f"session_b64_{label}_audio_s_per_s"] = round(
                    64 * sess_seconds / dt, 1)

        try:
            tight_rows()
        except Exception as e:
            log(f"sessions tight rows failed (non-fatal): {e}")

        if errors:
            result["session_scaling_errors"] = errors
            raise RuntimeError(f"session batch points failed: {errors}")

    # -- overlap: async dispatch value, measured where it can matter -------
    def bench_overlap(result):
        from janus_tpu.audio.synthetic import conversation
        from janus_tpu.runtime.sessions import SessionManager

        # (a) Dispatch-bound regime: batch-1 phrases, where per-call host
        # dispatch latency (~300 ms through the tunnel) dominates device
        # compute. The inflight window hides dispatch behind device time —
        # this is the regime overlap machinery exists for (serving many
        # sessions whose turns end on different ticks).
        n_single = 16
        singles = [voiced_phrase(f0=135.0 + 7 * i, seconds=2.0, amp=0.12,
                                 seed=100 + i) for i in range(n_single)]
        senc = SemanticEncoder(cfg, buckets=(48_000 * 2,))
        _retry(lambda: senc.encode_batch([singles[0]]), label="overlap warm")

        def serial():
            t0 = time.perf_counter()
            for p in singles:
                senc.encode_batch([p])
            return time.perf_counter() - t0

        def windowed(window=4):
            t0 = time.perf_counter()
            pend = []
            for p in singles:
                pend.append(senc.encode_batch_submit([p]))
                while len(pend) > window:
                    pend.pop(0).result()
            for q in pend:
                q.result()
            return time.perf_counter() - t0

        t_ser = min(_retry(serial, label="overlap serial") for _ in range(2))
        t_win = min(_retry(windowed, label="overlap windowed") for _ in range(2))
        result["overlap_dispatch_bound_speedup"] = round(t_ser / t_win, 3)
        result["overlap_dispatch_bound_s"] = [round(t_ser, 3), round(t_win, 3)]
        log(f"dispatch-bound: serial {t_ser:.2f}s vs windowed {t_win:.2f}s "
            f"-> {t_ser/t_win:.2f}x")

        # (b) Batched pipelining (batch-8 groups, submit window 2).
        k, window = 8, 2
        groups = [
            [voiced_phrase(f0=140.0 + 5 * (g * 4 + i), seconds=2.0,
                           amp=0.12, seed=g * 4 + i) for i in range(8)]
            for g in range(k)
        ]
        _retry(lambda: senc.encode_batch(groups[0]), label="overlap warm8")

        def serial8():
            t0 = time.perf_counter()
            for g in groups:
                senc.encode_batch(g)
            return time.perf_counter() - t0

        def windowed8():
            t0 = time.perf_counter()
            pend = []
            for g in groups:
                pend.append(senc.encode_batch_submit(g))
                while len(pend) > window:
                    pend.pop(0).result()
            for q in pend:
                q.result()
            return time.perf_counter() - t0

        t_serial = min(_retry(serial8, label="pipeline serial") for _ in range(2))
        t_pipe = min(_retry(windowed8, label="pipeline windowed") for _ in range(2))
        result["encode_pipeline_speedup"] = round(t_serial / t_pipe, 3)
        log(f"encode pipelining: serial {t_serial:.2f}s vs windowed "
            f"{t_pipe:.2f}s -> {t_serial/t_pipe:.2f}x")

        # (c) Macro: the full serving tick loop at 32 sessions. Text is
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
        t_sync = min(_retry(lambda: run_mode(sync_cfg),
                            label="overlap macro sync")[0] for _ in range(2))
        t_over, got = sorted(_retry(lambda: run_mode(over_cfg),
                                    label="overlap macro over")
                             for _ in range(2))[0]
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
        _retry(lambda: fenc.encode_batch(phrases), label="flagship warmup")
        log(f"flagship warmup {time.time()-t0:.1f}s")
        best = _amortized_encode(fenc, phrases, k=3, reps=3, label="flagship")
        result["flagship_encode_rtf_per_chip"] = round(best / audio_seconds, 6)
        try:
            flops, hbm = _encode_program_cost(fenc, batch, 48_000 * 10)
            _mfu_fields(result, "flagship", flops, hbm, best, platform)
        except Exception as e:
            log(f"flagship cost analysis failed (non-fatal): {e}")

        # per-stage on-chip breakdown: where do the milliseconds go?
        def stage_profile():
            from janus_tpu.models import asr as asr_mod
            from janus_tpu.models.params import cast_floating
            from janus_tpu.models.tokenizer import ByteTokenizer
            from janus_tpu.ops.energy import rms_energy
            from janus_tpu.ops.resample import decimate_48k_to_16k
            from janus_tpu.ops.yin import yin_track
            from janus_tpu.runtime.codec import mel_frame_budget

            acfg, pcfg = fcfg.asr, fcfg.prosody
            tok = ByteTokenizer()
            bucket = 48_000 * 10
            audio = jnp.asarray(np.stack([p[:bucket] for p in phrases]))
            n16 = mel_frame_budget(acfg, bucket)

            def timed(fn, args, fetch, k=4):
                _retry(lambda: fetch(fn(*args)), label="stage warm")
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    out = None
                    for _ in range(k):
                        out = fn(*args)
                    fetch(out)
                    best = min(best, (time.perf_counter() - t0) / k)
                return best

            stages = {}
            device_stages = {}

            def timed_device(fn, x, n=12, reps=4):
                """True per-iteration device time: loop the op n times
                INSIDE one jitted program with a sequential dependency,
                report (t_loopN − t_loop1)/(N−1). The chained-dispatch
                `timed` rows carry a ~6 ms per-call host-dispatch floor
                through the remote tunnel, which swamps sub-10 ms stages
                (r5b finding: decimate measured 7.7 ms chained vs 0.06 ms
                device)."""
                def looped(xx, k):
                    def body(i, carry):
                        eps, acc = carry
                        out = fn(xx + eps)
                        s = jnp.sum(out[..., :1].astype(jnp.float32))
                        return (s * 0.0, acc + s)
                    return jax.lax.fori_loop(
                        0, k, body, (jnp.float32(0.0), jnp.float32(0.0)))[1]

                fN = jax.jit(lambda xx: looped(xx, n))
                f1 = jax.jit(lambda xx: looped(xx, 1))
                _retry(lambda: (float(fN(x)), float(f1(x))),
                       label="device-stage warm")
                tn, t1 = [], []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    float(fN(x))
                    tn.append(time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    float(f1(x))
                    t1.append(time.perf_counter() - t0)
                # clamp: a sub-0.1 ms stage can go slightly negative in
                # the subtraction (dispatch jitter > stage time)
                return max(0.0, (min(tn) - min(t1)) / (n - 1))

            # stage decomposition mirrors the serving program exactly:
            # decimate once, YIN on the 16 kHz stream (ProsodyConfig.yin_rate)
            dec16_fn = jax.jit(decimate_48k_to_16k)
            stages["decimate"] = timed(
                dec16_fn, (audio,), lambda o: float(jnp.asarray(o)[0, 0]))
            device_stages["decimate"] = timed_device(decimate_48k_to_16k, audio)
            audio16 = dec16_fn(audio)
            if pcfg.yin_rate == 16_000:
                yin_fn = jax.jit(lambda a: yin_track(
                    a, 16_000, pcfg.yin_window_16k, pcfg.yin_hop_16k,
                    pcfg.yin_tolerance, fmin=pcfg.fmin_hz, fmax=pcfg.fmax_hz))
                yin_arg = audio16
            else:
                yin_fn = jax.jit(lambda a: yin_track(
                    a, fcfg.audio.sample_rate, pcfg.yin_window, pcfg.hop,
                    pcfg.yin_tolerance, fmin=pcfg.fmin_hz, fmax=pcfg.fmax_hz))
                yin_arg = audio
            stages["yin"] = timed(yin_fn, (yin_arg,),
                                  lambda o: float(jnp.asarray(o)[0, 0]))
            device_stages["yin"] = timed_device(
                lambda a: yin_track(
                    a, 16_000, pcfg.yin_window_16k, pcfg.yin_hop_16k,
                    pcfg.yin_tolerance, fmin=pcfg.fmin_hz, fmax=pcfg.fmax_hz)
                if pcfg.yin_rate == 16_000 else yin_fn(a),
                yin_arg)
            mel_fn = jax.jit(lambda a16: asr_mod.prepare_mel(
                a16, acfg, pad_to_frames=n16))
            stages["mel"] = timed(
                mel_fn, (audio16,), lambda o: float(jnp.asarray(o)[0, 0, 0]))
            device_stages["mel"] = timed_device(
                lambda a16: asr_mod.prepare_mel(a16, acfg,
                                                pad_to_frames=n16),
                audio16)
            result["flagship_stage_device_ms"] = {
                k: round(v * 1e3, 2) for k, v in device_stages.items()
            }
            mel = mel_fn(audio16)
            # fenc.params is the host-prepared tree (stacked + QKV-fused)
            enc_fn = jax.jit(lambda w, m: asr_mod.encode_audio(
                w, acfg, m.astype(jnp.dtype(acfg.dtype)), scan_layers=True))
            stages["encoder"] = timed(
                enc_fn, (fenc.params, mel),
                lambda o: float(jnp.asarray(o)[0, 0, 0]))
            enc_out = enc_fn(fenc.params, mel)
            prompt = jnp.broadcast_to(
                jnp.asarray(tok.sot_sequence(), dtype=jnp.int32),
                (batch, len(tok.sot_sequence())))

            def make_dec(fuse, kv_int8):
                return jax.jit(lambda w, e, p: asr_mod.greedy_decode(
                    w, acfg, e, p, tok.eot, max_new=acfg.max_decode_tokens,
                    scan_layers=True, cache_dtype=jnp.bfloat16,
                    fuse_qkv=fuse, cross_kv_int8=kv_int8))

            # serving config first, then the ablation rows that attribute
            # the win (VERDICT r3 task 2: fused QKV + int8 cross-KV)
            stages["greedy_decode"] = timed(
                make_dec(True, acfg.decode_cross_kv_int8),
                (fenc.params, enc_out, prompt),
                lambda o: int(jnp.asarray(o)[0, 0]), k=3)
            stages["greedy_decode_bf16kv"] = timed(
                make_dec(True, False), (fenc.params, enc_out, prompt),
                lambda o: int(jnp.asarray(o)[0, 0]), k=3)
            # int8 cross-KV through the FUSED Pallas kernel (r5): K/V
            # stream from HBM as int8, dequant in VMEM — the ablation that
            # decides whether int8 KV finally pays (ROOFLINE §1 predicted
            # the XLA dequant path's loss and named this kernel the fix)
            stages["greedy_decode_int8kv_kernel"] = timed(
                make_dec(True, True), (fenc.params, enc_out, prompt),
                lambda o: int(jnp.asarray(o)[0, 0]), k=3)
            # r3 path: unfused q/k/v, bf16 KV, per-call trace-time prestack.
            # fenc.params is already fused (no q/k/v keys), so time a fresh
            # unprepared tree — weight VALUES don't affect step time.
            raw = cast_floating(asr_mod.init_asr(0, acfg), jnp.bfloat16)
            stages["greedy_decode_r3_path"] = timed(
                make_dec(False, False), (raw, enc_out, prompt),
                lambda o: int(jnp.asarray(o)[0, 0]), k=3)
            del raw
            result["flagship_stage_ms"] = {
                k: round(v * 1e3, 1) for k, v in stages.items()
            }
            log(f"flagship stages: {result['flagship_stage_ms']}")

        try:
            stage_profile()
        except Exception as e:
            log(f"flagship stage profile failed (non-fatal): {e}")

        # int8 at flagship scale: 635M weights make the encode HBM-heavy,
        # the regime where the reference's CTranslate2 int8 mattered
        # (reference: backend/services/transcriber.py:26)
        from janus_tpu.models import asr as asr_mod
        from janus_tpu.ops.quant import quantize_tree

        base = asr_mod.init_asr(0, fcfg.asr)
        for mode, key in (("weight", "flagship_int8"),
                          ("dynamic", "flagship_int8_dynamic")):
            fq = quantize_tree(base, mode=mode)
            fqenc = SemanticEncoder(fcfg, asr_params=fq,
                                    buckets=(48_000 * 10,))
            log(f"flagship int8[{mode}]: compiling...")
            _retry(lambda: fqenc.encode_batch(phrases),
                   label=f"flagship int8 {mode}")
            qbest = _amortized_encode(fqenc, phrases, k=3, reps=2,
                                      label=f"int8[{mode}]")
            result[f"{key}_encode_rtf_per_chip"] = round(
                qbest / audio_seconds, 6)
            result[f"{key}_vs_bf16"] = round(best / qbest, 3)
            del fq, fqenc

    # -- flagship decode: Fish-Audio-class TTS (~0.6B) + vocoder -----------
    def bench_flagship_tts(result):
        import dataclasses

        from janus_tpu.common.config import TTSConfig
        from janus_tpu.models import tts as tts_mod
        from janus_tpu.models import vocoder as voc_mod
        from janus_tpu.models.params import cast_floating, param_count
        from janus_tpu.models.tokenizer import ByteTokenizer

        tok = ByteTokenizer()
        ftts = dataclasses.replace(JanusConfig(), tts=TTSConfig.flagship())
        tcfg, vcfg = ftts.tts, ftts.vocoder
        tts_params = cast_floating(
            tts_mod.init_tts(0, tcfg, text_vocab=tok.vocab_size), jnp.bfloat16)
        # host prestack: trace-time stacking copies ~1.2 GB of weights
        # inside every dispatched program (see tts_mod.prestack_tts)
        tts_params = tts_mod.prestack_tts(tts_params)
        voc_params = cast_floating(
            voc_mod.init_vocoder(1, vcfg, n_mels=tcfg.n_mels), jnp.bfloat16)
        result["flagship_tts_params_m"] = round(param_count(tts_params) / 1e6, 1)

        max_groups = 256  # 512 mel frames ≈ 5.46 s at 24 kHz hop 256
        lane_seconds = (max_groups * tcfg.reduction * vcfg.hop_length
                        / vcfg.sample_rate)

        @jax.jit
        def decode(tp, vp, text_ids, emo):
            mel, _ = tts_mod.tts_generate(
                tp, tcfg, text_ids, emo, max_groups=max_groups,
                text_vocab=tok.vocab_size, stop_threshold=2.0)  # full budget
            return voc_mod.vocoder_waveform(vp, vcfg, mel)

        for b in (8, 1):
            text = jnp.zeros((b, 32), dtype=jnp.int32)
            emo = jnp.zeros((b,), dtype=jnp.int32)
            log(f"flagship tts b={b}: compiling...")
            t0 = time.time()
            _retry(lambda: decode(tts_params, voc_params, text, emo)
                   .block_until_ready(), label=f"ftts b={b} warmup")
            log(f"flagship tts b={b} warmup {time.time()-t0:.1f}s")
            k = 2
            times = []
            for r in range(3):
                def group():
                    t0 = time.perf_counter()
                    out = None
                    for _ in range(k):
                        out = decode(tts_params, voc_params, text, emo)
                    _ = float(jnp.asarray(out)[0, 0])  # hard sync
                    return (time.perf_counter() - t0) / k
                dt = _retry(group, label=f"ftts b={b} group{r}")
                times.append(dt)
                log(f"flagship tts b={b} group {r}: {dt*1e3:.1f} ms "
                    f"rtf/chip={dt/(b*lane_seconds):.5f}")
            best = min(times)
            key = ("flagship_tts_rtf_per_chip" if b == 8
                   else "flagship_tts_rtf_b1")
            result[key] = round(best / (b * lane_seconds), 6)
            result[f"{key}_ms_stats"] = {
                "best_ms": round(best * 1e3, 1),
                "mean_ms": round(float(np.mean(times)) * 1e3, 1),
                "std_ms": round(float(np.std(times)) * 1e3, 1),
            }
        result["flagship_tts_vs_target"] = round(
            0.1 / result["flagship_tts_rtf_per_chip"], 3)

        # stage breakdown at b=8: prompt prefill / AR steps / vocoder
        def stage_profile():
            b = 8
            text = jnp.zeros((b, 32), dtype=jnp.int32)
            emo = jnp.zeros((b,), dtype=jnp.int32)

            def timed(fn, fetch, k=3):
                _retry(lambda: fetch(fn()), label="ftts stage warm")
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    out = None
                    for _ in range(k):
                        out = fn()
                    fetch(out)
                    best = min(best, (time.perf_counter() - t0) / k)
                return best

            prefill = jax.jit(lambda tp: tts_mod.tts_prefill(
                tp, tcfg, text, emo, max_groups=max_groups,
                text_vocab=tok.vocab_size)[0])
            t_pre = timed(lambda: prefill(tts_params),
                          lambda o: float(jnp.asarray(o)[0, 0]))
            gen = jax.jit(lambda tp: tts_mod.tts_generate(
                tp, tcfg, text, emo, max_groups=max_groups,
                text_vocab=tok.vocab_size, stop_threshold=2.0)[0])
            t_gen = timed(lambda: gen(tts_params),
                          lambda o: float(jnp.asarray(o)[0, 0, 0]), k=2)
            mel = gen(tts_params)
            voc = jax.jit(lambda vp, m: voc_mod.vocoder_waveform(vp, vcfg, m))
            t_voc = timed(lambda: voc(voc_params, mel),
                          lambda o: float(jnp.asarray(o)[0, 0]))

            # device-true vocoder time (chained row carries the ~6 ms
            # dispatch floor — see flagship_stage_device_ms)
            def voc_looped(vp, m, n):
                def body(i, carry):
                    eps, acc = carry
                    out = voc_mod.vocoder_waveform(vp, vcfg, m + eps)
                    s = jnp.sum(out[..., :1].astype(jnp.float32))
                    return (s * 0.0, acc + s)
                return jax.lax.fori_loop(
                    0, n, body, (jnp.float32(0.0), jnp.float32(0.0)))[1]

            n_loop = 8
            vN = jax.jit(lambda vp, m: voc_looped(vp, m, n_loop))
            v1 = jax.jit(lambda vp, m: voc_looped(vp, m, 1))
            _retry(lambda: (float(vN(voc_params, mel)),
                            float(v1(voc_params, mel))), label="voc dev warm")

            def _once(f):
                t0 = time.perf_counter()
                f()
                return time.perf_counter() - t0

            tn = min(_once(lambda: float(vN(voc_params, mel)))
                     for _ in range(3))
            t1 = min(_once(lambda: float(v1(voc_params, mel)))
                     for _ in range(3))
            t_voc_dev = max(0.0, (tn - t1) / (n_loop - 1))
            result["flagship_tts_stage_ms"] = {
                "prefill": round(t_pre * 1e3, 1),
                "ar_decode": round((t_gen - t_pre) * 1e3, 1),
                "ar_step_us": round((t_gen - t_pre) / (max_groups - 1) * 1e6, 1),
                "vocoder": round(t_voc * 1e3, 1),
                "vocoder_device": round(t_voc_dev * 1e3, 2),
            }
            log(f"flagship tts stages: {result['flagship_tts_stage_ms']}")

        try:
            stage_profile()
        except Exception as e:
            log(f"flagship tts stage profile failed (non-fatal): {e}")

        # streaming first-audio turnaround (the walkie-talkie number the
        # reference put at 2.8-3.0 s against its cloud TTS)
        from janus_tpu.runtime.streaming_tts import StreamingSynthesizer

        scfg = ftts.override(**{"tts.max_mel_frames": 2 * max_groups})
        stream_params = {**tts_params, "stop_head": {
            **tts_params["stop_head"],
            # random-weight stop logits sit at ~0.5; pin hard negative so
            # the stream runs the full budget deterministically
            "b": jnp.full_like(tts_params["stop_head"]["b"], -5.0)}}
        streamer = StreamingSynthesizer(
            scfg, tts_params=stream_params, vocoder_params=voc_params,
            chunk_groups=16)
        turn_text = "status report follows all clear"
        log("flagship tts streaming: compiling...")
        _retry(lambda: list(streamer.stream(turn_text)), label="ftts stream")
        first_s, total_s, n48 = min(
            (_retry(lambda: streamer.turnaround(turn_text),
                    label="ftts turnaround") for _ in range(2)),
            key=lambda t: t[0])
        result["flagship_tts_first_audio_s"] = round(first_s, 4)
        result["flagship_tts_stream_total_s"] = round(total_s, 4)
        result["flagship_tts_stream_audio_s"] = round(n48 / 48_000, 3)
        log(f"flagship tts first audio {first_s:.3f}s "
            f"(total {total_s:.2f}s for {n48/48_000:.2f}s audio)")

    _section(result, "decode", bench_decode)
    _section(result, "int8", bench_int8)
    _section(result, "sessions", bench_sessions)
    _section(result, "overlap", bench_overlap)
    _section(result, "flagship", bench_flagship)
    _section(result, "flagship_tts", bench_flagship_tts)

    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
