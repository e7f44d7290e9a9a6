"""Ablation: layer-scan unroll factor on the launch-bound decode loops.

Measures (a) flagship large-v3 greedy_decode (24+3 tokens, b=8) and
(b) flagship TTS decode chunk (32 AR steps, b=8) at scan_unroll 1/2/4.
"""
import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from janus_tpu.common.platform import apply_env_platform, enable_compile_cache

apply_env_platform()
enable_compile_cache()

from janus_tpu.common.config import ASRConfig, TTSConfig  # noqa: E402
from janus_tpu.models import asr, tts  # noqa: E402
from janus_tpu.models.params import cast_floating  # noqa: E402
from janus_tpu.models.tokenizer import ByteTokenizer  # noqa: E402


def timed(fn, args, fetch, k=3, reps=3):
    fetch(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    tok = ByteTokenizer()
    if which in ("asr", "both"):
        base = dataclasses.replace(ASRConfig.large_v3(), max_decode_tokens=24)
        p = cast_floating(asr.init_asr(0, base), jnp.bfloat16)
        p = asr.prepare_decode_params(p, scan_layers=True, fuse_qkv=True)
        enc = jnp.asarray(
            np.random.default_rng(0).standard_normal((8, 500, 1280)),
            jnp.bfloat16)
        prompt = jnp.broadcast_to(
            jnp.asarray(tok.sot_sequence(), dtype=jnp.int32),
            (8, len(tok.sot_sequence())))
        for u in (1, 2, 4):
            cfg = dataclasses.replace(base, scan_unroll=u)
            dec = jax.jit(lambda w, e, pr, c=cfg: asr.greedy_decode(
                w, c, e, pr, tok.eot, max_new=24, scan_layers=True,
                cache_dtype=jnp.bfloat16, fuse_qkv=True, cross_kv_int8=False))
            t0 = time.time()
            ms = timed(dec, (p, enc, prompt),
                       lambda o: int(jnp.asarray(o)[0, 0])) * 1e3
            print(f"asr greedy_decode unroll={u}: {ms:7.1f} ms"
                  f"  (first-call incl compile {time.time()-t0:.0f}s)",
                  flush=True)
    if which in ("tts", "both"):
        baset = TTSConfig.flagship()
        tp = tts.prestack_tts(cast_floating(
            tts.init_tts(0, baset, text_vocab=tok.vocab_size), jnp.bfloat16))
        ids = jnp.zeros((8, 64), jnp.int32)
        emo = jnp.zeros((8,), jnp.int32)
        for u in (1, 2, 4):
            cfg = dataclasses.replace(baset, scan_unroll=u)
            pre = jax.jit(lambda w, i, e, c=cfg: tts.tts_prefill(
                w, c, i, e, text_vocab=tok.vocab_size))
            first, done, state = pre(tp, ids, emo)
            chunk = jax.jit(
                lambda w, s, pv, dn, c=cfg: tts.tts_decode_chunk(
                    w, c, s, pv, dn, 0, n_steps=32),
            )
            t0 = time.time()
            ms = timed(chunk, (tp, state, first, done),
                       lambda o: float(jnp.asarray(o[0])[0, 0, 0])) * 1e3
            print(f"tts chunk32 unroll={u}: {ms:7.1f} ms"
                  f"  ({ms/32:.2f} ms/step; first-call {time.time()-t0:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()
