"""Localize the flagship TTS AR-step cost: ablate pieces of _block."""
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from janus_tpu.common.platform import apply_env_platform, enable_compile_cache

apply_env_platform()
enable_compile_cache()

from janus_tpu.common.config import TTSConfig  # noqa: E402
from janus_tpu.models import tts  # noqa: E402
from janus_tpu.models.params import cast_floating  # noqa: E402
from janus_tpu.models.tokenizer import ByteTokenizer  # noqa: E402
from janus_tpu.ops.attention import attend, merge_heads, split_heads  # noqa: E402
from janus_tpu.ops.layers import layer_norm, linear, gelu  # noqa: E402


def block_full(blk, x, num_heads, cache):
    return tts.__dict__["_block_orig"](blk, x, num_heads, cache)


def block_no_attend(blk, x, num_heads, cache):
    h = layer_norm(x, **blk["attn_ln"])
    p = blk["attn"]
    q = split_heads(linear(h, p["q"]["w"], p["q"]["b"]), num_heads)
    k = split_heads(linear(h, p["k"]["w"], p["k"].get("b")), num_heads)
    v = split_heads(linear(h, p["v"]["w"], p["v"]["b"]), num_heads)
    cache = cache.append_lockstep(k, v)
    x = x + linear(merge_heads(q + 0.0 * v), p["out"]["w"], p["out"]["b"])
    h = layer_norm(x, **blk["mlp_ln"])
    h = linear(gelu(linear(h, blk["mlp"]["fc1"]["w"], blk["mlp"]["fc1"]["b"])),
               blk["mlp"]["fc2"]["w"], blk["mlp"]["fc2"]["b"])
    return x + h, cache


def block_no_append(blk, x, num_heads, cache):
    h = layer_norm(x, **blk["attn_ln"])
    p = blk["attn"]
    q = split_heads(linear(h, p["q"]["w"], p["q"]["b"]), num_heads)
    k = split_heads(linear(h, p["k"]["w"], p["k"].get("b")), num_heads)
    v = split_heads(linear(h, p["v"]["w"], p["v"]["b"]), num_heads)
    mask = cache.valid_mask(x.shape[-2], causal=True)
    x = x + linear(merge_heads(attend(q, cache.k, cache.v, mask)),
                   p["out"]["w"], p["out"]["b"])
    h = layer_norm(x, **blk["mlp_ln"])
    h = linear(gelu(linear(h, blk["mlp"]["fc1"]["w"], blk["mlp"]["fc1"]["b"])),
               blk["mlp"]["fc2"]["w"], blk["mlp"]["fc2"]["b"])
    return x + h, cache


def block_mlp_only(blk, x, num_heads, cache):
    h = layer_norm(x, **blk["mlp_ln"])
    h = linear(gelu(linear(h, blk["mlp"]["fc1"]["w"], blk["mlp"]["fc1"]["b"])),
               blk["mlp"]["fc2"]["w"], blk["mlp"]["fc2"]["b"])
    return x + h, cache


def block_attnmm_only(blk, x, num_heads, cache):
    h = layer_norm(x, **blk["attn_ln"])
    p = blk["attn"]
    q = linear(h, p["q"]["w"], p["q"]["b"])
    k = linear(h, p["k"]["w"], p["k"].get("b"))
    v = linear(h, p["v"]["w"], p["v"]["b"])
    x = x + linear(q + k + v, p["out"]["w"], p["out"]["b"])
    return x, cache


def main():
    tok = ByteTokenizer()
    tts.__dict__["_block_orig"] = tts._block
    cfg = TTSConfig.flagship()
    tp = tts.prestack_tts(cast_floating(
        tts.init_tts(0, cfg, text_vocab=tok.vocab_size), jnp.bfloat16))
    ids = jnp.zeros((8, 64), jnp.int32)
    emo = jnp.zeros((8,), jnp.int32)
    pre = jax.jit(lambda w, i, e: tts.tts_prefill(
        w, cfg, i, e, text_vocab=tok.vocab_size))
    first, done, state = pre(tp, ids, emo)

    for name, variant in [
        ("full", block_full),
        ("no_attend", block_no_attend),
        ("no_append", block_no_append),
        ("mlp_only", block_mlp_only),
        ("attn_mm_only", block_attnmm_only),
        ("attend_fresh", block_attend_fresh),
        ("attend_s64", block_attend_s64),
    ]:
        tts._block = variant
        chunk = jax.jit(lambda w, s, pv, dn: tts.tts_decode_chunk(
            w, cfg, s, pv, dn, 0, n_steps=32))
        out = chunk(tp, state, first, done)
        float(jnp.asarray(out[0])[0, 0, 0])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(2):
                out = chunk(tp, state, first, done)
            float(jnp.asarray(out[0])[0, 0, 0])
            best = min(best, (time.perf_counter() - t0) / 2)
        print(f"{name:14s} {best*1e3:7.1f} ms/32 steps = {best/32*1e3:6.2f} ms/step",
              flush=True)
    tts._block = tts.__dict__["_block_orig"]




def block_attend_fresh(blk, x, num_heads, cache):
    """attend() on fresh zero K/V of the same shape (not the carried cache)."""
    h = layer_norm(x, **blk["attn_ln"])
    p = blk["attn"]
    q = split_heads(linear(h, p["q"]["w"], p["q"]["b"]), num_heads)
    k = split_heads(linear(h, p["k"]["w"], p["k"].get("b")), num_heads)
    v = split_heads(linear(h, p["v"]["w"], p["v"]["b"]), num_heads)
    cache = cache.append_lockstep(k, v)
    kf = jnp.zeros_like(cache.k) + k.mean()
    vf = jnp.zeros_like(cache.v) + v.mean()
    mask = cache.valid_mask(x.shape[-2], causal=True)
    x = x + linear(merge_heads(attend(q, kf, vf, mask)),
                   p["out"]["w"], p["out"]["b"])
    h = layer_norm(x, **blk["mlp_ln"])
    h = linear(gelu(linear(h, blk["mlp"]["fc1"]["w"], blk["mlp"]["fc1"]["b"])),
               blk["mlp"]["fc2"]["w"], blk["mlp"]["fc2"]["b"])
    return x + h, cache


def block_attend_s64(blk, x, num_heads, cache):
    """attend() on just the first 64 cache positions."""
    h = layer_norm(x, **blk["attn_ln"])
    p = blk["attn"]
    q = split_heads(linear(h, p["q"]["w"], p["q"]["b"]), num_heads)
    k = split_heads(linear(h, p["k"]["w"], p["k"].get("b")), num_heads)
    v = split_heads(linear(h, p["v"]["w"], p["v"]["b"]), num_heads)
    cache = cache.append_lockstep(k, v)
    x = x + linear(merge_heads(attend(q, cache.k[..., :64, :], cache.v[..., :64, :], None)),
                   p["out"]["w"], p["out"]["b"])
    h = layer_norm(x, **blk["mlp_ln"])
    h = linear(gelu(linear(h, blk["mlp"]["fc1"]["w"], blk["mlp"]["fc1"]["b"])),
               blk["mlp"]["fc2"]["w"], blk["mlp"]["fc2"]["b"])
    return x + h, cache


if __name__ == "__main__":
    main()
