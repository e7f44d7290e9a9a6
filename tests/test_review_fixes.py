"""Regression tests for the round-1 code-review findings."""

import numpy as np
import pytest

import jax.numpy as jnp

from janus_tpu.ops.attention import KVCache, attend
from janus_tpu.ops.flash import flash_attention
from janus_tpu.ops.yin import yin_frame


def test_flash_cross_attention_lengths():
    """Tq != Tk must match the reference attention (review finding #1)."""
    rng = np.random.default_rng(0)
    for tq, tk in [(8, 16), (16, 8), (7, 33)]:
        q = jnp.asarray(rng.standard_normal((1, 2, tq, 16)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((1, 2, tk, 16)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((1, 2, tk, 16)).astype(np.float32))
        ref = np.asarray(attend(q, k, v))
        out = np.asarray(flash_attention(q, k, v, force=True))
        np.testing.assert_allclose(out, ref, atol=2e-5, err_msg=f"{tq}x{tk}")


def test_kvcache_general_append_per_lane():
    """The vmap-friendly one-hot append handles per-lane fill points."""
    cache = KVCache.create((2,), num_heads=1, max_len=4, head_dim=2,
                           dtype=jnp.float32)
    # advance lane 0 only, then append to both: different fill points
    k1 = jnp.ones((2, 1, 1, 2))
    cache = cache.append(k1, k1)
    # manually desync lengths
    cache = KVCache(cache.k, cache.v, jnp.asarray([2, 1], dtype=jnp.int32))
    k2 = jnp.full((2, 1, 1, 2), 5.0)
    cache = cache.append(k2, k2)
    k = np.asarray(cache.k)
    assert k[0, 0, 2, 0] == 5.0  # lane 0 wrote at its own position
    assert k[1, 0, 1, 0] == 5.0  # lane 1 at a different one
    np.testing.assert_array_equal(np.asarray(cache.length), [3, 2])


def test_yin_fmax_bound_rejects_high_candidates():
    """F0 bounds restrict the period search (review finding #9)."""
    sr = 48_000
    t = np.arange(4096) / sr
    w = jnp.asarray((0.5 * np.sin(2 * np.pi * 880.0 * t)).astype(np.float32))
    unbounded = float(yin_frame(w, sr))
    assert abs(unbounded - 880.0) < 10  # it IS an 880 Hz tone
    bounded = float(yin_frame(w, sr, fmax=400.0))
    # with fmax=400 the tracker must pick a (sub)harmonic below the bound
    assert bounded <= 440.0 + 10


def test_long_phrase_split_not_truncated():
    """Phrases beyond the largest bucket keep their tail (finding #3)."""
    from janus_tpu.common.config import JanusConfig
    from janus_tpu.runtime.codec import SemanticEncoder

    cfg = JanusConfig().override(**{
        "asr.d_model": 64, "asr.encoder_layers": 1, "asr.decoder_layers": 1,
        "asr.num_heads": 4, "asr.n_mels": 16, "asr.vocab_size": 261,
        "asr.max_source_positions": 128, "asr.max_target_positions": 32,
        "asr.max_decode_tokens": 3,
    })

    class CountingEncoder(SemanticEncoder):
        calls = []

        def encode_batch(self, phrases):
            if all(len(p) <= self.buckets[-1] for p in phrases):
                CountingEncoder.calls.append([len(p) for p in phrases])
            return super().encode_batch(phrases)

    enc = CountingEncoder(cfg, buckets=(48_000,))  # 1 s max bucket
    # a 2.5 s "phrase": loud first second, quiet tail
    loud = np.full(48_000, 0.3, np.float32)
    quiet = np.full(72_000, 0.02, np.float32)
    out = enc.encode_batch([np.concatenate([loud, quiet])])
    assert len(out) == 1
    # all 120000 samples were encoded across 3 chunks
    flat = [n for call in CountingEncoder.calls for n in call]
    assert sum(flat) == 120_000
    # merged rms reflects the WHOLE phrase (loud 1s + quiet 1.5s), not just
    # the first bucket
    expected_rms = np.sqrt((0.3**2 * 48_000 + 0.02**2 * 72_000) / 120_000)
    assert abs(out[0]["rms"] - expected_rms) < 0.01


def test_snapshot_pauses_ingestion():
    """push_audio refuses during snapshot (finding #4)."""
    from janus_tpu.common.config import JanusConfig
    from janus_tpu.runtime.sessions import SessionManager

    cfg = JanusConfig().override(**{
        "asr.d_model": 64, "asr.encoder_layers": 1, "asr.decoder_layers": 1,
        "asr.num_heads": 4, "asr.n_mels": 16, "asr.vocab_size": 261,
        "asr.max_source_positions": 128, "asr.max_target_positions": 32,
        "asr.max_decode_tokens": 3,
    })
    mgr = SessionManager(cfg)
    s = mgr.add_session("a")
    assert mgr.push_audio("a", np.zeros(1536, np.float32))
    s.paused = True
    assert not mgr.push_audio("a", np.zeros(1536, np.float32))
    s.paused = False
    assert mgr.push_audio("a", np.zeros(1536, np.float32))
