"""Streaming TTS: chunked emission must equal the fused synthesis path.

The decode side emits waveform chunks while mel groups are still being
generated (turnaround vs the reference's 2.8–3.0 s cloud round trip —
reference docs/ARCHITECTURE.md:229-231). Exactness is the contract: the
vocoder backbone is frame-local, the iSTFT windowed, the resampler FIR —
so with proper halos the concatenated stream equals the non-streaming
program's output.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from janus_tpu.common.config import JanusConfig
from janus_tpu.models import tts as tts_mod
from janus_tpu.models import vocoder as voc_mod
from janus_tpu.models.tokenizer import ByteTokenizer
from janus_tpu.runtime.streaming_tts import StreamingSynthesizer


@pytest.fixture(scope="module")
def setup():
    cfg = JanusConfig().override(**{
        "tts.d_model": 64, "tts.layers": 2, "tts.num_heads": 4,
        "tts.n_mels": 20, "tts.max_mel_frames": 192, "tts.max_text_tokens": 32,
        "vocoder.d_model": 48, "vocoder.layers": 3, "vocoder.n_fft": 256,
        "vocoder.hop_length": 64, "vocoder.sample_rate": 24_000,
    })
    tok = ByteTokenizer()
    tts_params = tts_mod.init_tts(0, cfg.tts, text_vocab=tok.vocab_size)
    voc_params = voc_mod.init_vocoder(1, cfg.vocoder, n_mels=cfg.tts.n_mels)
    return cfg, tok, tts_params, voc_params


def _fused_reference(cfg, tok, tts_params, voc_params, text, stop_threshold=0.5):
    """The non-streaming program: tts_generate + full vocode + resample,
    exactly as Synthesizer._synth_impl does."""
    import math

    from janus_tpu.models.tts import text_bucket
    from janus_tpu.ops.resample import resample_poly

    ids = tok.encode(text)[: cfg.tts.max_text_tokens]
    bucket = text_bucket(len(ids), cfg.tts.max_text_tokens)
    padded = np.full((1, bucket), tok.pad, np.int32)
    padded[0, : len(ids)] = ids
    mel, n_frames = tts_mod.tts_generate(
        tts_params, cfg.tts, jnp.asarray(padded),
        jnp.asarray([0], jnp.int32), text_vocab=tok.vocab_size,
        stop_threshold=stop_threshold,
    )
    wav = voc_mod.vocoder_waveform(voc_params, cfg.vocoder, mel)
    sr = cfg.vocoder.sample_rate
    g = math.gcd(48_000, sr)
    up, down = 48_000 // g, sr // g
    wav48 = resample_poly(wav, up=up, down=down) if (up, down) != (1, 1) else wav
    n48 = int(np.asarray(n_frames)[0]) * cfg.vocoder.hop_length * up // down
    return np.asarray(wav48)[0, :n48], np.asarray(mel), int(np.asarray(n_frames)[0])


def test_chunked_generation_matches_fused_mel(setup):
    """tts_decode_chunk must reproduce tts_generate's mel buffer."""
    cfg, tok, tts_params, voc_params = setup
    ids = tok.encode("hello world")
    padded = np.full((1, 16), tok.pad, np.int32)
    padded[0, : len(ids)] = ids
    text = jnp.asarray(padded)
    emo = jnp.asarray([0], jnp.int32)
    max_groups = cfg.tts.max_mel_frames // cfg.tts.reduction

    mel_full, n_frames = tts_mod.tts_generate(
        tts_params, cfg.tts, text, emo, text_vocab=tok.vocab_size)
    mel_full = np.asarray(mel_full)

    first, done, state = tts_mod.tts_prefill(
        tts_params, cfg.tts, text, emo, text_vocab=tok.vocab_size)
    r = cfg.tts.reduction
    got = np.zeros_like(mel_full)
    got[0, :r, :] = np.asarray(first).reshape(r, cfg.tts.n_mels)
    prev, start = first, 0
    g_chunk = 7  # deliberately not a divisor of the budget
    while start < max_groups - 1:
        n = min(g_chunk, max_groups - 1 - start)
        groups, dones, prev, done, state = tts_mod.tts_decode_chunk(
            tts_params, cfg.tts, state, prev, done, jnp.int32(start), n_steps=n)
        g = np.asarray(groups)[0]
        lo = start + 1
        got[0, lo * r : (lo + n) * r, :] = g.reshape(-1, cfg.tts.n_mels)
        start += n
    np.testing.assert_allclose(got, mel_full, rtol=0, atol=2e-5)


def test_stream_equals_fused_synthesis(setup):
    cfg, tok, tts_params, voc_params = setup
    # never-stop threshold: the untrained stop head would fire at random,
    # and the parity claim must hold over many chunks
    ref, _mel, n_frames = _fused_reference(cfg, tok, tts_params, voc_params,
                                           "stream me", stop_threshold=2.0)
    s = StreamingSynthesizer(cfg, tts_params=tts_params,
                             vocoder_params=voc_params, chunk_groups=8,
                             stop_threshold=2.0)
    chunks = list(s.stream("stream me"))
    got = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
    assert got.shape == ref.shape, (got.shape, ref.shape, n_frames)
    np.testing.assert_allclose(got, ref, rtol=0, atol=3e-5)
    assert len(chunks) > 1  # it actually streamed


def test_stream_turnaround_beats_full(setup):
    """First chunk must land well before the full clip (the metric the
    reference put at 2.8-3.0 s)."""
    cfg, tok, tts_params, voc_params = setup
    s = StreamingSynthesizer(cfg, tts_params=tts_params,
                             vocoder_params=voc_params, chunk_groups=8,
                             stop_threshold=2.0)
    # warm the programs so the measurement is steady-state (same text
    # bucket as the measured phrase, or the prefill recompiles)
    list(s.stream("measure this phrase"))
    first, total, n = s.turnaround("measure this phrase")
    assert n > 0
    assert first < total
    assert first < 0.75 * total  # first audio at a fraction of full time


def test_stream_pcm16_bytes(setup):
    cfg, tok, tts_params, voc_params = setup
    s = StreamingSynthesizer(cfg, tts_params=tts_params,
                             vocoder_params=voc_params, chunk_groups=8)
    blobs = list(s.stream_pcm16("bytes"))
    assert all(isinstance(b, bytes) and len(b) % 2 == 0 for b in blobs)
    assert sum(len(b) for b in blobs) > 0
