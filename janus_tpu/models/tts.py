"""LLM-conditioned TTS acoustic model.

Replaces the reference's cloud TTS call (reference:
backend/services/synthesizer.py:177-207 — Fish Audio prompted with
``"(emotion) text"``) with an in-framework autoregressive transformer:

    [SPK] [EMO] text-bytes [BOA] → mel frame groups … [stop]

- One decoder-only transformer attends over the whole prompt+audio prefix
  (causal); text enters via token embeddings, generated mel re-enters
  through a prenet projection, so text and audio share every layer
  ("LLM-conditioned" in the SemantiCodec/FishAudio sense).
- Emotion is a reserved token id — the categorical prosody tags of the
  wire packet select it, preserving the reference's two-table emotion
  behavior end to end.
- A learned speaker embedding slot [SPK] carries voice-cloning
  conditioning from :mod:`janus_tpu.models.speaker`.
- ``reduction`` mel frames are emitted per step (r=2 default), halving
  decode steps; a stop head ends generation, and a fixed frame budget
  keeps the sampling loop a single compiled ``lax.while_loop``.

Generation is fully KV-cached: the prompt is prefilled in one pass, then
each step appends exactly one position.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.common.config import TTSConfig
from janus_tpu.models.params import KeyGen, normal_init, stack_layer_params
from janus_tpu.ops.attention import KVCache, attend, merge_heads, split_heads
from janus_tpu.ops.layers import embedding_lookup, gelu, layer_norm, linear

__all__ = [
    "EMOTIONS",
    "emotion_id",
    "init_tts",
    "tts_forward",
    "tts_generate",
    "prestack_tts",
    "TTSState",
    "audio_pos_base",
    "text_bucket",
    "text_buckets",
]

Params = Dict

# Emotion vocabulary: union of the send-side TTS tags
# (reference: backend/services/synthesizer.py:158-175), the API overrides
# (reference: backend/api/types.py:18-21), and the receive-side UI tags.
EMOTIONS = (
    "neutral", "excited", "joyful", "whispering", "shouting", "sad",
    "relaxed", "panicked", "serious", "calm", "angry", "auto",
)


def emotion_id(tag: str) -> int:
    tag = tag.lower()
    return EMOTIONS.index(tag) if tag in EMOTIONS else 0


class _SpecialIds:
    """Token-space layout: [0, text_vocab) bytes+text specials, then
    emotions, then control tokens."""

    def __init__(self, text_vocab: int):
        self.emotion_base = text_vocab
        self.boa = text_vocab + len(EMOTIONS)      # begin-of-audio
        self.spk = text_vocab + len(EMOTIONS) + 1  # speaker slot
        self.total = text_vocab + len(EMOTIONS) + 2


def special_ids(text_vocab: int) -> _SpecialIds:
    return _SpecialIds(text_vocab)


def init_tts(key: jax.Array | int, cfg: TTSConfig, text_vocab: int = 261) -> Params:
    kg = KeyGen(key)
    d = cfg.d_model
    ids = special_ids(text_vocab)
    blocks = [
        {
            "attn_ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "attn": {
                "q": {"w": normal_init(kg(), (d, d)), "b": jnp.zeros((d,))},
                "k": {"w": normal_init(kg(), (d, d))},
                "v": {"w": normal_init(kg(), (d, d)), "b": jnp.zeros((d,))},
                "out": {"w": normal_init(kg(), (d, d)), "b": jnp.zeros((d,))},
            },
            "mlp_ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "mlp": {
                "fc1": {"w": normal_init(kg(), (d, cfg.mlp_ratio * d)),
                        "b": jnp.zeros((cfg.mlp_ratio * d,))},
                "fc2": {"w": normal_init(kg(), (cfg.mlp_ratio * d, d)),
                        "b": jnp.zeros((d,))},
            },
        }
        for _ in range(cfg.layers)
    ]
    r_mels = cfg.reduction * cfg.n_mels
    max_pos = cfg.max_text_tokens + cfg.max_mel_frames // cfg.reduction + 8
    return {
        "token_emb": normal_init(kg(), (ids.total, d)),
        "pos_emb": normal_init(kg(), (max_pos, d)),
        "prenet": {
            "fc1": {"w": normal_init(kg(), (r_mels, d)), "b": jnp.zeros((d,))},
            "fc2": {"w": normal_init(kg(), (d, d)), "b": jnp.zeros((d,))},
        },
        "spk_proj": {"w": normal_init(kg(), (d, d)), "b": jnp.zeros((d,))},
        "blocks": blocks,
        "ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "mel_head": {"w": normal_init(kg(), (d, r_mels)), "b": jnp.zeros((r_mels,))},
        "stop_head": {"w": normal_init(kg(), (d, 1)), "b": jnp.zeros((1,))},
    }


def _embed_mel(params: Params, mel_groups: jax.Array) -> jax.Array:
    """``[..., S, r*n_mels] -> [..., S, d]`` prenet."""
    h = gelu(linear(mel_groups, params["prenet"]["fc1"]["w"], params["prenet"]["fc1"]["b"]))
    return linear(h, params["prenet"]["fc2"]["w"], params["prenet"]["fc2"]["b"])


def _block(blk: Params, x: jax.Array, num_heads: int,
           cache: KVCache) -> Tuple[jax.Array, KVCache]:
    h = layer_norm(x, **blk["attn_ln"])
    p = blk["attn"]
    q = split_heads(linear(h, p["q"]["w"], p["q"]["b"]), num_heads)
    k = split_heads(linear(h, p["k"]["w"], p["k"].get("b")), num_heads)
    v = split_heads(linear(h, p["v"]["w"], p["v"]["b"]), num_heads)
    cache = cache.append_lockstep(k, v)
    mask = cache.valid_mask(x.shape[-2], causal=True)
    x = x + linear(merge_heads(attend(q, cache.k, cache.v, mask)),
                   p["out"]["w"], p["out"]["b"])
    h = layer_norm(x, **blk["mlp_ln"])
    h = linear(gelu(linear(h, blk["mlp"]["fc1"]["w"], blk["mlp"]["fc1"]["b"])),
               blk["mlp"]["fc2"]["w"], blk["mlp"]["fc2"]["b"])
    return x + h, cache


class TTSState(NamedTuple):
    """KV caches: tuple of per-layer caches (unrolled), or one stacked
    :class:`KVCache` with a leading layer axis (``cfg.scan_layers`` — one
    compiled block body for deep flagship decoders)."""

    caches: "Tuple[KVCache, ...] | KVCache"

    @property
    def fill(self) -> jax.Array:
        c = self.caches
        return c.length[0] if isinstance(c, KVCache) else c[0].length


def _stack_blocks(blocks) -> Params:
    return stack_layer_params(blocks)


def _prestack(params: Params) -> Params:
    """Stack ``blocks`` along a leading layer axis (idempotent) — done once
    per traced program so the stack sits outside the sampling while_loop."""
    if isinstance(params["blocks"], dict):
        return params
    return {**params, "blocks": _stack_blocks(params["blocks"])}


def prestack_tts(params: Params) -> Params:
    """Host-side layer stacking for ``scan_layers`` configs (idempotent).

    Call once at load time (as the serving synthesizers do): left to trace
    time, the stack is re-materialized — a full weight copy — inside every
    dispatched program, which at flagship scale (~0.6B params) costs ~GBs
    per call (the same lesson as ``asr.prepare_decode_params``)."""
    return _prestack(params)


def _make_state(cfg: TTSConfig, batch: int, cache_len: int,
                dtype=jnp.float32) -> TTSState:
    head_dim = cfg.d_model // cfg.num_heads
    if cfg.scan_layers:
        return TTSState(KVCache.create(
            (cfg.layers, batch), cfg.num_heads, cache_len, head_dim,
            dtype=dtype))
    return TTSState(tuple(
        KVCache.create((batch,), cfg.num_heads, cache_len, head_dim,
                       dtype=dtype)
        for _ in range(cfg.layers)
    ))


def text_bucket(n: int, max_text_tokens: int, floor: int = 8) -> int:
    """Smallest power-of-two text width ≥ n (≥ ``floor``, capped at
    ``max_text_tokens``). Serving pads prompts to these buckets
    (recompile-free) and training jitters prompt widths over the same set,
    so any bucket is an in-distribution prompt length."""
    b = floor
    while b < n and b < max_text_tokens:
        b *= 2
    return min(b, max_text_tokens)


def text_buckets(max_text_tokens: int, floor: int = 8) -> Tuple[int, ...]:
    """All serving text buckets for a config (see :func:`text_bucket`)."""
    out = []
    b = floor
    while b < max_text_tokens:
        out.append(b)
        b *= 2
    out.append(max_text_tokens)
    return tuple(out)


def audio_pos_base(cfg: TTSConfig) -> int:
    """First position index of the audio stream.

    Audio tokens get positions ``audio_pos_base + group_index`` regardless
    of the prompt's actual length, so generation dynamics are identical
    for any text length ≤ ``max_text_tokens`` — serving no longer needs to
    pad text to the exact trained width (round-1 landmine: the decoder-only
    absolute ``pos_emb`` made everything position-sensitive)."""
    return cfg.max_text_tokens + 3  # [SPK] [EMO] text [BOA]


def _forward_embedded(params: Params, cfg: TTSConfig, x: jax.Array,
                      positions: jax.Array, state: TTSState
                      ) -> Tuple[jax.Array, jax.Array, TTSState]:
    """Shared trunk over already-embedded inputs ``[..., S, d]`` with
    explicit position indices ``positions[..., S]``.
    Returns (mel_out [..., S, r*n_mels], stop_logit [..., S], new_state)."""
    x = x + embedding_lookup(params["pos_emb"], positions)
    if isinstance(state.caches, KVCache):
        stacked = (params["blocks"] if isinstance(params["blocks"], dict)
                   else _stack_blocks(params["blocks"]))

        # The stacked caches ride the scan CARRY and each layer writes
        # ONLY its new positions into the big buffer (in-place carry
        # update). Passing caches through xs→ys instead (the r5a layout)
        # round-trips the full per-layer cache through scan staging every
        # iteration — at flagship geometry that cache plumbing alone cost
        # ~9 ms of the 13 ms AR step (BENCH_NOTES r5b ablation); the
        # attention math itself runs at ~2 ms. Ops and order are
        # identical, so generated mel is bit-equal to the old layout.
        c = state.caches
        t_new = x.shape[-2]
        len_b = c.length[0]                      # [B]; lanes in lockstep
        start = len_b.reshape(-1)[0]
        new_len = len_b + t_new

        def sbody(carry, layer):
            h, k_all, v_all = carry
            blk, idx = layer
            hn = layer_norm(h, **blk["attn_ln"])
            p = blk["attn"]
            q = split_heads(linear(hn, p["q"]["w"], p["q"]["b"]),
                            cfg.num_heads)
            k = split_heads(linear(hn, p["k"]["w"], p["k"].get("b")),
                            cfg.num_heads)
            v = split_heads(linear(hn, p["v"]["w"], p["v"]["b"]),
                            cfg.num_heads)
            zero = jnp.int32(0)
            at = (idx, zero, zero, start, zero)
            k_all = jax.lax.dynamic_update_slice(
                k_all, k.astype(k_all.dtype)[None], at)
            v_all = jax.lax.dynamic_update_slice(
                v_all, v.astype(v_all.dtype)[None], at)
            cache_l = KVCache(k=k_all[idx], v=v_all[idx], length=new_len)
            mask = cache_l.valid_mask(t_new, causal=True)
            h = h + linear(
                merge_heads(attend(q, cache_l.k, cache_l.v, mask)),
                p["out"]["w"], p["out"]["b"])
            hn = layer_norm(h, **blk["mlp_ln"])
            h = h + linear(
                gelu(linear(hn, blk["mlp"]["fc1"]["w"],
                            blk["mlp"]["fc1"]["b"])),
                blk["mlp"]["fc2"]["w"], blk["mlp"]["fc2"]["b"])
            return (h, k_all, v_all), None

        (x, k_new, v_new), _ = jax.lax.scan(
            sbody, (x, c.k, c.v),
            (stacked, jnp.arange(cfg.layers, dtype=jnp.int32)),
            unroll=getattr(cfg, "scan_unroll", 1))
        new_state = TTSState(KVCache(
            k=k_new, v=v_new, length=c.length + t_new))
    else:
        caches = []
        for blk, cache in zip(params["blocks"], state.caches):
            x, cache = _block(blk, x, cfg.num_heads, cache)
            caches.append(cache)
        new_state = TTSState(tuple(caches))
    x = layer_norm(x, **params["ln"])
    mel = linear(x, params["mel_head"]["w"], params["mel_head"]["b"])
    stop = linear(x, params["stop_head"]["w"], params["stop_head"]["b"])[..., 0]
    return mel, stop, new_state


def _prompt_embedding(params: Params, cfg: TTSConfig, text_ids: jax.Array,
                      emotion: jax.Array, speaker: Optional[jax.Array],
                      text_vocab: int) -> jax.Array:
    """Build ``[B, P, d]`` prompt: [SPK] [EMO] text [BOA]."""
    ids = special_ids(text_vocab)
    b = text_ids.shape[0]
    emo_tok = ids.emotion_base + emotion  # [B]
    spk_tok = jnp.full((b,), ids.spk, dtype=jnp.int32)
    boa_tok = jnp.full((b,), ids.boa, dtype=jnp.int32)
    seq = jnp.concatenate(
        [spk_tok[:, None], emo_tok[:, None], text_ids, boa_tok[:, None]], axis=1
    )
    x = embedding_lookup(params["token_emb"], seq)
    if speaker is not None:
        spk_emb = linear(speaker, params["spk_proj"]["w"], params["spk_proj"]["b"])
        x = x.at[:, 0, :].add(spk_emb)
    return x


def tts_forward(params: Params, cfg: TTSConfig, text_ids: jax.Array,
                emotion: jax.Array, mel_groups: jax.Array,
                speaker: Optional[jax.Array] = None, text_vocab: int = 261,
                mel_inputs: Optional[jax.Array] = None
                ) -> Tuple[jax.Array, jax.Array]:
    """Teacher-forced training pass.

    ``text_ids[B, Lt]``, ``mel_groups[B, S, r*n_mels]`` (targets). Returns
    (mel_pred[B, S, r*n_mels], stop_logits[B, S]): position i predicts
    group i from prompt + groups < i.

    ``mel_inputs`` optionally replaces the teacher-forced audio PREFIX
    (targets stay ``mel_groups``): training with noise-corrupted prefixes
    closes the exposure-bias gap — at inference the prefix is the model's
    own imperfect output, and a model trained only on clean prefixes
    drifts into word repetition/looping on multi-word prompts (the r4
    roundtrip-WER finding; the standard scheduled-sampling/prenet-noise
    remedy for AR acoustic models).
    """
    prompt = _prompt_embedding(params, cfg, text_ids, emotion, speaker, text_vocab)
    # shift mel right: inputs are groups [:-1], first audio input is BOA slot
    src = mel_groups if mel_inputs is None else mel_inputs
    mel_in = _embed_mel(params, src[:, :-1, :])
    x = jnp.concatenate([prompt, mel_in], axis=1)

    b = text_ids.shape[0]
    total = x.shape[1]
    p = prompt.shape[1]
    base = audio_pos_base(cfg)
    # prompt at 0..P-1; audio groups at the FIXED base (text-length
    # invariant — see audio_pos_base)
    positions = jnp.concatenate(
        [jnp.arange(p), base + jnp.arange(total - p)]
    )[None, :]
    state = _make_state(cfg, b, total)
    mel, stop, _ = _forward_embedded(params, cfg, x, positions, state)
    # outputs at positions [p-1, total): predictions for each mel group
    return mel[:, p - 1 :, :], stop[:, p - 1 :]


def tts_generate(params: Params, cfg: TTSConfig, text_ids: jax.Array,
                 emotion: jax.Array, speaker: Optional[jax.Array] = None,
                 max_groups: Optional[int] = None, text_vocab: int = 261,
                 stop_threshold: float = 0.5
                 ) -> Tuple[jax.Array, jax.Array]:
    """KV-cached autoregressive sampling.

    Returns ``(mel[B, max_groups*r, n_mels], n_frames[B])`` — generated
    frames and the per-sequence valid frame count (stop-head controlled).
    """
    if max_groups is None:
        max_groups = cfg.max_mel_frames // cfg.reduction
    b = text_ids.shape[0]
    r_mels = cfg.reduction * cfg.n_mels
    if cfg.scan_layers:
        # stack layer weights ONCE, outside the sampling while_loop
        params = _prestack(params)
    prompt = _prompt_embedding(params, cfg, text_ids, emotion, speaker, text_vocab)
    cache_len = prompt.shape[1] + max_groups
    base = audio_pos_base(cfg)
    # generation caches live in the compute dtype (bf16 serving): the f32
    # default is for the teacher-forced training forward only. At flagship
    # scale the f32 cache doubled every per-step cache byte (r5b).
    state = _make_state(cfg, b, cache_len, dtype=jnp.dtype(cfg.dtype))
    mel0, stop0, state = _forward_embedded(
        params, cfg, prompt, jnp.arange(prompt.shape[1])[None, :], state
    )
    first = mel0[:, -1, :]  # prediction for group 0

    out = jnp.zeros((b, max_groups, r_mels), dtype=jnp.float32)
    out = out.at[:, 0, :].set(first)
    done = jax.nn.sigmoid(stop0[:, -1]) > stop_threshold
    n_groups = jnp.ones((b,), dtype=jnp.int32)

    def cond(carry):
        step, _, done, _, _ = carry
        return (step < max_groups) & ~jnp.all(done)

    def body(carry):
        step, out, done, n_groups, state = carry
        prev = jax.lax.dynamic_slice_in_dim(out, step - 1, 1, axis=1)  # [B,1,rm]
        x = _embed_mel(params, prev)
        # audio group g sits at the FIXED position base + g, independent
        # of the prompt length (audio_pos_base)
        pos = jnp.full((b, 1), base + step - 1, dtype=jnp.int32)
        mel, stop, state = _forward_embedded(params, cfg, x, pos, state)
        nxt = mel[:, 0, :]
        nxt = jnp.where(done[:, None], 0.0, nxt)
        out = jax.lax.dynamic_update_slice_in_dim(out, nxt[:, None, :], step, axis=1)
        n_groups = jnp.where(done, n_groups, step + 1)
        done = done | (jax.nn.sigmoid(stop[:, 0]) > stop_threshold)
        return step + 1, out, done, n_groups, state

    _, out, _, n_groups, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), out, done, n_groups, state)
    )
    mel = out.reshape(b, max_groups * cfg.reduction, cfg.n_mels)
    return mel, n_groups * cfg.reduction


# --------------------------------------------------------------------------
# chunked generation (streaming synthesis)
# --------------------------------------------------------------------------

def tts_prefill(params: Params, cfg: TTSConfig, text_ids: jax.Array,
                emotion: jax.Array, speaker: Optional[jax.Array] = None,
                max_groups: Optional[int] = None, text_vocab: int = 261,
                stop_threshold: float = 0.5
                ) -> Tuple[jax.Array, jax.Array, TTSState]:
    """Prompt prefill for chunked (streaming) generation.

    Returns ``(group0[B, r*n_mels], done[B], state)`` — the same first
    step :func:`tts_generate` takes, but exposing the KV state so the host
    can drive generation in chunks and vocode/emit audio as groups land
    (SURVEY §2.4 runtime overlap; turnaround latency vs the reference's
    2.8–3.0 s cloud round trip)."""
    if max_groups is None:
        max_groups = cfg.max_mel_frames // cfg.reduction
    if cfg.scan_layers:
        params = _prestack(params)
    b = text_ids.shape[0]
    prompt = _prompt_embedding(params, cfg, text_ids, emotion, speaker, text_vocab)
    state = _make_state(cfg, b, prompt.shape[1] + max_groups,
                        dtype=jnp.dtype(cfg.dtype))
    mel0, stop0, state = _forward_embedded(
        params, cfg, prompt, jnp.arange(prompt.shape[1])[None, :], state
    )
    first = mel0[:, -1, :]
    done = jax.nn.sigmoid(stop0[:, -1]) > stop_threshold
    return first, done, state


def tts_decode_chunk(params: Params, cfg: TTSConfig, state: TTSState,
                     prev_group: jax.Array, done: jax.Array,
                     start_group: jax.Array, n_steps: int,
                     stop_threshold: float = 0.5
                     ) -> Tuple[jax.Array, jax.Array, jax.Array, TTSState]:
    """Generate ``n_steps`` further mel groups from a prefilled state.

    ``prev_group[B, r*n_mels]`` is the last generated group (input to the
    first step); ``start_group`` its index. Returns
    ``(groups[B, n_steps, r*n_mels], dones[B, n_steps], last_group, done,
    state)`` with zeros after each sequence's stop — bit-matching what
    :func:`tts_generate` writes into its output buffer, so chunked and
    fused generation produce identical mel. ``dones[:, i]`` is the done
    flag BEFORE emitting group i (True ⇒ that group is padding zeros)."""
    if cfg.scan_layers:
        params = _prestack(params)
    b = prev_group.shape[0]
    base = audio_pos_base(cfg)

    def body(carry, step):
        prev, done, state = carry
        x = _embed_mel(params, prev[:, None, :])
        pos = jnp.full((b, 1), base + start_group + step, dtype=jnp.int32)
        mel, stop, state = _forward_embedded(params, cfg, x, pos, state)
        nxt = jnp.where(done[:, None], 0.0, mel[:, 0, :])
        was_done = done
        done = done | (jax.nn.sigmoid(stop[:, 0]) > stop_threshold)
        return (nxt, done, state), (nxt, was_done)

    (last, done, state), (groups, dones) = jax.lax.scan(
        body, (prev_group, done, state), jnp.arange(n_steps)
    )
    return (jnp.swapaxes(groups, 0, 1), jnp.swapaxes(dones, 0, 1),
            last, done, state)
