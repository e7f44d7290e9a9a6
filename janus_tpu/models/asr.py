"""Whisper-class speech recognizer: conv stem + transformer encoder,
KV-cached autoregressive text decoder, greedy decode under ``jit``.

The geometry matches the canonical Whisper family exactly (conv1 k3 s1 /
conv2 k3 s2 stems, pre-LN blocks, sinusoidal encoder positions, learned
decoder positions, tied embedding logits, bias-less K projections) so real
checkpoints import directly — while the implementation is pure JAX with
static shapes end to end. The reference reaches this model through the
CTranslate2 C++ runtime (reference: backend/services/transcriber.py:23-64);
here the encoder+decoder run as one XLA program per phrase batch.

Params are nested dicts (see :mod:`janus_tpu.models.params`), so tensor-
parallel partition rules match on paths like ``encoder/blocks/3/attn/q/w``.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.common.config import ASRConfig
from janus_tpu.models.params import KeyGen, normal_init, stack_layer_params
from janus_tpu.ops.attention import KVCache, attend, causal_mask, merge_heads, split_heads
from janus_tpu.ops.layers import conv1d, embedding_lookup, gelu, layer_norm, linear, sinusoid_positions
from janus_tpu.ops.mel import log_mel_spectrogram

__all__ = [
    "init_asr",
    "encode_audio",
    "decoder_prefill",
    "decoder_step",
    "greedy_decode",
    "prestack_decoder",
    "transcribe_mel",
    "prepare_mel",
    "DecodeState",
]

Params = Dict


# --------------------------------------------------------------------------
# initialization
# --------------------------------------------------------------------------

def _init_attn(kg: KeyGen, d: int, k_bias: bool = False) -> Params:
    p = {
        "q": {"w": normal_init(kg(), (d, d)), "b": jnp.zeros((d,))},
        "k": {"w": normal_init(kg(), (d, d))},
        "v": {"w": normal_init(kg(), (d, d)), "b": jnp.zeros((d,))},
        "out": {"w": normal_init(kg(), (d, d)), "b": jnp.zeros((d,))},
    }
    if k_bias:
        p["k"]["b"] = jnp.zeros((d,))
    return p


def _init_ln(d: int) -> Params:
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _init_mlp(kg: KeyGen, d: int, ratio: int) -> Params:
    return {
        "fc1": {"w": normal_init(kg(), (d, ratio * d)), "b": jnp.zeros((ratio * d,))},
        "fc2": {"w": normal_init(kg(), (ratio * d, d)), "b": jnp.zeros((d,))},
    }


def init_asr(key: jax.Array | int, cfg: ASRConfig) -> Params:
    kg = KeyGen(key)
    d = cfg.d_model
    enc_blocks = [
        {
            "attn_ln": _init_ln(d),
            "attn": _init_attn(kg, d),
            "mlp_ln": _init_ln(d),
            "mlp": _init_mlp(kg, d, cfg.mlp_ratio),
        }
        for _ in range(cfg.encoder_layers)
    ]
    dec_blocks = [
        {
            "attn_ln": _init_ln(d),
            "attn": _init_attn(kg, d),
            "cross_ln": _init_ln(d),
            "cross": _init_attn(kg, d),
            "mlp_ln": _init_ln(d),
            "mlp": _init_mlp(kg, d, cfg.mlp_ratio),
        }
        for _ in range(cfg.decoder_layers)
    ]
    return {
        "encoder": {
            "conv1": {"w": normal_init(kg(), (3, cfg.n_mels, d)), "b": jnp.zeros((d,))},
            "conv2": {"w": normal_init(kg(), (3, d, d)), "b": jnp.zeros((d,))},
            "blocks": enc_blocks,
            "ln_post": _init_ln(d),
        },
        "decoder": {
            "token_emb": normal_init(kg(), (cfg.vocab_size, d)),
            "pos_emb": normal_init(kg(), (cfg.max_target_positions, d)),
            "blocks": dec_blocks,
            "ln": _init_ln(d),
        },
    }


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

def _attention(p: Params, x: jax.Array, num_heads: int,
               mask: Optional[jax.Array] = None,
               sp_mesh: Optional[jax.sharding.Mesh] = None) -> jax.Array:
    from janus_tpu.ops.flash import flash_attention

    q = split_heads(linear(x, p["q"]["w"], p["q"]["b"]), num_heads)
    k = split_heads(linear(x, p["k"]["w"], p["k"].get("b")), num_heads)
    v = split_heads(linear(x, p["v"]["w"], p["v"]["b"]), num_heads)
    if sp_mesh is not None:
        # sequence-parallel: mel frames sharded over the "seq" axis, exact
        # attention via the ppermute KV ring (ICI-neighbor traffic only)
        from janus_tpu.parallel.ring_attention import ring_attention

        o = merge_heads(ring_attention(q, k, v, sp_mesh, axis_name="seq"))
    else:
        # encoder self-attention is unmasked -> Pallas fused kernel on TPU
        # (transparently the XLA path elsewhere)
        o = merge_heads(flash_attention(q, k, v, mask=mask))
    return linear(o, p["out"]["w"], p["out"]["b"])


def _mlp(p: Params, x: jax.Array) -> jax.Array:
    return linear(gelu(linear(x, p["fc1"]["w"], p["fc1"]["b"])), p["fc2"]["w"], p["fc2"]["b"])


def encode_audio(params: Params, cfg: ASRConfig, mel: jax.Array,
                 sp_mesh: Optional[jax.sharding.Mesh] = None,
                 scan_layers: bool = False) -> jax.Array:
    """``mel[..., T, n_mels] -> enc[..., T//2, d_model]``.

    T must be even and ≤ 2·max_source_positions. Canonically T = 3000
    (30 s at hop 160), giving 1500 encoder positions.

    With ``sp_mesh`` (a mesh carrying a "seq" axis), long mel sequences run
    sequence-parallel: GSPMD shards the conv stem / norms / MLPs over time
    (handling the conv halos), and self-attention uses the exact ppermute
    KV ring instead of an all-gather — the chunk-boundary-context-over-ICI
    design of BASELINE config 5.
    """
    enc = params["encoder"]
    x = gelu(conv1d(mel, enc["conv1"]["w"], enc["conv1"]["b"], stride=1, padding=1))
    x = gelu(conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], stride=2, padding=1))
    t = x.shape[-2]
    x = x + sinusoid_positions(t, cfg.d_model).astype(x.dtype)
    if sp_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_axis = ("data" if ("data" in sp_mesh.shape
                                 and sp_mesh.shape["data"] > 1) else None)
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(sp_mesh, P(batch_axis, "seq", None))
        )
    blocks_prestacked = isinstance(enc["blocks"], dict)
    if (scan_layers and sp_mesh is None
            and (blocks_prestacked or len(enc["blocks"]) > 1)):
        # lax.scan over stacked block params: one compiled block body
        # instead of L unrolled copies — essential for large-v3's 32
        # layers, where the unrolled HLO dominates compile time. A
        # host-prestacked tree (dict of [L, ...] leaves) is consumed
        # as-is: re-stacking inside the program would copy the weights
        # on every call.
        stacked = (enc["blocks"] if blocks_prestacked
                   else stack_layer_params(enc["blocks"]))

        def body(h, blk):
            h = h + _attention(blk["attn"], layer_norm(h, **blk["attn_ln"]),
                               cfg.num_heads)
            h = h + _mlp(blk["mlp"], layer_norm(h, **blk["mlp_ln"]))
            return h, None

        x, _ = jax.lax.scan(body, x, stacked,
                            unroll=getattr(cfg, "scan_unroll", 1))
    else:
        for blk in enc["blocks"]:
            x = x + _attention(blk["attn"], layer_norm(x, **blk["attn_ln"]),
                               cfg.num_heads, sp_mesh=sp_mesh)
            x = x + _mlp(blk["mlp"], layer_norm(x, **blk["mlp_ln"]))
    return layer_norm(x, **enc["ln_post"])


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

class DecodeState(NamedTuple):
    """Per-layer self-attention caches plus per-layer precomputed
    cross-attention K/V from the encoder output.

    Two layouts share this container:

    - **unrolled** (default): tuples of per-layer leaves;
    - **scan** (``scan_layers=True``): one stacked :class:`KVCache` whose
      leaves carry a leading layer axis, and ``cross_k``/``cross_v`` as
      single ``[L, ..., H, T_enc, Dh]`` arrays — the layout ``lax.scan``
      consumes. Deep decoders (large-v3: 32 layers) compile one block
      body instead of 32 unrolled copies.
    """

    self_caches: "Tuple[KVCache, ...] | KVCache"
    cross_k: "Tuple[jax.Array, ...] | jax.Array"   # each [..., H, T_enc, Dh]
    cross_v: "Tuple[jax.Array, ...] | jax.Array"

    @property
    def stacked(self) -> bool:
        return isinstance(self.self_caches, KVCache)

    @property
    def fill(self) -> jax.Array:
        """Per-lane fill count ``[...]`` (layer 0; layers are in lockstep)."""
        if self.stacked:
            return self.self_caches.length[0]
        return self.self_caches[0].length


def _stack_blocks(blocks: List[Params]) -> Params:
    """List of per-layer param trees → one tree with leading layer axis."""
    return stack_layer_params(blocks)


def _fuse_qkv(attn: Params) -> Params:
    """Self-attention q/k/v projection triple → one ``[d, 3d]`` matmul
    (``qkv``), zero-filling the bias-less K slot. Works on plain arrays
    and on (Dyn)QuantizedWeight pairs, per-layer or layer-stacked: the
    concatenation is along the output-channel axis, which both the bias
    and the per-output-channel quantization scales share. Cuts the decode
    loop's matmul count (3 small weight fetches → 1), numerically the
    same columns."""
    from janus_tpu.ops.quant import DynQuantizedWeight, QuantizedWeight

    q, k, v = attn["q"], attn["k"], attn["v"]
    wq, wk, wv = q["w"], k["w"], v["w"]
    if isinstance(wq, (QuantizedWeight, DynQuantizedWeight)):
        w = type(wq)(
            jnp.concatenate([wq.q, wk.q, wv.q], axis=-1),
            jnp.concatenate([wq.scale, wk.scale, wv.scale], axis=-1),
        )
    else:
        w = jnp.concatenate([wq, wk, wv], axis=-1)
    b = jnp.concatenate(
        [q["b"], k.get("b", jnp.zeros_like(q["b"])), v["b"]], axis=-1)
    return {"qkv": {"w": w, "b": b}, "out": attn["out"]}


def prepare_decode_params(params: Params, scan_layers: bool = False,
                          fuse_qkv: bool = True) -> Params:
    """Decode-loop layout transform (idempotent): optionally stack the
    decoder blocks for ``lax.scan`` and fuse each block's self-attention
    q/k/v into one matmul.

    Call it ONCE on the host (as ``runtime.codec.SemanticEncoder`` does at
    init) so neither the layer stack nor the fused weights are rebuilt —
    a full decoder-weight copy — on every dispatched program call;
    ``greedy_decode`` also applies it defensively at trace time, where the
    idempotence makes it free for pre-prepared trees."""
    dec = params["decoder"]
    blocks = dec["blocks"]

    def fuse_block(b: Params) -> Params:
        if fuse_qkv and "qkv" not in b["attn"]:
            return {**b, "attn": _fuse_qkv(b["attn"])}
        return b

    if isinstance(blocks, dict):
        blocks = fuse_block(blocks)
    elif scan_layers:
        blocks = fuse_block(_stack_blocks(blocks))
    else:
        blocks = [fuse_block(b) for b in blocks]
    return {**params, "decoder": {**dec, "blocks": blocks}}


def prestack_decoder(params: Params) -> Params:
    """Return ``params`` with ``decoder/blocks`` stacked along a leading
    layer axis (idempotent, no QKV fusion) — kept for callers that need
    the stacked-but-unfused layout; the decode loop uses
    :func:`prepare_decode_params`."""
    dec = params["decoder"]
    if isinstance(dec["blocks"], dict):
        return params
    return {**params, "decoder": {**dec, "blocks": _stack_blocks(dec["blocks"])}}


def _precompute_cross_kv(params: Params, cfg: ASRConfig, enc: jax.Array) -> Tuple:
    ks, vs = [], []
    for blk in params["decoder"]["blocks"]:
        p = blk["cross"]
        ks.append(split_heads(linear(enc, p["k"]["w"], p["k"].get("b")), cfg.num_heads))
        vs.append(split_heads(linear(enc, p["v"]["w"], p["v"]["b"]), cfg.num_heads))
    return tuple(ks), tuple(vs)


def init_decode_state(params: Params, cfg: ASRConfig, enc: jax.Array,
                      max_len: Optional[int] = None, dtype=jnp.float32,
                      scan_layers: bool = False,
                      cross_kv_int8: bool = False) -> DecodeState:
    """``cross_kv_int8`` stores the per-layer cross-attention K/V int8 with
    per-position scales in the transposed kernel layout
    (:class:`janus_tpu.ops.quant.QuantKVT`): the decode loop re-reads them
    every token, so this halves the dominant non-weight HBM stream at
    flagship scale, and the fused Pallas kernel
    (:mod:`janus_tpu.ops.cross_attn`) reads the int8 directly from HBM —
    no dense dequantized copy (VERDICT r4 task 5; reference analog:
    CTranslate2 int8 decode, backend/services/transcriber.py:26)."""
    from janus_tpu.ops.quant import quantize_kv_t

    batch_shape = enc.shape[:-2]
    if max_len is None:
        max_len = cfg.max_target_positions
    head_dim = cfg.d_model // cfg.num_heads
    if scan_layers:
        cache = KVCache.create(
            (cfg.decoder_layers,) + batch_shape, cfg.num_heads, max_len,
            head_dim, dtype=dtype,
        )
        blocks = params["decoder"]["blocks"]
        # only the cross projections are needed here — don't stack the
        # whole block tree when the caller hasn't prestacked it
        cross = (blocks["cross"] if isinstance(blocks, dict)
                 else _stack_blocks([b["cross"] for b in blocks]))

        def per_layer_kv(p):
            k = split_heads(linear(enc, p["k"]["w"], p["k"].get("b")), cfg.num_heads)
            v = split_heads(linear(enc, p["v"]["w"], p["v"]["b"]), cfg.num_heads)
            return k, v

        ck, cv = jax.vmap(per_layer_kv)(cross)
        if cross_kv_int8:
            ck, cv = quantize_kv_t(ck), quantize_kv_t(cv)
        return DecodeState(self_caches=cache, cross_k=ck, cross_v=cv)
    caches = tuple(
        KVCache.create(batch_shape, cfg.num_heads, max_len, head_dim, dtype=dtype)
        for _ in range(cfg.decoder_layers)
    )
    ck, cv = _precompute_cross_kv(params, cfg, enc)
    if cross_kv_int8:
        ck = tuple(quantize_kv_t(k) for k in ck)
        cv = tuple(quantize_kv_t(v) for v in cv)
    return DecodeState(self_caches=caches, cross_k=ck, cross_v=cv)


def _self_qkv(blk: Params, cfg: ASRConfig, x: jax.Array):
    """Pre-norm + self-attention projections (fused qkv when prepared —
    see prepare_decode_params); heads split."""
    h = layer_norm(x, **blk["attn_ln"])
    p = blk["attn"]
    if "qkv" in p:
        q, k, v = jnp.split(linear(h, p["qkv"]["w"], p["qkv"]["b"]), 3, axis=-1)
        return tuple(split_heads(t, cfg.num_heads) for t in (q, k, v))
    q = split_heads(linear(h, p["q"]["w"], p["q"]["b"]), cfg.num_heads)
    k = split_heads(linear(h, p["k"]["w"], p["k"].get("b")), cfg.num_heads)
    v = split_heads(linear(h, p["v"]["w"], p["v"]["b"]), cfg.num_heads)
    return q, k, v


def _decoder_layer_attnpost(
    blk: Params, cfg: ASRConfig, x: jax.Array, q: jax.Array,
    k_full: jax.Array, v_full: jax.Array, mask: jax.Array,
    cross_k: jax.Array, cross_v: jax.Array,
) -> jax.Array:
    """Everything after the self-KV write: self-attend → cross-attn → MLP.

    Cross-attention runs over the (static) encoder sequence. int8 K/V run
    the fused Pallas kernel on TPU (K/V stream from HBM as int8 and
    dequantize in VMEM — the XLA dequant path materialized a dense bf16
    copy per step and measured SLOWER than bf16, docs/ROOFLINE.md §1);
    dense K/V take the plain XLA path."""
    from janus_tpu.ops.cross_attn import cross_attention_kv

    p = blk["attn"]
    x = x + linear(
        merge_heads(attend(q, k_full, v_full, mask)),
        p["out"]["w"], p["out"]["b"],
    )
    h = layer_norm(x, **blk["cross_ln"])
    pc = blk["cross"]
    qc = split_heads(linear(h, pc["q"]["w"], pc["q"]["b"]), cfg.num_heads)
    x = x + linear(
        merge_heads(cross_attention_kv(qc, cross_k, cross_v)),
        pc["out"]["w"], pc["out"]["b"],
    )
    return x + _mlp(blk["mlp"], layer_norm(x, **blk["mlp_ln"]))


def _decoder_layer(
    blk: Params, cfg: ASRConfig, x: jax.Array, cache: KVCache,
    cross_k: jax.Array, cross_v: jax.Array, t_new: int,
) -> Tuple[jax.Array, KVCache]:
    """One decoder block: cached self-attn → cross-attn → MLP."""
    q, k, v = _self_qkv(blk, cfg, x)
    cache = cache.append_lockstep(k, v)
    mask = cache.valid_mask(t_new, causal=True)
    x = _decoder_layer_attnpost(blk, cfg, x, q, cache.k, cache.v, mask,
                                cross_k, cross_v)
    return x, cache


def _decoder_forward(
    params: Params, cfg: ASRConfig, tokens: jax.Array, pos_offset: jax.Array,
    state: DecodeState,
) -> Tuple[jax.Array, DecodeState]:
    """Run ``tokens[..., T_new]`` through the decoder, appending to caches.

    Returns logits ``[..., T_new, vocab]`` and the updated state. Dispatches
    on the state layout: unrolled per-layer python loop, or one
    ``lax.scan`` block body when the state was built with
    ``scan_layers=True`` (see :class:`DecodeState`).
    """
    dec = params["decoder"]
    t_new = tokens.shape[-1]
    positions = pos_offset[..., None] + jnp.arange(t_new)
    x = embedding_lookup(dec["token_emb"], tokens)
    x = x + embedding_lookup(dec["pos_emb"], positions)

    if state.stacked:
        stacked = (dec["blocks"] if isinstance(dec["blocks"], dict)
                   else _stack_blocks(dec["blocks"]))

        # Stacked self-caches ride the scan CARRY; each layer writes only
        # its new positions into the big buffer. Passing the caches
        # through xs→ys round-trips the full per-layer cache through scan
        # staging every iteration (the r5b TTS finding — there it was
        # ~9 ms of a 13 ms step). Cross K/V stay read-only xs. Ops and
        # order are unchanged → identical tokens.
        c = state.self_caches
        len_b = c.length[0]                      # [B]; lanes in lockstep
        start = len_b.reshape(-1)[0]
        new_len = len_b + t_new

        def body(carry, layer):
            h, k_all, v_all = carry
            blk, ck, cv, idx = layer
            q, k, v = _self_qkv(blk, cfg, h)
            zero = jnp.int32(0)
            at = (idx, zero, zero, start, zero)
            k_all = jax.lax.dynamic_update_slice(
                k_all, k.astype(k_all.dtype)[None], at)
            v_all = jax.lax.dynamic_update_slice(
                v_all, v.astype(v_all.dtype)[None], at)
            cache_l = KVCache(k=k_all[idx], v=v_all[idx], length=new_len)
            mask = cache_l.valid_mask(t_new, causal=True)
            h = _decoder_layer_attnpost(blk, cfg, h, q, cache_l.k,
                                        cache_l.v, mask, ck, cv)
            return (h, k_all, v_all), None

        n_layers = jax.tree.leaves(c)[0].shape[0]
        (x, k_new, v_new), _ = jax.lax.scan(
            body, (x, c.k, c.v),
            (stacked, state.cross_k, state.cross_v,
             jnp.arange(n_layers, dtype=jnp.int32)),
            unroll=getattr(cfg, "scan_unroll", 1),
        )
        new_caches = KVCache(k=k_new, v=v_new, length=c.length + t_new)
    else:
        caches: List[KVCache] = []
        for i, blk in enumerate(dec["blocks"]):
            x, cache = _decoder_layer(
                blk, cfg, x, state.self_caches[i],
                state.cross_k[i], state.cross_v[i], t_new,
            )
            caches.append(cache)
        new_caches = tuple(caches)

    x = layer_norm(x, **dec["ln"])
    logits = jnp.einsum(
        "...td,vd->...tv", x, dec["token_emb"], preferred_element_type=jnp.float32
    )
    return logits, DecodeState(new_caches, state.cross_k, state.cross_v)


def decoder_prefill(params: Params, cfg: ASRConfig, prompt: jax.Array,
                    state: DecodeState) -> Tuple[jax.Array, DecodeState]:
    """Process the prompt (e.g. sot sequence) in one pass; logits for the
    last prompt position predict the first generated token."""
    zero = jnp.zeros(prompt.shape[:-1], dtype=jnp.int32)
    logits, state = _decoder_forward(params, cfg, prompt, zero, state)
    return logits[..., -1, :], state


def decoder_step(params: Params, cfg: ASRConfig, token: jax.Array,
                 state: DecodeState) -> Tuple[jax.Array, DecodeState]:
    """One autoregressive step: ``token[...]`` → logits ``[..., vocab]``."""
    pos = state.fill
    logits, state = _decoder_forward(params, cfg, token[..., None], pos, state)
    return logits[..., 0, :], state


# --------------------------------------------------------------------------
# greedy decode
# --------------------------------------------------------------------------

def greedy_decode(
    params: Params,
    cfg: ASRConfig,
    enc: jax.Array,
    prompt: jax.Array,
    eot_id: int,
    max_new: Optional[int] = None,
    cache_dtype=jnp.float32,
    scan_layers: bool = False,
    cross_kv_int8: bool = False,
    fuse_qkv: bool = False,
) -> jax.Array:
    """Batched greedy search.

    ``enc`` is ``[B, T_enc, d]``; ``prompt`` is ``[B, P]`` (identical sot
    sequences). Returns ``[B, max_new]`` int32, padded with ``eot_id`` after
    each sequence finishes. Runs as a single ``lax.while_loop`` with early
    exit once every lane has emitted eot — one compiled program per
    (B, T_enc) bucket (reference behavior: greedy beam_size=1;
    backend/services/transcriber.py:53-57). ``scan_layers`` compiles one
    decoder block body via ``lax.scan`` (for deep flagship decoders).
    """
    if max_new is None:
        max_new = cfg.max_decode_tokens
    cache_len = prompt.shape[-1] + max_new
    if scan_layers or fuse_qkv:
        # stack/fuse decoder weights ONCE, outside the token while_loop
        # (idempotent — free when the caller pre-prepared on the host)
        params = prepare_decode_params(params, scan_layers=scan_layers,
                                       fuse_qkv=fuse_qkv)
    state = init_decode_state(params, cfg, enc, max_len=cache_len,
                              dtype=cache_dtype, scan_layers=scan_layers,
                              cross_kv_int8=cross_kv_int8)
    first_logits, state = decoder_prefill(params, cfg, prompt, state)
    first_tok = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)

    batch = prompt.shape[0]
    out = jnp.full((batch, max_new), eot_id, dtype=jnp.int32)
    out = out.at[:, 0].set(first_tok)
    done = first_tok == eot_id

    def cond(carry):
        step, _, done, _ = carry
        return (step < max_new) & ~jnp.all(done)

    def body(carry):
        step, out, done, state = carry
        tok = out[:, step - 1]
        logits, new_state = decoder_step(params, cfg, tok, state)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eot_id, nxt)
        out = out.at[:, step].set(nxt)
        done = done | (nxt == eot_id)
        # freeze cache growth for finished lanes is unnecessary: writes past
        # eot are masked out of the final transcript host-side
        return step + 1, out, done, new_state

    _, out, _, _ = jax.lax.while_loop(cond, body, (jnp.int32(1), out, done, state))
    return out


# --------------------------------------------------------------------------
# end-to-end helpers
# --------------------------------------------------------------------------

def prepare_mel(audio_16k: jax.Array, cfg: ASRConfig,
                pad_to_frames: Optional[int] = None) -> jax.Array:
    """16 kHz audio ``[..., T]`` → log-mel ``[..., frames, n_mels]`` padded/
    trimmed to a static frame count (default: the full 2·max_source_positions
    window, i.e. 30 s)."""
    if pad_to_frames is None:
        pad_to_frames = 2 * cfg.max_source_positions
    target_samples = pad_to_frames * cfg.hop_length
    t = audio_16k.shape[-1]
    if t < target_samples:
        audio_16k = jnp.pad(
            audio_16k, [(0, 0)] * (audio_16k.ndim - 1) + [(0, target_samples - t)]
        )
    else:
        audio_16k = audio_16k[..., :target_samples]
    # fused Pallas matmul-DFT frontend on TPU; FFT path elsewhere
    from janus_tpu.ops.mel_pallas import log_mel_spectrogram_fused

    return log_mel_spectrogram_fused(
        audio_16k, n_fft=cfg.n_fft, hop=cfg.hop_length, n_mels=cfg.n_mels
    )


def transcribe_mel(params: Params, cfg: ASRConfig, mel: jax.Array,
                   prompt: jax.Array, eot_id: int,
                   max_new: Optional[int] = None,
                   scan_layers: bool = False) -> jax.Array:
    """mel → token ids (jittable end-to-end)."""
    enc = encode_audio(params, cfg, mel, scan_layers=scan_layers)
    return greedy_decode(params, cfg, enc, prompt, eot_id, max_new,
                         scan_layers=scan_layers)
