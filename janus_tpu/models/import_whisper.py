"""Import canonical Whisper-family checkpoints into janus_tpu ASR params.

Accepts a flat ``name -> numpy array`` state dict using HuggingFace
``WhisperModel`` naming (``model.encoder.layers.0.self_attn.q_proj.weight``
...) and produces the nested param tree consumed by
:mod:`janus_tpu.models.asr`. Torch ``Linear`` stores ``y = x Wᵀ`` weights
as ``[out, in]`` — transposed here; ``Conv1d`` stores ``[out, in, k]`` —
permuted to our ``[k, in, out]``.

This module is also what the numerics parity tests use to cross-check the
JAX implementation against the torch reference implementation.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from janus_tpu.common.config import ASRConfig

__all__ = ["params_from_hf_state_dict", "asr_config_from_hf"]


def _ln(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"]),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def _linear(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    out = {"w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        out["b"] = jnp.asarray(sd[f"{prefix}.bias"])
    return out


def _attn(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    return {
        "q": _linear(sd, f"{prefix}.q_proj"),
        "k": _linear(sd, f"{prefix}.k_proj"),
        "v": _linear(sd, f"{prefix}.v_proj"),
        "out": _linear(sd, f"{prefix}.out_proj"),
    }


def _mlp(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    return {
        "fc1": _linear(sd, f"{prefix}.fc1"),
        "fc2": _linear(sd, f"{prefix}.fc2"),
    }


def params_from_hf_state_dict(sd: Mapping[str, np.ndarray]) -> Dict:
    """Build the janus_tpu ASR param tree from HF Whisper weights."""
    sd = {k.removeprefix("model."): np.asarray(v) for k, v in sd.items()}

    n_enc = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("encoder.layers.")
    )
    n_dec = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("decoder.layers.")
    )

    enc_blocks = []
    for i in range(n_enc):
        p = f"encoder.layers.{i}"
        enc_blocks.append({
            "attn_ln": _ln(sd, f"{p}.self_attn_layer_norm"),
            "attn": _attn(sd, f"{p}.self_attn"),
            "mlp_ln": _ln(sd, f"{p}.final_layer_norm"),
            "mlp": _mlp(sd, p),
        })

    dec_blocks = []
    for i in range(n_dec):
        p = f"decoder.layers.{i}"
        dec_blocks.append({
            "attn_ln": _ln(sd, f"{p}.self_attn_layer_norm"),
            "attn": _attn(sd, f"{p}.self_attn"),
            "cross_ln": _ln(sd, f"{p}.encoder_attn_layer_norm"),
            "cross": _attn(sd, f"{p}.encoder_attn"),
            "mlp_ln": _ln(sd, f"{p}.final_layer_norm"),
            "mlp": _mlp(sd, p),
        })

    return {
        "encoder": {
            "conv1": {
                "w": jnp.asarray(sd["encoder.conv1.weight"].transpose(2, 1, 0)),
                "b": jnp.asarray(sd["encoder.conv1.bias"]),
            },
            "conv2": {
                "w": jnp.asarray(sd["encoder.conv2.weight"].transpose(2, 1, 0)),
                "b": jnp.asarray(sd["encoder.conv2.bias"]),
            },
            "blocks": enc_blocks,
            "ln_post": _ln(sd, "encoder.layer_norm"),
        },
        "decoder": {
            "token_emb": jnp.asarray(sd["decoder.embed_tokens.weight"]),
            "pos_emb": jnp.asarray(sd["decoder.embed_positions.weight"]),
            "blocks": dec_blocks,
            "ln": _ln(sd, "decoder.layer_norm"),
        },
    }


def asr_config_from_hf(hf_config) -> ASRConfig:
    """Map a ``transformers.WhisperConfig`` to :class:`ASRConfig`."""
    return ASRConfig(
        n_mels=hf_config.num_mel_bins,
        max_source_positions=hf_config.max_source_positions,
        d_model=hf_config.d_model,
        encoder_layers=hf_config.encoder_layers,
        decoder_layers=hf_config.decoder_layers,
        num_heads=hf_config.encoder_attention_heads,
        vocab_size=hf_config.vocab_size,
        max_target_positions=hf_config.max_target_positions,
    )
