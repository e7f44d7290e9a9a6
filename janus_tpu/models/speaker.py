"""Speaker encoder for voice cloning.

The reference clones voices by shipping raw reference-audio bytes to the
cloud TTS (reference: backend/services/synthesizer.py:183-200). Here the
reference audio is embedded locally: log-mel statistics (mean ‖ std over
time) are projected to a d-dimensional speaker vector consumed by the TTS
[SPK] slot. Deterministic pooling means hot-reloading a new reference file
(reference: synthesizer.py:90-104) just recomputes one embedding.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from janus_tpu.models.params import KeyGen, normal_init
from janus_tpu.ops.layers import gelu, linear
from janus_tpu.ops.mel import log_mel_spectrogram

__all__ = ["init_speaker_encoder", "speaker_embed"]

Params = Dict


def init_speaker_encoder(key: jax.Array | int, n_mels: int = 80,
                         d_out: int = 512) -> Params:
    kg = KeyGen(key)
    return {
        "fc1": {"w": normal_init(kg(), (2 * n_mels, d_out)), "b": jnp.zeros((d_out,))},
        "fc2": {"w": normal_init(kg(), (d_out, d_out)), "b": jnp.zeros((d_out,))},
    }


def speaker_embed(params: Params, audio_16k: jax.Array,
                  n_mels: int = 80) -> jax.Array:
    """``audio_16k[..., T] -> speaker vector [..., d_out]`` (L2-normalized)."""
    mel = log_mel_spectrogram(audio_16k, n_mels=n_mels)
    stats = jnp.concatenate([mel.mean(axis=-2), mel.std(axis=-2)], axis=-1)
    h = gelu(linear(stats, params["fc1"]["w"], params["fc1"]["b"]))
    v = linear(h, params["fc2"]["w"], params["fc2"]["b"])
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6)
