"""Generative vocoder: mel → waveform via an iSTFT head (Vocos-style).

Instead of HiFi-GAN's deep transposed-conv upsampling stack — hostile to
XLA fusion and latency — the backbone stays at mel frame rate (ConvNeXt-
style 1-D blocks: depthwise conv k7 + pointwise MLP + layer scale) and two
linear heads predict log-magnitude and phase (cos/sin pair) per STFT bin;
the waveform is reconstructed with one windowed overlap-add inverse STFT.
Everything is static-shape, fully parallel over frames, and lowers to a
handful of MXU matmuls + one batched irfft.

This realizes the BASELINE "upsampling convs + iSTFT/HiFi-GAN-class head"
capability natively (the reference outsourced waveform generation to the
Fish Audio cloud; reference: backend/services/synthesizer.py:191-207).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.common.config import VocoderConfig
from janus_tpu.models.params import KeyGen, normal_init
from janus_tpu.ops.layers import gelu, layer_norm, linear
from janus_tpu.ops.stft import hann_window, istft

__all__ = ["init_vocoder", "vocoder_waveform", "vocoder_spectra",
           "spectra_to_waveform", "vocoder_halo_frames"]

Params = Dict


def _init_block(kg: KeyGen, d: int, k: int = 7, mlp: int = 3) -> Params:
    return {
        "dwconv": {"w": normal_init(kg(), (k, d), scale=0.1), "b": jnp.zeros((d,))},
        "ln": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "pw1": {"w": normal_init(kg(), (d, mlp * d)), "b": jnp.zeros((mlp * d,))},
        "pw2": {"w": normal_init(kg(), (mlp * d, d)), "b": jnp.zeros((d,))},
        "gamma": jnp.full((d,), 1e-2),
    }


def init_vocoder(key: jax.Array | int, cfg: VocoderConfig, n_mels: int = 80) -> Params:
    kg = KeyGen(key)
    d = cfg.d_model
    n_bins = cfg.n_fft // 2 + 1
    return {
        "embed": {"w": normal_init(kg(), (n_mels, d)), "b": jnp.zeros((d,))},
        "blocks": [_init_block(kg, d) for _ in range(cfg.layers)],
        "ln_out": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "mag_head": {"w": normal_init(kg(), (d, n_bins)), "b": jnp.zeros((n_bins,))},
        "phase_head": {"w": normal_init(kg(), (d, 2 * n_bins)),
                       "b": jnp.zeros((2 * n_bins,))},
    }


def _depthwise_conv(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Depthwise 1-D conv over ``[..., T, D]`` with kernel ``[K, D]``,
    same-padded. Expressed as a sum of K shifted scalings — for K=7 XLA
    fuses this into one elementwise chain, no im2col."""
    k = w.shape[0]
    half = k // 2
    t = x.shape[-2]
    pad = [(0, 0)] * (x.ndim - 2) + [(half, half), (0, 0)]
    xp = jnp.pad(x, pad)
    y = jnp.zeros_like(x)
    for i in range(k):
        y = y + xp[..., i : i + t, :] * w[i]
    return y + b


def vocoder_spectra(params: Params, cfg: VocoderConfig,
                    mel: jax.Array) -> jax.Array:
    """``mel[..., T, n_mels] -> complex spec[..., T, n_fft//2+1]``.

    The frame-local half of the vocoder: ConvNeXt backbone + mag/phase
    heads. Frame f's spectrum depends only on mel frames within
    ``3 * layers`` (depthwise k=7 ⇒ 3 per block) — the property chunked
    streaming synthesis exploits (:mod:`janus_tpu.runtime.streaming_tts`).
    """
    x = linear(mel, params["embed"]["w"], params["embed"]["b"])
    for blk in params["blocks"]:
        h = _depthwise_conv(x, blk["dwconv"]["w"], blk["dwconv"]["b"])
        h = layer_norm(h, **blk["ln"])
        h = linear(gelu(linear(h, blk["pw1"]["w"], blk["pw1"]["b"])),
                   blk["pw2"]["w"], blk["pw2"]["b"])
        x = x + blk["gamma"] * h
    x = layer_norm(x, **params["ln_out"])

    log_mag = linear(x, params["mag_head"]["w"], params["mag_head"]["b"])
    mag = jnp.exp(jnp.clip(log_mag, -14.0, 6.0))
    ph = linear(x, params["phase_head"]["w"], params["phase_head"]["b"])
    n_bins = cfg.n_fft // 2 + 1
    cos_p, sin_p = ph[..., :n_bins], ph[..., n_bins:]
    norm = jax.lax.rsqrt(cos_p**2 + sin_p**2 + 1e-7)
    return (mag * cos_p * norm) + 1j * (mag * sin_p * norm)


def spectra_to_waveform(cfg: VocoderConfig, spec: jax.Array,
                        length: Optional[int] = None,
                        tail_repeat: bool = True) -> jax.Array:
    """Windowed overlap-add iSTFT of vocoder spectra.

    With ``tail_repeat`` the final frame is repeated ``n_fft // hop``
    times so the centered iSTFT's edge trim still yields the full
    ``T * hop`` samples — the utterance-end flush. Chunked synthesis
    passes ``tail_repeat=False`` for interior chunks (the next chunk's
    halo provides that context) and slices the overlap region itself."""
    t = spec.shape[-2]
    if tail_repeat:
        extra = cfg.n_fft // cfg.hop_length
        tail = jnp.repeat(spec[..., -1:, :], extra, axis=-2)
        spec = jnp.concatenate([spec, tail], axis=-2)
    wav = istft(spec, n_fft=cfg.n_fft, hop=cfg.hop_length,
                window=hann_window(cfg.n_fft))
    out_len = length if length is not None else t * cfg.hop_length
    return wav[..., :out_len]


def vocoder_waveform(params: Params, cfg: VocoderConfig, mel: jax.Array,
                     length: Optional[int] = None) -> jax.Array:
    """``mel[..., T, n_mels] -> waveform[..., T*hop]``."""
    spec = vocoder_spectra(params, cfg, mel)
    return spectra_to_waveform(cfg, spec, length=length)


def vocoder_halo_frames(cfg: VocoderConfig) -> int:
    """Mel frames of one-sided context for exact chunked backbone output
    (each ConvNeXt block's depthwise k=7 conv adds 3 frames per side)."""
    return 3 * cfg.layers
