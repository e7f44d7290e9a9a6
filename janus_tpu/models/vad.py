"""Voice activity detection: the pipeline's gatekeeper.

Replaces the reference's TorchScript Silero gate (reference:
backend/services/vad.py:30-77 — per-chunk speech probability thresholded
at 0.5) with two in-framework backends behind one interface:

- ``energy``: a deterministic adaptive-noise-floor gate. Zero weights,
  works out of the box, used as the default runtime gate.
- ``model``: a small spectral conv/GRU-free scoring network in JAX,
  trainable with :mod:`janus_tpu.train`, for deployments that want a
  learned gate. Same ``[B] -> probability`` contract.

Both are fully batched: the runtime scores a whole session batch of
chunks with one jitted call per engine tick.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.common.config import VADConfig
from janus_tpu.models.params import KeyGen, normal_init
from janus_tpu.ops.layers import gelu, linear
from janus_tpu.ops.resample import decimate_48k_to_16k

__all__ = ["init_vad", "vad_model_prob", "energy_gate_prob", "VoiceActivityDetector"]

Params = Dict

_N_BANDS = 64


def _spectral_features(chunk_16k: jax.Array) -> jax.Array:
    """Log band-energy features ``[..., n_bands]`` from ``[..., T]`` audio."""
    spec = jnp.abs(jnp.fft.rfft(chunk_16k.astype(jnp.float32), axis=-1))
    n_freqs = spec.shape[-1]
    # average adjacent bins into _N_BANDS bands (static reshape)
    usable = (n_freqs // _N_BANDS) * _N_BANDS
    bands = spec[..., :usable].reshape(spec.shape[:-1] + (_N_BANDS, -1)).mean(-1)
    return jnp.log1p(bands * 100.0)


def init_vad(key: jax.Array | int, cfg: Optional[VADConfig] = None) -> Params:
    kg = KeyGen(key)
    h = 64
    return {
        "fc1": {"w": normal_init(kg(), (_N_BANDS, h), scale=0.1), "b": jnp.zeros((h,))},
        "fc2": {"w": normal_init(kg(), (h, h), scale=0.1), "b": jnp.zeros((h,))},
        "out": {"w": normal_init(kg(), (h, 1), scale=0.1), "b": jnp.zeros((1,))},
    }


def vad_model_prob(params: Params, chunk_16k: jax.Array) -> jax.Array:
    """Speech probability ``[...]`` for 16 kHz chunk(s) ``[..., T]``."""
    f = _spectral_features(chunk_16k)
    h = gelu(linear(f, params["fc1"]["w"], params["fc1"]["b"]))
    h = gelu(linear(h, params["fc2"]["w"], params["fc2"]["b"]))
    logit = linear(h, params["out"]["w"], params["out"]["b"])[..., 0]
    return jax.nn.sigmoid(logit)


def energy_gate_prob(
    chunk_16k: jax.Array, noise_floor: jax.Array, gate_rms: float = 0.015
) -> Tuple[jax.Array, jax.Array]:
    """Deterministic gate: probability from the margin between chunk RMS and
    an exponentially-tracked noise floor. Returns ``(prob, new_floor)``.

    The floor adapts fast downward (silence) and slowly upward, so steady
    background noise is rejected while speech onsets pass. Mapping to a
    (0,1) "probability" keeps the 0.5-threshold contract of the reference.
    """
    x = chunk_16k.astype(jnp.float32)
    rms = jnp.sqrt(jnp.mean(x * x, axis=-1))
    is_quieter = rms < noise_floor
    new_floor = jnp.where(
        is_quieter,
        0.5 * noise_floor + 0.5 * rms,     # fall fast
        0.99 * noise_floor + 0.01 * rms,   # rise slowly
    )
    threshold = jnp.maximum(3.0 * new_floor, gate_rms)
    prob = jax.nn.sigmoid(8.0 * (rms / jnp.maximum(threshold, 1e-6) - 1.0))
    return prob, new_floor


class VoiceActivityDetector:
    """Drop-in behavioral equivalent of the reference gate
    (reference: backend/services/vad.py:40-77): ``is_speech(chunk) -> bool``
    on 48 kHz float32 chunks, thresholded at ``cfg.threshold``.

    Stateless across ``reset()`` like the reference; the energy backend
    carries only its adaptive noise floor (reset restores it).
    """

    def __init__(
        self,
        cfg: Optional[VADConfig] = None,
        params: Optional[Params] = None,
        sample_rate: int = 48_000,
    ) -> None:
        self.cfg = cfg or VADConfig()
        self.sample_rate = sample_rate
        self.params = params
        backend = self.cfg.backend if params is None else "model"
        if params is None and backend == "model":
            backend = "energy"  # no weights -> deterministic gate
        self.backend = backend
        self._floor = jnp.asarray(1e-3)
        self._prob_fn = jax.jit(self._prob_impl)

    def _prob_impl(self, params, chunk: jax.Array, floor: jax.Array):
        # params traced, not closed over (closure capture inlines weights
        # into the HLO as constants)
        if self.sample_rate == 48_000:
            chunk16 = decimate_48k_to_16k(chunk)
        else:
            chunk16 = chunk
        if self.backend == "model":
            return vad_model_prob(params, chunk16), floor
        return energy_gate_prob(chunk16, floor, self.cfg.energy_gate_rms)

    def speech_prob(self, chunk: np.ndarray) -> float:
        prob, new_floor = self._prob_fn(self.params, jnp.asarray(chunk),
                                        self._floor)
        self._floor = new_floor
        return float(prob)

    def is_speech(self, chunk: np.ndarray) -> bool:
        return self.speech_prob(chunk) > self.cfg.threshold

    def reset(self) -> None:
        self._floor = jnp.asarray(1e-3)
