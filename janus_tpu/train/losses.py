"""Loss functions for the three trainable model families.

The reference trains nothing (all weights arrive via dependencies); the
framework makes every model trainable in-house, which is what makes the
multi-chip mesh worth having (BASELINE configs 4-5 presume trained
checkpoints for the in-framework models).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from janus_tpu.common.config import ASRConfig, TTSConfig
from janus_tpu.models import asr as asr_mod
from janus_tpu.models import tts as tts_mod
from janus_tpu.models import vad as vad_mod

__all__ = ["asr_loss", "tts_loss", "vad_loss"]


def asr_loss(params, cfg: ASRConfig, mel: jax.Array, tokens: jax.Array,
             token_mask: jax.Array) -> Tuple[jax.Array, Dict]:
    """Teacher-forced seq2seq cross-entropy.

    ``mel[B, T, n_mels]``; ``tokens[B, L]`` includes the sot prefix and the
    eot terminator; ``token_mask[B, L]`` marks real (loss-bearing) targets.
    Position i's logits predict token i+1.
    """
    enc = asr_mod.encode_audio(params, cfg, mel)
    state = asr_mod.init_decode_state(params, cfg, enc, max_len=tokens.shape[1])
    logits, _ = asr_mod._decoder_forward(
        params, cfg, tokens[:, :-1],
        jnp.zeros(tokens.shape[:1], dtype=jnp.int32), state,
    )
    targets = tokens[:, 1:]
    mask = token_mask[:, 1:].astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    loss = jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    acc = jnp.sum((jnp.argmax(logits, -1) == targets) * mask) / jnp.maximum(
        jnp.sum(mask), 1.0
    )
    return loss, {"asr_ce": loss, "asr_acc": acc}


def tts_loss(params, cfg: TTSConfig, text_ids: jax.Array, emotion: jax.Array,
             mel_groups: jax.Array, group_mask: jax.Array,
             speaker: Optional[jax.Array] = None,
             text_vocab: int = 261,
             mel_inputs: Optional[jax.Array] = None) -> Tuple[jax.Array, Dict]:
    """Teacher-forced L1+L2 mel regression plus stop-flag BCE.

    ``mel_groups[B, S, r*n_mels]`` targets; ``group_mask[B, S]`` marks real
    groups (the last real group is the stop target). ``mel_inputs``
    optionally corrupts the teacher-forced prefix (exposure-bias
    regularization — see ``tts_forward``)."""
    mel_pred, stop_logits = tts_mod.tts_forward(
        params, cfg, text_ids, emotion, mel_groups, speaker, text_vocab,
        mel_inputs=mel_inputs,
    )
    m = group_mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    l1 = jnp.sum(jnp.abs(mel_pred - mel_groups).mean(-1) * m) / denom
    l2 = jnp.sum(((mel_pred - mel_groups) ** 2).mean(-1) * m) / denom

    # stop target: 1 at the final real group of each sequence
    lengths = jnp.sum(m, axis=-1)
    last_idx = jnp.maximum(lengths - 1, 0).astype(jnp.int32)
    stop_target = jax.nn.one_hot(last_idx, mel_groups.shape[1])
    bce = optax.sigmoid_binary_cross_entropy(stop_logits, stop_target)
    stop = jnp.sum(bce * m) / denom

    loss = l1 + l2 + 0.5 * stop
    return loss, {"tts_l1": l1, "tts_l2": l2, "tts_stop": stop}


def vocoder_loss(params, cfg, mel: jax.Array, target_wav: jax.Array
                 ) -> Tuple[jax.Array, Dict]:
    """Multi-resolution STFT loss + L1 waveform for the iSTFT vocoder.

    ``mel[B, T, n_mels]`` (the vocoder's own input representation),
    ``target_wav[B, T*hop]``.

    Phase supervision: the predicted complex spectra are compared per
    frame against the TRUE windowed STFT on the vocoder's own grid
    (``stft``/``istft`` here are an exact centered round-trip, so matching
    spectra ⇒ matching waveform). Waveform L1 alone conditions phase
    poorly through the overlap-add, and the multi-resolution magnitude
    terms are phase-blind; without this term copy-synthesis SNR plateaus
    near 10 dB.
    """
    from janus_tpu.models.vocoder import spectra_to_waveform, vocoder_spectra
    from janus_tpu.ops.stft import stft

    spec_pred = vocoder_spectra(params, cfg, mel)
    pred = spectra_to_waveform(cfg, spec_pred, length=target_wav.shape[-1])
    l1 = jnp.mean(jnp.abs(pred - target_wav))

    t = spec_pred.shape[-2]
    spec_true = stft(target_wav, n_fft=cfg.n_fft, hop=cfg.hop_length)[..., :t, :]
    cplx = jnp.mean(jnp.abs(spec_pred - spec_true)) / (
        jnp.mean(jnp.abs(spec_true)) + 1e-6
    )

    sc_total = 0.0
    mag_total = 0.0
    resolutions = ((512, 128), (1024, 256))
    for n_fft, hop in resolutions:
        sp = jnp.abs(stft(pred, n_fft=n_fft, hop=hop))
        st = jnp.abs(stft(target_wav, n_fft=n_fft, hop=hop))
        sc_total = sc_total + jnp.linalg.norm(sp - st) / jnp.maximum(
            jnp.linalg.norm(st), 1e-6
        )
        mag_total = mag_total + jnp.mean(
            jnp.abs(jnp.log(sp + 1e-5) - jnp.log(st + 1e-5))
        )
    n_res = len(resolutions)
    loss = 10.0 * l1 + 4.0 * cplx + sc_total / n_res + mag_total / n_res
    return loss, {"voc_l1": l1, "voc_cplx": cplx, "voc_sc": sc_total / n_res,
                  "voc_mag": mag_total / n_res}


def vad_loss(params, chunk_16k: jax.Array, label: jax.Array) -> Tuple[jax.Array, Dict]:
    """BCE on speech/non-speech chunk labels."""
    prob = vad_mod.vad_model_prob(params, chunk_16k)
    eps = 1e-6
    bce = -(label * jnp.log(prob + eps) + (1 - label) * jnp.log(1 - prob + eps))
    loss = jnp.mean(bce)
    acc = jnp.mean(((prob > 0.5) == (label > 0.5)).astype(jnp.float32))
    return loss, {"vad_bce": loss, "vad_acc": acc}
