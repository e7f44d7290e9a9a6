"""Model zoo: resolve named model configurations + checkpoints.

``load("demo")`` returns the committed tone-language demo models (ASR +
TTS + vocoder) ready to plug into SemanticEncoder / Synthesizer; ``load``
also accepts HF-format Whisper checkpoint directories for the real model
family when assets are present (zero-egress containers won't have them).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Optional

from janus_tpu.common.config import ASRConfig, JanusConfig, TTSConfig, VocoderConfig

__all__ = ["ModelBundle", "load_demo", "demo_available",
           "load_demo_hard", "hard_available", "REPO_ROOT"]

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CKPT_DIR = os.path.join(REPO_ROOT, "checkpoints")


@dataclass
class ModelBundle:
    config: JanusConfig
    asr_params: Optional[Any] = None
    tts_params: Optional[Any] = None
    vocoder_params: Optional[Any] = None
    speaker_params: Optional[Any] = None
    default_speaker_vec: Optional[Any] = None


def demo_available(ckpt_dir: str = _CKPT_DIR) -> bool:
    return os.path.exists(os.path.join(ckpt_dir, "demo_asr.npz"))


def load_demo(ckpt_dir: str = _CKPT_DIR,
              base: Optional[JanusConfig] = None) -> ModelBundle:
    """The committed tone-language demo bundle (see janus_tpu.train.demo)."""
    from janus_tpu.eval.roundtrip import load_npz_params
    from janus_tpu.train.demo import (
        demo_asr_config,
        demo_tts_config,
        demo_vocoder_config,
    )

    cfg = base if base is not None else JanusConfig.from_env()
    cfg = cfg.override(**{f"asr.{k}": v for k, v in demo_asr_config().__dict__.items()})
    cfg = cfg.override(**{f"tts.{k}": v for k, v in demo_tts_config().__dict__.items()})
    cfg = cfg.override(
        **{f"vocoder.{k}": v for k, v in demo_vocoder_config().__dict__.items()}
    )

    bundle = ModelBundle(config=cfg)
    asr_path = os.path.join(ckpt_dir, "demo_asr.npz")
    if os.path.exists(asr_path):
        bundle.asr_params = load_npz_params(asr_path)
    tts_path = os.path.join(ckpt_dir, "demo_tts.npz")
    if os.path.exists(tts_path):
        bundle.tts_params = load_npz_params(tts_path)
    voc_path = os.path.join(ckpt_dir, "demo_vocoder.npz")
    if os.path.exists(voc_path):
        bundle.vocoder_params = load_npz_params(voc_path)
    spk_path = os.path.join(ckpt_dir, "demo_speaker.npz")
    if os.path.exists(spk_path):
        bundle.speaker_params = load_npz_params(spk_path)
        # default voice = synthetic speaker 0's enrollment embedding
        import jax.numpy as jnp

        from janus_tpu.models.speaker import speaker_embed
        from janus_tpu.train.demo import ENROLLMENT_PHRASE
        from janus_tpu.train.synthetic_task import render_text

        ref = render_text(ENROLLMENT_PHRASE, 16_000, seed=0, speaker=0)
        bundle.default_speaker_vec = speaker_embed(
            bundle.speaker_params, jnp.asarray(ref), n_mels=cfg.tts.n_mels
        )
    return bundle


def hard_available(ckpt_dir: str = _CKPT_DIR) -> bool:
    return (os.path.exists(os.path.join(ckpt_dir, "demo_asr_hard.npz"))
            and os.path.exists(os.path.join(ckpt_dir, "demo_tts_hard.npz")))


def load_demo_hard(ckpt_dir: str = _CKPT_DIR,
                   base: Optional[JanusConfig] = None) -> ModelBundle:
    """The hard-corpus bundle: 256-word/16-speaker ASR + hard-corpus TTS
    (sharing the demo vocoder — it is trained on arbitrary character
    strings, not corpus words). This is the decode-side generality stand-in
    for the reference's arbitrary-text cloud TTS
    (reference: backend/services/synthesizer.py:106-207)."""
    from janus_tpu.eval.roundtrip import load_npz_params
    from janus_tpu.train.demo import (
        demo_speaker_vectors,
        demo_vocoder_config,
        hard_asr_config,
        hard_tts_config,
    )

    cfg = base if base is not None else JanusConfig.from_env()
    cfg = cfg.override(**{f"asr.{k}": v for k, v in hard_asr_config().__dict__.items()})
    cfg = cfg.override(**{f"tts.{k}": v for k, v in hard_tts_config().__dict__.items()})
    cfg = cfg.override(
        **{f"vocoder.{k}": v for k, v in demo_vocoder_config().__dict__.items()}
    )

    bundle = ModelBundle(config=cfg)
    asr_path = os.path.join(ckpt_dir, "demo_asr_hard.npz")
    if os.path.exists(asr_path):
        bundle.asr_params = load_npz_params(asr_path)
    tts_path = os.path.join(ckpt_dir, "demo_tts_hard.npz")
    if os.path.exists(tts_path):
        bundle.tts_params = load_npz_params(tts_path)
    voc_path = os.path.join(ckpt_dir, "demo_vocoder.npz")
    if os.path.exists(voc_path):
        bundle.vocoder_params = load_npz_params(voc_path)
    # speaker encoder is deterministic (seed 42) but d_out follows the TTS
    # width, so the hard bundle derives its own default voice
    spk_params, vecs = demo_speaker_vectors(cfg.tts)
    bundle.speaker_params = spk_params
    bundle.default_speaker_vec = vecs[0]
    return bundle
