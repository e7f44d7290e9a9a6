"""Synthetic speech corpus: a deterministic, learnable audio "language".

With zero network egress there are no pretrained checkpoints; this module
makes the framework *functional* anyway. It defines a tone-language where
each character is a fixed harmonic stack on a character-specific F0, words
are concatenated character tones, and utterances are word sequences with
gaps. Models trained on it are real speech models in miniature: the ASR
learns frequency→character transcription, the TTS learns text→mel
generation, the vocoder learns mel→waveform inversion — and the whole
codec round-trips actual text end to end (the basis of the WER/SNR
harness, BASELINE config 3).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

__all__ = [
    "WORDS",
    "char_frequency",
    "render_text",
    "sample_text",
    "sample_batch",
    "mel_targets_for",
]

# Small closed vocabulary: enough structure to be language-like, small
# enough to overfit quickly on CPU in tests.
WORDS = (
    "alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "nov", "oscar", "papa",
)

CHAR_SECONDS = 0.06      # per-character tone duration
WORD_GAP_SECONDS = 0.04  # silence between words
BASE_F0 = 120.0
F0_STEP = 24.0


def char_frequency(c: str) -> float:
    """Character → fundamental frequency (a–z mapped to a log-ish ladder)."""
    idx = max(0, min(ord(c.lower()) - ord("a"), 25))
    return BASE_F0 + F0_STEP * idx


# "Speakers": harmonic gain profiles (timbres) applied on top of the base
# (amp, amp/2, amp/4) stack. Speaker 0 = identity = the original voice, so
# existing checkpoints keep their training distribution.
SPEAKER_TIMBRES = (
    (1.0, 1.0, 1.0),    # default voice
    (1.0, 0.2, 2.4),    # hollow (3rd-harmonic heavy)
    (0.4, 2.0, 0.8),    # nasal (2nd-harmonic dominant)
    (1.0, 0.0, 0.0),    # pure tone
)


# Emotion → (f0 scale, amplitude scale): how the corpus *renders* the
# emotion tags of the wire protocol (reference tags:
# backend/services/synthesizer.py:158-175). Neutral is identity so
# emotion-less checkpoints keep their distribution.
EMOTION_RENDERING = {
    "neutral":    (1.00, 1.00),
    "excited":    (1.30, 1.60),
    "joyful":     (1.30, 1.00),
    "whispering": (1.00, 0.35),
    "shouting":   (1.00, 1.80),
    "sad":        (0.80, 0.70),
    "relaxed":    (0.85, 1.00),
    "panicked":   (1.45, 1.60),
    "serious":    (0.85, 1.10),
    "calm":       (0.90, 0.85),
    "angry":      (1.10, 1.70),
    "auto":       (1.00, 1.00),
}


def render_text(text: str, sample_rate: int = 16_000, amp: float = 0.3,
                noise: float = 0.002, seed: int = 0,
                speaker: int = 0, emotion: str = "neutral") -> np.ndarray:
    """Deterministic waveform for a text string. ``speaker`` selects a
    harmonic timbre profile (voice identity); ``emotion`` scales F0 and
    amplitude per :data:`EMOTION_RENDERING`."""
    rng = np.random.default_rng(seed)
    h1, h2, h3 = SPEAKER_TIMBRES[speaker % len(SPEAKER_TIMBRES)]
    f0_scale, amp_scale = EMOTION_RENDERING.get(emotion, (1.0, 1.0))
    amp = amp * amp_scale
    segs: List[np.ndarray] = []
    n_char = int(CHAR_SECONDS * sample_rate)
    n_gap = int(WORD_GAP_SECONDS * sample_rate)
    for w, word in enumerate(text.split()):
        if w > 0:
            segs.append(np.zeros(n_gap, dtype=np.float32))
        for c in word:
            f0 = char_frequency(c) * f0_scale
            t = np.arange(n_char) / sample_rate
            x = (
                amp * h1 * np.sin(2 * np.pi * f0 * t)
                + (amp / 2) * h2 * np.sin(2 * np.pi * 2 * f0 * t)
                + (amp / 4) * h3 * np.sin(2 * np.pi * 3 * f0 * t)
            )
            # short fade to avoid clicks (keeps the spectrum clean)
            ramp = min(32, n_char // 4)
            env = np.ones(n_char)
            env[:ramp] = np.linspace(0, 1, ramp)
            env[-ramp:] = np.linspace(1, 0, ramp)
            segs.append((x * env).astype(np.float32))
    if not segs:
        return np.zeros(n_char, dtype=np.float32)
    audio = np.concatenate(segs)
    if noise > 0:
        audio = audio + noise * rng.standard_normal(len(audio)).astype(np.float32)
    return audio.astype(np.float32)


def sample_text(rng: np.random.Generator, min_words: int = 1,
                max_words: int = 3) -> str:
    n = int(rng.integers(min_words, max_words + 1))
    return " ".join(WORDS[int(i)] for i in rng.integers(0, len(WORDS), n))


def sample_batch(
    rng: np.random.Generator,
    batch: int,
    tokenizer,
    sample_rate: int = 16_000,
    max_seconds: float = 2.0,
    max_tokens: int = 32,
    augment: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[str]]:
    """Batch for ASR training: (audio[B, T], tokens[B, L], mask[B, L], texts).

    tokens = [sot] text-bytes [eot], padded with eot; mask marks sot..eot
    inclusive (loss behind each real prediction target). ``augment=True``
    adds random leading silence (the VAD pre-roll a serving phrase carries)
    and ±30% gain so the model matches the live segmenter's output
    distribution.
    """
    t_max = int(max_seconds * sample_rate)
    audio = np.zeros((batch, t_max), dtype=np.float32)
    tokens = np.full((batch, max_tokens), tokenizer.eot, dtype=np.int32)
    mask = np.zeros((batch, max_tokens), dtype=np.float32)
    texts: List[str] = []
    for i in range(batch):
        text = sample_text(rng)
        texts.append(text)
        wav = render_text(text, sample_rate, seed=int(rng.integers(1 << 30)))
        offset = 0
        if augment:
            offset = int(rng.integers(0, int(0.5 * sample_rate)))
            wav = wav * float(rng.uniform(0.7, 1.3))
        end = min(offset + len(wav), t_max)
        audio[i, offset:end] = wav[: end - offset]
        ids = [tokenizer.sot] + tokenizer.encode(text)[: max_tokens - 2] + [tokenizer.eot]
        tokens[i, : len(ids)] = ids
        mask[i, : len(ids)] = 1.0
    return audio, tokens, mask, texts


def mel_targets_for(texts: List[str], n_mels: int, reduction: int,
                    max_groups: int, sample_rate: int = 16_000,
                    n_fft: int = 400, hop: int = 160,
                    speakers: Optional[List[int]] = None,
                    emotions: Optional[List[str]] = None,
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """TTS training targets: (mel_groups[B, S, r*n_mels], mask[B, S])."""
    import jax.numpy as jnp

    from janus_tpu.ops.mel import log_mel_spectrogram

    b = len(texts)
    if speakers is None:
        speakers = [0] * b
    if emotions is None:
        emotions = ["neutral"] * b
    out = np.zeros((b, max_groups, reduction * n_mels), dtype=np.float32)
    mask = np.zeros((b, max_groups), dtype=np.float32)
    for i, text in enumerate(texts):
        wav = render_text(text, sample_rate, seed=0, speaker=speakers[i],
                          emotion=emotions[i])  # deterministic target
        mel = np.asarray(log_mel_spectrogram(
            jnp.asarray(wav), sample_rate, n_fft, hop, n_mels
        ))
        n_frames = (mel.shape[0] // reduction) * reduction
        groups = mel[:n_frames].reshape(-1, reduction * n_mels)
        s = min(len(groups), max_groups)
        out[i, :s] = groups[:s]
        mask[i, :s] = 1.0
    return out, mask
