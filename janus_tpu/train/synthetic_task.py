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
    "HARD_WORDS",
    "make_word_list",
    "char_frequency",
    "speaker_timbre",
    "render_text",
    "sample_text",
    "sample_batch",
    "mel_targets_for",
    "add_noise_snr",
]

# Small closed vocabulary: enough structure to be language-like, small
# enough to overfit quickly on CPU in tests.
WORDS = (
    "alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "nov", "oscar", "papa",
)


def make_word_list(n_words: int = 256, seed: int = 1234,
                   min_syllables: int = 2, max_syllables: int = 4) -> tuple:
    """Deterministic pronounceable vocabulary of ``n_words`` unique
    CV-syllable words (e.g. 'bakilo', 'zumepa'). This is the *hard-corpus*
    word inventory: at 256+ words the ASR can no longer pattern-match a
    handful of templates — it must genuinely track the per-character
    frequency ladder through speaker/rate/noise variation (the zero-egress
    stand-in for open-vocabulary English; reference capability:
    backend/services/transcriber.py:23-64)."""
    cons = "bdfgjklmnprstvz"
    vowels = "aeiou"
    rng = np.random.default_rng(seed)
    words: List[str] = []
    seen = set()
    while len(words) < n_words:
        n_syl = int(rng.integers(min_syllables, max_syllables + 1))
        w = "".join(
            cons[int(rng.integers(0, len(cons)))]
            + vowels[int(rng.integers(0, len(vowels)))]
            for _ in range(n_syl)
        )
        if w not in seen:
            seen.add(w)
            words.append(w)
    return tuple(words)


HARD_WORDS = make_word_list(256)

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


def speaker_timbre(speaker: int) -> Tuple[float, float, float]:
    """Harmonic gain profile for an arbitrary speaker index. Indices
    0..3 return the fixed :data:`SPEAKER_TIMBRES` (checkpoint compat);
    higher indices get deterministic pseudo-random timbres, giving the
    hard corpus an open set of voices."""
    if speaker < len(SPEAKER_TIMBRES):
        return SPEAKER_TIMBRES[speaker % len(SPEAKER_TIMBRES)]
    r = np.random.default_rng(9000 + speaker)
    return (float(r.uniform(0.3, 1.2)), float(r.uniform(0.0, 2.2)),
            float(r.uniform(0.0, 2.2)))


# Emotion → (amplitude scale, speaking-rate scale, vibrato depth, tremolo
# depth): how the corpus *renders* the emotion tags of the wire protocol
# (reference tags: backend/services/synthesizer.py:158-175). Deliberately
# NO F0 scaling: in the tone language the character F0 ladder IS the text
# content, so an emotion that shifted F0 would corrupt the transcript —
# exactly as a real TTS keeps phonemes intelligible while varying affect.
# (Round-2 rendering scaled F0 and broke round-trip WER; see docs/PARITY.md.)
# Vibrato depth is capped ≤ 0.015: the ladder step at 'z' (720 Hz) is
# 24/720 ≈ 3.3%, so deeper vibrato would cross character boundaries.
EMOTION_RENDERING = {
    #              amp   rate  vibrato tremolo
    "neutral":    (1.00, 1.00, 0.000, 0.00),
    "excited":    (1.60, 1.15, 0.012, 0.30),
    "joyful":     (1.15, 1.10, 0.012, 0.20),
    "whispering": (0.35, 0.95, 0.000, 0.10),
    "shouting":   (1.80, 1.05, 0.000, 0.00),
    "sad":        (0.70, 0.85, 0.008, 0.10),
    "relaxed":    (1.00, 0.90, 0.000, 0.00),
    "panicked":   (1.60, 1.30, 0.015, 0.35),
    "serious":    (1.10, 0.90, 0.000, 0.00),
    "calm":       (0.85, 0.90, 0.000, 0.00),
    "angry":      (1.70, 1.10, 0.000, 0.40),
    "auto":       (1.00, 1.00, 0.000, 0.00),
}

VIBRATO_HZ = 6.0
TREMOLO_HZ = 5.0


def render_text(text: str, sample_rate: int = 16_000, amp: float = 0.3,
                noise: float = 0.002, seed: int = 0,
                speaker: int = 0, emotion: str = "neutral",
                rate: float = 1.0, hop_quantize: int = 0) -> np.ndarray:
    """Deterministic waveform for a text string.

    ``speaker`` selects a harmonic timbre profile (voice identity, any
    index via :func:`speaker_timbre`); ``emotion`` modulates amplitude /
    rate / vibrato / tremolo per :data:`EMOTION_RENDERING` while leaving
    the character F0 ladder untouched; ``rate`` is an additional
    speaking-rate multiplier (>1 = faster) for corpus difficulty.

    ``hop_quantize`` (samples) rounds char/gap durations to that grid.
    The DECODE-stack corpora (TTS targets, vocoder pool) must pass their
    mel hop here: the vocoder learns phase only because every tone onset
    lands on the analysis grid — rate-scaled durations off the grid shift
    target phase by sub-hop offsets that are invisible in mel, capping
    copy-synthesis SNR near 13 dB (round-3 regression). ASR corpora keep
    the default 0 (continuous rates are part of their difficulty)."""
    rng = np.random.default_rng(seed)
    h1, h2, h3 = speaker_timbre(speaker)
    amp_scale, rate_scale, vib, trem = EMOTION_RENDERING.get(
        emotion, (1.0, 1.0, 0.0, 0.0))
    amp = amp * amp_scale
    total_rate = max(rate * rate_scale, 1e-3)
    segs: List[np.ndarray] = []
    n_char = max(16, int(CHAR_SECONDS / total_rate * sample_rate))
    n_gap = max(8, int(WORD_GAP_SECONDS / total_rate * sample_rate))
    if hop_quantize > 0:
        n_char = max(hop_quantize, round(n_char / hop_quantize) * hop_quantize)
        n_gap = max(hop_quantize, round(n_gap / hop_quantize) * hop_quantize)
    for w, word in enumerate(text.split()):
        if w > 0:
            segs.append(np.zeros(n_gap, dtype=np.float32))
        for c in word:
            f0 = char_frequency(c)
            t = np.arange(n_char) / sample_rate
            # phase-modulated vibrato: instantaneous frequency
            # f0 * (1 + vib*cos(2π f_v t)) — char identity preserved
            phase = 2 * np.pi * f0 * t
            if vib > 0:
                phase = phase + (f0 * vib / VIBRATO_HZ) * np.sin(
                    2 * np.pi * VIBRATO_HZ * t)
            x = (
                amp * h1 * np.sin(phase)
                + (amp / 2) * h2 * np.sin(2 * phase)
                + (amp / 4) * h3 * np.sin(3 * phase)
            )
            if trem > 0:
                x = x * (1.0 - trem / 2 + (trem / 2) * np.cos(
                    2 * np.pi * TREMOLO_HZ * t))
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


def add_noise_snr(audio: np.ndarray, snr_db: float, seed: int = 0) -> np.ndarray:
    """Additive white noise at a target SNR (dB) relative to signal power."""
    rng = np.random.default_rng(seed)
    p_sig = float(np.mean(audio.astype(np.float64) ** 2)) + 1e-12
    p_noise = p_sig / (10.0 ** (snr_db / 10.0))
    return (audio + np.sqrt(p_noise) *
            rng.standard_normal(len(audio))).astype(np.float32)


def sample_text(rng: np.random.Generator, min_words: int = 1,
                max_words: int = 3,
                vocab: Tuple[str, ...] = WORDS) -> str:
    n = int(rng.integers(min_words, max_words + 1))
    return " ".join(vocab[int(i)] for i in rng.integers(0, len(vocab), n))


def sample_batch(
    rng: np.random.Generator,
    batch: int,
    tokenizer,
    sample_rate: int = 16_000,
    max_seconds: float = 2.0,
    max_tokens: int = 32,
    augment: bool = False,
    vocab: Tuple[str, ...] = WORDS,
    min_words: int = 1,
    max_words: int = 3,
    n_speakers: int = 1,
    rate_range: Tuple[float, float] = (1.0, 1.0),
    snr_db_range: Optional[Tuple[float, float]] = None,
    clean_prob: float = 0.0,
    emotions: Tuple[str, ...] = ("neutral",),
    hop_quantize: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, List[str]]:
    """Batch for ASR training: (audio[B, T], tokens[B, L], mask[B, L], texts).

    tokens = [sot] text-bytes [eot], padded with eot; mask marks sot..eot
    inclusive (loss behind each real prediction target). ``augment=True``
    adds random leading silence (the VAD pre-roll a serving phrase carries)
    and ±30% gain so the model matches the live segmenter's output
    distribution.

    The hard-corpus knobs (``vocab=HARD_WORDS``, ``n_speakers``,
    ``rate_range``, ``snr_db_range``, ``emotions``) sample per-utterance
    speaker timbres, speaking rates, additive-noise SNRs and emotion
    renderings — the speech-like difficulty axis the default tone task
    lacks (VERDICT r2 §missing-1)."""
    t_max = int(max_seconds * sample_rate)
    audio = np.zeros((batch, t_max), dtype=np.float32)
    tokens = np.full((batch, max_tokens), tokenizer.eot, dtype=np.int32)
    mask = np.zeros((batch, max_tokens), dtype=np.float32)
    texts: List[str] = []
    for i in range(batch):
        text = sample_text(rng, min_words, max_words, vocab=vocab)
        texts.append(text)
        rate = float(rng.uniform(*rate_range))
        spk = int(rng.integers(0, n_speakers))
        emo = emotions[int(rng.integers(0, len(emotions)))]
        wav = render_text(text, sample_rate, seed=int(rng.integers(1 << 30)),
                          speaker=spk, emotion=emo, rate=rate,
                          hop_quantize=hop_quantize)
        if snr_db_range is not None:
            # One draw from the main stream regardless of the clean/noisy
            # outcome; the decision + SNR + noise seed come from a CHILD
            # generator so the render-seed stream is identical for every
            # (clean_prob, outcome) combination — seeded noisy-row WERs stay
            # comparable across recipes (advisor r3 finding).
            nrng = np.random.default_rng(int(rng.integers(1 << 30)))
            if nrng.random() >= clean_prob:
                # clean_prob: fraction of utterances rendered with NO added
                # noise, so the noise-free eval row stays in-distribution
                # even though train-time noise is otherwise always on
                snr = float(nrng.uniform(*snr_db_range))
                wav = add_noise_snr(wav, snr, seed=int(nrng.integers(1 << 30)))
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
                    tail_silence_frames: int = 4,
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """TTS training targets: (mel_groups[B, S, r*n_mels], mask[B, S]).

    All renders are zero-padded to one bucket and featurized as chunked
    BATCHES: per-utterance mel calls would compile one program per unique
    waveform length, and with rate-scaled emotion renderings nearly every
    utterance has a unique length (hundreds of remote-tunnel compiles —
    the round-3 stall). Masks use each render's own frame count, so the
    padding never leaks into the loss.

    ``tail_silence_frames`` extends each target by that many REAL silence
    frames before the stop flag (default 4 = vocoder n_fft/hop): the
    iSTFT head reconstructs a frame's samples from windows reaching
    ``n_fft/hop`` frames ahead, so a sequence that ends at full amplitude
    forces the end-flush to extrapolate — measured 15-20 dB copy-SNR tails
    (r5 finding: the last hop of every utterance sat at ~2 dB while the
    interior ran ~30 dB). A TTS that *generates* its own silence tail
    gives the vocoder true end context, no serving-path special cases."""
    import jax
    import jax.numpy as jnp

    from janus_tpu.ops.mel import log_mel_spectrogram

    b = len(texts)
    if speakers is None:
        speakers = [0] * b
    if emotions is None:
        emotions = ["neutral"] * b
    tail = tail_silence_frames * hop
    wavs = [
        np.pad(
            render_text(t, sample_rate, seed=0, speaker=speakers[i],
                        emotion=emotions[i],
                        hop_quantize=hop),  # deterministic, phase on grid
            (0, tail),
        )
        for i, t in enumerate(texts)
    ]
    # one bucket: enough for max_groups everywhere (frames = len // hop)
    t_max = max(max(len(w) for w in wavs),
                (max_groups * reduction + 1) * hop)
    t_max = -(-t_max // hop) * hop
    out = np.zeros((b, max_groups, reduction * n_mels), dtype=np.float32)
    mask = np.zeros((b, max_groups), dtype=np.float32)
    mel_fn = jax.jit(lambda a: log_mel_spectrogram(
        a, sample_rate, n_fft, hop, n_mels))
    for lo in range(0, b, 64):
        chunk = wavs[lo : lo + 64]
        padded = np.zeros((len(chunk), t_max), dtype=np.float32)
        for j, w in enumerate(chunk):
            padded[j, : len(w)] = w
        mels = np.asarray(mel_fn(jnp.asarray(padded)))  # [c, T//hop, mels]
        for j, w in enumerate(chunk):
            n_frames = ((len(w) // hop) // reduction) * reduction
            groups = mels[j, :n_frames].reshape(-1, reduction * n_mels)
            s = min(len(groups), max_groups)
            out[lo + j, :s] = groups[:s]
            mask[lo + j, :s] = 1.0
    return out, mask
