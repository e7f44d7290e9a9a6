"""Train functional demo models on the synthetic tone-language.

Produces small but *working* checkpoints — the zero-egress stand-in for
pretrained weights: after a few hundred steps the ASR transcribes the
tone-language exactly, making the end-to-end codec produce real text
(and the WER harness meaningful).

CLI::

    python -m janus_tpu.train.demo --steps 600 --out checkpoints/demo
"""

from __future__ import annotations

import argparse
import logging
import time
from typing import Optional, Tuple

import numpy as np

from janus_tpu.common.config import ASRConfig, MeshConfig
from janus_tpu.models import asr as asr_mod
from janus_tpu.models.tokenizer import ByteTokenizer
from janus_tpu.parallel.mesh import build_mesh
from janus_tpu.parallel.sharding import ASR_PARTITION_RULES
from janus_tpu.train.losses import asr_loss
from janus_tpu.train.synthetic_task import sample_batch
from janus_tpu.train.trainer import Trainer

logger = logging.getLogger(__name__)

__all__ = ["demo_asr_config", "train_demo_asr", "evaluate_asr"]


def demo_asr_config() -> ASRConfig:
    """Small enough to train on CPU in minutes, structured like the real
    thing (conv stem + enc/dec attention + byte vocab)."""
    return ASRConfig(
        n_mels=80, d_model=128, encoder_layers=2, decoder_layers=2,
        num_heads=4, vocab_size=ByteTokenizer().vocab_size,
        max_source_positions=128, max_target_positions=48,
        max_decode_tokens=32, dtype="float32",
    )


def hard_asr_config() -> ASRConfig:
    """Geometry for the HARD corpus (256-word vocabulary, 16 speakers,
    0.8-1.25x speaking rates, additive noise, up to 5-word utterances —
    janus_tpu.train.synthetic_task.HARD_WORDS). Longer encoder window
    (3.84 s) and a wider model than the toy demo."""
    return ASRConfig(
        n_mels=80, d_model=192, encoder_layers=3, decoder_layers=3,
        num_heads=6, vocab_size=ByteTokenizer().vocab_size,
        max_source_positions=192, max_target_positions=64,
        max_decode_tokens=48, dtype="float32",
    )


# Corpus knobs shared by the standard retrain and the roundtrip eval: the
# demo ASR must transcribe everything the demo TTS can RENDER — all
# emotion renderings (rate 0.85-1.3x, tremolo/vibrato, whisper-to-shout
# amplitudes) across the 4 fixed speaker timbres.
STANDARD_CORPUS = dict(
    n_speakers=4,
    rate_range=(0.95, 1.05),
    emotions=("neutral", "excited", "joyful", "whispering", "shouting",
              "sad", "relaxed", "panicked", "serious", "calm", "angry"),
    # the decode stack renders on the mel hop grid (render_text
    # hop_quantize) — the ASR that transcribes its output trains on the
    # same distribution
    hop_quantize=160,
)

def _hard_corpus() -> dict:
    from janus_tpu.train.synthetic_task import HARD_WORDS

    return dict(
        vocab=HARD_WORDS,
        n_speakers=16,
        rate_range=(0.8, 1.25),
        # up to 40 dB, plus a 25% no-noise fraction: train-time noise
        # otherwise makes the noise-free eval row out-of-distribution
        # (round-3 finding: WER[snr10] 0.068 < WER[clean] 0.086 with an
        # always-noisy (8, 30) range)
        snr_db_range=(8.0, 40.0),
        clean_prob=0.25,
        min_words=1,
        max_words=5,
        emotions=("neutral", "excited", "joyful", "whispering", "shouting",
                  "sad", "relaxed", "panicked", "serious", "calm", "angry"),
    )


HARD_CORPUS = _hard_corpus()


def _bg_render(fn, label: str = "pool"):
    """Run ``fn`` (a pool builder) in a daemon thread; the returned join()
    yields its result — or falls back to a synchronous re-render if the
    thread died. Without this a render exception (e.g. during a tunnel
    stall) surfaces hundreds of steps later as a bare KeyError and kills
    the whole run (advisor r4)."""
    import threading

    box: dict = {}

    def work():
        try:
            box["out"] = fn()
        except Exception as e:  # noqa: BLE001 — captured, re-raised at join
            box["err"] = e

    t = threading.Thread(target=work, daemon=True)
    t.start()

    def join():
        t.join()
        if "err" in box:
            logger.warning("background %s render failed (%s); "
                           "re-rendering synchronously", label, box["err"])
            return fn()
        return box["out"]

    return join


def _decimate_pool(audio: np.ndarray) -> np.ndarray:
    """Serving-path frontend for a rendered pool: capture at 48 kHz,
    anti-aliased decimation back to 16 kHz (the SemanticEncoder's own
    filtering). Chunked so the 48 kHz intermediate stays small."""
    import jax
    import jax.numpy as jnp

    from janus_tpu.ops.resample import decimate_48k_to_16k, resample_poly

    out16 = np.zeros_like(audio)
    dec = jax.jit(lambda a: decimate_48k_to_16k(resample_poly(a, up=3, down=1)))
    for i in range(0, len(audio), 64):
        out16[i : i + 64] = np.asarray(dec(jnp.asarray(audio[i : i + 64])))
    return out16


def build_asr_pool(rng, pool_n: int, tok, cfg: ASRConfig,
                   max_seconds: float, corpus: dict):
    """Pre-rendered utterance pool (audio16[N, T], tokens[N, L],
    mask[N, L]): per-step host rendering would serialize with remote
    dispatch (CLAUDE.md), so the train loop only indexes numpy arrays."""
    audio, tokens, mask, texts = sample_batch(
        rng, pool_n, tok, max_seconds=max_seconds,
        max_tokens=cfg.max_target_positions, augment=True, **corpus,
    )
    return _decimate_pool(audio), tokens, mask, texts


def train_demo_asr(
    steps: int = 600,
    batch: int = 16,
    seed: int = 0,
    cfg: Optional[ASRConfig] = None,
    mesh=None,
    learning_rate: float = 1e-3,
    log_every: int = 50,
    corpus: Optional[dict] = None,
    max_seconds: float = 2.0,
    pool_n: Optional[int] = None,
    pool_refresh_every: Optional[int] = None,
    init_params=None,
    save_every: Optional[int] = None,
    save_path: Optional[str] = None,
):
    """Returns (params, cfg, tokenizer, history). ``corpus`` forwards
    hard-corpus knobs to :func:`sample_batch` (vocab / speakers / rates /
    noise / emotions); default is the legacy single-voice neutral task.

    ``pool_refresh_every`` re-renders the utterance pool every N steps in
    a BACKGROUND thread (host rendering overlaps device steps on the
    second core; only the ~seconds of decimation dispatch lands on the
    loop). A fixed pool of a few thousand utterances memorizes the hard
    corpus (train acc 1.0, fresh-utterance WER 0.35 — the round-3
    finding); refreshing makes the corpus effectively unlimited.
    ``learning_rate`` may be an optax schedule."""
    import jax.numpy as jnp

    from janus_tpu.models.asr import prepare_mel

    cfg = cfg or demo_asr_config()
    tok = ByteTokenizer()
    mesh = mesh or build_mesh(MeshConfig(data=1, model=1, seq=1))
    # ``init_params`` warm-starts a continuation run (e.g. a checkpoint
    # that just missed its WER floor) instead of retraining from scratch
    params = init_params if init_params is not None else asr_mod.init_asr(seed, cfg)
    n_frames = 2 * cfg.max_source_positions

    def loss_fn(p, audio16, tokens, mask):
        # mel INSIDE the jitted step: one dispatch per step, no host sync
        mel = prepare_mel(audio16, cfg, pad_to_frames=n_frames)
        return asr_loss(p, cfg, mel, tokens, mask)

    trainer = Trainer(loss_fn, mesh, ASR_PARTITION_RULES,
                      learning_rate=learning_rate)
    state = trainer.create_state(params)

    rng = np.random.default_rng(seed)
    pool_n = pool_n or max(512, 4 * batch)
    pool_audio, pool_tokens, pool_mask, _ = build_asr_pool(
        rng, pool_n, tok, cfg, max_seconds, corpus or {})

    def render_next(render_seed: int):
        def build():
            r = np.random.default_rng(render_seed)
            return sample_batch(
                r, pool_n, tok, max_seconds=max_seconds,
                max_tokens=cfg.max_target_positions, augment=True,
                **(corpus or {}))

        return _bg_render(build, label="asr")

    renderer = (render_next(seed + 1) if pool_refresh_every else None)

    history = []  # device scalars; float() only at log points so the
    # host never blocks per step (async dispatch pipelines the tunnel RTT)
    t0 = time.time()
    for step in range(steps):
        if (pool_refresh_every and step and step % pool_refresh_every == 0
                and renderer is not None):
            audio48, pool_tokens, pool_mask, _texts = renderer()
            pool_audio = _decimate_pool(audio48)
            renderer = render_next(seed + 1 + step)
        idx = rng.choice(pool_n, size=batch, replace=False)
        state, metrics = trainer.train_step(
            state, pool_audio[idx], pool_tokens[idx], pool_mask[idx])
        history.append(metrics["loss"])
        if log_every and step % log_every == 0:
            logger.info("step %d loss=%.4f acc=%.3f (%.1fs)", step,
                        float(metrics["loss"]), float(metrics["asr_acc"]),
                        time.time() - t0)
        if save_every and save_path and step and step % save_every == 0:
            # periodic snapshot: a tunnel stall / crash late in a long run
            # must never cost the whole run (the r4 16k-step run stalled
            # once at step ~12.5k with nothing on disk)
            from janus_tpu.train.retrain_demo import save_npz

            save_npz(save_path, state.params)
            logger.info("checkpoint snapshot @%d -> %s", step, save_path)
    return state.params, cfg, tok, [float(h) for h in history]


def evaluate_asr(params, cfg: ASRConfig, tok: ByteTokenizer,
                 n_utterances: int = 16, seed: int = 123,
                 corpus: Optional[dict] = None,
                 max_seconds: float = 2.0) -> Tuple[float, list]:
    """Greedy-decode fresh utterances; returns (WER, [(ref, hyp), ...]).
    ``corpus`` selects the evaluation distribution (same knobs as
    training; e.g. ``{**HARD_CORPUS, 'snr_db_range': (5.0, 5.0)}`` for
    WER-under-noise)."""
    import jax.numpy as jnp

    from janus_tpu.eval.metrics import word_error_rate
    from janus_tpu.models.asr import prepare_mel, transcribe_mel

    rng = np.random.default_rng(seed)
    audio, _tokens, _mask, texts = sample_batch(
        rng, n_utterances, tok, max_seconds=max_seconds,
        max_tokens=cfg.max_target_positions, **(corpus or {}),
    )
    mel = prepare_mel(jnp.asarray(audio), cfg,
                      pad_to_frames=2 * cfg.max_source_positions)
    prompt = jnp.full((n_utterances, 1), tok.sot, dtype=jnp.int32)
    out = np.asarray(transcribe_mel(params, cfg, mel, prompt, tok.eot))
    hyps = []
    for row in out:
        cut = np.where(row == tok.eot)[0]
        ids = row[: cut[0]] if cut.size else row
        hyps.append(tok.decode(ids).strip())
    wer = word_error_rate(texts, hyps)
    return wer, list(zip(texts, hyps))


def demo_tts_config():
    from janus_tpu.common.config import TTSConfig

    # d192/L4: the d128/L3 model plateaued with last-word substitution
    # errors on 3-word prompts (r4 roundtrip finding — capacity, not
    # recipe: prefix-noise training fixed looping but not the tail errors).
    # max_mel_frames 192, not 128: a 3-word prompt at the slow emotion
    # rates renders ~120 frames — at a 128 budget its training targets
    # were TAIL-TRUNCATED (mel_targets_for crops at max_groups), i.e. the
    # longest prompts trained on corrupted tails, which is exactly where
    # the roundtrip errors lived.
    return TTSConfig(
        d_model=192, layers=4, num_heads=4, n_mels=80, reduction=2,
        max_text_tokens=48, max_mel_frames=192,
    )


def hard_tts_config():
    """TTS geometry for the HARD corpus (256 CV-syllable words, up to
    5-word prompts). Worst-case render: 40 chars at the slow emotion rates
    (7 hops/char after hop-quantization) + 4 gaps ≈ 300 mel frames, so the
    320-frame budget never tail-truncates a training target (the r4 demo
    lesson); 48 text tokens cover 5×8-char words + spaces. d256/L6: the
    d192/L4 demo model already strained on 3-word toy prompts."""
    from janus_tpu.common.config import TTSConfig

    return TTSConfig(
        d_model=256, layers=6, num_heads=8, n_mels=80, reduction=2,
        max_text_tokens=48, max_mel_frames=320,
    )


def demo_vocoder_config():
    from janus_tpu.common.config import VocoderConfig

    # trained on the 16 kHz tone-language domain directly (hop 160 matches
    # the mel frontend, so TTS mel output feeds it with no resampling);
    # d256/L8 sized for >= 23 dB copy-synthesis SNR (d192/L6 plateaued
    # ~20.9 mean / 19.3 min at 8k steps — VERDICT r4 weak-6)
    return VocoderConfig(n_fft=640, hop_length=160, d_model=256, layers=8,
                         sample_rate=16_000)


ENROLLMENT_PHRASE = "alpha bravo"  # fixed utterance used to enroll a voice


def demo_speaker_vectors(cfg=None, spk_seed: int = 42):
    """(speaker_encoder_params, [vec per synthetic speaker]). The encoder is
    deterministic (fixed seed), so serving recomputes identical embeddings
    from any reference audio of the same timbre."""
    import jax.numpy as jnp

    from janus_tpu.models.speaker import init_speaker_encoder, speaker_embed
    from janus_tpu.train.synthetic_task import SPEAKER_TIMBRES, render_text

    cfg = cfg or demo_tts_config()
    spk_params = init_speaker_encoder(spk_seed, n_mels=cfg.n_mels,
                                      d_out=cfg.d_model)
    vecs = []
    for s in range(len(SPEAKER_TIMBRES)):
        ref = render_text(ENROLLMENT_PHRASE, 16_000, seed=0, speaker=s)
        vecs.append(np.asarray(speaker_embed(spk_params, jnp.asarray(ref),
                                             n_mels=cfg.n_mels)))
    return spk_params, vecs


def train_demo_tts(steps: int = 800, batch: int = 16, seed: int = 0,
                   cfg=None, learning_rate: float = 1e-3, log_every: int = 100,
                   multi_speaker: bool = True, tf_input_noise: float = 0.35,
                   pool_refresh_every: Optional[int] = None,
                   pool_n: Optional[int] = None,
                   emotion_weights: Optional[dict] = None,
                   corpus: Optional[dict] = None,
                   init_params=None,
                   save_every: Optional[int] = None,
                   save_path: Optional[str] = None):
    """Teacher-forced text->mel training on the tone language; with
    ``multi_speaker`` the model is conditioned on speaker embeddings from
    the fixed enrollment encoder (functional voice cloning).

    ``tf_input_noise``: Gaussian noise on the teacher-forced mel PREFIX
    (relative to the pool's mel std; targets stay clean). At inference the
    prefix is the model's own imperfect output — clean-prefix-only training
    drifts into word loops/repetitions on multi-word prompts (r4 roundtrip
    WER 0.25-0.34 with repeats like 'mike mike mike lima'); prefix noise is
    the scheduled-sampling-style fix.

    ``pool_refresh_every``: re-render the text pool every N steps in a
    background thread — a FIXED 512-text pool covers ~12% of the 3-word
    combination space, and the model substitutes frequent words on unseen
    combinations (the r4 roundtrip tail errors); refreshing makes the text
    distribution effectively unlimited, the same fix the hard-ASR corpus
    needed.

    ``corpus`` forwards text-sampling knobs to :func:`sample_text`
    (``vocab`` / ``min_words`` / ``max_words``) — pass
    ``dict(vocab=HARD_WORDS, max_words=5)`` with :func:`hard_tts_config`
    to train the hard-corpus TTS (VERDICT r4 task 1). ``init_params``
    warm-starts a continuation run; ``save_every``/``save_path`` snapshot
    the checkpoint periodically (a tunnel stall late in a long run must
    never cost the whole run)."""
    from janus_tpu.models import tts as tts_mod
    from janus_tpu.parallel.sharding import TTS_PARTITION_RULES
    from janus_tpu.train.losses import tts_loss
    from janus_tpu.models.tts import EMOTIONS, emotion_id
    from janus_tpu.train.synthetic_task import (
        SPEAKER_TIMBRES,
        mel_targets_for,
        sample_text,
    )

    cfg = cfg or demo_tts_config()
    tok = ByteTokenizer()
    mesh = build_mesh(MeshConfig(data=1, model=1, seq=1))
    params = (init_params if init_params is not None
              else tts_mod.init_tts(seed, cfg, text_vocab=tok.vocab_size))
    n_speakers = len(SPEAKER_TIMBRES) if multi_speaker else 1
    _spk_params, spk_vecs = demo_speaker_vectors(cfg)
    spk_matrix = np.stack(spk_vecs)  # [n_speakers, d]

    def loss_fn(p, text, emo, mels, mask, spk, noisy):
        return tts_loss(p, cfg, text, emo, mels, mask, speaker=spk,
                        text_vocab=tok.vocab_size, mel_inputs=noisy)

    trainer = Trainer(loss_fn, mesh, TTS_PARTITION_RULES, learning_rate=learning_rate)
    state = trainer.create_state(params)

    rng = np.random.default_rng(seed)
    max_groups = cfg.max_mel_frames // cfg.reduction
    # Prompt-width jitter: each step trains at a random serving text
    # bucket, so every bucket the synthesizer can pad to is an
    # in-distribution prompt length (audio positions are text-length
    # invariant by construction — models.tts.audio_pos_base). One compiled
    # train step per bucket.
    buckets = tts_mod.text_buckets(cfg.max_text_tokens)

    # Pre-render an utterance pool ONCE (per-step host rendering would
    # serialize with remote dispatch); minibatches sample from the pool
    # and ``pool_refresh_every`` re-renders it in a background thread.
    pool_n = pool_n or max(512, 4 * batch)

    # emotion sampling: optionally oversample tags whose renders are
    # hardest (fast rates compress chars to ~5 mel hops — the r4 emotion
    # roundtrip failures were exactly the excited/panicked tails)
    emo_p = np.ones(len(EMOTIONS))
    for name, w in (emotion_weights or {}).items():
        emo_p[EMOTIONS.index(name)] = w
    emo_p = emo_p / emo_p.sum()

    text_kw = {k: (corpus or {})[k]
               for k in ("vocab", "min_words", "max_words") if k in (corpus or {})}

    def build_pool(r: np.random.Generator) -> dict:
        texts = [sample_text(r, **text_kw) for _ in range(pool_n)]
        speakers = r.integers(0, n_speakers, pool_n).tolist()
        emos = [EMOTIONS[int(i)]
                for i in r.choice(len(EMOTIONS), pool_n, p=emo_p)]
        mels, mask = mel_targets_for(
            texts, cfg.n_mels, cfg.reduction, max_groups,
            speakers=speakers, emotions=emos)
        return {
            "ids": [tok.encode(t)[: cfg.max_text_tokens] for t in texts],
            "emo": np.asarray([emotion_id(e) for e in emos], np.int32),
            "spk": spk_matrix[speakers].astype(np.float32),
            "mels": mels, "mask": mask,
        }

    pool = build_pool(rng)
    pool_ids, pool_emo = pool["ids"], pool["emo"]
    pool_spk, pool_mels, pool_mask = pool["spk"], pool["mels"], pool["mask"]
    noise_std = tf_input_noise * float(pool_mels[pool_mask > 0].std())

    def render_next(render_seed: int):
        return _bg_render(
            lambda: build_pool(np.random.default_rng(render_seed)),
            label="tts")

    renderer = render_next(seed + 1) if pool_refresh_every else None

    history = []  # device scalars; float() only at log points so the
    # host never blocks per step (async dispatch pipelines the tunnel RTT)
    t0 = time.time()
    for step in range(steps):
        if (pool_refresh_every and step and step % pool_refresh_every == 0
                and renderer is not None):
            p = renderer()
            pool_ids, pool_emo = p["ids"], p["emo"]
            pool_spk, pool_mels, pool_mask = p["spk"], p["mels"], p["mask"]
            renderer = render_next(seed + 1 + step)
        idx = rng.choice(pool_n, size=batch, replace=False)
        longest = max(len(pool_ids[i]) for i in idx)
        fitting = [b for b in buckets if b >= longest] or [buckets[-1]]
        width = int(fitting[int(rng.integers(0, len(fitting)))])
        text_ids = np.full((batch, width), tok.pad, np.int32)
        for row, i in enumerate(idx):
            ids = pool_ids[i][:width]
            text_ids[row, : len(ids)] = ids
        mels = pool_mels[idx]
        noisy = (mels + noise_std * rng.standard_normal(mels.shape)
                 .astype(np.float32)) if noise_std > 0 else mels
        state, metrics = trainer.train_step(
            state, text_ids, pool_emo[idx], mels, pool_mask[idx],
            pool_spk[idx], noisy)
        history.append(metrics["loss"])
        if log_every and step % log_every == 0:
            logger.info("tts step %d loss=%.4f (%.1fs)", step,
                        float(metrics["loss"]), time.time() - t0)
        if save_every and save_path and step and step % save_every == 0:
            from janus_tpu.train.retrain_demo import save_npz

            save_npz(save_path, state.params)
            logger.info("tts checkpoint snapshot @%d -> %s", step, save_path)
    return state.params, cfg, tok, [float(h) for h in history]


def train_demo_vocoder(steps: int = 600, batch: int = 8, seed: int = 0,
                       cfg=None, learning_rate: float = 2e-3,
                       log_every: int = 100):
    """mel -> waveform inversion on the tone-language domain."""
    import jax.numpy as jnp

    from janus_tpu.models.vocoder import init_vocoder
    from janus_tpu.ops.mel import log_mel_spectrogram
    from janus_tpu.parallel.sharding import VOCODER_PARTITION_RULES
    from janus_tpu.train.losses import vocoder_loss
    from janus_tpu.train.synthetic_task import render_text, sample_text

    cfg = cfg or demo_vocoder_config()
    mesh = build_mesh(MeshConfig(data=1, model=1, seq=1))
    n_mels = 80
    params = init_vocoder(seed, cfg, n_mels=n_mels)

    def loss_fn(p, mel, wav):
        return vocoder_loss(p, cfg, mel, wav)

    trainer = Trainer(loss_fn, mesh, VOCODER_PARTITION_RULES,
                      learning_rate=learning_rate)
    state = trainer.create_state(params)

    rng = np.random.default_rng(seed)
    t_frames = 96
    t_samples = t_frames * cfg.hop_length
    history = []
    t0 = time.time()
    for step in range(steps):
        wavs = np.zeros((batch, t_samples), np.float32)
        for i in range(batch):
            from janus_tpu.models.tts import EMOTIONS as _EMOS

            w = render_text(sample_text(rng), cfg.sample_rate,
                            seed=int(rng.integers(1 << 30)),
                            speaker=int(rng.integers(0, 4)),
                            emotion=_EMOS[int(rng.integers(0, len(_EMOS)))],
                            hop_quantize=cfg.hop_length)
            wavs[i, : min(len(w), t_samples)] = w[:t_samples]
        mel = np.asarray(log_mel_spectrogram(
            jnp.asarray(wavs), cfg.sample_rate, 400, cfg.hop_length, n_mels
        ))[:, :t_frames, :]
        state, metrics = trainer.train_step(state, mel, wavs)
        history.append(float(metrics["loss"]))
        if log_every and step % log_every == 0:
            logger.info("voc step %d loss=%.4f l1=%.4f (%.1fs)", step,
                        metrics["loss"], metrics["voc_l1"], time.time() - t0)
    return state.params, cfg, history


def main() -> None:
    from janus_tpu.common.platform import apply_env_platform

    apply_env_platform()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=600)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--out", default="checkpoints/demo_asr")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    params, cfg, tok, history = train_demo_asr(args.steps, args.batch)
    wer, pairs = evaluate_asr(params, cfg, tok)
    logger.info("final loss=%.4f  WER=%.3f", history[-1], wer)
    for ref, hyp in pairs[:5]:
        logger.info("  ref=%r hyp=%r", ref, hyp)

    from janus_tpu.train.checkpoint import save_params

    save_params(args.out, params)
    logger.info("saved -> %s", args.out)


if __name__ == "__main__":
    main()
