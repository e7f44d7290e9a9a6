"""Retrain the demo TTS/vocoder checkpoints (round-2 recipe).

Why a retrain entry exists: the TTS gained text-length-invariant audio
positions + prompt-width jitter (``models/tts.py::audio_pos_base``),
which invalidates round-1 ``demo_tts.npz``; and the round-1 vocoder's
copy-synthesis SNR (10.54 dB at 600 steps) was a training-budget problem,
not a design problem — this recipe trains longer with cosine decay and
random window crops, targeting ≥ 18 dB.

    python -m janus_tpu.train.retrain_demo                  # tts + vocoder
    python -m janus_tpu.train.retrain_demo --what vocoder --steps 4000

Saves flat-npz checkpoints the zoo loads (``checkpoints/demo_*.npz``).
"""

from __future__ import annotations

import argparse
import logging
import time

import jax
import numpy as np

logger = logging.getLogger("janus.retrain")


def train_vocoder(steps: int, batch: int, seed: int = 0, log_every: int = 200):
    """Longer-budget vocoder training: cosine-decayed AdamW + random
    window crops over the multi-speaker / multi-emotion tone corpus."""
    import jax.numpy as jnp
    import optax

    from janus_tpu.common.config import MeshConfig
    from janus_tpu.models.vocoder import init_vocoder
    from janus_tpu.ops.mel import log_mel_spectrogram
    from janus_tpu.parallel.mesh import build_mesh
    from janus_tpu.parallel.sharding import VOCODER_PARTITION_RULES
    from janus_tpu.train.demo import demo_vocoder_config
    from janus_tpu.train.losses import vocoder_loss
    from janus_tpu.train.synthetic_task import render_text, sample_text
    from janus_tpu.train.trainer import Trainer
    from janus_tpu.models.tts import EMOTIONS

    cfg = demo_vocoder_config()
    mesh = build_mesh(MeshConfig(data=1, model=1, seq=1))
    n_mels = 80
    params = init_vocoder(seed, cfg, n_mels=n_mels)

    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=2e-3, warmup_steps=min(100, steps // 10),
        decay_steps=steps, end_value=2e-5,  # phase fine-tuning needs a low tail
    )
    t_frames = 96

    def loss_fn(p, wav):
        # mel computed INSIDE the jitted step: no per-step host sync, one
        # dispatch per step (remote-dispatch pipelining stays full)
        mel = log_mel_spectrogram(
            wav, cfg.sample_rate, 400, cfg.hop_length, n_mels
        )[:, :t_frames, :]
        return vocoder_loss(p, cfg, mel, wav)

    trainer = Trainer(loss_fn, mesh, VOCODER_PARTITION_RULES,
                      learning_rate=schedule)
    state = trainer.create_state(params)

    rng = np.random.default_rng(seed)
    t_samples = t_frames * cfg.hop_length

    def random_chars_text(r) -> str:
        """Uniform random character strings (not corpus words): the vocoder
        must invert mel for ANY character sequence the TTS can emit, so
        half the pool breaks word-level memorization (without this,
        copy-SNR is ~20 dB on corpus words but ~9 dB on unseen words)."""
        return " ".join(
            "".join(chr(ord("a") + int(c)) for c in r.integers(0, 26, int(r.integers(2, 8))))
            for _ in range(int(r.integers(1, 4)))
        )

    # Pre-render an utterance pool once; steps take random crops from it.
    # Per-step host rendering would serialize with remote dispatch.
    pool_n = 512
    pool = []
    for _ in range(pool_n):
        w = render_text(
            sample_text(rng) if rng.random() < 0.5 else random_chars_text(rng),
            cfg.sample_rate,
            seed=int(rng.integers(1 << 30)),
            speaker=int(rng.integers(0, 4)),
            emotion=EMOTIONS[int(rng.integers(0, len(EMOTIONS)))],
            # tone onsets must land on the analysis grid or target phase
            # is invisible in mel (see render_text docstring)
            hop_quantize=cfg.hop_length,
        )
        if len(w) < t_samples:
            w = np.pad(w, (0, t_samples - len(w)))
        pool.append(w.astype(np.float32))

    history = []  # device scalars; float() only at log points
    t0 = time.time()
    for step in range(steps):
        wavs = np.zeros((batch, t_samples), np.float32)
        hop = cfg.hop_length
        for i, j in enumerate(rng.choice(pool_n, size=batch, replace=False)):
            w = pool[j]
            # Crop on the hop grid. The tone corpus is phase-deterministic
            # on that grid (char 0.06s = 6 hops, gap 0.04s = 4 hops, every
            # tone starts at phase 0), so per-frame target phase is a
            # function of mel context — learnable. Arbitrary-sample crops
            # rotate target phase randomly per example, which caps
            # copy-synthesis SNR near 7 dB no matter the budget.
            off = hop * int(rng.integers(0, (len(w) - t_samples) // hop + 1))
            wavs[i] = w[off : off + t_samples]
        state, metrics = trainer.train_step(state, wavs)
        history.append(metrics["loss"])
        if log_every and step % log_every == 0:
            logger.info("voc step %d loss=%.4f l1=%.4f cplx=%.4f (%.1fs)",
                        step, float(metrics["loss"]), float(metrics["voc_l1"]),
                        float(metrics["voc_cplx"]), time.time() - t0)
    return state.params, cfg, [float(h) for h in history]


def quick_copy_snr(voc_params, vcfg, n_mels: int = 80) -> float:
    """The eval/roundtrip copy-synthesis SNR, standalone.

    The waveform is featurized with its zero continuation (``n_fft/hop``
    trailing silence frames, the centered-analysis convention): without
    them the end-flush must extrapolate past the final full-amplitude
    frame and the last hop dominates the error (~15 dB ceilings on short
    utterances — r5 finding; the serving TTS generates its own silence
    tail for the same reason, see synthetic_task.mel_targets_for)."""
    import jax.numpy as jnp

    from janus_tpu.eval.metrics import snr_db
    from janus_tpu.models.vocoder import vocoder_waveform
    from janus_tpu.ops.mel import log_mel_spectrogram
    from janus_tpu.train.synthetic_task import render_text

    wav = render_text("tiko ma selo", vcfg.sample_rate, seed=0)
    tail = (vcfg.n_fft // vcfg.hop_length) * vcfg.hop_length
    wavp = np.pad(wav, (0, tail))
    mel = log_mel_spectrogram(jnp.asarray(wavp), vcfg.sample_rate, 400,
                              vcfg.hop_length, n_mels)
    # jitted: eager complex ops are UNIMPLEMENTED on some remote backends
    fn = jax.jit(lambda p, m: vocoder_waveform(p, vcfg, m, length=len(wavp)))
    recon = np.asarray(fn(voc_params, mel))
    return snr_db(wav, recon[: len(wav)])


def save_npz(path: str, params) -> None:
    """Write the zoo's checkpoint format: flat fp16 npz keyed by tree path
    (loaded by ``eval.roundtrip.load_npz_params`` / ``models.zoo``)."""
    from janus_tpu.models.params import flatten_with_paths

    flat = {}
    for k, v in flatten_with_paths(params):
        a = np.asarray(v)
        flat[k] = a.astype(np.float16) if np.issubdtype(a.dtype, np.floating) else a
    np.savez(path, **flat)


def main() -> None:
    from janus_tpu.common.platform import apply_env_platform, enable_compile_cache

    apply_env_platform()
    enable_compile_cache()  # restarted runs skip the remote-compile tunnel
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--what", default="tts,vocoder",
                    help="comma list: tts, vocoder, asr, asr_hard, tts_hard")
    ap.add_argument("--tts-steps", type=int, default=12000)
    ap.add_argument("--voc-steps", type=int, default=12000)
    ap.add_argument("--asr-steps", type=int, default=4000)
    ap.add_argument("--hard-steps", type=int, default=12000)
    ap.add_argument("--hard-tts-steps", type=int, default=16000)
    ap.add_argument("--hard-warm-start", action="store_true",
                    help="asr_hard: continue from the committed checkpoint "
                         "instead of retraining from scratch")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out-dir", default="checkpoints")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    from janus_tpu.train import demo as demo_mod

    what = {w.strip() for w in args.what.split(",")}

    if "asr" in what:
        # STANDARD_CORPUS: the ASR must transcribe every emotion rendering
        # the demo TTS can produce (rate/tremolo/vibrato/amplitude), or
        # round-trip WER dies on emotion-tagged packets (round-2 regression).
        # Pool refresh matters here too: a fixed 512-utterance pool at 1500
        # steps memorizes — fresh-utterance WER ~0.04 with trailing-syllable
        # duplications ('papa' -> 'papapa') on repeated-tone words.
        import optax

        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=1e-3,
            warmup_steps=min(200, args.asr_steps // 10),
            decay_steps=args.asr_steps, end_value=5e-5)
        params, cfg, tok, hist = demo_mod.train_demo_asr(
            args.asr_steps, args.batch, corpus=demo_mod.STANDARD_CORPUS,
            pool_n=1024, pool_refresh_every=300, learning_rate=schedule)
        wer, _ = demo_mod.evaluate_asr(params, cfg, tok,
                                       corpus=demo_mod.STANDARD_CORPUS)
        logger.info("asr final loss=%.4f WER=%.3f", hist[-1], wer)
        save_npz(f"{args.out_dir}/demo_asr.npz", params)

    if "asr_hard" in what:
        # HARD corpus: 256-word vocabulary, 16 speakers, 0.8-1.25x rates,
        # SNR noise with a 25% clean fraction, up to 5-word utterances
        # (VERDICT r2 item 2a). The pool refreshes every 400 steps (a
        # FIXED 2048-utterance pool memorizes: train acc 1.0 but fresh
        # WER 0.35); cosine decay for the long run.
        # Training noise reaches down to 2 dB (the committed corpus floor
        # is 8): the snr0 eval row was far out-of-distribution and sat at
        # WER 0.137 (VERDICT r4 task 7). --hard-warm-start continues from
        # the committed checkpoint at a low peak LR so the clean/snr10
        # floors survive the distribution shift.
        import os

        import optax

        noisy_corpus = dict(demo_mod.HARD_CORPUS)
        noisy_corpus["snr_db_range"] = (2.0, 40.0)
        init = None
        peak = 1e-3
        ckpt = f"{args.out_dir}/demo_asr_hard.npz"
        if args.hard_warm_start and os.path.exists(ckpt):
            from janus_tpu.eval.roundtrip import load_npz_params

            init = load_npz_params(ckpt)
            peak = 3e-4
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=peak,
            warmup_steps=min(300, args.hard_steps // 10),
            decay_steps=args.hard_steps, end_value=5e-5)
        params, cfg, tok, hist = demo_mod.train_demo_asr(
            args.hard_steps, args.batch, cfg=demo_mod.hard_asr_config(),
            corpus=noisy_corpus, max_seconds=3.84, pool_n=2048,
            pool_refresh_every=400, learning_rate=schedule, init_params=init,
            save_every=2000, save_path=f"{args.out_dir}/demo_asr_hard.npz")
        save_npz(f"{args.out_dir}/demo_asr_hard.npz", params)
        for label, snr in (("clean", None), ("snr10", (10.0, 10.0)),
                           ("snr5", (5.0, 5.0)), ("snr0", (0.0, 0.0))):
            corpus = dict(demo_mod.HARD_CORPUS)
            corpus["clean_prob"] = 0.0
            corpus["snr_db_range"] = snr
            if snr is None:
                corpus.pop("snr_db_range")
            wer, pairs = demo_mod.evaluate_asr(
                params, cfg, tok, n_utterances=32, corpus=corpus,
                max_seconds=3.84)
            logger.info("asr_hard WER[%s]=%.3f  (e.g. ref=%r hyp=%r)",
                        label, wer, pairs[0][0], pairs[0][1])

    # Off-rate tags (fast: excited/panicked at 1.15-1.3x; slow:
    # relaxed/serious/calm/sad at 0.85-0.9x) are where the roundtrip
    # failures have lived — r4's fast-only weighting fixed
    # excited/panicked but traded in a 'relaxed' failure (the gate was
    # then loosened to 4/5 — VERDICT r4 weak-1). This rebalance weights
    # BOTH rate directions symmetrically and trains longer instead of
    # chasing one tag at a time.
    TTS_EMOTION_WEIGHTS = {
        "excited": 2.0, "panicked": 2.2, "relaxed": 1.8, "serious": 1.5,
        "calm": 1.5, "sad": 1.4, "angry": 1.4, "whispering": 1.3,
        "joyful": 1.2, "shouting": 1.2,
    }

    def tts_schedule(steps: int, peak: float = 1e-3):
        # cosine-annealed: the constant-1e-3 recipe plateaued in a noisy
        # basin (~0.02 loss) and final emotion-roundtrip quality was a
        # draw of where the last step landed (r5 finding: a 12k constant-
        # LR run shipped 2/5 emotion tags; the same run annealed settles)
        import optax

        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=peak,
            warmup_steps=min(200, steps // 10),
            decay_steps=steps, end_value=1e-5)

    if "tts" in what:
        params, cfg, tok, hist = demo_mod.train_demo_tts(
            steps=args.tts_steps, batch=args.batch,
            pool_refresh_every=1200,
            learning_rate=tts_schedule(args.tts_steps),
            emotion_weights=TTS_EMOTION_WEIGHTS,
            save_every=2000, save_path=f"{args.out_dir}/demo_tts.npz")
        logger.info("tts final loss=%.4f", hist[-1])
        save_npz(f"{args.out_dir}/demo_tts.npz", params)
        # speaker encoder is deterministic (seed 42) — re-save for the zoo
        spk_params, _ = demo_mod.demo_speaker_vectors()
        save_npz(f"{args.out_dir}/demo_speaker.npz", spk_params)

    if "tts_hard" in what:
        # Hard-corpus TTS (VERDICT r4 task 1): 256-word vocabulary, up to
        # 5-word prompts, full emotion set, 4 serving voices. With pool
        # refresh the text distribution is effectively unlimited; the
        # decode half of the codec stops being a toy-domain demo.
        from janus_tpu.train.synthetic_task import HARD_WORDS

        params, cfg, tok, hist = demo_mod.train_demo_tts(
            steps=args.hard_tts_steps, batch=args.batch,
            cfg=demo_mod.hard_tts_config(),
            corpus=dict(vocab=HARD_WORDS, min_words=1, max_words=5),
            pool_n=768, pool_refresh_every=800,
            learning_rate=tts_schedule(args.hard_tts_steps),
            emotion_weights=TTS_EMOTION_WEIGHTS,
            save_every=2000, save_path=f"{args.out_dir}/demo_tts_hard.npz")
        logger.info("tts_hard final loss=%.4f", hist[-1])
        save_npz(f"{args.out_dir}/demo_tts_hard.npz", params)

    if "vocoder" in what:
        params, vcfg, hist = train_vocoder(args.voc_steps, max(args.batch // 2, 4))
        # save FIRST: a failed diagnostic must never lose the training run
        save_npz(f"{args.out_dir}/demo_vocoder.npz", params)
        try:
            snr = quick_copy_snr(params, vcfg)
            logger.info("vocoder final loss=%.4f copy-SNR=%.2f dB", hist[-1], snr)
        except Exception as e:
            logger.warning("copy-SNR probe failed (checkpoint saved): %s", e)

    logger.info("done -> %s", args.out_dir)


if __name__ == "__main__":
    main()
