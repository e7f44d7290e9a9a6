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
        max_decode_tokens=32,
    )


def train_demo_asr(
    steps: int = 600,
    batch: int = 16,
    seed: int = 0,
    cfg: Optional[ASRConfig] = None,
    mesh=None,
    learning_rate: float = 1e-3,
    log_every: int = 50,
):
    """Returns (params, cfg, tokenizer, history)."""
    cfg = cfg or demo_asr_config()
    tok = ByteTokenizer()
    mesh = mesh or build_mesh(MeshConfig(data=1, model=1, seq=1))
    params = asr_mod.init_asr(seed, cfg)

    def loss_fn(p, mel, tokens, mask):
        return asr_loss(p, cfg, mel, tokens, mask)

    trainer = Trainer(loss_fn, mesh, ASR_PARTITION_RULES,
                      learning_rate=learning_rate)
    state = trainer.create_state(params)

    import jax.numpy as jnp

    from janus_tpu.models.asr import prepare_mel

    rng = np.random.default_rng(seed)
    max_seconds = 2.0
    n_frames = 2 * cfg.max_source_positions  # 256 frames = 2.56 s budget
    history = []
    t0 = time.time()
    for step in range(steps):
        audio, tokens, mask, _texts = sample_batch(
            rng, batch, tok, max_seconds=max_seconds,
            max_tokens=cfg.max_target_positions,
        )
        mel = np.asarray(prepare_mel(jnp.asarray(audio), cfg,
                                     pad_to_frames=n_frames))
        state, metrics = trainer.train_step(state, mel, tokens, mask)
        history.append(float(metrics["loss"]))
        if log_every and step % log_every == 0:
            logger.info("step %d loss=%.4f acc=%.3f (%.1fs)", step,
                        metrics["loss"], metrics["asr_acc"], time.time() - t0)
    return state.params, cfg, tok, history


def evaluate_asr(params, cfg: ASRConfig, tok: ByteTokenizer,
                 n_utterances: int = 16, seed: int = 123) -> Tuple[float, list]:
    """Greedy-decode fresh utterances; returns (WER, [(ref, hyp), ...])."""
    import jax.numpy as jnp

    from janus_tpu.eval.metrics import word_error_rate
    from janus_tpu.models.asr import prepare_mel, transcribe_mel

    rng = np.random.default_rng(seed)
    audio, _tokens, _mask, texts = sample_batch(
        rng, n_utterances, tok, max_seconds=2.0,
        max_tokens=cfg.max_target_positions,
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


def main() -> None:
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
