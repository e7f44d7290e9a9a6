"""Round-trip codec evaluation (BASELINE config 3).

Measures the full semantic loop on the synthetic tone-language:

    text ──render──▶ speech ──SemanticEncoder──▶ packet
         ◀──WER──── re-transcribed ◀──ASR── reconstructed ◀──TTS+vocoder──

Reported: transcription WER (speech→packet), round-trip WER
(packet→speech→text), categorical prosody agreement across the wire, mean
packet size / airtime at 300 bps, and copy-synthesis SNR for the vocoder
path. The reference published none of these (BASELINE.md).

CLI::

    python -m janus_tpu.eval.roundtrip --asr-ckpt checkpoints_demo_asr.npz
"""

from __future__ import annotations

import argparse
import json
import logging
from typing import Dict, List, Optional

import numpy as np

from janus_tpu.common.config import ASRConfig, JanusConfig
from janus_tpu.common.protocol import JanusPacket
from janus_tpu.eval.metrics import prosody_agreement, snr_db, word_error_rate
from janus_tpu.models.tokenizer import ByteTokenizer
from janus_tpu.train.synthetic_task import render_text, sample_text

logger = logging.getLogger(__name__)

__all__ = ["load_npz_params", "evaluate_roundtrip"]


def load_npz_params(path: str) -> Dict:
    """Load a flat fp16 npz checkpoint back into a param tree."""
    from janus_tpu.models.params import unflatten_from_paths

    import jax.numpy as jnp

    data = np.load(path)
    return unflatten_from_paths(
        {k: jnp.asarray(data[k].astype(np.float32)) for k in data.files}
    )


def evaluate_roundtrip(
    asr_params,
    asr_cfg: ASRConfig,
    n_utterances: int = 16,
    seed: int = 7,
    tts_params=None,
    tts_cfg=None,
    vocoder_params=None,
    vocoder_cfg=None,
) -> Dict:
    """Returns the metric dict. TTS/vocoder params default to random
    weights (the reconstruction numbers then measure the untrained lower
    bound; transcription metrics are unaffected)."""
    import jax.numpy as jnp

    from janus_tpu.models.asr import prepare_mel, transcribe_mel
    from janus_tpu.ops.resample import resample_poly

    tok = ByteTokenizer()
    rng = np.random.default_rng(seed)
    texts = [sample_text(rng) for _ in range(n_utterances)]

    # --- speech -> packet (transcription + prosody) ---
    cfg = JanusConfig()
    sr = cfg.audio.sample_rate
    phrases = []
    for i, t in enumerate(texts):
        wav16 = render_text(t, 16_000, seed=i)
        wav48 = np.asarray(resample_poly(jnp.asarray(wav16), up=3, down=1))
        phrases.append(wav48.astype(np.float32))

    from janus_tpu.runtime.codec import SemanticEncoder

    encoder = SemanticEncoder(
        cfg.override(**{f"asr.{k}": v for k, v in asr_cfg.__dict__.items()}),
        asr_params=asr_params,
    )
    results = encoder.encode_batch(phrases)
    hyps = [r["text"] for r in results]
    tx_wer = word_error_rate(texts, hyps)

    packets = [
        JanusPacket(text=r["text"], prosody=r["prosody"], timestamp=0.0)
        for r in results
    ]
    sizes = [p.wire_size() for p in packets]

    # --- packet -> speech -> text (round trip) ---
    from janus_tpu.runtime.synthesizer import Synthesizer

    synth_cfg = cfg
    if tts_cfg is not None:
        synth_cfg = synth_cfg.override(**{f"tts.{k}": v for k, v in tts_cfg.__dict__.items()})
    if vocoder_cfg is not None:
        synth_cfg = synth_cfg.override(
            **{f"vocoder.{k}": v for k, v in vocoder_cfg.__dict__.items()}
        )
    default_vec = None
    if tts_params is not None:
        # speaker-conditioned demo TTS: synthesize in the default voice
        try:
            from janus_tpu.train.demo import demo_speaker_vectors

            _sp, vecs = demo_speaker_vectors(synth_cfg.tts)
            default_vec = vecs[0]
        except Exception:
            pass
    synth = Synthesizer(synth_cfg, tts_params=tts_params,
                        vocoder_params=vocoder_params,
                        default_speaker_vec=default_vec)
    rt_hyps: List[str] = []
    for p in packets:
        audio_bytes = synth.synthesize(p)
        pcm = np.frombuffer(audio_bytes, dtype=np.int16).astype(np.float32) / 32768.0
        # transcribe whatever came back (the 1536*6 minimum is a SEND-side
        # VAD heuristic, not a receive-side rule — a correctly synthesized
        # one-short-word clip, e.g. 'nov' at 0.18 s, must count)
        if len(pcm) == 0:
            rt_hyps.append("")
            continue
        rt = encoder.encode_batch([pcm])[0]
        rt_hyps.append(rt["text"])
    rt_wer = word_error_rate(texts, rt_hyps)

    # --- prosody across the wire ---
    ref_pros = [(r["prosody"]["energy"], r["prosody"]["pitch"]) for r in results]
    wire_pros = [
        (JanusPacket.deserialize(p.serialize()).prosody.get("energy"),
         JanusPacket.deserialize(p.serialize()).prosody.get("pitch"))
        for p in packets
    ]
    pros_agree = prosody_agreement(ref_pros, wire_pros)

    # --- vocoder copy-synthesis SNR (tone-language domain) ---
    import math

    import jax

    from janus_tpu.models.vocoder import vocoder_waveform
    from janus_tpu.ops.mel import log_mel_spectrogram

    voc_sr = synth_cfg.vocoder.sample_rate
    # Averaged over several utterances: single-utterance copy-SNR varies
    # ~±4 dB with text draw, so one sample is not a stable quality gate.
    # All utterances are zero-padded to one length and vocoded as a batch
    # (one compiled program regardless of text lengths). Each waveform
    # keeps ≥ n_fft/hop frames of its zero continuation inside the batch
    # (centered-analysis end context — see quick_copy_snr; scoring stays
    # over the signal's own samples).
    snr_texts = texts[: min(4, len(texts))]
    wavs_v: List[np.ndarray] = []
    for i, t in enumerate(snr_texts):
        w16 = render_text(t, 16_000, seed=i)
        if voc_sr != 16_000:
            g = math.gcd(voc_sr, 16_000)
            w = np.asarray(
                resample_poly(jnp.asarray(w16), up=voc_sr // g, down=16_000 // g)
            )
        else:
            w = w16
        wavs_v.append(w.astype(np.float32))
    hop = synth_cfg.vocoder.hop_length
    tail = (synth_cfg.vocoder.n_fft // hop) * hop
    pad_len = -(-(max(len(w) for w in wavs_v) + tail) // hop) * hop
    batch = np.zeros((len(wavs_v), pad_len), np.float32)
    for i, w in enumerate(wavs_v):
        batch[i, : len(w)] = w
    # vocoder input mel: standard 400-fft frontend at the vocoder hop
    mel_v = log_mel_spectrogram(
        jnp.asarray(batch), voc_sr, 400, hop, synth_cfg.tts.n_mels,
    )
    # jitted: eager complex-number ops are UNIMPLEMENTED on some remote
    # TPU backends (see CLAUDE.md)
    recon = np.asarray(
        jax.jit(
            lambda p, m: vocoder_waveform(p, synth_cfg.vocoder, m,
                                          length=pad_len)
        )(synth.vocoder_params, mel_v)
    )
    per_utt_snr = [
        snr_db(w, recon[i, : len(w)]) for i, w in enumerate(wavs_v)
    ]
    copy_snr = float(np.mean(per_utt_snr))
    copy_snr_min = float(np.min(per_utt_snr))

    # --- streaming turnaround (time to FIRST audio vs full clip) ---
    # The reference's walkie-talkie turnaround was 2.8-3.0 s against its
    # cloud TTS (reference docs/ARCHITECTURE.md:229-231).
    from janus_tpu.runtime.streaming_tts import StreamingSynthesizer

    streamer = StreamingSynthesizer(
        synth_cfg, tts_params=synth.tts_params,
        vocoder_params=synth.vocoder_params, chunk_groups=16,
    )
    turn_text = packets[0].text or texts[0]
    spk = synth._speaker_arg()
    list(streamer.stream(turn_text, speaker=spk))  # warm the programs
    first_s, total_s, _n = streamer.turnaround(turn_text, speaker=spk)

    # --- prompt-padding robustness (text-length-invariant positions) ---
    # Same text at two different prompt paddings must transcribe the same
    # (the round-1 build required the exact trained width).
    pad_match = None
    if tts_params is not None:
        import jax.numpy as jnp

        from janus_tpu.models import tts as tts_mod
        from janus_tpu.models import vocoder as voc_mod

        def _synth_at_width(width: int) -> np.ndarray:
            ids = tok.encode(turn_text)[:width]
            padded = np.full((1, width), tok.pad, np.int32)
            padded[0, : len(ids)] = ids

            # jitted end-to-end: EAGER complex ops (the vocoder's iSTFT
            # spectra) are UNIMPLEMENTED on some remote TPU backends
            # (CLAUDE.md); params stay traced args, never closed over
            def _gen(tp, vp, ids_j, emo, spk_j):
                mel, n_frames = tts_mod.tts_generate(
                    tp, synth_cfg.tts, ids_j, emo, speaker=spk_j,
                    text_vocab=tok.vocab_size,
                )
                return voc_mod.vocoder_waveform(vp, synth_cfg.vocoder, mel), n_frames

            wav, n_frames = jax.jit(_gen)(
                synth.tts_params, synth.vocoder_params, jnp.asarray(padded),
                jnp.asarray([0], jnp.int32),
                None if spk is None else jnp.asarray(spk)[None, :],
            )
            n = int(np.asarray(n_frames)[0]) * synth_cfg.vocoder.hop_length
            wav = np.asarray(wav)[0, :n]
            if synth_cfg.vocoder.sample_rate != sr:
                import math as _math

                g = _math.gcd(sr, synth_cfg.vocoder.sample_rate)
                wav = np.asarray(resample_poly(
                    jnp.asarray(wav), up=sr // g,
                    down=synth_cfg.vocoder.sample_rate // g))
            return wav.astype(np.float32)

        from janus_tpu.models.tts import text_bucket

        w_small = text_bucket(len(tok.encode(turn_text)),
                              synth_cfg.tts.max_text_tokens)
        w_full = synth_cfg.tts.max_text_tokens
        if w_small != w_full:
            wav_a, wav_b = _synth_at_width(w_small), _synth_at_width(w_full)
            if min(len(wav_a), len(wav_b)) >= 1536 * 6:
                ta = encoder.encode_batch([wav_a])[0]["text"]
                tb = encoder.encode_batch([wav_b])[0]["text"]
                pad_match = bool(ta == tb)

    out = {
        "transcription_wer": round(tx_wer, 4),
        "roundtrip_wer": round(rt_wer, 4),
        "prosody_agreement": round(pros_agree, 4),
        "mean_packet_bytes": round(float(np.mean(sizes)), 1),
        "mean_airtime_s_at_300bps": round(float(np.mean(sizes)) / 37.5, 3),
        "vocoder_copy_snr_db": round(copy_snr, 2),
        "vocoder_copy_snr_min_db": round(copy_snr_min, 2),
        "tts_turnaround_first_audio_s": round(first_s, 4),
        "tts_full_synthesis_s": round(total_s, 4),
        "n_utterances": n_utterances,
    }
    if pad_match is not None:
        out["tts_padding_transcript_match"] = pad_match
    if tts_params is not None:
        out.update(evaluate_emotion_roundtrip(synth, encoder))
        out.update(evaluate_voice_clone_identity(
            synth.tts_params, synth_cfg.tts, synth.vocoder_params,
            synth_cfg.vocoder))
    return out


# Wire-reachable semantic emotion tags and a prosody combo that produces
# each (tts_emotion_tag truth table; 'sad' needs pitch 'Low' which the
# extractor never emits — the reference's dead branch, docs/PARITY.md).
REACHABLE_EMOTIONS = (
    ("excited", ("High", "Loud")),
    ("joyful", ("High", "Normal")),
    ("whispering", ("High", "Quiet")),
    ("shouting", ("Normal", "Loud")),
    ("relaxed", ("Normal", "Normal")),
)


def evaluate_emotion_roundtrip(synth, encoder, text: str = "kilo echo papa") -> Dict:
    """Per-emotion round trip THROUGH THE SYNTHESIZER: every wire-reachable
    emotion tag must still transcribe to the original text (emotion
    modulates affect, never content — the round-2 regression where emotion
    rendering scaled the F0 ladder made this 0/5)."""
    matches = {}
    for tag, (pitch, energy) in REACHABLE_EMOTIONS:
        p = JanusPacket(text=text,
                        prosody={"energy": energy, "pitch": pitch},
                        timestamp=0.0)
        audio = synth.synthesize(p)
        pcm = np.frombuffer(audio, dtype=np.int16).astype(np.float32) / 32768.0
        hyp = encoder.encode_batch([pcm])[0]["text"] if len(pcm) else ""
        matches[tag] = bool(hyp == text)
    return {
        "emotion_roundtrip_match": round(
            sum(matches.values()) / len(matches), 4),
        "emotion_roundtrip_by_tag": matches,
    }


def evaluate_voice_clone_identity(tts_params, tts_cfg, vocoder_params,
                                  vocoder_cfg, text: str = "lima oscar") -> Dict:
    """Closed-set speaker identification of CLONED audio: synthesize
    ``text`` conditioned on each enrolled speaker's embedding, re-embed the
    synthesized waveform, and check the nearest enrollment is the target
    speaker (the reference's voice cloning ships reference audio to the
    cloud TTS — backend/services/synthesizer.py:183-200; here identity is
    measurable locally)."""
    import jax
    import jax.numpy as jnp

    from janus_tpu.models import tts as tts_mod
    from janus_tpu.models import vocoder as voc_mod
    from janus_tpu.models.speaker import speaker_embed
    from janus_tpu.train.demo import demo_speaker_vectors

    tok = ByteTokenizer()
    spk_params, vecs = demo_speaker_vectors(tts_cfg)
    enroll = np.stack(vecs)  # [S, d]

    ids = tok.encode(text)
    from janus_tpu.models.tts import text_bucket

    width = text_bucket(len(ids), tts_cfg.max_text_tokens)
    padded = np.full((1, width), tok.pad, np.int32)
    padded[0, : len(ids)] = ids

    def _gen(tp, vp, t_ids, emo, spk):
        mel, n_frames = tts_mod.tts_generate(
            tp, tts_cfg, t_ids, emo, speaker=spk, text_vocab=tok.vocab_size)
        return voc_mod.vocoder_waveform(vp, vocoder_cfg, mel), n_frames

    gen = jax.jit(_gen)
    correct, sims = 0, []
    for s in range(len(vecs)):
        wav, nf = gen(tts_params, vocoder_params, jnp.asarray(padded),
                      jnp.asarray([0], jnp.int32),
                      jnp.asarray(enroll[s])[None, :])
        n = int(np.asarray(nf)[0]) * vocoder_cfg.hop_length
        w = jnp.asarray(np.asarray(wav)[0, :n])
        emb = np.asarray(jax.jit(
            lambda p, a: speaker_embed(p, a, n_mels=tts_cfg.n_mels)
        )(spk_params, w))
        cos = enroll @ emb  # embeddings are L2-normalized
        sims.append(float(cos[s]))
        correct += int(np.argmax(cos) == s)
    return {
        "voice_clone_identity": f"{correct}/{len(vecs)}",
        "voice_clone_identity_frac": round(correct / len(vecs), 4),
        "voice_clone_target_cos_mean": round(float(np.mean(sims)), 4),
    }


def evaluate_hard_roundtrip(bundle=None, n_utterances: int = 24,
                            seed: int = 97) -> Dict:
    """Full wire path on the HARD corpus (VERDICT r4 task 1): render a
    fresh hard utterance (16 speakers, 0.8–1.25× rates, emotion
    renderings) → SemanticEncoder (hard ASR) → JanusPacket bytes →
    Synthesizer (hard-corpus TTS + vocoder, default voice, emotion tag
    from the packet's prosody) → re-encode → WER.

    This is the decode-side generality check: the reference's synthesizer
    speaks arbitrary text (reference backend/services/synthesizer.py:
    106-207); the zero-egress stand-in for that generality is the 256-word
    corpus, round-tripped through the actual wire path."""
    import jax.numpy as jnp

    from janus_tpu.models import zoo
    from janus_tpu.ops.resample import resample_poly
    from janus_tpu.runtime.codec import SemanticEncoder
    from janus_tpu.runtime.synthesizer import Synthesizer
    from janus_tpu.train.demo import HARD_CORPUS

    if bundle is None:
        bundle = zoo.load_demo_hard()
    cfg = bundle.config
    rng = np.random.default_rng(seed)
    vocab = HARD_CORPUS["vocab"]
    emotions = HARD_CORPUS["emotions"]

    texts, phrases = [], []
    for i in range(n_utterances):
        t = sample_text(rng, 1, 5, vocab=vocab)
        texts.append(t)
        wav16 = render_text(
            t, 16_000, seed=int(rng.integers(1 << 30)),
            speaker=int(rng.integers(0, HARD_CORPUS["n_speakers"])),
            emotion=emotions[int(rng.integers(0, len(emotions)))],
            rate=float(rng.uniform(*HARD_CORPUS["rate_range"])),
        )
        wav48 = np.asarray(resample_poly(jnp.asarray(wav16), up=3, down=1))
        phrases.append(wav48.astype(np.float32))

    encoder = SemanticEncoder(cfg, asr_params=bundle.asr_params,
                              buckets=(48_000 * 4,))
    results = encoder.encode_batch(phrases)
    hyps = [r["text"] for r in results]
    tx_wer = word_error_rate(texts, hyps)

    synth = Synthesizer(cfg, tts_params=bundle.tts_params,
                        vocoder_params=bundle.vocoder_params,
                        default_speaker_vec=np.asarray(
                            bundle.default_speaker_vec))
    rt_hyps: List[str] = []
    tags = {}
    for r in results:
        p = JanusPacket(text=r["text"], prosody=r["prosody"], timestamp=0.0)
        p = JanusPacket.deserialize(p.serialize())  # through the real wire
        tag = synth._resolve_emotion(p)
        tags[tag] = tags.get(tag, 0) + 1
        audio = synth.synthesize(p)
        pcm = np.frombuffer(audio, dtype=np.int16).astype(np.float32) / 32768.0
        rt_hyps.append(encoder.encode_batch([pcm])[0]["text"] if len(pcm)
                       else "")
    rt_wer = word_error_rate(texts, rt_hyps)
    return {
        "hard_roundtrip_wer": round(rt_wer, 4),
        "hard_roundtrip_tx_wer": round(tx_wer, 4),
        "hard_roundtrip_n": n_utterances,
        "hard_roundtrip_emotion_tags": tags,
    }


def evaluate_hard_asr(params, cfg, n_utterances: int = 32,
                      seed: int = 321) -> Dict:
    """WER of the hard-corpus ASR (256-word vocabulary, 16 speakers,
    0.8-1.25x rates, emotion renderings) clean and under additive noise —
    the zero-egress stand-in for real-speech difficulty (VERDICT r2)."""
    from janus_tpu.train.demo import HARD_CORPUS, evaluate_asr

    tok = ByteTokenizer()
    out: Dict = {"hard_vocab_words": len(HARD_CORPUS["vocab"]),
                 "hard_n_speakers": HARD_CORPUS["n_speakers"]}
    for label, snr in (("clean", None), ("snr10", (10.0, 10.0)),
                       ("snr5", (5.0, 5.0)), ("snr0", (0.0, 0.0))):
        corpus = dict(HARD_CORPUS)
        corpus["clean_prob"] = 0.0  # pin each row's noise level exactly
        if snr is None:
            corpus.pop("snr_db_range", None)
        else:
            corpus["snr_db_range"] = snr
        wer, _ = evaluate_asr(params, cfg, tok, n_utterances=n_utterances,
                              seed=seed, corpus=corpus, max_seconds=3.84)
        out[f"hard_wer_{label}"] = round(wer, 4)
    return out


def main() -> None:
    import os
    from janus_tpu.common.platform import apply_env_platform, enable_compile_cache

    apply_env_platform()
    enable_compile_cache()

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--asr-ckpt", default="checkpoints/demo_asr.npz")
    parser.add_argument("--tts-ckpt", default="checkpoints/demo_tts.npz")
    parser.add_argument("--voc-ckpt", default="checkpoints/demo_vocoder.npz")
    parser.add_argument("--hard-ckpt", default="checkpoints/demo_asr_hard.npz")
    parser.add_argument("--n", type=int, default=16)
    parser.add_argument(
        "--min-snr", type=float,
        default=float(os.environ.get("JANUS_MIN_SNR", "nan")),
        help="fail (exit 1) when vocoder copy-synthesis SNR falls below "
             "this floor — the round-2 regression gate",
    )
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from janus_tpu.train.demo import (
        demo_asr_config,
        demo_tts_config,
        demo_vocoder_config,
    )

    params = load_npz_params(args.asr_ckpt)
    kw = {}
    if os.path.exists(args.tts_ckpt):
        kw["tts_params"] = load_npz_params(args.tts_ckpt)
        kw["tts_cfg"] = demo_tts_config()
    if os.path.exists(args.voc_ckpt):
        kw["vocoder_params"] = load_npz_params(args.voc_ckpt)
        kw["vocoder_cfg"] = demo_vocoder_config()
    metrics = evaluate_roundtrip(params, demo_asr_config(), n_utterances=args.n, **kw)
    if os.path.exists(args.hard_ckpt):
        from janus_tpu.train.demo import hard_asr_config

        metrics.update(evaluate_hard_asr(
            load_npz_params(args.hard_ckpt), hard_asr_config()))
    from janus_tpu.models import zoo

    if zoo.hard_available():
        metrics.update(evaluate_hard_roundtrip())
    print(json.dumps(metrics, indent=2))
    if args.min_snr == args.min_snr:  # not NaN -> the floor is armed
        if metrics["vocoder_copy_snr_db"] < args.min_snr:
            raise SystemExit(
                f"copy-synthesis SNR {metrics['vocoder_copy_snr_db']} dB "
                f"below the {args.min_snr} dB floor"
            )


if __name__ == "__main__":
    main()
