"""The semantic decoder: JanusPacket → PCM audio bytes.

Mode routing, emotion prompting, voice-clone hot-reload and the failure-
degradation ladder all mirror the reference synthesizer exactly
(reference: backend/services/synthesizer.py:106-255):

- MORSE_CODE  → local sine synthesis (bit-identical timings)
- TEXT_ONLY   → fast TTS (no emotion tag unless an override is active)
- SEMANTIC    → emotion-prompted TTS; the (pitch, energy) → tag table is
  the reference's, including its dead 'Low' branches
- semantic failure → fast TTS; fast-TTS failure → b''

The synthesis itself runs the in-framework TTS transformer + iSTFT
vocoder as one jitted program, instead of a cloud call. Text pads only to
the next power-of-two bucket: audio tokens sit at a fixed position base
(models.tts.audio_pos_base) and training jitters prompt widths over the
same buckets, so any bucket is an in-distribution prompt length. Output
is 48 kHz mono int16 PCM bytes ready for playback.
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.common.config import JanusConfig
from janus_tpu.common.protocol import JanusMode, JanusPacket
from janus_tpu.models import tts as tts_mod
from janus_tpu.models.tts import text_bucket
from janus_tpu.models import vocoder as voc_mod
from janus_tpu.models.speaker import init_speaker_encoder, speaker_embed
from janus_tpu.models.tokenizer import ByteTokenizer
from janus_tpu.ops.morse import morse_audio
from janus_tpu.ops.resample import decimate_48k_to_16k, resample_poly

logger = logging.getLogger(__name__)

__all__ = ["Synthesizer"]



class Synthesizer:
    """Packet → audio bytes, API-compatible with the reference service."""

    def __init__(
        self,
        cfg: Optional[JanusConfig] = None,
        tts_params=None,
        vocoder_params=None,
        speaker_params=None,
        reference_audio_path: Optional[str] = None,
        rng_seed: int = 0,
        default_speaker_vec=None,
        mesh: Optional[jax.sharding.Mesh] = None,
    ) -> None:
        """``default_speaker_vec`` is the voice used when no reference
        audio is enrolled (speaker-conditioned TTS checkpoints are trained
        with a vector in the [SPK] slot, so unconditioned generation is
        off-distribution).

        With a ``mesh``, the TTS and vocoder weights are tensor-parallel
        sharded over the ``model`` axis per the same partition rules the
        trainer uses (parallel/sharding.py) — the flagship-scale serving
        layout the encode path got in ``runtime.codec.SemanticEncoder``
        (VERDICT r4 task 4); XLA derives the collectives from the
        shardings. Generation is numerically identical to unsharded (the
        tp2-vs-unsharded parity is asserted in tests/test_parallel.py)."""
        self.cfg = cfg or JanusConfig()
        self.tokenizer = ByteTokenizer()
        self.tts_params = tts_params if tts_params is not None else tts_mod.init_tts(
            rng_seed, self.cfg.tts, text_vocab=self.tokenizer.vocab_size
        )
        self.vocoder_params = (
            vocoder_params
            if vocoder_params is not None
            else voc_mod.init_vocoder(rng_seed + 1, self.cfg.vocoder,
                                      n_mels=self.cfg.tts.n_mels)
        )
        self.speaker_params = (
            speaker_params
            if speaker_params is not None
            else init_speaker_encoder(rng_seed + 2, n_mels=self.cfg.tts.n_mels,
                                      d_out=self.cfg.tts.d_model)
        )

        self.mesh = mesh
        if mesh is not None:
            from janus_tpu.parallel.sharding import (
                TTS_PARTITION_RULES,
                VOCODER_PARTITION_RULES,
                shard_params,
            )

            self.tts_params = shard_params(self.tts_params, mesh,
                                           TTS_PARTITION_RULES)
            self.vocoder_params = shard_params(self.vocoder_params, mesh,
                                               VOCODER_PARTITION_RULES)
        elif self.cfg.tts.scan_layers:
            # stack the layer axis ONCE on the host — trace-time stacking
            # copies the full weight set inside every dispatched program
            # (with a mesh the per-layer layout must survive for the
            # partition rules; GSPMD handles the stacking instead)
            self.tts_params = tts_mod.prestack_tts(self.tts_params)

        self._default_speaker_vec = (
            np.asarray(default_speaker_vec, dtype=np.float32)
            if default_speaker_vec is not None else None
        )
        self._reference_audio_path = reference_audio_path
        self._reference_audio_mtime: Optional[float] = None
        self._speaker_vec: Optional[jax.Array] = None
        if reference_audio_path:
            self._load_reference_audio(reference_audio_path)

        self._synth_jit = jax.jit(self._synth_impl)
        self._streamer = None  # lazy StreamingSynthesizer (shares params)

    # -- voice cloning (reference: synthesizer.py:67-104) ------------------

    def _load_reference_audio(self, path: str) -> None:
        try:
            if os.path.exists(path):
                # The verify endpoint saves the browser upload verbatim, so
                # the clone reference may be WebM/Opus, not WAV — sniff it.
                from janus_tpu.audio.decode import read_audio

                audio, sr = read_audio(path)
                if sr == 48_000:
                    audio16 = np.asarray(decimate_48k_to_16k(jnp.asarray(audio)))
                elif sr == 16_000:
                    audio16 = audio
                else:
                    audio16 = np.asarray(
                        resample_poly(jnp.asarray(audio), up=16_000, down=sr)
                    )
                self._speaker_vec = speaker_embed(
                    self.speaker_params, jnp.asarray(audio16),
                    n_mels=self.cfg.tts.n_mels,
                )
                self._reference_audio_mtime = os.path.getmtime(path)
            else:
                self._speaker_vec = None
                self._reference_audio_mtime = None
        except Exception as e:  # degrade, never crash synthesis
            logger.warning("Could not load reference audio from %s: %s", path, e)
            self._speaker_vec = None
            self._reference_audio_mtime = None

    def _check_and_reload_reference_audio(self) -> None:
        if self._reference_audio_path and os.path.exists(self._reference_audio_path):
            mtime = os.path.getmtime(self._reference_audio_path)
            if self._reference_audio_mtime is None or mtime != self._reference_audio_mtime:
                self._load_reference_audio(self._reference_audio_path)

    # -- device path -------------------------------------------------------

    def _synth_impl(self, tts_params, vocoder_params, text_ids: jax.Array,
                    emotion: jax.Array, speaker: Optional[jax.Array]
                    ) -> Tuple[jax.Array, jax.Array]:
        # params are traced args, NOT closed over — closure capture inlines
        # the weights into the HLO as constants (flagship-size programs
        # break the compile tunnel; checkpoints would recompile)
        import math

        mel, n_frames = tts_mod.tts_generate(
            tts_params, self.cfg.tts, text_ids, emotion,
            speaker=speaker, text_vocab=self.tokenizer.vocab_size,
        )
        wav = voc_mod.vocoder_waveform(vocoder_params, self.cfg.vocoder, mel)
        # vocoder rate -> 48 kHz playback
        sr = self.cfg.vocoder.sample_rate
        g = math.gcd(48_000, sr)
        up, down = 48_000 // g, sr // g
        wav48 = resample_poly(wav, up=up, down=down) if (up, down) != (1, 1) else wav
        n48 = n_frames * self.cfg.vocoder.hop_length * up // down
        return wav48, n48

    def _run_tts(self, prompt_text: str, emotion_tag: str) -> bytes:
        ids = self.tokenizer.encode(prompt_text)[: self.cfg.tts.max_text_tokens]
        # pad only to the next power-of-two text bucket (recompile-free,
        # one program per bucket). The model is text-length robust: audio
        # tokens sit at a FIXED position base (models.tts.audio_pos_base)
        # and training jitters the prompt width over these same buckets,
        # so serving no longer requires the exact trained length (the
        # round-1 landmine).
        bucket = text_bucket(len(ids), self.cfg.tts.max_text_tokens)
        padded = np.full((1, bucket), self.tokenizer.pad, dtype=np.int32)
        padded[0, : len(ids)] = ids
        emo = np.asarray([tts_mod.emotion_id(emotion_tag)], dtype=np.int32)
        speaker = None
        if self._speaker_vec is not None:
            speaker = jnp.asarray(self._speaker_vec)[None, :]
        elif self._default_speaker_vec is not None:
            speaker = jnp.asarray(self._default_speaker_vec)[None, :]
        wav, n_samples = self._synth_jit(
            self.tts_params, self.vocoder_params,
            jnp.asarray(padded), jnp.asarray(emo), speaker
        )
        n = int(np.asarray(n_samples)[0]) if np.ndim(n_samples) else int(n_samples)
        # Text-proportional duration guard: an AR stop-head miss must not
        # emit unbounded trailing audio (looping is the classic failure of
        # autoregressive acoustic models — real TTS stacks cap decoder
        # steps by prompt length the same way).
        cap = int((0.35 + self.cfg.tts.max_seconds_per_text_token * len(ids))
                  * 48_000)
        pcm = np.asarray(wav[0])[: max(min(n, cap), 0)]
        pcm = np.clip(pcm, -1.0, 1.0)
        return (pcm * 32767.0).astype(np.int16).tobytes()

    def _resolve_emotion(self, packet: JanusPacket) -> str:
        if packet.override_emotion and packet.override_emotion != "Auto":
            return packet.override_emotion
        prosody = packet.prosody or {}
        return _reference_emotion_table(
            prosody.get("pitch", "Normal"), prosody.get("energy", "Normal")
        )

    def _speaker_arg(self):
        if self._speaker_vec is not None:
            return np.asarray(self._speaker_vec)
        if self._default_speaker_vec is not None:
            return self._default_speaker_vec
        return None

    def synthesize_streaming(self, packet: JanusPacket):
        """Yield PCM16 byte chunks as mel groups are generated — first
        audio after one decode chunk instead of the full budget
        (turnaround vs the reference's 2.8–3.0 s cloud round trip).
        Concatenated chunks equal :meth:`synthesize`'s output for the
        semantic/text modes; Morse is instant and yields once."""
        if packet.mode == JanusMode.MORSE_CODE:
            yield morse_audio(packet.text)
            return
        self._check_and_reload_reference_audio()
        if packet.mode == JanusMode.TEXT_ONLY:
            tag = (packet.override_emotion
                   if packet.override_emotion and packet.override_emotion != "Auto"
                   else "neutral")
        else:
            tag = self._resolve_emotion(packet)
        if self._streamer is None:
            from janus_tpu.runtime.streaming_tts import StreamingSynthesizer

            self._streamer = StreamingSynthesizer(
                self.cfg, tts_params=self.tts_params,
                vocoder_params=self.vocoder_params,
            )
        emitted = False
        try:
            for chunk in self._streamer.stream_pcm16(
                packet.text, tag, speaker=self._speaker_arg()
            ):
                emitted = True
                yield chunk
        except Exception as e:
            logger.error("streaming synthesis failed: %s", e)
            if not emitted:  # reference fallback ladder, chunk-free
                fallback = self._generate_fast_tts(packet.text,
                                                   packet.override_emotion)
                if fallback:
                    yield fallback

    # -- public API (reference: synthesizer.py:106-255) --------------------

    def synthesize(self, packet: JanusPacket) -> bytes:
        if packet.mode == JanusMode.MORSE_CODE:
            return morse_audio(packet.text)
        if packet.mode == JanusMode.TEXT_ONLY:
            return self._generate_fast_tts(packet.text, packet.override_emotion)
        if packet.mode == JanusMode.SEMANTIC_VOICE:
            return self._generate_semantic_audio(packet)
        raise ValueError(f"Unknown packet mode: {packet.mode}")

    def _generate_semantic_audio(self, packet: JanusPacket) -> bytes:
        self._check_and_reload_reference_audio()
        emotion = self._resolve_emotion(packet)
        try:
            return self._run_tts(packet.text, emotion)
        except Exception as e:
            logger.error("Synthesis error: %s", e)
            return self._generate_fast_tts(packet.text, packet.override_emotion)

    def _generate_fast_tts(self, text: str, emotion: Optional[str] = None) -> bytes:
        self._check_and_reload_reference_audio()
        tag = emotion if (emotion and emotion != "Auto") else "neutral"
        try:
            return self._run_tts(text, tag)
        except Exception as e:
            logger.error("Fast TTS error: %s", e)
            return b""


def _reference_emotion_table(pitch: str, energy: str) -> str:
    from janus_tpu.runtime.emotion import tts_emotion_tag

    return tts_emotion_tag(pitch, energy)
