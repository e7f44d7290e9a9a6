"""Streaming TTS: emit waveform chunks while mel groups are still being
generated.

The reference's turnaround was a full cloud round trip (~2.8–3.0 s,
reference docs/ARCHITECTURE.md:229-231) — nothing played until the whole
clip came back. Here the decode side is chunked end-to-end:

1. the TTS transformer generates mel in chunks of ``chunk_groups`` KV-
   cached steps (:func:`janus_tpu.models.tts.tts_decode_chunk`) instead
   of one fused ``while_loop`` over the whole budget;
2. the vocoder backbone is frame-local (ConvNeXt k=7 ⇒ 3·layers halo), so
   each chunk's spectra are computed exactly from the chunk plus halo
   (:func:`janus_tpu.models.vocoder.vocoder_spectra`);
3. the iSTFT and the 24 k→48 k polyphase resampler get the same halo
   treatment (window span / FIR reach), so every emitted chunk is
   BIT-IDENTICAL to the corresponding slice of the non-streaming
   ``Synthesizer._synth_impl`` output (asserted by
   ``tests/test_streaming_tts.py``).

Turnaround: first audio after prompt prefill + one chunk of groups + one
chunk vocode, instead of the full generation budget.

All device programs have a handful of static shapes (first / interior /
final chunk), so sustained streaming never recompiles.
"""

from __future__ import annotations

import logging
import math
import time
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.common.config import JanusConfig
from janus_tpu.models import tts as tts_mod
from janus_tpu.models import vocoder as voc_mod
from janus_tpu.models.tokenizer import ByteTokenizer
from janus_tpu.models.tts import text_bucket
from janus_tpu.ops.resample import resample_poly

logger = logging.getLogger(__name__)

__all__ = ["StreamingSynthesizer"]

# One-sided input-sample halo for exact interior polyphase resampling
# (windowed-sinc reach is num_taps/up ≈ 33 source samples; 128 is ample).
_RESAMPLE_HALO = 128


class StreamingSynthesizer:
    """Chunked text→audio with exact parity to the fused synthesis path.

    ``stream()`` yields 48 kHz float32 waveform chunks; ``synthesize``-
    style int16 bytes come from :meth:`stream_pcm16`.
    """

    def __init__(self, cfg: Optional[JanusConfig] = None, tts_params=None,
                 vocoder_params=None, chunk_groups: int = 16,
                 rng_seed: int = 0, stop_threshold: float = 0.5) -> None:
        self.cfg = cfg or JanusConfig()
        self.tokenizer = ByteTokenizer()
        self.tts_params = (tts_params if tts_params is not None
                           else tts_mod.init_tts(rng_seed, self.cfg.tts,
                                                 text_vocab=self.tokenizer.vocab_size))
        self.vocoder_params = (vocoder_params if vocoder_params is not None
                               else voc_mod.init_vocoder(
                                   rng_seed + 1, self.cfg.vocoder,
                                   n_mels=self.cfg.tts.n_mels))
        if self.cfg.tts.scan_layers:
            # host-side layer stack (idempotent): trace-time stacking would
            # copy the weights inside every dispatched chunk program
            self.tts_params = tts_mod.prestack_tts(self.tts_params)
        self.chunk_groups = int(chunk_groups)
        self.stop_threshold = float(stop_threshold)
        vcfg = self.cfg.vocoder
        self._hb = voc_mod.vocoder_halo_frames(vcfg)      # backbone halo
        self._hi = vcfg.n_fft // vcfg.hop_length          # iSTFT frame halo
        self._extra = vcfg.n_fft // vcfg.hop_length       # utterance-end flush
        g = math.gcd(48_000, vcfg.sample_rate)
        self._up, self._down = 48_000 // g, vcfg.sample_rate // g

        self._prefill_jit = jax.jit(self._prefill_impl)
        self._chunk_jit = jax.jit(self._chunk_impl, static_argnames=("n_steps",))
        # complex spectra never cross the device->host boundary: transfers
        # of complex dtypes are UNIMPLEMENTED on some remote TPU backends,
        # so the programs move real/imag float32 pairs and the host buffer
        # reassembles complex64.
        def _spectra_ri(vp, mel):
            s = voc_mod.vocoder_spectra(vp, vcfg, mel)
            return jnp.real(s), jnp.imag(s)

        self._spectra_jit = jax.jit(_spectra_ri)
        self._istft_jit = jax.jit(
            lambda re, im: voc_mod.spectra_to_waveform(
                vcfg, jax.lax.complex(re, im), tail_repeat=False))
        if (self._up, self._down) != (1, 1):
            self._resample_jit = jax.jit(
                lambda w: resample_poly(w, up=self._up, down=self._down))
        else:
            self._resample_jit = None

    # -- device programs (params traced, never closed over) ----------------

    def _prefill_impl(self, tts_params, text_ids, emotion, speaker):
        return tts_mod.tts_prefill(
            tts_params, self.cfg.tts, text_ids, emotion, speaker=speaker,
            text_vocab=self.tokenizer.vocab_size,
            stop_threshold=self.stop_threshold)

    def _chunk_impl(self, tts_params, state, prev, done, start_group,
                    n_steps: int):
        return tts_mod.tts_decode_chunk(
            tts_params, self.cfg.tts, state, prev, done, start_group,
            n_steps=n_steps, stop_threshold=self.stop_threshold)

    # -- streaming ----------------------------------------------------------

    def stream(self, text: str, emotion_tag: str = "neutral",
               speaker=None) -> Iterator[np.ndarray]:
        """Yield 48 kHz float32 chunks; concatenation equals the
        non-streaming synthesis of the same prompt, bit-exactly."""
        tcfg, vcfg = self.cfg.tts, self.cfg.vocoder
        r = tcfg.reduction
        max_groups = tcfg.max_mel_frames // r
        t_frames = max_groups * r            # the full mel budget
        hop = vcfg.hop_length

        ids = self.tokenizer.encode(text)[: tcfg.max_text_tokens]
        bucket = text_bucket(len(ids), tcfg.max_text_tokens)
        padded = np.full((1, bucket), self.tokenizer.pad, np.int32)
        padded[0, : len(ids)] = ids
        emo = jnp.asarray([tts_mod.emotion_id(emotion_tag)], jnp.int32)
        spk = None if speaker is None else jnp.asarray(speaker)[None, :]

        first, done, state = self._prefill_jit(
            self.tts_params, jnp.asarray(padded), emo, spk)

        # host-side buffers over the FULL budget (mirrors tts_generate's
        # zero-filled output buffer, so parity holds after the stop)
        mel_buf = np.zeros((1, t_frames, tcfg.n_mels), np.float32)
        n_bins = vcfg.n_fft // 2 + 1
        spec_buf = np.zeros((1, t_frames + self._extra, n_bins), np.complex64)
        mel_buf[0, 0:r, :] = np.asarray(first).reshape(r, tcfg.n_mels)
        groups_have = 1          # mel groups materialized on host
        n_valid_groups = 1       # groups before the stop fired
        stopped = bool(np.asarray(done)[0])
        spec_have = 0            # spectra computed through this frame
        emitted48 = 0
        prev, start = first, 0

        chunk_frames = self.chunk_groups * r

        def gen_more():
            nonlocal prev, done, state, start, groups_have, stopped
            nonlocal n_valid_groups
            groups, dones, prev, done, state = self._chunk_jit(
                self.tts_params, state, prev, done, start,
                n_steps=self.chunk_groups)
            g = np.asarray(groups)[0]        # [G, r*n_mels]
            d = np.asarray(dones)[0]         # [G] done BEFORE each group
            lo = groups_have
            hi = min(lo + self.chunk_groups, max_groups)
            mel_buf[0, lo * r : hi * r, :] = g[: hi - lo].reshape(-1, tcfg.n_mels)
            if not stopped:
                n_valid_groups = lo + int(np.argmax(d)) if d.any() else hi
                stopped = bool(d.any())
            groups_have = hi
            start += self.chunk_groups

        def spec_through(frame: int):
            """Compute exact spectra for frames [spec_have, frame)."""
            nonlocal spec_have
            while spec_have < frame:
                a = spec_have
                b = min(a + chunk_frames, t_frames)
                m_lo = max(0, a - self._hb)
                m_hi = min(t_frames, b + self._hb)
                # mel through m_hi must exist (zeros after the stop are
                # already the correct values — tts_generate parity)
                while (groups_have * r < m_hi and groups_have < max_groups
                       and not stopped):
                    gen_more()
                s_re, s_im = self._spectra_jit(
                    self.vocoder_params, jnp.asarray(mel_buf[:, m_lo:m_hi, :]))
                spec = np.asarray(s_re) + 1j * np.asarray(s_im)
                spec_buf[:, a:b, :] = spec[:, a - m_lo : b - m_lo, :]
                spec_have = b
                if b == t_frames:  # utterance-end flush (spec tail repeat)
                    spec_buf[:, t_frames:, :] = spec_buf[:, t_frames - 1 : t_frames, :]
                    spec_have = t_frames + self._extra

        def emit(a_frame: int, b_frame: int, n48_limit: int) -> np.ndarray:
            """Exact 48 kHz samples for vocoder frames [a, b)."""
            spec_through(min(b_frame + self._hi + 1, t_frames))
            s0 = max(0, a_frame - self._hi - 1)
            s1 = min(t_frames + self._extra, b_frame + self._hi + 1)
            window = spec_buf[:, s0:s1, :]
            wav = np.asarray(self._istft_jit(
                jnp.asarray(window.real.astype(np.float32)),
                jnp.asarray(window.imag.astype(np.float32))))
            # local sample l == absolute sample s0*hop + l
            core_lo = a_frame * hop
            core_hi = b_frame * hop
            rh_l = min(_RESAMPLE_HALO, core_lo - s0 * hop)
            # right halo clamps to the FULL signal length (t_frames*hop):
            # the fused path slices the waveform there before resampling,
            # so its resampler sees zero right-padding, not the iSTFT
            # flush tail — parity requires the same edge condition
            hi_abs = min(core_hi + _RESAMPLE_HALO, t_frames * hop)
            span = wav[:, core_lo - s0 * hop - rh_l : hi_abs - s0 * hop]
            if self._resample_jit is not None:
                out = np.asarray(self._resample_jit(jnp.asarray(span)))
                lo = rh_l * self._up // self._down
                n = (core_hi - core_lo) * self._up // self._down
                out = out[:, lo : lo + n]
            else:
                out = span[:, rh_l : rh_l + (core_hi - core_lo)]
            take = min(out.shape[1], n48_limit)
            return out[0, :take]

        samples_per_frame48 = hop * self._up // self._down
        # same text-proportional duration guard as the fused path
        # (Synthesizer._run_tts) — parity requires identical clipping
        cap48 = int((0.35 + tcfg.max_seconds_per_text_token * len(ids))
                    * 48_000)
        a = 0
        while a < t_frames:
            b = min(a + chunk_frames, t_frames)
            # generate through this chunk's spec halo first, so any stop
            # inside [a, b) is known BEFORE the emission limit is fixed
            need_groups = min(max_groups,
                              -(-min(t_frames, b + self._hb) // r))
            while groups_have < need_groups and not stopped:
                gen_more()
            n48 = min((n_valid_groups if stopped else max_groups)
                      * r * samples_per_frame48, cap48)
            if emitted48 >= n48:
                break
            chunk = emit(a, b, n48 - emitted48)
            emitted48 += len(chunk)
            if len(chunk):
                yield chunk
            if emitted48 >= n48:
                break
            a = b

    def stream_pcm16(self, text: str, emotion_tag: str = "neutral",
                     speaker=None) -> Iterator[bytes]:
        for chunk in self.stream(text, emotion_tag, speaker=speaker):
            yield (np.clip(chunk, -1.0, 1.0) * 32767.0).astype(np.int16).tobytes()

    def turnaround(self, text: str, emotion_tag: str = "neutral",
                   speaker=None) -> Tuple[float, float, int]:
        """(seconds to FIRST audio chunk, seconds to full audio, samples).

        The first number is the walkie-talkie turnaround the reference
        measured at 2.8–3.0 s against its cloud TTS."""
        t0 = time.perf_counter()
        first_t = None
        total = 0
        for chunk in self.stream(text, emotion_tag, speaker=speaker):
            if first_t is None:
                first_t = time.perf_counter() - t0
            total += len(chunk)
        return (first_t or 0.0), time.perf_counter() - t0, total
