"""The semantic encoder: phrase audio → JanusPacket.

This is the fused encode path (BASELINE config 2): one jitted program per
duration bucket runs anti-aliased decimation, the Whisper-class
encoder+greedy decode, YIN pitch tracking and RMS energy — everything the
reference spread across faster-whisper and aubio calls in a thread pool
(reference: backend/services/engine.py:510-552). Prosody classification
returns int codes inside jit; only the final string/packet assembly is
host-side.

Phrases are padded into a small set of static duration buckets so the
whole deployment compiles a handful of programs once and never again.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from janus_tpu.common.config import JanusConfig
from janus_tpu.common.protocol import JanusMode, JanusPacket
from janus_tpu.models import asr as asr_mod
from janus_tpu.models.tokenizer import ByteTokenizer
from janus_tpu.ops.energy import ENERGY_TAGS, classify_energy, rms_energy
from janus_tpu.ops.resample import decimate_48k_to_16k
from janus_tpu.ops.yin import PITCH_TAGS, classify_pitch, mean_voiced_pitch, yin_track

__all__ = ["SemanticEncoder", "PendingEncode", "duration_bucket",
           "mel_frame_budget"]


class PendingEncode:
    """Handle to an asynchronously dispatched encode program.

    Holds only device arrays (JAX futures) — no host transfer happens
    until :meth:`result`. ``is_ready`` polls completion without blocking,
    letting a serving loop harvest finished batches opportunistically
    while later batches' frontends run (SURVEY §2.4 runtime overlap; the
    reference's analog was its playback queue + threads)."""

    __slots__ = ("_encoder", "_arrays", "_b_real", "_out")

    def __init__(self, encoder, arrays, b_real: int):
        self._encoder = encoder
        self._arrays = arrays
        self._b_real = b_real
        self._out = None

    @classmethod
    def done(cls, results: list) -> "PendingEncode":
        p = cls(None, None, 0)
        p._out = results
        return p

    def is_ready(self) -> bool:
        """True when every output buffer is computed (no blocking)."""
        if self._out is not None:
            return True
        try:
            return all(a.is_ready() for a in self._arrays)
        except AttributeError:  # backend without is_ready: treat as ready
            return True

    def result(self) -> list:
        """Block until the program finishes; fetch + decode (idempotent)."""
        if self._out is None:
            self._out = self._encoder._finalize(self._arrays, self._b_real)
            self._arrays = None  # release device buffers
        return self._out


def mel_frame_budget(acfg, bucket: int) -> int:
    """16 kHz mel frame budget for a 48 kHz sample bucket (even, ≥2,
    capped at the encoder window). Shared by serving and the profiler so
    they always compile the same program."""
    n16 = min(bucket // 3 // acfg.hop_length, 2 * acfg.max_source_positions)
    return max(2, n16 - (n16 % 2))

# Phrase duration buckets in 48 kHz samples (1.25 s ... 30 s). Chosen so
# bucket[i+1] = 2*bucket[i]: at most 2x padding waste, ~5 compiled programs.
DEFAULT_BUCKETS = tuple(48_000 * s for s in (2, 4, 8, 15, 30))


def duration_bucket(n_samples: int, buckets: Sequence[int] = DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n_samples <= b:
            return b
    return buckets[-1]


class SemanticEncoder:
    """Batched phrase → (text, prosody) encoder with a host-side packet
    assembler. One instance owns the ASR params and the compiled programs."""

    def __init__(
        self,
        cfg: Optional[JanusConfig] = None,
        asr_params=None,
        tokenizer=None,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        mesh: Optional[jax.sharding.Mesh] = None,
    ) -> None:
        """With a ``mesh``, serving shards the phrase batch over the
        ``data`` axis and the ASR weights per the tensor-parallel rules
        over ``model`` — the pod-scale layout of BASELINE config 5; XLA
        derives the collectives from the shardings."""
        self.cfg = cfg or JanusConfig()
        self.tokenizer = tokenizer or ByteTokenizer()
        if asr_params is None:
            asr_params = asr_mod.init_asr(0, self.cfg.asr)
        # honor the configured inference dtype (bf16 default: half the
        # weight HBM traffic; matmuls still accumulate fp32, norms/softmax
        # run fp32 internally)
        import jax.numpy as jnp

        from janus_tpu.models.params import cast_floating

        dtype = jnp.dtype(self.cfg.asr.dtype)
        if dtype != jnp.float32:
            asr_params = cast_floating(asr_params, dtype)

        self.mesh = mesh
        if mesh is not None:
            from janus_tpu.parallel.sharding import ASR_PARTITION_RULES, shard_params

            asr_params = shard_params(asr_params, mesh, ASR_PARTITION_RULES)
        else:
            # prepare the decode layout ONCE on the host: stacked encoder
            # blocks (scan configs) + stacked/QKV-fused decoder blocks.
            # Leaving this to trace time re-stacks/concatenates (copies)
            # the decoder weights inside every dispatched program — ~GBs
            # per call at flagship scale (advisor r4: the non-scan branch
            # had the same in-program copy through the fuse_qkv flag).
            # (With a mesh the tree must keep the per-layer q/k/v layout
            # the partition rules name, so no host prep there.)
            if self.cfg.asr.scan_layers:
                enc_tree = asr_params["encoder"]
                if not isinstance(enc_tree["blocks"], dict):
                    from janus_tpu.models.params import stack_layer_params

                    asr_params = {**asr_params, "encoder": {
                        **enc_tree,
                        "blocks": stack_layer_params(enc_tree["blocks"])}}
            asr_params = asr_mod.prepare_decode_params(
                asr_params, scan_layers=self.cfg.asr.scan_layers,
                fuse_qkv=True)
        self.params = asr_params
        self._compute_dtype = dtype
        self.buckets = tuple(buckets)
        # Donate the audio/n_valid buffers: XLA reuses them for scratch
        # instead of holding both live (serving streams a fresh batch every
        # dispatch, so nothing reads them afterwards). CPU has no donation
        # — skip there to avoid a warning per compiled program in tests.
        donate = (1, 2) if jax.default_backend() != "cpu" else ()
        self._encode_jit = jax.jit(
            self._encode_impl, static_argnames=("n_16k_frames",),
            donate_argnums=donate,
        )

    def mel_frame_budget(self, bucket: int) -> int:
        """16 kHz mel frame budget for a 48 kHz sample bucket: even, ≥2,
        capped at the 30 s encoder window. The single source of truth for
        the ``n_16k_frames`` static arg (serving and analysis must compile
        the same program)."""
        return mel_frame_budget(self.cfg.asr, bucket)

    # -- device path -------------------------------------------------------

    def _encode_impl(self, params, audio_48k: jax.Array, n_valid: jax.Array,
                     n_16k_frames: int) -> Tuple[jax.Array, ...]:
        """``audio_48k[B, T48]`` (zero-padded), ``n_valid[B]`` true lengths.

        Returns (tokens[B, N], energy_code[B], pitch_code[B],
        mean_f0[B], rms[B]).

        ``params`` MUST be a traced argument, never closed over: closure-
        captured weights are inlined into the HLO as constants (a 635M-param
        model becomes a 3 GB program that kills the compile tunnel, and
        every new checkpoint would recompile).
        """
        acfg = self.cfg.asr
        pcfg = self.cfg.prosody

        if audio_48k.dtype == jnp.int16:
            # int16 wire format (RuntimeConfig.encode_transfer_int16):
            # exact inverse of the capture-side int16 -> float32/32768
            # conversion (reference backend/services/audio_io.py:125-128)
            audio_48k = audio_48k.astype(jnp.float32) / 32768.0
        elif audio_48k.dtype == jnp.uint8:
            # 8-bit mu-law wire (RuntimeConfig.encode_transfer_ulaw):
            # halves the transfer again at ~35-38 dB quantization SNR
            from janus_tpu.audio.ulaw import ulaw_decode

            audio_48k = ulaw_decode(audio_48k)

        def frontend(audio_48k, n_valid):
            """Per-shard audio frontend: prosody + mel. FFT ops (YIN
            autocorrelation, STFT) are not SPMD-partitionable — left to
            GSPMD they get batch-all-gathered and replicated on every
            device; under shard_map each device transforms only its own
            session lanes."""
            t48 = audio_48k.shape[-1]
            sample_mask = jnp.arange(t48)[None, :] < n_valid[:, None]
            rms = rms_energy(audio_48k, sample_mask)
            energy_code = classify_energy(rms, pcfg.energy_quiet,
                                          pcfg.energy_loud)

            audio_16k = decimate_48k_to_16k(audio_48k)
            if pcfg.yin_rate == 16_000:
                # pitch on the anti-aliased 16 kHz stream the mel frontend
                # needs anyway: 3x shorter signal, 3x smaller window AND
                # 3x fewer lags than native-rate tracking (the fmax-bounded
                # search needs no bandwidth above 8 kHz). Geometry scaled
                # to the same analysis durations; see ProsodyConfig.yin_rate.
                track = yin_track(
                    audio_16k, 16_000, pcfg.yin_window_16k,
                    pcfg.yin_hop_16k, pcfg.yin_tolerance,
                    fmin=pcfg.fmin_hz, fmax=pcfg.fmax_hz,
                )
                # ceil for BOTH divisions: the decimator emits ceil(n/3)
                # samples, so flooring here could drop the final partial
                # hop from the voiced-pitch mask (advisor r4)
                n16 = -(-n_valid // 3)
                n_hops = -(-n16 // pcfg.yin_hop_16k)
            else:
                track = yin_track(
                    audio_48k, self.cfg.audio.sample_rate, pcfg.yin_window,
                    pcfg.hop, pcfg.yin_tolerance, fmin=pcfg.fmin_hz,
                    fmax=pcfg.fmax_hz,
                )
                n_hops = -(-n_valid // pcfg.hop)
            f0 = mean_voiced_pitch(track, n_valid=n_hops)
            pitch_code = classify_pitch(f0, pcfg.pitch_deep_hz,
                                        pcfg.pitch_high_hz)
            mel = asr_mod.prepare_mel(audio_16k, acfg,
                                      pad_to_frames=n_16k_frames)
            return rms, energy_code, f0, pitch_code, mel

        if self.mesh is not None and self.mesh.shape.get("data", 1) > 1:
            from jax.sharding import PartitionSpec as P

            dp = P("data")
            frontend = jax.shard_map(
                frontend, mesh=self.mesh,
                in_specs=(dp, dp),
                out_specs=(dp, dp, dp, dp, P("data", None, None)),
                check_vma=False,
            )
        rms, energy_code, f0, pitch_code, mel = frontend(audio_48k, n_valid)
        # a mesh with a seq axis runs the encoder sequence-parallel: mel
        # time sharded over "seq", exact attention via the ppermute KV ring
        sp_mesh = (
            self.mesh
            if self.mesh is not None and self.mesh.shape.get("seq", 1) > 1
            else None
        )
        scan = acfg.scan_layers and sp_mesh is None
        enc = asr_mod.encode_audio(
            params, acfg, mel.astype(self._compute_dtype),
            scan_layers=scan, sp_mesh=sp_mesh,
        )
        prompt = jnp.broadcast_to(
            jnp.asarray(self.tokenizer.sot_sequence(), dtype=jnp.int32),
            (audio_48k.shape[0], len(self.tokenizer.sot_sequence())),
        )
        tokens = asr_mod.greedy_decode(
            params, acfg, enc, prompt, self.tokenizer.eot,
            max_new=acfg.max_decode_tokens, scan_layers=scan,
            # self-KV caches in the compute dtype (they stay tiny at phrase
            # decode lengths); cross-KV optionally int8 with per-position
            # scales — the decode loop re-reads every layer's cross K/V per
            # token, the dominant non-weight HBM stream at flagship scale
            cache_dtype=self._compute_dtype,
            cross_kv_int8=acfg.decode_cross_kv_int8,
            # host-prepared trees are already fused (idempotent re-fuse is
            # free); under a mesh keep the sharded per-layer q/k/v layout
            fuse_qkv=self.mesh is None,
        )
        return tokens, energy_code, pitch_code, f0, rms

    # -- host path ---------------------------------------------------------

    def encode_batch(self, phrases: Sequence[np.ndarray]) -> list:
        """Encode a batch of 48 kHz float32 phrases (ragged lengths) into
        per-phrase dicts: {text, prosody, f0, rms}.

        Both dimensions are bucketed so a deployment compiles a handful of
        programs total: durations into ``self.buckets`` and batch size up
        to the next power of two (padded lanes are zero audio and get
        sliced off the results).
        """
        return self.encode_batch_submit(phrases).result()

    def encode_batch_submit(self, phrases: Sequence[np.ndarray]) -> "PendingEncode":
        """Dispatch the encode program WITHOUT waiting: JAX async dispatch
        returns device futures immediately, so the caller keeps doing host
        work (VAD, segmentation, the next batch) while the program runs.
        Harvest with :meth:`PendingEncode.result`; poll with
        :meth:`PendingEncode.is_ready` to keep device→host syncs off the
        hot path (SURVEY §2.4 runtime overlap)."""
        if not phrases:
            return PendingEncode.done([])
        max_bucket = self.buckets[-1]
        if any(len(p) > max_bucket for p in phrases):
            # phrases beyond the largest bucket are split into bucket-sized
            # chunks, encoded as extra lanes, and merged afterwards (the
            # reference transcribed arbitrarily long buffers; truncating
            # here would silently drop tail audio). Rare path; synchronous.
            return PendingEncode.done(
                self._encode_with_splitting(phrases, max_bucket)
            )
        bucket = duration_bucket(max(len(p) for p in phrases), self.buckets)
        b_real = len(phrases)
        b_pad = 1 << (b_real - 1).bit_length()  # next power of two
        if self.mesh is not None:
            # lanes must tile the data axis (e.g. a single phrase through a
            # data=4 mesh still ships 4 lanes, 3 of them zero audio)
            data = self.mesh.shape.get("data", 1)
            b_pad = max(b_pad, data)
            b_pad += (-b_pad) % data
        batch = np.zeros((b_pad, bucket), dtype=np.float32)
        n_valid = np.zeros((b_pad,), dtype=np.int32)
        for i, p in enumerate(phrases):
            p = np.asarray(p, dtype=np.float32)[:bucket]
            batch[i, : len(p)] = p
            n_valid[i] = len(p)
        # padded lanes keep n_valid=0; their outputs are discarded below

        n16 = self.mel_frame_budget(bucket)

        if self.cfg.runtime.encode_transfer_ulaw:
            # 8-bit mu-law wire: half of int16 again, ~35-38 dB SNR
            # (opt-in; see RuntimeConfig.encode_transfer_ulaw)
            from janus_tpu.audio.ulaw import ulaw_encode

            batch = ulaw_encode(batch)
        elif self.cfg.runtime.encode_transfer_int16:
            # ship int16 PCM (half the transfer bytes); the program
            # converts back with the exact capture-side scaling
            batch = np.clip(np.round(batch * 32768.0),
                            -32768, 32767).astype(np.int16)
        batch_j = jnp.asarray(batch)
        n_valid_j = jnp.asarray(n_valid)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_shard = NamedSharding(self.mesh, P("data"))
            batch_j = jax.device_put(batch_j, data_shard)
            n_valid_j = jax.device_put(n_valid_j, data_shard)
        arrays = self._encode_jit(
            self.params, batch_j, n_valid_j, n_16k_frames=n16
        )
        return PendingEncode(self, arrays, b_real)

    def _finalize(self, arrays, b_real: int) -> list:
        """Host fetch + token decode for a dispatched encode program."""
        tokens, e_code, p_code, f0, rms = (np.asarray(a) for a in arrays)
        out = []
        for i in range(b_real):
            ids = tokens[i]
            cut = np.where(ids == self.tokenizer.eot)[0]
            if cut.size:
                ids = ids[: cut[0]]
            text = self.tokenizer.decode(ids).strip()
            out.append({
                "text": text,
                "prosody": {
                    "energy": ENERGY_TAGS[int(e_code[i])],
                    "pitch": PITCH_TAGS[int(p_code[i])],
                },
                "f0": float(f0[i]),
                "rms": float(rms[i]),
            })
        return out

    def _encode_with_splitting(self, phrases: Sequence[np.ndarray],
                               max_bucket: int) -> list:
        """Chunk overlong phrases, encode all chunks in one batch, merge."""
        pcfg = self.cfg.prosody
        segments: list = []
        spans: list = []  # (start, count, [lengths]) per original phrase
        for p in phrases:
            p = np.asarray(p, dtype=np.float32)
            start = len(segments)
            lengths = []
            for off in range(0, len(p), max_bucket):
                seg = p[off : off + max_bucket]
                segments.append(seg)
                lengths.append(len(seg))
            spans.append((start, len(lengths), lengths))

        seg_results = self.encode_batch(segments)  # all ≤ max_bucket now
        out = []
        for start, count, lengths in spans:
            chunk = seg_results[start : start + count]
            if count == 1:
                out.append(chunk[0])
                continue
            total = float(sum(lengths))
            text = " ".join(r["text"] for r in chunk if r["text"].strip()).strip()
            rms = float(np.sqrt(sum((r["rms"] ** 2) * n for r, n in
                                    zip(chunk, lengths)) / max(total, 1.0)))
            voiced = [(r["f0"], n) for r, n in zip(chunk, lengths) if r["f0"] > 0]
            f0 = (sum(f * n for f, n in voiced) / sum(n for _, n in voiced)
                  if voiced else 0.0)
            energy = ("Quiet" if rms < pcfg.energy_quiet
                      else "Normal" if rms < pcfg.energy_loud else "Loud")
            pitch = ("Normal" if f0 <= 0 else
                     "Deep" if f0 < pcfg.pitch_deep_hz else
                     "Normal" if f0 < pcfg.pitch_high_hz else "High")
            out.append({
                "text": text,
                "prosody": {"energy": energy, "pitch": pitch},
                "f0": float(f0),
                "rms": rms,
            })
        return out

    def encode_packet(
        self,
        phrase: np.ndarray,
        mode: JanusMode = JanusMode.SEMANTIC_VOICE,
        override_emotion: str = "Auto",
        timestamp: Optional[float] = None,
    ) -> Optional[JanusPacket]:
        """Full reference semantics: empty transcripts produce no packet
        (reference: backend/services/engine.py:536-552)."""
        res = self.encode_batch([phrase])[0]
        if not res["text"].strip():
            return None
        return JanusPacket(
            text=res["text"],
            mode=mode,
            prosody=res["prosody"],
            override_emotion=override_emotion,
            timestamp=timestamp if timestamp is not None else time.time(),
        )

    def warmup(self, bucket: Optional[int] = None) -> None:
        """Pre-compile the program for one bucket (or the smallest)."""
        b = bucket or self.buckets[0]
        self.encode_batch([np.zeros(b, dtype=np.float32)])
