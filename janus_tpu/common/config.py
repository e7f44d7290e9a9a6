"""Typed configuration tree.

The reference scatters tunables across modules as bare constants and ad-hoc
environment reads (reference: backend/services/engine.py:439-441,
link_simulator.py:19, vad.py:11, prosody.py:67-99, audio_io.py:28-31,
docs/SETUP.md:93-107). Here everything lives in one frozen dataclass tree
with env-var and dotted-path overrides, so a whole deployment is a single
value that can be logged, hashed, and passed through jitted code as static
configuration.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field, fields, is_dataclass, replace
from typing import Any, Dict, Optional, Tuple

__all__ = [
    "AudioConfig",
    "SegmenterConfig",
    "VADConfig",
    "ProsodyConfig",
    "LinkConfig",
    "ASRConfig",
    "TTSConfig",
    "VocoderConfig",
    "MeshConfig",
    "RuntimeConfig",
    "ServerConfig",
    "JanusConfig",
]


@dataclass(frozen=True)
class AudioConfig:
    """Capture/playback format (reference: backend/services/audio_io.py:28-31)."""

    sample_rate: int = 48_000
    chunk_samples: int = 1536           # 32 ms at 48 kHz
    channels: int = 1
    model_sample_rate: int = 16_000     # rate the ASR frontend consumes

    @property
    def chunk_seconds(self) -> float:
        return self.chunk_samples / self.sample_rate


@dataclass(frozen=True)
class SegmenterConfig:
    """Phrase segmentation state machine
    (reference: backend/services/engine.py:439-504)."""

    pre_roll_chunks: int = 10           # deque of chunks kept before speech onset
    silence_threshold_chunks: int = 15  # ~500 ms of silence ends a phrase
    min_phrase_samples: int = 1536 * 6  # buffers shorter than this are dropped


@dataclass(frozen=True)
class VADConfig:
    """Speech gate (reference: backend/services/vad.py:11-77)."""

    threshold: float = 0.5
    frame_samples: int = 512            # model frame at 16 kHz
    backend: str = "model"              # "model" (conv-GRU) or "energy"
    energy_gate_rms: float = 0.015      # floor used by the energy backend


@dataclass(frozen=True)
class ProsodyConfig:
    """YIN pitch + RMS energy extraction and categorical thresholds
    (reference: backend/services/prosody.py:32-99)."""

    yin_window: int = 4096
    hop: int = 512
    yin_tolerance: float = 0.8
    fmin_hz: float = 40.0
    fmax_hz: float = 1000.0
    # Serving runs pitch tracking on the anti-aliased 16 kHz stream the mel
    # frontend already produces: the bounded search (fmax 1 kHz) needs no
    # bandwidth above 8 kHz, and signal/window/lag-grid all shrink 3x
    # (~27x less work than 48 kHz tracking — it was 1.4x the cost of the
    # flagship 635M encoder forward, BENCH_r03 flagship_stage_ms). The 16 kHz
    # geometry is the 48 kHz window/hop scaled to the same durations
    # (85.0 ms window vs 85.3, 10.63 ms hop vs 10.67). Set yin_rate=0 to
    # track at the native 48 kHz capture rate (exact aubio-geometry path,
    # still available for parity study); docs/PARITY.md documents the
    # deviation. f0 agreement between the two paths is asserted in
    # tests/test_ops_yin.py::test_serving_16k_geometry_matches_48k.
    yin_rate: int = 16_000
    yin_window_16k: int = 1360
    yin_hop_16k: int = 170
    energy_quiet: float = 0.05          # rms <  -> 'Quiet'
    energy_loud: float = 0.15           # rms >= -> 'Loud'
    pitch_deep_hz: float = 120.0        # mean f0 <  -> 'Deep'
    pitch_high_hz: float = 200.0        # mean f0 >= -> 'High'


@dataclass(frozen=True)
class LinkConfig:
    """Constrained-link transport
    (reference: backend/services/link_simulator.py:19-20, engine.py:156-162)."""

    baud_rate: int = 300
    target_ip: str = "127.0.0.1"
    target_port: int = 5005
    receiver_port: int = 5005
    use_tcp: bool = False
    progress_ticks: int = 20

    @property
    def bytes_per_second(self) -> float:
        return self.baud_rate / 8.0


@dataclass(frozen=True)
class ASRConfig:
    """Whisper-class speech recognizer. Defaults are the 'tiny' geometry;
    presets below give base/small/large-v3 sizes
    (reference delegated this to faster-whisper `base.en`:
    backend/services/transcriber.py:23-27)."""

    n_mels: int = 80
    n_fft: int = 400
    hop_length: int = 160
    max_source_positions: int = 1500    # 30 s of mel frames after conv stem
    d_model: int = 384
    encoder_layers: int = 4
    decoder_layers: int = 4
    num_heads: int = 6
    mlp_ratio: int = 4
    vocab_size: int = 51_864
    max_target_positions: int = 448
    max_decode_tokens: int = 64         # greedy decode budget for a phrase
    dtype: str = "bfloat16"
    # compile one lax.scan block body instead of L unrolled layers; required
    # for flagship-deep models (32-layer unrolled HLO overwhelms compile)
    scan_layers: bool = False
    # lax.scan unroll factor for the layer scans (1 = pure loop). The
    # decode step is launch-bound (ROOFLINE §1: ~2.4 ms/step of per-layer
    # loop overhead at flagship scale); unrolling N layer bodies per scan
    # iteration amortizes the per-iteration overhead without changing op
    # order (bit-identical results) at ~N× body compile size.
    scan_unroll: int = 1
    # serving decode loop: store per-layer cross-attention K/V int8 with
    # per-position scales. In the HBM ledger this halves the dominant
    # non-weight per-token stream — but MEASURED at flagship scale the
    # int8 path is ~20% SLOWER (BENCH r4 flagship_stage_ms: 165.4 ms vs
    # 138.3 bf16): XLA does not fuse the convert+scale into the attention
    # matmul operand on this backend, so the dequantized bf16 copy
    # materializes each step, costing more than the int8 read saves.
    # Default OFF (bf16 caches, exact); the capability stays available and
    # benchmarked as an ablation (docs/ROOFLINE.md §1). Approximation
    # bounds are tested in tests/test_asr.py.
    decode_cross_kv_int8: bool = False

    @classmethod
    def tiny(cls) -> "ASRConfig":
        return cls()

    @classmethod
    def base(cls) -> "ASRConfig":
        return cls(d_model=512, encoder_layers=6, decoder_layers=6, num_heads=8)

    @classmethod
    def small(cls) -> "ASRConfig":
        return cls(d_model=768, encoder_layers=12, decoder_layers=12, num_heads=12)

    @classmethod
    def large_v3(cls) -> "ASRConfig":
        return cls(
            n_mels=128,
            d_model=1280,
            encoder_layers=32,
            decoder_layers=32,
            num_heads=20,
            vocab_size=51_866,
            scan_layers=True,
        )


@dataclass(frozen=True)
class TTSConfig:
    """LLM-conditioned acoustic transformer: autoregressive mel-frame decoder
    prompted with text + emotion tag (replaces the reference's cloud TTS;
    reference: backend/services/synthesizer.py:158-207)."""

    d_model: int = 512
    layers: int = 8
    num_heads: int = 8
    mlp_ratio: int = 4
    n_mels: int = 80
    reduction: int = 2                  # mel frames emitted per decode step
    max_text_tokens: int = 256
    max_mel_frames: int = 1024
    dtype: str = "bfloat16"
    scan_layers: bool = False           # one lax.scan block body (deep models)
    scan_unroll: int = 1                # layer-scan unroll (see ASRConfig)
    # Synthesis duration guard: hard cap on emitted audio per prompt token
    # (plus a 0.35 s floor) — bounds the damage of an AR stop-head miss
    # (runaway looping). Generous vs normal speech (~0.06-0.09 s/char).
    max_seconds_per_text_token: float = 0.15

    @classmethod
    def flagship(cls) -> "TTSConfig":
        """Fish-Audio-class acoustic model (~0.6B params — the serving
        geometry bench.py's flagship-decode section measures; VERDICT r4
        task 3). ``scan_layers``: one compiled block body, same rule as
        the large-v3 encoder (the unrolled 30-layer HLO would overwhelm
        the compile tunnel). ``reduction=4``: the AR step at this scale is
        launch-bound ([8,1,1280] matmuls × 30 layers ≈ 12 ms regardless of
        frames emitted — BENCH r5 stage split), so emitting 4 mel frames
        per step halves the step count at the same per-step cost; r=2..5
        is the standard acoustic-model reduction range."""
        return cls(d_model=1280, layers=30, num_heads=20, scan_layers=True,
                   reduction=4)


@dataclass(frozen=True)
class VocoderConfig:
    """iSTFT-head vocoder (Vocos-style): conv backbone predicts magnitude and
    phase, waveform is reconstructed with an inverse STFT — no giant
    transposed convs, very XLA-friendly."""

    n_fft: int = 1024
    hop_length: int = 256
    d_model: int = 512
    layers: int = 8
    sample_rate: int = 24_000
    dtype: str = "bfloat16"


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh axes. data = concurrent sessions (DP), model = TP over
    heads/MLP, seq = sequence/context parallelism over mel frames."""

    data: int = 1
    model: int = 1
    seq: int = 1
    axis_names: Tuple[str, str, str] = ("data", "model", "seq")


@dataclass(frozen=True)
class RuntimeConfig:
    """Host runtime: batched sessions + queue depths
    (reference queue depths: backend/services/engine.py:428, 187)."""

    max_sessions: int = 32
    audio_queue_depth: int = 100
    playback_queue_depth: int = 100
    ducking_level: float = 0.25
    executor_workers: int = 2
    # Runtime overlap (SURVEY §2.4): encode programs are dispatched
    # asynchronously and harvested on later ticks, so the tick loop keeps
    # running VAD/segmentation for batch N+1 while batch N's encode is in
    # flight on the device. 0 = synchronous (harvest same tick).
    max_inflight_encodes: int = 2
    # Double-buffered VAD dispatch: tick N dispatches the newest chunks'
    # VAD program and consumes tick N-1's result, so the per-tick
    # device->host sync overlaps the next dispatch (and, on hardware, the
    # VAD compute itself). Costs one chunk (32 ms) of end-of-phrase
    # detection latency — negligible vs the 500 ms silence threshold.
    pipelined_vad: bool = True
    # Receiver plays synthesized audio chunk-by-chunk as the TTS generates
    # (streaming turnaround) instead of waiting for the full clip.
    streaming_playback: bool = True
    # Ship encode batches to the device as int16 PCM (half the bytes of
    # float32) and convert on-device. Capture is int16-native (the
    # reference's AudioService converts int16 -> float32/32768,
    # reference backend/services/audio_io.py:125-128), so the round trip
    # is EXACT for capture-native audio; synthetic float inputs see one
    # +-1.5e-5 quantization, far below the corpus noise floor. Matters
    # because host->device transfer is a first-order cost on a remote
    # dispatch link (15.4 MB/call at the 10 s x batch-8 bucket).
    encode_transfer_int16: bool = True
    # Opt-in 8-bit G.711-style mu-law wire format (overrides int16):
    # halves transfer again at ~35-38 dB quantization SNR — far above the
    # hard corpus's gated noise floors (WER holds at snr0=0dB additive
    # noise), but no longer bit-exact for capture audio, so OFF by
    # default. Worth flipping when the host<->device link is the wall:
    # the r5 session-scaling decomposition showed the b=32->64 plateau is
    # ~17 MB/s tunnel transfer with the device program flat (BENCH_NOTES).
    encode_transfer_ulaw: bool = False


@dataclass(frozen=True)
class ServerConfig:
    """Control-plane server (reference: backend/server.py, docs/API.md)."""

    host: str = "127.0.0.1"
    port: int = 8000
    ws_path: str = "/ws/janus"
    verify_phrase: str = "The quick brown fox jumps over the lazy dog."
    verify_threshold: float = 0.8
    reference_audio_path: str = "reference_audio.wav"


@dataclass(frozen=True)
class JanusConfig:
    """The whole deployment as one value."""

    audio: AudioConfig = field(default_factory=AudioConfig)
    segmenter: SegmenterConfig = field(default_factory=SegmenterConfig)
    vad: VADConfig = field(default_factory=VADConfig)
    prosody: ProsodyConfig = field(default_factory=ProsodyConfig)
    link: LinkConfig = field(default_factory=LinkConfig)
    asr: ASRConfig = field(default_factory=ASRConfig)
    tts: TTSConfig = field(default_factory=TTSConfig)
    vocoder: VocoderConfig = field(default_factory=VocoderConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)
    server: ServerConfig = field(default_factory=ServerConfig)

    # -- overrides ---------------------------------------------------------

    def override(self, **dotted: Any) -> "JanusConfig":
        """Return a copy with dotted-path overrides, e.g.
        ``cfg.override(**{"link.baud_rate": 1200, "asr.d_model": 512})``."""
        cfg = self
        for path, value in dotted.items():
            cfg = _set_path(cfg, path.split("."), value)
        return cfg

    @classmethod
    def from_env(cls, env: Optional[Dict[str, str]] = None) -> "JanusConfig":
        """Build a config honoring the reference's environment variables
        (reference: backend/services/engine.py:415-417,
        backend/scripts/receiver_main.py:102-110)."""
        e = os.environ if env is None else env
        cfg = cls()
        target_ip = e.get("TARGET_IP", cfg.link.target_ip)
        use_tcp = e.get("USE_TCP", "").lower() in ("1", "true", "yes") or (
            "ngrok" in target_ip  # reference auto-enables TCP through ngrok
        )
        return cfg.override(**{
            "link.target_ip": target_ip,
            "link.target_port": int(e.get("TARGET_PORT", cfg.link.target_port)),
            "link.receiver_port": int(e.get("RECEIVER_PORT", cfg.link.receiver_port)),
            "link.use_tcp": use_tcp,
            "server.reference_audio_path": e.get(
                "REFERENCE_AUDIO_PATH", cfg.server.reference_audio_path
            ),
        })

    @classmethod
    def from_cli(cls, argv: Optional[list] = None,
                 base: Optional["JanusConfig"] = None) -> "JanusConfig":
        """Apply ``--set path=value`` overrides from the command line, e.g.
        ``--set link.baud_rate=1200 --set asr.d_model=512``. Values parse as
        JSON first (ints/floats/bools), falling back to strings."""
        import argparse
        import json

        parser = argparse.ArgumentParser(add_help=False)
        parser.add_argument("--set", action="append", default=[], dest="sets")
        ns, _unknown = parser.parse_known_args(argv)
        cfg = base if base is not None else cls.from_env()
        overrides: Dict[str, Any] = {}
        for item in ns.sets:
            if "=" not in item:
                raise ValueError(f"--set expects path=value, got {item!r}")
            path, raw = item.split("=", 1)
            try:
                value = json.loads(raw)
            except json.JSONDecodeError:
                value = raw
            overrides[path] = value
        return cfg.override(**overrides)

    def to_flat_dict(self) -> Dict[str, Any]:
        """Flatten to dotted keys — for logging/hashing a deployment."""
        out: Dict[str, Any] = {}

        def rec(prefix: str, obj: Any) -> None:
            for f in fields(obj):
                v = getattr(obj, f.name)
                key = f"{prefix}{f.name}"
                if is_dataclass(v):
                    rec(key + ".", v)
                else:
                    out[key] = v

        rec("", self)
        return out


def _set_path(obj: Any, path: list, value: Any) -> Any:
    if len(path) == 1:
        if not any(f.name == path[0] for f in fields(obj)):
            raise KeyError(f"unknown config field: {path[0]}")
        return replace(obj, **{path[0]: value})
    child = getattr(obj, path[0])
    return replace(obj, **{path[0]: _set_path(child, path[1:], value)})
