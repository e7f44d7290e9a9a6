"""Standalone sender: mic (or file) → packets on the wire.

CLI twin of the engine's send path with no UI dependency, for cross-
machine network testing (reference: backend/scripts/sender_main.py). Env
config matches the reference: TARGET_IP, TARGET_PORT, USE_TCP.

Usage::

    python -m janus_tpu.tools.sender_main [--file audio.wav] [--streaming]
"""

from __future__ import annotations

import argparse
import logging
import queue
import threading
import time
from typing import Optional

import numpy as np

from janus_tpu.audio.io import AudioService, StreamAudioService
from janus_tpu.common.config import JanusConfig
from janus_tpu.common.protocol import JanusPacket
from janus_tpu.models.vad import VoiceActivityDetector
from janus_tpu.runtime.codec import SemanticEncoder
from janus_tpu.runtime.emotion import api_mode_to_protocol
from janus_tpu.runtime.engine import audio_producer
from janus_tpu.runtime.link import LinkSimulator
from janus_tpu.runtime.segmenter import PhraseSegmenter, SegmenterEvent

logger = logging.getLogger(__name__)

__all__ = ["main_loop", "main"]


def main_loop(
    cfg: JanusConfig,
    audio_service: AudioService,
    encoder: Optional[SemanticEncoder] = None,
    vad: Optional[VoiceActivityDetector] = None,
    link: Optional[LinkSimulator] = None,
    stop_event: Optional[threading.Event] = None,
    mode: str = "semantic",
    max_idle_seconds: float = 0.0,
) -> int:
    """Blocking send loop; returns packets sent. ``stop_event`` is
    injectable for tests (reference: sender_main.py:247-252);
    ``max_idle_seconds`` > 0 exits after that long without audio."""
    encoder = encoder or SemanticEncoder(cfg)
    vad = vad or VoiceActivityDetector(cfg.vad, sample_rate=cfg.audio.sample_rate)
    link = link or LinkSimulator(cfg.link)
    stop_event = stop_event or threading.Event()
    segmenter = PhraseSegmenter(cfg.segmenter)

    audio_queue: "queue.Queue" = queue.Queue(maxsize=cfg.runtime.audio_queue_depth)
    producer = threading.Thread(
        target=audio_producer, args=(audio_service, audio_queue, stop_event),
        daemon=True,
    )
    producer.start()

    sent = 0
    last_audio = time.monotonic()
    non_vad = mode in ("morse", "text_only")
    try:
        while not stop_event.is_set():
            try:
                chunk = audio_queue.get(timeout=0.1)
                last_audio = time.monotonic()
            except queue.Empty:
                stream_ended = not producer.is_alive()  # capture hit EOF
                idled = (max_idle_seconds
                         and time.monotonic() - last_audio > max_idle_seconds)
                if stream_ended or idled:
                    # flush whatever is buffered, then exit
                    r = segmenter.flush()
                    if r.event is SegmenterEvent.PHRASE_READY:
                        sent += _process(encoder, link, cfg, r.phrase, mode)
                    break
                continue

            is_speech = vad.is_speech(chunk) or non_vad
            r = segmenter.push_streaming(chunk, is_speech)
            if r.event is SegmenterEvent.PHRASE_READY:
                sent += _process(encoder, link, cfg, r.phrase, mode)
    finally:
        stop_event.set()
        link.close()
    return sent


def _process(encoder: SemanticEncoder, link: LinkSimulator, cfg: JanusConfig,
             phrase: np.ndarray, mode: str) -> int:
    result = encoder.encode_batch([phrase])[0]
    if not result["text"].strip():
        logger.info("empty transcript for %.2fs phrase — packet dropped "
                    "(reference semantics)", len(phrase) / cfg.audio.sample_rate)
        return 0
    packet = JanusPacket(
        text=result["text"],
        mode=api_mode_to_protocol(mode),
        prosody=result["prosody"],
    )
    payload = packet.serialize()
    logger.info("TX %dB %r %s", len(payload), result["text"], result["prosody"])
    link.transmit(payload)
    return 1


def main() -> None:
    from janus_tpu.common.platform import apply_env_platform

    apply_env_platform()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--file", help="WAV file to stream instead of the mic")
    parser.add_argument("--mode", default="semantic",
                        choices=("semantic", "text_only", "morse"))
    parser.add_argument("--idle-exit", type=float, default=0.0,
                        help="exit after N seconds without audio")
    parser.add_argument("--demo", action="store_true",
                        help="use the committed tone-language demo ASR")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    cfg = JanusConfig.from_env()
    encoder = None
    if args.demo:
        from janus_tpu.models.zoo import load_demo

        bundle = load_demo(base=cfg)
        cfg = bundle.config
        encoder = SemanticEncoder(cfg, asr_params=bundle.asr_params)
    if args.file:
        from janus_tpu.audio.wav import read_wav

        audio, sr = read_wav(args.file)
        if sr != cfg.audio.sample_rate:
            raise SystemExit(f"expected {cfg.audio.sample_rate} Hz WAV, got {sr}")
        service: AudioService = StreamAudioService(audio, realtime=True)
    else:
        service = AudioService()
    sent = main_loop(cfg, service, encoder=encoder, mode=args.mode,
                     max_idle_seconds=args.idle_exit)
    logger.info("done: %d packets", sent)


if __name__ == "__main__":
    main()
