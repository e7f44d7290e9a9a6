"""Application server: wires the engine loops under the control plane.

The lifespan mirrors the reference app factory (reference:
backend/server.py:39-137): start the audio service, spawn the async send
loop and the threaded receive loop, serve REST + WS on one port, and shut
everything down gracefully (stop event → thread join → task cancel →
audio close).

Run: ``python -m janus_tpu.api.server``.
"""

from __future__ import annotations

import asyncio
import logging
import threading
from typing import Optional

from janus_tpu.api.endpoints import health_check, make_voice_verify_handler
from janus_tpu.api.http import HttpServer, Request, Response
from janus_tpu.api.socket_manager import handle_janus_ws
from janus_tpu.api.ws import accept_handshake
from janus_tpu.audio.io import AudioService
from janus_tpu.common.config import JanusConfig
from janus_tpu.common.state import EngineState
from janus_tpu.models.vad import VoiceActivityDetector
from janus_tpu.runtime.codec import SemanticEncoder
from janus_tpu.runtime.engine import receiver_loop, smart_ear_loop
from janus_tpu.runtime.link import LinkSimulator, PacketListener
from janus_tpu.runtime.synthesizer import Synthesizer

logger = logging.getLogger(__name__)

__all__ = ["JanusServer"]


class JanusServer:
    def __init__(self, cfg: Optional[JanusConfig] = None,
                 audio_service: Optional[AudioService] = None,
                 encoder: Optional[SemanticEncoder] = None,
                 synthesizer: Optional[Synthesizer] = None) -> None:
        self.cfg = cfg or JanusConfig.from_env()
        self.state = EngineState()
        self.audio = audio_service or AudioService()
        self.encoder = encoder or SemanticEncoder(self.cfg)
        self.synthesizer = synthesizer or Synthesizer(
            self.cfg, reference_audio_path=self.cfg.server.reference_audio_path
        )
        self.vad = VoiceActivityDetector(self.cfg.vad,
                                         sample_rate=self.cfg.audio.sample_rate)
        self.stop_event = threading.Event()
        self.http = HttpServer(self.cfg.server.host, self.cfg.server.port)
        self._ear_task: Optional[asyncio.Task] = None
        self._recv_thread: Optional[threading.Thread] = None
        self._link: Optional[LinkSimulator] = None
        self._listener: Optional[PacketListener] = None

        self.http.route("GET", "/api/health", health_check)

        async def dashboard(_request: Request) -> Response:
            from janus_tpu.api.dashboard import DASHBOARD_HTML

            return Response(
                body=DASHBOARD_HTML.encode(),
                headers={"Content-Type": "text/html; charset=utf-8"},
            )

        self.http.route("GET", "/", dashboard)
        # second page of the reference frontend (frontend/app/telemetry/):
        # same single-file app, boots on the telemetry tab
        self.http.route("GET", "/telemetry", dashboard)

        def transcribe_file(path: str) -> str:
            # Sniffs WAV / WebM-Opus / Ogg-Opus — the formats the reference
            # accepted via FFmpeg (reference: backend/services/transcriber.py:66-91;
            # browser records audio/webm;codecs=opus, VoiceCloner.tsx:61-63).
            from janus_tpu.audio.decode import read_audio
            import jax.numpy as jnp
            import numpy as np

            from janus_tpu.ops.resample import resample_poly

            audio, sr = read_audio(path)
            if sr != 48_000:
                audio = np.asarray(
                    resample_poly(jnp.asarray(audio), up=48_000, down=sr)
                )
            return self.encoder.encode_batch([audio])[0]["text"]

        self.http.route(
            "POST", "/api/voice/verify",
            make_voice_verify_handler(transcribe_file, self.cfg.server),
        )

        async def ws_entry(reader, writer, request: Request):
            ws = await accept_handshake(reader, writer, request.headers)
            await handle_janus_ws(ws, self.state)

        self.http.websocket(self.cfg.server.ws_path, ws_entry)

    # -- lifecycle ---------------------------------------------------------

    async def start(self, start_engine: bool = True) -> None:
        await self.http.start()
        logger.info("control plane on %s:%d", self.cfg.server.host, self.http.bound_port)
        if start_engine:
            self._link = LinkSimulator(self.cfg.link)
            self._listener = PacketListener(
                self.cfg.link.receiver_port, use_tcp=self.cfg.link.use_tcp
            )
            self._ear_task = asyncio.create_task(
                smart_ear_loop(self.audio, self.state, self.encoder, self.vad,
                               self._link, self.stop_event, self.cfg)
            )
            loop = asyncio.get_running_loop()
            self._recv_thread = threading.Thread(
                target=receiver_loop,
                args=(self.audio, self.state, self.synthesizer, self._listener,
                      self.stop_event, loop, self.cfg),
                daemon=True,
            )
            self._recv_thread.start()

    async def stop(self) -> None:
        """Graceful shutdown (reference: backend/server.py:89-108)."""
        self.stop_event.set()
        if self._recv_thread is not None:
            self._recv_thread.join(timeout=2)
        if self._ear_task is not None:
            self._ear_task.cancel()
            try:
                await self._ear_task
            except (asyncio.CancelledError, Exception):
                pass
        for closable in (self._link, self._listener):
            if closable is not None:
                closable.close()
        await self.http.stop()
        self.audio.close()


async def _main() -> None:
    from janus_tpu.common.logging_util import setup_logging

    setup_logging()
    server = JanusServer()
    await server.start()
    try:
        await asyncio.Event().wait()
    finally:
        await server.stop()


if __name__ == "__main__":
    asyncio.run(_main())
