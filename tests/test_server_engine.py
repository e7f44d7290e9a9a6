"""Full-server integration: JanusServer with live engine loops — audio in,
packets over loopback UDP, synthesis to the virtual speaker, events on the
WebSocket (the reference's unified-backend mode; backend/server.py:39-137)."""

import asyncio
import json
import threading
import time

import numpy as np
import pytest

from janus_tpu.audio.io import StreamAudioService
from janus_tpu.audio.synthetic import conversation
from janus_tpu.common.config import JanusConfig
from janus_tpu.runtime.codec import SemanticEncoder
def _free_udp_port():
    import socket

    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class FixedText(SemanticEncoder):
    def encode_batch(self, phrases):
        out = super().encode_batch(phrases)
        for i, r in enumerate(out):
            r["text"] = f"server test {i}"
        return out


@pytest.fixture
def live_server(tmp_path):
    from janus_tpu.api.server import JanusServer
    from janus_tpu.runtime.synthesizer import Synthesizer

    port = _free_udp_port()
    cfg = JanusConfig().override(**{
        "server.port": 0,
        "server.reference_audio_path": str(tmp_path / "ref.wav"),
        "link.baud_rate": 48_000,
        "link.target_ip": "127.0.0.1",
        "link.target_port": port,
        "link.receiver_port": port,
        "asr.d_model": 64, "asr.encoder_layers": 1, "asr.decoder_layers": 1,
        "asr.num_heads": 4, "asr.n_mels": 16, "asr.vocab_size": 261,
        "asr.max_source_positions": 256, "asr.max_target_positions": 32,
        "asr.max_decode_tokens": 3,
        "tts.d_model": 32, "tts.layers": 1, "tts.num_heads": 4, "tts.n_mels": 16,
        "tts.max_mel_frames": 8,
        "vocoder.d_model": 32, "vocoder.layers": 1, "vocoder.n_fft": 256,
        "vocoder.hop_length": 64,
    })
    # mic feed at realtime pace: lead silence (covers WS startup before
    # is_streaming arrives), speech, trailing silence, then EOF
    audio = np.concatenate([
        np.zeros(2 * 48_000, np.float32),
        conversation(turns=1, speech_seconds=1.5, silence_seconds=1.0, amp=0.3),
    ])
    mic = StreamAudioService(audio, realtime=True)
    encoder = FixedText(cfg, buckets=(48_000 * 4,))
    encoder.warmup()
    synth = Synthesizer(cfg)

    # loopback: the server's own listener receives what its own link sends
    srv = JanusServer(cfg, audio_service=mic, encoder=encoder,
                      synthesizer=synth)

    loop = asyncio.new_event_loop()
    started = threading.Event()

    def run():
        asyncio.set_event_loop(loop)

        async def main():
            await srv.start(start_engine=True)
            started.set()
            await srv.stop_signal.wait()
            await srv.stop()

        srv.stop_signal = asyncio.Event()
        srv._test_loop = loop
        loop.run_until_complete(main())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(timeout=30)
    yield srv, mic
    loop.call_soon_threadsafe(srv.stop_signal.set)
    t.join(timeout=15)


def test_unified_backend_duplex(live_server):
    import websockets.sync.client as ws_client

    srv, mic = live_server
    url = f"ws://127.0.0.1:{srv.http.bound_port}/ws/janus"
    with ws_client.connect(url) as ws:
        snap = json.loads(ws.recv(timeout=5))
        assert snap["type"] == "control_state"

        # start streaming: the engine loop begins consuming the mic feed
        ws.send(json.dumps({"type": "control", "is_streaming": True}))

        # collect events until we see the packet summary from the send path
        seen = {}
        deadline = time.time() + 60
        while time.time() < deadline and len(seen) < 2:
            try:
                m = json.loads(ws.recv(timeout=5))
            except TimeoutError:
                continue
            if m["type"] in ("transcript", "packet_summary"):
                seen[m["type"]] = m

        assert "transcript" in seen, f"events seen: {list(seen)}"
        assert seen["transcript"]["text"].startswith("server test")
        assert "packet_summary" in seen
        assert seen["packet_summary"]["bytes"] > 20  # real serialized size

    # the receiver loop synthesized and played the loopback packet
    deadline = time.time() + 30
    while time.time() < deadline and not mic.written_chunks:
        time.sleep(0.2)
    assert mic.written_chunks, "no audio reached the virtual speaker"
