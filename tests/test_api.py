"""Control plane: REST health/verify + WebSocket control protocol over a
real socket (reference: backend/tests/test_api_flow.py,
test_voice_cloning.py)."""

import asyncio
import json
import threading

import numpy as np
import pytest

from janus_tpu.audio.io import StreamAudioService
from janus_tpu.audio.synthetic import voiced_phrase
from janus_tpu.audio.wav import write_wav
from janus_tpu.common.config import JanusConfig
from janus_tpu.common.state import EngineState


def tiny_cfg(tmp_ref):
    return JanusConfig().override(**{
        "server.port": 0,
        "server.reference_audio_path": str(tmp_ref),
        "asr.d_model": 64, "asr.encoder_layers": 1, "asr.decoder_layers": 1,
        "asr.num_heads": 4, "asr.n_mels": 16, "asr.vocab_size": 261,
        "asr.max_source_positions": 256, "asr.max_target_positions": 32,
        "asr.max_decode_tokens": 4,
        "tts.d_model": 32, "tts.layers": 1, "tts.num_heads": 4, "tts.n_mels": 16,
        "tts.max_mel_frames": 8,
        "vocoder.d_model": 32, "vocoder.layers": 1, "vocoder.n_fft": 256,
        "vocoder.hop_length": 64,
    })


@pytest.fixture
def server(tmp_path):
    """JanusServer with control plane only (no engine loops) on a free port."""
    from janus_tpu.api.server import JanusServer
    from janus_tpu.runtime.codec import SemanticEncoder

    cfg = tiny_cfg(tmp_path / "ref.wav")
    srv = JanusServer(
        cfg,
        audio_service=StreamAudioService(),
        encoder=SemanticEncoder(cfg, buckets=(48_000,)),
    )

    loop = asyncio.new_event_loop()
    started = threading.Event()

    def run():
        asyncio.set_event_loop(loop)

        async def main():
            await srv.start(start_engine=False)
            started.set()
            await srv.stop_signal.wait()
            await srv.stop()

        srv.stop_signal = asyncio.Event()
        srv._test_loop = loop
        loop.run_until_complete(main())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(timeout=10)
    yield srv
    loop.call_soon_threadsafe(srv.stop_signal.set)
    t.join(timeout=10)


def test_health(server):
    import httpx

    r = httpx.get(f"http://127.0.0.1:{server.http.bound_port}/api/health")
    assert r.status_code == 200
    assert r.json() == {"status": "ok"}
    assert r.headers["access-control-allow-origin"] == "*"


def test_404_and_options(server):
    import httpx

    base = f"http://127.0.0.1:{server.http.bound_port}"
    assert httpx.get(f"{base}/nope").status_code == 404
    assert httpx.options(f"{base}/api/health").status_code == 204


def test_voice_verify_flow(server, tmp_path, monkeypatch):
    import httpx

    base = f"http://127.0.0.1:{server.http.bound_port}"
    wav_path = tmp_path / "up.wav"
    write_wav(str(wav_path), voiced_phrase(seconds=0.3), 48000)
    # The reference frontend uploads the clip under the ``audio_file`` field
    # (VoiceCloner.tsx:111) and branches on ``data.status === 'verified'``
    # (VoiceCloner.tsx:125-137) — assert that exact wire shape.
    files = {"audio_file": ("recording.wav", wav_path.read_bytes(), "audio/wav")}

    # untrained ASR -> transcript won't match the pangram -> not verified
    r = httpx.post(f"{base}/api/voice/verify", files=files, timeout=60)
    assert r.status_code == 200
    body = r.json()
    assert body["status"] == "failed"
    assert isinstance(body["transcript"], str)

    # force a perfect transcription -> verified + reference audio saved
    monkeypatch.setattr(
        server.encoder, "encode_batch",
        lambda phrases: [{"text": "The quick brown fox jumps over the lazy dog.",
                          "prosody": {"energy": "Normal", "pitch": "Normal"},
                          "f0": 0.0, "rms": 0.0}],
    )
    r2 = httpx.post(f"{base}/api/voice/verify", files=files, timeout=60)
    assert r2.json()["status"] == "verified"
    assert (tmp_path / "ref.wav").exists()


def test_websocket_control_roundtrip(server):
    import websockets.sync.client as ws_client

    url = f"ws://127.0.0.1:{server.http.bound_port}/ws/janus"
    with ws_client.connect(url) as ws:
        # snapshot arrives first
        snap = json.loads(ws.recv(timeout=5))
        assert snap["type"] == "control_state"
        assert snap["mode"] == "semantic"
        assert snap["is_streaming"] is False

        # partial control update mutates only named fields
        ws.send(json.dumps({"type": "control", "is_streaming": True}))
        ack = json.loads(ws.recv(timeout=5))
        assert ack["type"] == "control_state"
        assert ack["is_streaming"] is True
        assert ack["mode"] == "semantic"
        assert server.state.control.is_streaming is True

        ws.send(json.dumps({"type": "control", "mode": "morse",
                            "emotion_override": "panicked"}))
        ack2 = json.loads(ws.recv(timeout=5))
        assert ack2["mode"] == "morse"
        assert ack2["emotion_override"] == "panicked"
        assert ack2["is_streaming"] is True  # untouched

    # disconnect resets transient flags (reference: socket_manager.py:75-83)
    for _ in range(50):
        if not server.state.control.is_streaming:
            break
        import time

        time.sleep(0.1)
    assert server.state.control.is_streaming is False
    assert server.state.control.mode == "morse"  # mode persists


def test_websocket_event_fanout(server):
    import websockets.sync.client as ws_client

    url = f"ws://127.0.0.1:{server.http.bound_port}/ws/janus"
    with ws_client.connect(url) as ws:
        json.loads(ws.recv(timeout=5))  # snapshot

        async def put():
            await server.state.transcript_queue().put(
                {"type": "transcript", "text": "hello"}
            )
            await server.state.packet_queue().put(
                {"type": "packet_summary", "bytes": 42, "mode": "semantic",
                 "created_at_ms": 1, "emotion": None, "snippet": "hello"}
            )

        fut = asyncio.run_coroutine_threadsafe(put(), _server_loop(server))
        fut.result(timeout=5)

        got = {json.loads(ws.recv(timeout=5))["type"] for _ in range(2)}
        assert got == {"transcript", "packet_summary"}


def _server_loop(server):
    """The loop the server's engine/queues run on (attached by the fixture)."""
    return server._test_loop


def test_bad_ws_message_does_not_kill_connection(server):
    import websockets.sync.client as ws_client

    url = f"ws://127.0.0.1:{server.http.bound_port}/ws/janus"
    with ws_client.connect(url) as ws:
        json.loads(ws.recv(timeout=5))
        ws.send("not json at all")
        ws.send(json.dumps({"type": "control", "mode": "text_only"}))
        ack = json.loads(ws.recv(timeout=5))
        assert ack["mode"] == "text_only"


def test_dashboard_served(server):
    import httpx

    r = httpx.get(f"http://127.0.0.1:{server.http.bound_port}/")
    assert r.status_code == 200
    assert "janus_tpu dashboard" in r.text
    assert "/ws/janus" in r.text
