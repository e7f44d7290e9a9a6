"""Wire-level golden tests: replay the real Next.js frontend's traffic.

Every guard here is a line-for-line Python port of the reference
frontend's *runtime type guards and branch conditions* — the exact code
that decides whether a message renders or is silently dropped:

- ``isTranscriptMessage`` / ``isPacketSummaryMessage`` /
  ``isControlStateMessage`` (reference:
  frontend/hooks/useJanusWebSocket.ts:37-80)
- VoiceCloner's upload (field ``audio_file``, filename ``recording.webm``,
  type ``audio/webm;codecs=opus``) and its success branch
  ``data.status === 'verified'`` (reference:
  frontend/components/VoiceCloner.tsx:58-63,111,125-137)
- ``sendControl``'s partial messages (undefined keys dropped by
  JSON.stringify — reference: frontend/hooks/useJanusWebSocket.ts:142-155,
  useJanusSocket.ts:64-89)

If the backend ever drifts from what the real dashboard accepts, these
fail.
"""

import asyncio
import json
import threading

import numpy as np
import pytest

from janus_tpu.audio.io import StreamAudioService
from janus_tpu.audio.opus import OpusEncoder, opus_available
from janus_tpu.audio.synthetic import voiced_phrase
from janus_tpu.audio.webm import mux_webm_opus
from janus_tpu.common.config import JanusConfig

from tests.test_api import tiny_cfg  # same control-plane-only server shape

VALID_MODES = {"semantic", "text_only", "morse"}  # useJanusWebSocket.ts:37-43


# -- Python ports of the frontend's runtime type guards ----------------------

def is_janus_mode(value) -> bool:
    return value in VALID_MODES


def is_transcript_message(data) -> bool:
    # useJanusWebSocket.ts:45-54
    return (
        isinstance(data, dict)
        and data.get("type") == "transcript"
        and isinstance(data.get("text"), str)
    )


def is_packet_summary_message(data) -> bool:
    # useJanusWebSocket.ts:56-67 (bool is not a "number" in JS)
    def is_number(v):
        return isinstance(v, (int, float)) and not isinstance(v, bool)

    return (
        isinstance(data, dict)
        and data.get("type") == "packet_summary"
        and is_number(data.get("bytes"))
        and is_number(data.get("created_at_ms"))
        and is_janus_mode(data.get("mode"))
    )


def is_control_state_message(data) -> bool:
    # useJanusWebSocket.ts:69-80
    return (
        isinstance(data, dict)
        and data.get("type") == "control_state"
        and isinstance(data.get("is_streaming"), bool)
        and isinstance(data.get("is_recording"), bool)
        and is_janus_mode(data.get("mode"))
    )


# -- server fixture -----------------------------------------------------------

@pytest.fixture
def server(tmp_path):
    from janus_tpu.api.server import JanusServer
    from janus_tpu.runtime.codec import SemanticEncoder

    cfg = tiny_cfg(tmp_path / "reference_audio.webm")
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


def _base(server):
    return f"http://127.0.0.1:{server.http.bound_port}"


# -- VoiceCloner verify flow ---------------------------------------------------

@pytest.mark.skipif(not opus_available(), reason="libopus not present")
def test_voicecloner_webm_upload_exact_traffic(server, tmp_path, monkeypatch):
    """POST exactly what VoiceCloner.uploadAudio sends, branch on status."""
    import httpx

    pcm = np.asarray(voiced_phrase(seconds=0.8), dtype=np.float32)
    enc = OpusEncoder()
    webm = mux_webm_opus(enc.encode(pcm), enc.lookahead)  # MediaRecorder shape
    enc.close()

    # VoiceCloner.tsx:110-116 — formData.append('audio_file', blob, 'recording.webm')
    files = {"audio_file": ("recording.webm", webm, "audio/webm;codecs=opus")}

    r = httpx.post(f"{_base(server)}/api/voice/verify", files=files, timeout=60)
    assert r.status_code == 200  # VoiceCloner throws on !response.ok
    data = r.json()
    # VoiceVerificationResponse contract (types/janus.ts:59-63)
    assert data["status"] in ("verified", "failed")
    # untrained demo ASR won't produce the pangram -> the error branch,
    # which renders data.transcript (VoiceCloner.tsx:133-136)
    assert data["status"] == "failed"
    assert isinstance(data.get("transcript", ""), str)

    # Force a perfect transcription -> the success branch.
    monkeypatch.setattr(
        server.encoder, "encode_batch",
        lambda phrases: [{"text": "The quick brown fox jumps over the lazy dog.",
                          "prosody": {"energy": "Normal", "pitch": "Normal"},
                          "f0": 0.0, "rms": 0.0}],
    )
    r2 = httpx.post(f"{_base(server)}/api/voice/verify", files=files, timeout=60)
    data2 = r2.json()
    assert data2["status"] == "verified"

    # The upload is saved VERBATIM as the clone reference (the reference
    # backend does the same with `content`, endpoints.py:63-66) and must
    # itself be decodable for the speaker-embedding hot-reload.
    saved = (tmp_path / "reference_audio.webm").read_bytes()
    assert saved == webm
    from janus_tpu.audio.decode import read_audio

    audio, sr = read_audio(saved)
    assert sr == 48_000 and len(audio) > 0


# -- WebSocket control plane ---------------------------------------------------

def test_ws_snapshot_and_every_ack_pass_frontend_guards(server):
    import websockets.sync.client as ws_client

    url = f"ws://127.0.0.1:{server.http.bound_port}/ws/janus"
    with ws_client.connect(url) as ws:
        snap = json.loads(ws.recv(timeout=5))
        assert is_control_state_message(snap)
        # full snapshot also carries emotion_override (types/janus.ts:64-70)
        assert snap["emotion_override"] in ("auto", "relaxed", "panicked")

        # The exact partial messages the UI emits (undefined keys dropped):
        frontend_messages = [
            {"type": "control", "is_recording": True},    # PTT hold
            {"type": "control", "is_recording": False},   # PTT release
            {"type": "control", "is_streaming": True},    # 'S' toggle
            {"type": "control", "mode": "text_only"},     # ModeToggle
            {"type": "control", "mode": "morse"},
            {"type": "control", "emotion_override": "panicked"},  # EmotionSelector
            {"type": "control", "emotion_override": "auto"},
            {"type": "control", "is_streaming": False},
        ]
        for msg in frontend_messages:
            ws.send(json.dumps(msg))
            ack = json.loads(ws.recv(timeout=5))
            assert is_control_state_message(ack), (msg, ack)
            for k, v in msg.items():
                if k != "type":
                    assert ack[k] == v, (msg, ack)


def test_ws_event_messages_pass_frontend_guards(server):
    """Engine-emitted transcript/packet events must render in the UI."""
    import websockets.sync.client as ws_client

    from janus_tpu.runtime.engine import _emit_events

    url = f"ws://127.0.0.1:{server.http.bound_port}/ws/janus"
    with ws_client.connect(url) as ws:
        json.loads(ws.recv(timeout=5))  # snapshot

        # Emit through the REAL engine helper, not hand-built dicts.
        fut = asyncio.run_coroutine_threadsafe(
            _emit_events(
                server.state, text="wire check", mode="semantic",
                avg_pitch_hz=180.0, avg_energy=0.07, packet_bytes=61,
                emotion="relaxed",
            ),
            server._test_loop,
        )
        fut.result(timeout=5)

        msgs = [json.loads(ws.recv(timeout=5)) for _ in range(2)]
        by_type = {m["type"]: m for m in msgs}
        assert is_transcript_message(by_type["transcript"])
        assert is_packet_summary_message(by_type["packet_summary"])
        # PacketSummaryMessage optional fields keep their declared types
        ps = by_type["packet_summary"]
        assert ps["emotion"] is None or isinstance(ps["emotion"], str)
        assert ps["snippet"] is None or isinstance(ps["snippet"], str)


def test_health_shape_for_useBackendHealth(server):
    """useBackendHealth polls GET /api/health; HealthResponse = {status:'ok'}."""
    import httpx

    r = httpx.get(f"{_base(server)}/api/health", timeout=10)
    assert r.status_code == 200
    assert r.json() == {"status": "ok"}
