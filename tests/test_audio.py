"""WAV I/O and audio services."""

import numpy as np
import pytest

from janus_tpu.audio.io import AudioService, StreamAudioService
from janus_tpu.audio.synthetic import chunk_stream, conversation, tone, voiced_phrase
from janus_tpu.audio.wav import float_to_pcm16, pcm16_to_float, read_wav, write_wav


def test_wav_roundtrip(tmp_path):
    audio = voiced_phrase(seconds=0.3)
    p = str(tmp_path / "a.wav")
    write_wav(p, audio, 48000)
    back, sr = read_wav(p)
    assert sr == 48000
    assert back.shape == audio.shape
    np.testing.assert_allclose(back, audio, atol=2.5 / 32768)


def test_wav_from_bytes(tmp_path):
    p = str(tmp_path / "b.wav")
    write_wav(p, tone(440, 0.1, sample_rate=16000), 16000)
    with open(p, "rb") as f:
        data = f.read()
    audio, sr = read_wav(data)
    assert sr == 16000
    assert len(audio) == 1600


def test_pcm16_helpers():
    x = np.asarray([0.0, 0.5, -0.5, 1.0, -1.0], dtype=np.float32)
    b = float_to_pcm16(x)
    back = pcm16_to_float(b)
    np.testing.assert_allclose(back, x, atol=2e-4)


def test_audio_service_mock_mode():
    svc = AudioService(use_hardware=False)
    assert svc.mock_mode
    chunk = svc.read_chunk()
    assert chunk.shape == (1536,)
    assert chunk.dtype == np.float32
    svc.write_chunk(b"\x00\x00" * 10)  # no-op
    svc.write_chunk(np.zeros(10, dtype=np.float32))
    svc.close()


def test_stream_audio_service_replay_and_capture():
    audio = np.arange(1536 * 2 + 100, dtype=np.float32) / 10_000
    svc = StreamAudioService(audio, end_of_stream=False)
    c1, c2, c3 = svc.read_chunk(), svc.read_chunk(), svc.read_chunk()
    np.testing.assert_array_equal(c1, audio[:1536])
    np.testing.assert_array_equal(c2, audio[1536:3072])
    assert c3.shape == (1536,)
    assert np.all(c3[100:] == 0)  # zero-padded tail
    assert svc.exhausted

    svc.write_chunk(np.full(100, 0.25, np.float32))
    svc.write_chunk(float_to_pcm16(np.full(50, -0.5, np.float32)))
    out = svc.written_audio
    assert out.shape == (150,)
    assert abs(float(out[0]) - 0.25) < 1e-3
    assert abs(float(out[120]) + 0.5) < 1e-3


def test_synthetic_generators():
    conv = conversation(turns=2, speech_seconds=0.5, silence_seconds=0.25)
    assert conv.shape[0] == int((0.5 + 0.25) * 2 * 48000)
    chunks = list(chunk_stream(conv))
    assert all(c.shape == (1536,) for c in chunks)
    # speech regions loud, silence regions quiet
    assert np.abs(conv[: int(0.5 * 48000)]).max() > 0.1
    sil = conv[int(0.5 * 48000) : int(0.75 * 48000)]
    assert np.abs(sil).max() < 0.05
