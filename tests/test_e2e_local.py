"""End-to-end loopback: sender pipeline → real localhost UDP → receiver
pipeline → captured playback (reference: backend/tests/test_e2e_local.py —
including its multi-turn deadlock regression)."""

import threading

import numpy as np
import pytest

from janus_tpu.audio.io import StreamAudioService
from janus_tpu.audio.synthetic import conversation
from janus_tpu.common.config import JanusConfig
from janus_tpu.common.protocol import JanusPacket
from janus_tpu.runtime.codec import SemanticEncoder
from janus_tpu.runtime.link import LinkSimulator, PacketListener
from janus_tpu.runtime.synthesizer import Synthesizer
from janus_tpu.models.vad import VoiceActivityDetector
from janus_tpu.tools.receiver_main import receive_loop
from janus_tpu.tools.sender_main import main_loop


def e2e_cfg(port, baud=48_000):
    """Tiny models + fast link so the whole duplex run takes seconds."""
    return JanusConfig().override(**{
        "link.baud_rate": baud,
        "link.target_ip": "127.0.0.1",
        "link.target_port": port,
        "link.receiver_port": port,
        "asr.d_model": 64, "asr.encoder_layers": 1, "asr.decoder_layers": 1,
        "asr.num_heads": 4, "asr.n_mels": 16, "asr.vocab_size": 261,
        "asr.max_source_positions": 512, "asr.max_target_positions": 32,
        "asr.max_decode_tokens": 4,
        "tts.d_model": 32, "tts.layers": 1, "tts.num_heads": 4, "tts.n_mels": 16,
        "tts.max_mel_frames": 16,
        "vocoder.d_model": 32, "vocoder.layers": 1, "vocoder.n_fft": 256,
        "vocoder.hop_length": 64,
    })


class FixedTextEncoder(SemanticEncoder):
    """Real prosody path, deterministic transcript (the reference mocks the
    transcriber the same way: test_e2e_local.py:27-60)."""

    def __init__(self, cfg, **kw):
        super().__init__(cfg, **kw)
        self.counter = 0

    def encode_batch(self, phrases):
        out = super().encode_batch(phrases)
        for r in out:
            self.counter += 1
            r["text"] = f"test message {self.counter}"
        return out



def test_full_duplex_conversation_over_udp():
    """Three speech turns must yield three packets transmitted, synthesized
    and played — the reference's deadlock-after-first-turn regression."""
    listener = PacketListener(0, use_tcp=False, timeout=0.2)
    cfg = e2e_cfg(listener.port)

    # ~3 turns of 2s speech + 1s silence at 48kHz
    audio = conversation(turns=3, speech_seconds=2.0, silence_seconds=1.0,
                         amp=0.3)
    sender_audio = StreamAudioService(audio)
    receiver_audio = StreamAudioService()

    encoder = FixedTextEncoder(cfg, buckets=(48_000 * 4,))
    synth = Synthesizer(cfg)
    # compile both jitted programs BEFORE the timed loops start, so the
    # receiver's idle-exit budget only measures steady-state traffic
    encoder.warmup()
    synth.synthesize(JanusPacket(text="warm", prosody={"energy": "Normal",
                                                       "pitch": "Normal"}))
    stop_rx = threading.Event()
    played = []

    def rx():
        played.append(
            receive_loop(cfg, receiver_audio, synthesizer=synth,
                         listener=listener, stop_event=stop_rx,
                         max_idle_seconds=8.0)
        )

    rx_thread = threading.Thread(target=rx, daemon=True)
    rx_thread.start()

    vad = VoiceActivityDetector(cfg.vad, sample_rate=48_000)
    link = LinkSimulator(cfg.link)
    sent = main_loop(cfg, sender_audio, encoder=encoder, vad=vad, link=link,
                     mode="semantic", max_idle_seconds=2.0)

    rx_thread.join(timeout=60)
    stop_rx.set()

    assert sent == 3, f"expected 3 packets sent, got {sent}"
    assert played and played[0] == 3, f"expected 3 packets played, got {played}"
    # synthesized audio reached the virtual speaker
    assert len(receiver_audio.written_chunks) == 3
    assert all(len(c) > 0 for c in receiver_audio.written_chunks)



def test_morse_mode_end_to_end():
    """Morse mode bypasses VAD and plays exact sine timing on the far end."""
    listener = PacketListener(0, use_tcp=False, timeout=0.2)
    cfg = e2e_cfg(listener.port)

    audio = conversation(turns=1, speech_seconds=1.0, silence_seconds=1.0, amp=0.3)
    sender_audio = StreamAudioService(audio)
    receiver_audio = StreamAudioService()

    encoder = FixedTextEncoder(cfg, buckets=(48_000 * 4,))
    synth = Synthesizer(cfg)
    encoder.warmup()
    stop_rx = threading.Event()
    played = []

    def rx():
        played.append(
            receive_loop(cfg, receiver_audio, synthesizer=synth,
                         listener=listener, stop_event=stop_rx,
                         max_idle_seconds=6.0)
        )

    rx_thread = threading.Thread(target=rx, daemon=True)
    rx_thread.start()

    vad = VoiceActivityDetector(cfg.vad, sample_rate=48_000)
    link = LinkSimulator(cfg.link)
    sent = main_loop(cfg, sender_audio, encoder=encoder, vad=vad, link=link,
                     mode="morse", max_idle_seconds=2.0)
    rx_thread.join(timeout=30)
    stop_rx.set()

    assert sent >= 1
    assert played and played[0] == sent
    # morse output is int16 sine at 800 Hz — loud, long
    pcm = receiver_audio.written_audio
    assert len(pcm) > 48_000  # at least 1s of tones for "test message N"
    assert np.abs(pcm).max() > 0.4



def test_corrupt_packet_skipped_not_fatal():
    listener = PacketListener(0, use_tcp=False, timeout=0.2)
    cfg = e2e_cfg(listener.port)
    receiver_audio = StreamAudioService()
    synth = Synthesizer(cfg)
    synth.synthesize(JanusPacket(text="warm", prosody={"energy": "Normal",
                                                       "pitch": "Normal"}))
    stop_rx = threading.Event()
    played = []

    def rx():
        played.append(
            receive_loop(cfg, receiver_audio, synthesizer=synth,
                         listener=listener, stop_event=stop_rx,
                         max_idle_seconds=3.0)
        )

    rx_thread = threading.Thread(target=rx, daemon=True)
    rx_thread.start()

    import socket

    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.sendto(b"\xff\xfe garbage not msgpack", ("127.0.0.1", listener.port))
    good = JanusPacket(text="after garbage",
                       prosody={"energy": "Normal", "pitch": "Normal"}).serialize()
    s.sendto(good, ("127.0.0.1", listener.port))
    s.close()

    rx_thread.join(timeout=30)
    stop_rx.set()
    assert played and played[0] == 1  # good packet survived the garbage
