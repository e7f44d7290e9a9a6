"""Host audio: WAV I/O, synthetic signals, capture/playback services."""

from janus_tpu.audio.wav import read_wav, write_wav  # noqa: F401
