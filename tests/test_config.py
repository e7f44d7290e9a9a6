import pytest

from janus_tpu.common.config import ASRConfig, JanusConfig


def test_defaults_match_reference_constants():
    cfg = JanusConfig()
    # reference: backend/services/audio_io.py:28-31
    assert cfg.audio.sample_rate == 48_000
    assert cfg.audio.chunk_samples == 1536
    # reference: backend/services/engine.py:439-441,504
    assert cfg.segmenter.pre_roll_chunks == 10
    assert cfg.segmenter.silence_threshold_chunks == 15
    assert cfg.segmenter.min_phrase_samples == 9216
    # reference: backend/services/vad.py:11
    assert cfg.vad.threshold == 0.5
    # reference: backend/services/link_simulator.py:19-20
    assert cfg.link.baud_rate == 300
    assert cfg.link.bytes_per_second == 37.5
    # reference: backend/services/prosody.py:67-99
    assert cfg.prosody.energy_quiet == 0.05
    assert cfg.prosody.energy_loud == 0.15
    assert cfg.prosody.pitch_deep_hz == 120.0
    assert cfg.prosody.pitch_high_hz == 200.0


def test_override_dotted_paths():
    cfg = JanusConfig().override(**{"link.baud_rate": 1200, "asr.d_model": 512})
    assert cfg.link.baud_rate == 1200
    assert cfg.asr.d_model == 512
    # original untouched (frozen dataclasses)
    assert JanusConfig().link.baud_rate == 300


def test_override_unknown_field_raises():
    with pytest.raises(KeyError):
        JanusConfig().override(**{"link.nope": 1})


def test_from_env_ngrok_enables_tcp():
    # reference: backend/services/engine.py:417 auto-enables TCP for ngrok
    cfg = JanusConfig.from_env({"TARGET_IP": "0.tcp.ngrok.io", "TARGET_PORT": "123"})
    assert cfg.link.use_tcp is True
    assert cfg.link.target_port == 123
    cfg2 = JanusConfig.from_env({})
    assert cfg2.link.use_tcp is False


def test_asr_presets():
    assert ASRConfig.tiny().d_model == 384
    assert ASRConfig.base().d_model == 512
    assert ASRConfig.small().encoder_layers == 12
    assert ASRConfig.large_v3().n_mels == 128


def test_flat_dict_roundtrip_keys():
    flat = JanusConfig().to_flat_dict()
    assert flat["audio.sample_rate"] == 48_000
    assert flat["asr.encoder_layers"] == 4
    assert "mesh.axis_names" in flat


def test_from_cli_overrides():
    cfg = JanusConfig.from_cli(
        ["--set", "link.baud_rate=1200", "--set", "asr.dtype=float32",
         "--set", "vad.backend=energy"],
        base=JanusConfig(),
    )
    assert cfg.link.baud_rate == 1200
    assert cfg.asr.dtype == "float32"
    assert cfg.vad.backend == "energy"


def test_from_cli_bad_item():
    with pytest.raises(ValueError):
        JanusConfig.from_cli(["--set", "nonsense"], base=JanusConfig())
