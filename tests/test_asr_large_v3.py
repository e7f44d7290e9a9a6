"""Whisper import parity at FULL large-v3 geometry (VERDICT r2 item 2b).

Round-2 parity tests ran only at a tiny random geometry; nothing proved
`models/import_whisper.py` at the real flagship shape. This builds a
complete large-v3-shaped HuggingFace ``WhisperModel`` with RANDOM weights
(zero egress forbids the real checkpoint; geometry + naming + layout are
what the importer must survive), imports the state dict, and checks
torch-vs-JAX numerics at depth 32 / d_model 1280 / 20 heads / 128 mels /
vocab 51866 — through both the unrolled and the scan-over-layers encoder
paths (the path the flagship serving program compiles).

Runtime ~3-5 min on 2 CPU cores (fp32, batch 1, one forward each side);
marked slow but runs in the default suite — a broken import at scale must
not ship green. Reference capability analog:
backend/services/transcriber.py:23-64 (faster-whisper large-family).
"""

import gc

import numpy as np
import pytest

import jax.numpy as jnp

from janus_tpu.models import asr
from janus_tpu.models.import_whisper import (
    asr_config_from_hf,
    params_from_hf_state_dict,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def large_v3_pair():
    """(torch outputs, state dict, hf config) at exact large-v3 geometry.

    The torch model is materialized, driven once (encoder + one decoder
    forward), reduced to numpy, and freed — so the test's peak memory is
    one framework's copy of the 1.5B fp32 params at a time.
    """
    import torch
    from transformers import WhisperConfig, WhisperModel

    hf_cfg = WhisperConfig(
        vocab_size=51_866,
        num_mel_bins=128,
        d_model=1280,
        encoder_layers=32,
        decoder_layers=32,
        encoder_attention_heads=20,
        decoder_attention_heads=20,
        encoder_ffn_dim=5120,
        decoder_ffn_dim=5120,
        max_source_positions=1500,
        max_target_positions=448,
    )
    torch.manual_seed(0)
    model = WhisperModel(hf_cfg).eval()
    # HF init gives std=0.02 normals; at depth 32 that explodes
    # activations multiplicatively and parity drowns in fp32 noise.
    # Rescale residual-branch outputs 1/sqrt(2*layers) (the usual
    # depth-scaled init) so signals stay O(1) through all 64 blocks —
    # geometry/naming/layout coverage is unchanged.
    with torch.no_grad():
        scale = 1.0 / np.sqrt(2 * 32)
        for name, p in model.named_parameters():
            if any(k in name for k in ("out_proj.weight", "fc2.weight")):
                p.mul_(scale)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 3000, 128)).astype(np.float32)
    tokens = np.array([[50258, 50259, 50360, 50365, 440]], dtype=np.int64)

    with torch.no_grad():
        enc_out = model.encoder(
            torch.from_numpy(mel.transpose(0, 2, 1))
        ).last_hidden_state.numpy()
        dec_out = model(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(tokens),
        ).last_hidden_state
        logits = (dec_out @ model.decoder.embed_tokens.weight.T).numpy()

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    del model
    gc.collect()
    return hf_cfg, sd, mel, tokens, enc_out, logits


def test_large_v3_config_mapping(large_v3_pair):
    from janus_tpu.common.config import ASRConfig

    hf_cfg, *_ = large_v3_pair
    cfg = asr_config_from_hf(hf_cfg)
    flagship = ASRConfig.large_v3()
    for field in ("n_mels", "d_model", "encoder_layers", "decoder_layers",
                  "num_heads", "vocab_size", "max_source_positions",
                  "max_target_positions"):
        assert getattr(cfg, field) == getattr(flagship, field), field


def test_large_v3_encoder_parity_unrolled_and_scan(large_v3_pair):
    import dataclasses

    hf_cfg, sd, mel, _tokens, enc_ref, _logits = large_v3_pair
    cfg = dataclasses.replace(asr_config_from_hf(hf_cfg), dtype="float32")
    params = params_from_hf_state_dict(sd)

    ours = np.asarray(asr.encode_audio(params, cfg, jnp.asarray(mel)))
    assert ours.shape == enc_ref.shape == (1, 1500, 1280)
    # fp32 through 64 residual matmul blocks at d=1280: tolerances scale
    # with depth; values are O(1) by construction (depth-scaled init)
    np.testing.assert_allclose(ours, enc_ref, atol=2e-3, rtol=1e-3)

    scan = np.asarray(
        asr.encode_audio(params, cfg, jnp.asarray(mel), scan_layers=True))
    np.testing.assert_allclose(scan, enc_ref, atol=2e-3, rtol=1e-3)
    # scan vs unrolled must agree far tighter than either vs torch
    np.testing.assert_allclose(scan, ours, atol=2e-5)


def test_large_v3_decoder_parity(large_v3_pair):
    import dataclasses

    hf_cfg, sd, mel, tokens, _enc_ref, logits_ref = large_v3_pair
    cfg = dataclasses.replace(asr_config_from_hf(hf_cfg), dtype="float32")
    params = params_from_hf_state_dict(sd)

    enc = asr.encode_audio(params, cfg, jnp.asarray(mel))
    state = asr.init_decode_state(params, cfg, enc, max_len=8)
    ours, _ = asr._decoder_forward(
        params, cfg, jnp.asarray(tokens, dtype=jnp.int32),
        jnp.zeros((1,), dtype=jnp.int32), state,
    )
    ours = np.asarray(ours)
    assert ours.shape == logits_ref.shape == (1, 5, 51_866)
    np.testing.assert_allclose(ours, logits_ref, atol=5e-3, rtol=1e-3)
    # ranking is what greedy decode consumes: argmax must agree exactly
    np.testing.assert_array_equal(
        np.argmax(ours, axis=-1), np.argmax(logits_ref, axis=-1))
