"""ASR model: numerics parity vs the torch reference implementation
(random weights, offline), KV-cache decode consistency, greedy decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from janus_tpu.common.config import ASRConfig
from janus_tpu.models import asr
from janus_tpu.models.import_whisper import asr_config_from_hf, params_from_hf_state_dict
from janus_tpu.models.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def tiny_torch_model():
    import torch
    from transformers import WhisperConfig, WhisperModel

    hf_cfg = WhisperConfig(
        vocab_size=283,
        num_mel_bins=16,
        d_model=64,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=128,
        decoder_ffn_dim=128,
        max_source_positions=64,
        max_target_positions=32,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=1,
    )
    torch.manual_seed(0)
    model = WhisperModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return model, hf_cfg, sd


def test_encoder_parity(tiny_torch_model):
    import torch

    model, hf_cfg, sd = tiny_torch_model
    cfg = asr_config_from_hf(hf_cfg)
    params = params_from_hf_state_dict(sd)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 128, 16)).astype(np.float32)  # [B, T, mels]

    ours = np.asarray(asr.encode_audio(params, cfg, jnp.asarray(mel)))
    with torch.no_grad():
        theirs = model.encoder(
            torch.from_numpy(mel.transpose(0, 2, 1))
        ).last_hidden_state.numpy()
    assert ours.shape == theirs.shape == (2, 64, 64)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_decoder_parity_full_sequence(tiny_torch_model):
    import torch

    model, hf_cfg, sd = tiny_torch_model
    cfg = asr_config_from_hf(hf_cfg)
    params = params_from_hf_state_dict(sd)

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 128, 16)).astype(np.float32)
    tokens = np.array([[5, 17, 99, 254, 3]], dtype=np.int64)

    enc = asr.encode_audio(params, cfg, jnp.asarray(mel))
    state = asr.init_decode_state(params, cfg, enc, max_len=16)
    logits, _ = asr._decoder_forward(
        params, cfg, jnp.asarray(tokens, dtype=jnp.int32),
        jnp.zeros((1,), dtype=jnp.int32), state,
    )
    ours = np.asarray(logits)

    with torch.no_grad():
        out = model(
            input_features=torch.from_numpy(mel.transpose(0, 2, 1)),
            decoder_input_ids=torch.from_numpy(tokens),
        ).last_hidden_state
        theirs = (out @ model.decoder.embed_tokens.weight.T).numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-4)


def test_incremental_decode_matches_full(tiny_torch_model):
    """Token-by-token decoding through the KV cache must equal one-shot
    decoding of the full sequence."""
    _, hf_cfg, sd = tiny_torch_model
    cfg = asr_config_from_hf(hf_cfg)
    params = params_from_hf_state_dict(sd)

    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((1, 128, 16)).astype(np.float32))
    toks = np.array([[7, 42, 3, 199]], dtype=np.int32)

    enc = asr.encode_audio(params, cfg, mel)
    state = asr.init_decode_state(params, cfg, enc, max_len=16)
    full_logits, _ = asr._decoder_forward(
        params, cfg, jnp.asarray(toks), jnp.zeros((1,), jnp.int32), state
    )

    state = asr.init_decode_state(params, cfg, enc, max_len=16)
    last, state = asr.decoder_prefill(params, cfg, jnp.asarray(toks[:, :1]), state)
    step_logits = [last]
    for i in range(1, toks.shape[1]):
        last, state = asr.decoder_step(params, cfg, jnp.asarray(toks[:, i]), state)
        step_logits.append(last)
    inc = np.stack([np.asarray(l) for l in step_logits], axis=1)
    np.testing.assert_allclose(inc, np.asarray(full_logits), atol=2e-4)


def test_greedy_decode_shapes_and_determinism():
    cfg = ASRConfig(
        n_mels=16, d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4,
        vocab_size=261, max_source_positions=64, max_target_positions=64,
        max_decode_tokens=8,
    )
    params = asr.init_asr(0, cfg)
    tok = ByteTokenizer()
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((2, 128, 16)).astype(np.float32))
    prompt = jnp.full((2, 1), tok.sot, dtype=jnp.int32)

    f = jax.jit(
        lambda m: asr.transcribe_mel(params, cfg, m, prompt, tok.eot, max_new=8)
    )
    out1 = np.asarray(f(mel))
    out2 = np.asarray(f(mel))
    assert out1.shape == (2, 8)
    np.testing.assert_array_equal(out1, out2)
    assert out1.dtype == np.int32


def test_greedy_decode_eot_padding():
    """Force eot as the argmax by biasing the token embedding — every lane
    must emit eot immediately and stay padded."""
    cfg = ASRConfig(
        n_mels=16, d_model=64, encoder_layers=1, decoder_layers=1, num_heads=4,
        vocab_size=261, max_source_positions=64, max_target_positions=64,
    )
    params = asr.init_asr(0, cfg)
    tok = ByteTokenizer()
    # bias logits: make eot embedding huge so <x, emb[eot]> dominates
    emb = np.array(params["decoder"]["token_emb"])
    direction = np.ones(cfg.d_model, dtype=np.float32) * 5.0
    emb[tok.eot] = direction
    params["decoder"]["token_emb"] = jnp.asarray(emb)

    rng = np.random.default_rng(4)
    mel = jnp.asarray(rng.standard_normal((1, 128, 16)).astype(np.float32))
    prompt = jnp.full((1, 1), tok.sot, dtype=jnp.int32)
    enc = asr.encode_audio(params, cfg, mel)
    out = np.asarray(asr.greedy_decode(params, cfg, enc, prompt, tok.eot, max_new=6))
    # either everything is eot (if the bias wins) or at minimum the output
    # is eot-padded after the first eot
    seen_eot = False
    for t in out[0]:
        if seen_eot:
            assert t == tok.eot
        if t == tok.eot:
            seen_eot = True


def test_prepare_mel_static_shapes():
    cfg = ASRConfig(n_mels=16, max_source_positions=64)
    audio = jnp.ones((2, 5000))
    mel = asr.prepare_mel(audio, cfg)
    assert mel.shape == (2, 128, 16)
    long_audio = jnp.ones((2, 100_000))
    mel2 = asr.prepare_mel(long_audio, cfg)
    assert mel2.shape == (2, 128, 16)


def test_tokenizer_roundtrip():
    tok = ByteTokenizer()
    s = "Hello, Janus! ünïcødé"
    assert tok.decode(tok.encode(s)) == s
    assert tok.vocab_size == 261
    ids = tok.encode("hi") + [tok.eot, tok.eot]
    assert tok.decode(ids) == "hi"


def test_scan_layers_matches_unrolled():
    cfg = ASRConfig(
        n_mels=16, d_model=64, encoder_layers=3, decoder_layers=1, num_heads=4,
        vocab_size=261, max_source_positions=64, max_target_positions=16,
    )
    params = asr.init_asr(0, cfg)
    rng = np.random.default_rng(9)
    mel = jnp.asarray(rng.standard_normal((2, 128, 16)).astype(np.float32))
    ref = np.asarray(asr.encode_audio(params, cfg, mel))
    out = np.asarray(asr.encode_audio(params, cfg, mel, scan_layers=True))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_scan_decoder_matches_unrolled():
    """Full transcribe with scan_layers (stacked caches + lax.scan block
    body, the large-v3 compile path) must emit the same tokens as the
    unrolled decoder."""
    cfg = ASRConfig(
        n_mels=16, d_model=64, encoder_layers=2, decoder_layers=3, num_heads=4,
        vocab_size=261, max_source_positions=64, max_target_positions=64,
        max_decode_tokens=8,
    )
    params = asr.init_asr(0, cfg)
    tok = ByteTokenizer()
    rng = np.random.default_rng(11)
    mel = jnp.asarray(rng.standard_normal((2, 128, 16)).astype(np.float32))
    prompt = jnp.full((2, 1), tok.sot, dtype=jnp.int32)

    ref = np.asarray(
        asr.transcribe_mel(params, cfg, mel, prompt, tok.eot, max_new=8)
    )
    out = np.asarray(
        jax.jit(
            lambda m: asr.transcribe_mel(
                params, cfg, m, prompt, tok.eot, max_new=8, scan_layers=True
            )
        )(mel)
    )
    np.testing.assert_array_equal(out, ref)

    # logits parity too (token equality can mask drift): prefill + one step
    enc = asr.encode_audio(params, cfg, mel)
    st_u = asr.init_decode_state(params, cfg, enc, max_len=8)
    st_s = asr.init_decode_state(params, cfg, enc, max_len=8, scan_layers=True)
    lu, st_u = asr.decoder_prefill(params, cfg, prompt, st_u)
    ls, st_s = asr.decoder_prefill(params, cfg, prompt, st_s)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lu), atol=2e-4)
    t = jnp.argmax(lu, axis=-1).astype(jnp.int32)
    lu2, _ = asr.decoder_step(params, cfg, t, st_u)
    ls2, _ = asr.decoder_step(params, cfg, t, st_s)
    np.testing.assert_allclose(np.asarray(ls2), np.asarray(lu2), atol=2e-4)


def test_fused_qkv_matches_unfused():
    """prepare_decode_params' QKV fusion (one [d, 3d] matmul) must emit
    identical tokens and near-identical logits to the per-projection path,
    for both the unrolled and the scan/stacked decoder layouts."""
    cfg = ASRConfig(
        n_mels=16, d_model=64, encoder_layers=2, decoder_layers=3, num_heads=4,
        vocab_size=261, max_source_positions=64, max_target_positions=64,
        max_decode_tokens=8,
    )
    params = asr.init_asr(0, cfg)
    tok = ByteTokenizer()
    rng = np.random.default_rng(21)
    mel = jnp.asarray(rng.standard_normal((2, 128, 16)).astype(np.float32))
    prompt = jnp.full((2, 1), tok.sot, dtype=jnp.int32)
    enc = asr.encode_audio(params, cfg, mel)

    ref = np.asarray(asr.greedy_decode(params, cfg, enc, prompt, tok.eot,
                                       max_new=8))
    for scan in (False, True):
        out = np.asarray(asr.greedy_decode(
            params, cfg, enc, prompt, tok.eot, max_new=8,
            scan_layers=scan, fuse_qkv=True))
        np.testing.assert_array_equal(out, ref)

    # host-prepared tree (stacked + fused) consumed as-is
    prepared = asr.prepare_decode_params(params, scan_layers=True,
                                         fuse_qkv=True)
    assert "qkv" in prepared["decoder"]["blocks"]["attn"]
    assert "qkv" in asr.prepare_decode_params(  # idempotent
        prepared, scan_layers=True, fuse_qkv=True)["decoder"]["blocks"]["attn"]
    out = np.asarray(asr.greedy_decode(prepared, cfg, enc, prompt, tok.eot,
                                       max_new=8, scan_layers=True,
                                       fuse_qkv=True))
    np.testing.assert_array_equal(out, ref)


def test_cross_kv_int8_quantization_accuracy():
    from janus_tpu.ops.quant import dequant_kv, quantize_kv

    rng = np.random.default_rng(5)
    kv = jnp.asarray(rng.standard_normal((3, 2, 4, 64, 16)).astype(np.float32))
    deq = np.asarray(dequant_kv(quantize_kv(kv), jnp.float32))
    err = np.abs(deq - np.asarray(kv)).max(axis=-1)
    amax = np.abs(np.asarray(kv)).max(axis=-1)
    assert np.all(err <= amax / 127.0 + 1e-6)  # per-position bound
    # identity on plain arrays
    assert dequant_kv(kv, jnp.float32) is kv


def test_cross_kv_int8_decode_close():
    """int8 cross-KV is an approximation: prefill logits must stay within
    quantization-level error of the exact path, and the full greedy decode
    must run (token equality on trained checkpoints is gated in
    tests/test_zoo_checkpoints.py)."""
    cfg = ASRConfig(
        n_mels=16, d_model=64, encoder_layers=2, decoder_layers=2, num_heads=4,
        vocab_size=261, max_source_positions=64, max_target_positions=64,
        max_decode_tokens=8,
    )
    params = asr.init_asr(0, cfg)
    tok = ByteTokenizer()
    rng = np.random.default_rng(13)
    mel = jnp.asarray(rng.standard_normal((2, 128, 16)).astype(np.float32))
    prompt = jnp.full((2, 1), tok.sot, dtype=jnp.int32)
    enc = asr.encode_audio(params, cfg, mel)

    for scan in (False, True):
        st = asr.init_decode_state(params, cfg, enc, max_len=9,
                                   scan_layers=scan)
        st_q = asr.init_decode_state(params, cfg, enc, max_len=9,
                                     scan_layers=scan, cross_kv_int8=True)
        lx, _ = asr.decoder_prefill(params, cfg, prompt, st)
        lq, _ = asr.decoder_prefill(params, cfg, prompt, st_q)
        scale = float(np.abs(np.asarray(lx)).max())
        assert np.abs(np.asarray(lq) - np.asarray(lx)).max() < 0.02 * scale

        out = np.asarray(asr.greedy_decode(
            params, cfg, enc, prompt, tok.eot, max_new=8, scan_layers=scan,
            cross_kv_int8=True, fuse_qkv=True))
        assert out.shape == (2, 8) and out.dtype == np.int32
