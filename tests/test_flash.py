"""Pallas fused attention vs the XLA reference (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from janus_tpu.ops.attention import attend, causal_mask
from janus_tpu.ops.flash import flash_attention


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("t", [64, 200, 256])
def test_flash_matches_reference(causal, t):
    rng = np.random.default_rng(0)
    b, h, d = 2, 3, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))

    mask = causal_mask(t, t) if causal else None
    ref = np.asarray(attend(q, k, v, mask))
    out = np.asarray(flash_attention(q, k, v, causal=causal, force=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_flash_unpadded_lengths():
    # T not a multiple of the lane width exercises the padding/masking path
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((1, 2, 77, 64)).astype(np.float32))
    ref = np.asarray(attend(q, q, q))
    out = np.asarray(flash_attention(q, q, q, force=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_flash_falls_back_on_custom_mask():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((1, 2, 32, 16)).astype(np.float32))
    mask = jnp.asarray(rng.integers(0, 2, size=(32, 32)).astype(bool))
    ref = np.asarray(attend(q, q, q, mask))
    out = np.asarray(flash_attention(q, q, q, mask=mask, force=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_grad_matches_reference(causal):
    """grad must flow through the kernel (custom_vjp): an on-TPU encoder
    train step differentiates flash_attention; without the VJP, Pallas has
    no autodiff rule and tracing crashes."""
    import jax

    rng = np.random.default_rng(3)
    b, h, t, d = 1, 2, 64, 32
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))

    mask = causal_mask(t, t) if causal else None

    def loss_ref(q, k, v):
        return jnp.sum(attend(q, k, v, mask) * w)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal, force=True) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)
