"""Pallas flash attention vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.ops.attention import causal_mask, sdpa
from aha_tpu.ops.flash_attention import flash_attention


def _qkv(S, Hq=4, Hkv=2, D=128, B=2, dtype=jnp.float32):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, Hq, D), dtype)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, Hkv, D), dtype)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, Hkv, D), dtype)
    return q, k, v


@pytest.mark.parametrize("S,blk", [(128, 128), (256, 128), (512, 128),
                                   (256, 64)])
@pytest.mark.parametrize("causal", [True, False])
def test_flash_matches_sdpa(S, blk, causal):
    q, k, v = _qkv(S)
    ref = sdpa(q, k, v, causal_mask(S, S) if causal else None)
    got = flash_attention(q, k, v, causal=causal, block_q=blk, block_k=blk,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_gqa_grouping():
    """8 q-heads over 2 kv-heads must equal the grouped XLA path."""
    q, k, v = _qkv(128, Hq=8, Hkv=2)
    ref = sdpa(q, k, v, causal_mask(128, 128))
    got = flash_attention(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_bf16():
    q, k, v = _qkv(256, dtype=jnp.bfloat16)
    ref = sdpa(q, k, v, causal_mask(256, 256))
    got = flash_attention(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_flash_cross_attention_lengths():
    """Sq != Skv (non-causal cross attention, e.g. audio encoder)."""
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 4, 128))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 384, 4, 128))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 384, 4, 128))
    ref = sdpa(q, k, v, None)
    got = flash_attention(q, k, v, causal=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
