"""Fused one-launch decode layer (ops/fused_layer.py) vs the reference
XLA layer path — interpret-mode parity on CPU.

The kernel fuses rms-norms, the qkv/o/gateup/down weight streams, RoPE,
and live-window attention into one launch; these tests pin its numerics
to Qwen3Model._layer (the path every other decode config uses) and its
gating predicate to the geometries it claims.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model, fuse_decode_params
from aha_tpu.ops.fused_layer import (MAX_WINDOW, fused_decode_layer,
                                     fused_layer_supported)
from aha_tpu.ops.rope import gather_rope


@pytest.fixture(scope="module")
def setup():
    cfg = Qwen3Config(vocab_size=512, hidden_size=1024,
                      intermediate_size=3072, num_hidden_layers=2,
                      num_attention_heads=16, num_key_value_heads=8,
                      head_dim=128, tie_word_embeddings=True)
    model = Qwen3Model(cfg, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = fuse_decode_params(params)
    return cfg, model, params


def _rope_rows(model, pos):
    positions = pos + jnp.arange(1)
    cos, sin = gather_rope(model.cos, model.sin, positions)
    return (cos, sin,
            jnp.concatenate([cos, cos], -1).reshape(1, 128),
            jnp.concatenate([sin, sin], -1).reshape(1, 128))


@pytest.mark.parametrize("li_val,pos_val", [(0, 37), (1, 1), (1, 63)])
def test_fused_layer_matches_reference(setup, li_val, pos_val):
    cfg, model, params = setup
    lyr = params["layers"]
    Skv = 256
    kc = jax.random.normal(jax.random.PRNGKey(1), (2, 1, Skv, 1024),
                           jnp.bfloat16)
    vc = jax.random.normal(jax.random.PRNGKey(2), (2, 1, Skv, 1024),
                           jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 1024), jnp.bfloat16)
    pos = jnp.asarray(pos_val, jnp.int32)
    li = jnp.asarray(li_val, jnp.int32)
    cos, sin, cosr, sinr = _rope_rows(model, pos)

    xo, krow, vrow = fused_decode_layer(
        x, lyr, li, pos, cosr, sinr, kc, vc, window=64,
        eps=cfg.rms_norm_eps, interpret=True)

    lp = jax.tree.map(lambda a: a[li_val], lyr)
    xr, kc2, vc2, _, _ = model._layer(lp, x, cos, sin, kc, vc, li, pos,
                                      is_prefill=False)
    krow_ref = kc2[li_val, 0, pos_val].reshape(8, 128)
    vrow_ref = vc2[li_val, 0, pos_val].reshape(8, 128)

    np.testing.assert_allclose(np.asarray(vrow, np.float32),
                               np.asarray(vrow_ref, np.float32),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(krow, np.float32),
                               np.asarray(krow_ref, np.float32), atol=0.03)
    # hidden state: bf16 rounding + f32-vs-bf16 accumulation order
    np.testing.assert_allclose(np.asarray(xo, np.float32).ravel(),
                               np.asarray(xr, np.float32).ravel(),
                               atol=0.06)


def test_fused_layer_cache_rows_roundtrip(setup):
    """Writing the returned rows reproduces the reference cache update."""
    cfg, model, params = setup
    lyr = params["layers"]
    Skv = 128
    kc = jnp.zeros((2, 1, Skv, 1024), jnp.bfloat16)
    vc = jnp.zeros((2, 1, Skv, 1024), jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 1, 1024), jnp.bfloat16)
    pos = jnp.asarray(9, jnp.int32)
    li = jnp.asarray(1, jnp.int32)
    cos, sin, cosr, sinr = _rope_rows(model, pos)
    _, krow, vrow = fused_decode_layer(
        x, lyr, li, pos, cosr, sinr, kc, vc, window=64,
        eps=cfg.rms_norm_eps, interpret=True)
    zero = jnp.zeros((), jnp.int32)
    kc_new = jax.lax.dynamic_update_slice(
        kc, krow.reshape(1, 1, 1, 1024), (li, zero, pos, zero))
    _, kc_ref, _, _, _ = model._layer(
        jax.tree.map(lambda a: a[1], lyr), x, cos, sin, kc, vc, li, pos,
        is_prefill=False)
    np.testing.assert_allclose(
        np.asarray(kc_new[1, 0, 9], np.float32),
        np.asarray(kc_ref[1, 0, 9], np.float32), atol=0.03)
    # untouched rows stay zero
    assert float(jnp.abs(kc_new[0]).sum()) == 0.0
    assert float(jnp.abs(kc_new[1, 0, 10:]).sum()) == 0.0


def test_supported_gate(setup):
    cfg, model, params = setup
    lyr = params["layers"]
    ok = fused_layer_supported(lyr, 1024, 16, 8, 128, 3072, 64)
    assert ok
    # window guards
    assert not fused_layer_supported(lyr, 1024, 16, 8, 128, 3072, None)
    assert not fused_layer_supported(lyr, 1024, 16, 8, 128, 3072,
                                     MAX_WINDOW + 1)
    # unfused params (no qkv) are rejected
    unfused = dict(lyr)
    unfused.pop("qkv")
    assert not fused_layer_supported(unfused, 1024, 16, 8, 128, 3072, 64)
    # biased projections are rejected (qwen2-style attention biases)
    biased = {**lyr, "qkv": {**lyr["qkv"],
                             "b": jnp.zeros((2, 4096), jnp.bfloat16)}}
    assert not fused_layer_supported(biased, 1024, 16, 8, 128, 3072, 64)
