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
                                     fused_decode_stack,
                                     fused_decode_stack_q8,
                                     fused_layer_q8_supported,
                                     fused_layer_supported)
from aha_tpu.ops.quant_matmul import pack_q4_rows, pack_q8_rows
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


def test_fused_stack_matches_layer_chain(setup):
    """The whole-stack (one-launch) kernel equals the per-layer reference
    chain, including the in-place cache row writes via aliased outputs."""
    cfg, model, params = setup
    lyr = params["layers"]
    Skv = 128
    kc = jax.random.normal(jax.random.PRNGKey(1), (2, 1, Skv, 1024),
                           jnp.bfloat16)
    vc = jax.random.normal(jax.random.PRNGKey(2), (2, 1, Skv, 1024),
                           jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 1024), jnp.bfloat16)
    pos = jnp.asarray(33, jnp.int32)
    cos, sin, cosr, sinr = _rope_rows(model, pos)

    xo, kn, vn = fused_decode_stack(x, lyr, pos, cosr, sinr, kc, vc,
                                    window=64, eps=cfg.rms_norm_eps,
                                    interpret=True)
    xr, kcr, vcr = x, kc, vc
    for i in range(2):
        lp = jax.tree.map(lambda a: a[i], lyr)
        xr, kcr, vcr, _, _ = model._layer(
            lp, xr, cos, sin, kcr, vcr, jnp.asarray(i, jnp.int32), pos,
            is_prefill=False)
    np.testing.assert_allclose(np.asarray(xo, np.float32).ravel(),
                               np.asarray(xr, np.float32).ravel(),
                               atol=0.08)
    for li in range(2):
        # one bf16 ulp at |k| ~ 4 is 0.03125: the kernel rounds f32->bf16
        # once where the reference path rounds at the matmul output
        np.testing.assert_allclose(
            np.asarray(kn[li, 0, 33], np.float32),
            np.asarray(kcr[li, 0, 33], np.float32), atol=0.064)
        np.testing.assert_allclose(
            np.asarray(vn[li, 0, 33], np.float32),
            np.asarray(vcr[li, 0, 33], np.float32), atol=0.064)
    # rows the step must not touch stay bit-identical
    np.testing.assert_array_equal(np.asarray(kn[:, :, 40:], np.float32),
                                  np.asarray(kc[:, :, 40:], np.float32))


def _quantize_layers(model, packs: dict):
    """Two-layer quantized stack; packs maps projection name ->
    pack_q8_rows/pack_q4_rows (the layouts load_qwen3_gguf +
    fuse_decode_params produce, incl. per-tensor grid mixes)."""
    params = model.init_random(jax.random.PRNGKey(7), dtype=jnp.bfloat16)

    def q(p, pack):
        d = pack(np.asarray(p["w"], np.float32).T)
        return {k: jnp.asarray(v) for k, v in d.items()}

    lyr = params["layers"]
    qlayers = []
    for i in range(2):
        sl = jax.tree.map(lambda a: a[i], lyr)
        qlayers.append({
            "ln1": sl["ln1"], "ln2": sl["ln2"],
            "q_norm": sl["q_norm"], "k_norm": sl["k_norm"],
            "q": q(sl["q"], packs["q"]), "k": q(sl["k"], packs["q"]),
            "v": q(sl["v"], packs["q"]), "o": q(sl["o"], packs["o"]),
            "mlp": {"gate": q(sl["mlp"]["gate"], packs["gu"]),
                    "up": q(sl["mlp"]["up"], packs["gu"]),
                    "down": q(sl["mlp"]["down"], packs["dn"])},
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qlayers)
    return fuse_decode_params({"layers": stacked})["layers"]


@pytest.fixture(scope="module")
def q8_setup(setup):
    cfg, model, _ = setup
    packs = dict(q=pack_q8_rows, o=pack_q8_rows, gu=pack_q8_rows,
                 dn=pack_q8_rows)
    return cfg, model, _quantize_layers(model, packs)


def test_fused_stack_q8_matches_quant_path(q8_setup):
    cfg, model, qlyr = q8_setup
    assert fused_layer_q8_supported(qlyr, 1024, 16, 8, 128, 3072, 64)
    assert not fused_layer_supported(qlyr, 1024, 16, 8, 128, 3072, 64)
    Skv = 128
    kc = jax.random.normal(jax.random.PRNGKey(1), (2, 1, Skv, 1024),
                           jnp.bfloat16)
    vc = jax.random.normal(jax.random.PRNGKey(2), (2, 1, Skv, 1024),
                           jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 1024), jnp.bfloat16)
    pos = jnp.asarray(21, jnp.int32)
    cos, sin, cosr, sinr = _rope_rows(model, pos)
    xo, kn, vn = fused_decode_stack_q8(
        x, qlyr, pos, cosr, sinr, kc, vc, window=64,
        eps=cfg.rms_norm_eps, interpret=True)
    xr, kcr, vcr = x, kc, vc
    for i in range(2):
        lp = jax.tree.map(lambda a: a[i], qlyr)
        xr, kcr, vcr, _, _ = model._layer(
            lp, xr, cos, sin, kcr, vcr, jnp.asarray(i, jnp.int32), pos,
            is_prefill=False)
    np.testing.assert_allclose(np.asarray(xo, np.float32).ravel(),
                               np.asarray(xr, np.float32).ravel(),
                               atol=0.1)
    for li in range(2):
        np.testing.assert_allclose(
            np.asarray(kn[li, 0, 21], np.float32),
            np.asarray(kcr[li, 0, 21], np.float32), atol=0.064)
        np.testing.assert_allclose(
            np.asarray(vn[li, 0, 21], np.float32),
            np.asarray(vcr[li, 0, 21], np.float32), atol=0.064)
    np.testing.assert_array_equal(np.asarray(kn[:, :, 30:], np.float32),
                                  np.asarray(kc[:, :, 30:], np.float32))


@pytest.mark.parametrize("packs", [
    dict(q=pack_q4_rows, o=pack_q4_rows, gu=pack_q4_rows, dn=pack_q4_rows),
    dict(q=pack_q8_rows, o=pack_q8_rows, gu=pack_q4_rows, dn=pack_q4_rows),
], ids=["all-q4", "mixed-q8-q4"])
def test_fused_stack_q4_and_mixed_grids(setup, packs):
    """The quant stack kernel serves nibble-packed q4 weights and
    per-tensor q8/q4 mixes (llama.cpp mixes formats per tensor)."""
    cfg, model, _ = setup
    qlyr = _quantize_layers(model, packs)
    assert fused_layer_q8_supported(qlyr, 1024, 16, 8, 128, 3072, 64)
    Skv = 128
    kc = jax.random.normal(jax.random.PRNGKey(1), (2, 1, Skv, 1024),
                           jnp.bfloat16)
    vc = jax.random.normal(jax.random.PRNGKey(2), (2, 1, Skv, 1024),
                           jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 1024), jnp.bfloat16)
    pos = jnp.asarray(21, jnp.int32)
    cos, sin, cosr, sinr = _rope_rows(model, pos)
    xo, kn, vn = fused_decode_stack_q8(
        x, qlyr, pos, cosr, sinr, kc, vc, window=64,
        eps=cfg.rms_norm_eps, interpret=True)
    xr, kcr, vcr = x, kc, vc
    for i in range(2):
        lp = jax.tree.map(lambda a: a[i], qlyr)
        xr, kcr, vcr, _, _ = model._layer(
            lp, xr, cos, sin, kcr, vcr, jnp.asarray(i, jnp.int32), pos,
            is_prefill=False)
    # the kernel quantizes ACTIVATIONS per 128-group (GGML Q8_1 style,
    # same class as the quant_matmul kernels) where the off-TPU reference
    # path dequantizes weights exactly — ~1% relative on top of the q4
    # weight error, so tolerances here are the int8-activation class
    np.testing.assert_allclose(np.asarray(xo, np.float32).ravel(),
                               np.asarray(xr, np.float32).ravel(),
                               atol=0.15)
    for li in range(2):
        np.testing.assert_allclose(
            np.asarray(kn[li, 0, 21], np.float32),
            np.asarray(kcr[li, 0, 21], np.float32), atol=0.15)


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
