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


# ---------------------------------------------------------------------------
# flash_decode: dynamic-length single-token decode over a padded KV cache
# ---------------------------------------------------------------------------

from aha_tpu.ops.flash_attention import flash_decode, flash_decode_at_layer


def _decode_case(B, Hq, Hkv, D, S, seed=0, dtype=jnp.float32):
    kq, kk, kv_ = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(kq, (B, 1, Hq, D), dtype)
    k = jax.random.normal(kk, (B, S, Hkv, D), dtype)
    v = jax.random.normal(kv_, (B, S, Hkv, D), dtype)
    return q, k, v


def _masked_ref(q, k, v, pos):
    S = k.shape[1]
    kp = jnp.arange(S)[None, :]
    mask = jnp.where(kp <= pos, 0.0, jnp.finfo(jnp.float32).min)[None, None]
    return sdpa(q, k, v, mask)


@pytest.mark.parametrize("pos", [0, 63, 255, 700, 1023])
def test_flash_decode_lengths(pos):
    """Only rows 0..pos may contribute; padded tail must be invisible."""
    q, k, v = _decode_case(1, 16, 8, 128, 1024)
    got = flash_decode(q, k, v, jnp.int32(pos + 1), interpret=True)
    ref = _masked_ref(q, k, v, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("Hq,Hkv,D", [(4, 4, 128), (8, 2, 128), (12, 2, 64),
                                      (16, 8, 64)])
def test_flash_decode_geometries(Hq, Hkv, D):
    q, k, v = _decode_case(2, Hq, Hkv, D, 512, seed=3)
    pos = jnp.asarray([200, 511], jnp.int32)
    got = flash_decode(q, k, v, pos + 1, interpret=True)
    kp = jnp.arange(512)[None, :]
    mask = jnp.where(kp <= pos[:, None], 0.0,
                     jnp.finfo(jnp.float32).min)[:, None, None, :]
    ref = sdpa(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_decode_padding_invariance():
    """Garbage in the dead cache tail must not change the output."""
    q, k, v = _decode_case(1, 8, 4, 128, 512)
    pos = 100
    k_dirty = k.at[:, pos + 1:].set(1e4)
    v_dirty = v.at[:, pos + 1:].set(-1e4)
    a = flash_decode(q, k, v, jnp.int32(pos + 1), interpret=True)
    b = flash_decode(q, k_dirty, v_dirty, jnp.int32(pos + 1), interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


@pytest.mark.parametrize("layer", [0, 1, 3])
def test_flash_decode_at_layer(layer):
    """Stacked-cache variant must read exactly the addressed layer."""
    L, B, Hq, Hkv, D, S = 4, 1, 16, 8, 128, 512
    kk, kv_, kq = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(kq, (B, 1, Hq, D))
    kc = jax.random.normal(kk, (L, B, S, Hkv, D))
    vc = jax.random.normal(kv_, (L, B, S, Hkv, D))
    pos = 300
    got = flash_decode_at_layer(q, kc, vc, jnp.int32(layer),
                                jnp.int32(pos + 1), interpret=True)
    ref = _masked_ref(q, kc[layer], vc[layer], pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_decode_bf16():
    q, k, v = _decode_case(1, 16, 8, 128, 512, dtype=jnp.bfloat16)
    got = flash_decode(q, k, v, jnp.int32(317), interpret=True)
    ref = _masked_ref(q, k, v, 316)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)


def test_flash_decode_q8_kernel_variants_match_fallback():
    """Both q8 decode kernels (bf16-cast and all-int8 MXU) reproduce the
    XLA dequant fallback in interpret mode, within quantization noise."""
    from aha_tpu.ops.attention import sdpa
    from aha_tpu.ops.flash_attention import flash_decode_at_layer_q8

    L, B, S, Hq, Hkv, D = 2, 1, 512, 4, 2, 64
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.float32)
    # flat int8 rows (L, B, S, Hkv·D) — see core/cache.py
    k_i8 = jnp.asarray(rng.integers(-127, 128, (L, B, S, Hkv * D)), jnp.int8)
    v_i8 = jnp.asarray(rng.integers(-127, 128, (L, B, S, Hkv * D)), jnp.int8)
    ks = jnp.asarray(rng.random((L, B, Hkv, S)) * 0.01 + 0.002, jnp.float32)
    vs = jnp.asarray(rng.random((L, B, Hkv, S)) * 0.01 + 0.002, jnp.float32)
    pos = 300
    layer = jnp.int32(1)

    # XLA reference: dequantize the addressed layer, masked sdpa
    k_deq = (k_i8[1].reshape(B, S, Hkv, D).astype(jnp.float32)
             * ks[1].transpose(0, 2, 1)[..., None])
    v_deq = (v_i8[1].reshape(B, S, Hkv, D).astype(jnp.float32)
             * vs[1].transpose(0, 2, 1)[..., None])
    mask = jnp.where(jnp.arange(S)[None, :] <= pos, 0.0,
                     jnp.finfo(jnp.float32).min)[None, None]
    ref = np.asarray(sdpa(q, k_deq, v_deq, mask))

    for mxu in (False, True):
        got = np.asarray(flash_decode_at_layer_q8(
            q, k_i8, v_i8, ks, vs, layer, jnp.int32(pos + 1),
            block_k=128, interpret=True, mxu=mxu))
        atol = 2e-3 if not mxu else 2e-2   # p-requant noise on the MXU path
        np.testing.assert_allclose(got, ref, atol=atol, rtol=2e-2,
                                   err_msg=f"mxu={mxu}")


def test_flash_decode_flat_batched_matches_per_slot():
    """The B-folded decode kernel (one k/v block carries every slot, grid
    over k-blocks only) is bit-identical to the per-slot-grid kernel for
    ragged per-slot lengths, including slots parked on row 0."""
    from aha_tpu.ops.flash_attention import (
        flash_decode_at_layer_flat, flash_decode_at_layer_flat_batched)

    L, B, S, Hkv, D, Hq = 3, 8, 512, 2, 64, 4
    rng = np.random.default_rng(11)
    k = jnp.asarray(rng.standard_normal((L, B, S, Hkv * D)),
                    jnp.float32).astype(jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((L, B, S, Hkv * D)),
                    jnp.float32).astype(jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)),
                    jnp.float32).astype(jnp.bfloat16)
    valid = jnp.asarray([1, 5, 64, 100, 128, 200, 511, 512], jnp.int32)
    for layer in (0, 2):
        a = flash_decode_at_layer_flat(q, k, v, jnp.int32(layer), valid,
                                       block_k=128, interpret=True)
        b = flash_decode_at_layer_flat_batched(
            q, k, v, jnp.int32(layer), valid, block_k=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
    # scalar valid_len broadcasts across slots
    a = flash_decode_at_layer_flat(q, k, v, jnp.int32(1), jnp.int32(77),
                                   block_k=128, interpret=True)
    b = flash_decode_at_layer_flat_batched(
        q, k, v, jnp.int32(1), jnp.int32(77), block_k=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))


def test_flash_decode_q8_batched_matches_per_slot():
    """The B-folded q8 decode kernel matches the per-slot q8 kernel
    bit-for-bit over ragged per-slot lengths."""
    from aha_tpu.ops.flash_attention import (
        flash_decode_at_layer_q8, flash_decode_at_layer_q8_batched)

    L, B, S, Hkv, D, Hq = 2, 4, 512, 2, 64, 4
    rng = np.random.default_rng(13)
    k_i8 = jnp.asarray(rng.integers(-127, 128, (L, B, S, Hkv * D)), jnp.int8)
    v_i8 = jnp.asarray(rng.integers(-127, 128, (L, B, S, Hkv * D)), jnp.int8)
    ks = jnp.asarray(rng.random((L, B, Hkv, S)) * 0.01 + 0.002, jnp.float32)
    vs = jnp.asarray(rng.random((L, B, Hkv, S)) * 0.01 + 0.002, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.float32)
    valid = jnp.asarray([1, 100, 511, 512], jnp.int32)
    for layer in (0, 1):
        for mxu in (False, True):
            a = flash_decode_at_layer_q8(
                q, k_i8, v_i8, ks, vs, jnp.int32(layer), valid,
                block_k=128, interpret=True, mxu=mxu)
            b = flash_decode_at_layer_q8_batched(
                q, k_i8, v_i8, ks, vs, jnp.int32(layer), valid, block_k=128,
                interpret=True, mxu=mxu)
            if mxu:
                # the MXU kernels requantize p to int8 per block; a 1-ulp
                # exp() rounding difference (XLA fuses the two kernel
                # bodies differently) can shift p_s = max(pw)/127 and with
                # it every rounded p_q, so bit-exactness between the two
                # kernels is not guaranteed — but the divergence is bounded
                # by the requant step (~1e-4 relative), far below any
                # indexing/masking bug.
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-4, atol=1e-5,
                                           err_msg=f"mxu={mxu}")
            else:
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                              err_msg=f"mxu={mxu}")


def test_flash_decode_batched_default_block_odd_batch():
    """Default block_k must divide every power-of-two cache bucket for ANY
    slot count (odd B once produced non-divisor blocks that tripped the
    Skv % block_k assert), and must not exceed the VMEM budget at large
    B*HD (the old 128 floor did)."""
    from aha_tpu.ops.flash_attention import (
        _po2_floor, flash_decode_at_layer_flat,
        flash_decode_at_layer_flat_batched)

    assert _po2_floor(170) == 128
    assert _po2_floor(512) == 512
    assert _po2_floor(3) == 8
    # 16 slots x HD 1024 bf16: budget quotient is 64 rows; no floor above it
    assert _po2_floor(min(512, (2 << 20) // (16 * 1024 * 2))) == 64

    L, B, S, Hkv, D, Hq = 2, 6, 256, 2, 64, 4
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.standard_normal((L, B, S, Hkv * D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, B, S, Hkv * D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.float32)
    valid = jnp.asarray([1, 17, 63, 100, 200, 256], jnp.int32)
    a = flash_decode_at_layer_flat(q, k, v, jnp.int32(1), valid,
                                   block_k=128, interpret=True)
    b = flash_decode_at_layer_flat_batched(q, k, v, jnp.int32(1), valid,
                                           interpret=True)   # default block_k
    # different block sizes reorder the online-softmax accumulation
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-6, atol=2e-6)


def test_fast_argmax_nan_row_degrades_to_valid_id():
    from aha_tpu.core.sampling import fast_argmax

    lg = jnp.full((128,), jnp.nan, jnp.float32)
    assert 0 <= int(fast_argmax(lg)) < 128


@pytest.mark.parametrize("layer", [0, 2])
def test_flash_decode_flat_matches_masked_sdpa(layer):
    """Ground truth for the DEFAULT serving path: the flat-row kernel must
    equal a masked sdpa over the addressed layer (not just match its sibling
    kernels)."""
    from aha_tpu.ops.flash_attention import flash_decode_at_layer_flat

    L, B, S, Hkv, D, Hq = 3, 2, 512, 2, 64, 4
    rng = np.random.default_rng(17)
    kf = jnp.asarray(rng.standard_normal((L, B, S, Hkv * D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((L, B, S, Hkv * D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.float32)
    pos = 300
    got = flash_decode_at_layer_flat(q, kf, vf, jnp.int32(layer),
                                     jnp.int32(pos + 1), block_k=128,
                                     interpret=True)
    ref = _masked_ref(q, kf[layer].reshape(B, S, Hkv, D),
                      vf[layer].reshape(B, S, Hkv, D), pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_decode_static_max_len_window():
    """A static live-window bound (engine-selected per dispatch) shrinks the
    k-grid without changing results, as long as valid_len <= window.  The
    bounded kernel must match both the unbounded kernel and the masked sdpa
    reference, for windows equal to / above the live prefix, and for the
    window == block_k degenerate case."""
    from aha_tpu.ops.flash_attention import flash_decode_at_layer_flat

    L, B, S, Hkv, D, Hq = 3, 2, 1024, 2, 64, 4
    rng = np.random.default_rng(23)
    kf = jnp.asarray(rng.standard_normal((L, B, S, Hkv * D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((L, B, S, Hkv * D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.float32)
    pos = 200                      # live rows: 201 <= 256
    ref = _masked_ref(q, kf[1].reshape(B, S, Hkv, D),
                      vf[1].reshape(B, S, Hkv, D), pos)
    for window in (256, 512, 1024, None):
        got = flash_decode_at_layer_flat(
            q, kf, vf, jnp.int32(1), jnp.int32(pos + 1), block_k=128,
            interpret=True, static_max_len=window)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=str(window))
    # window == block_k with a tiny live prefix
    got = flash_decode_at_layer_flat(
        q, kf, vf, jnp.int32(1), jnp.int32(5), block_k=128,
        interpret=True, static_max_len=128)
    ref5 = _masked_ref(q, kf[1].reshape(B, S, Hkv, D),
                       vf[1].reshape(B, S, Hkv, D), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref5),
                               rtol=2e-5, atol=2e-5)


def test_engine_live_window_selection():
    """The engine's per-dispatch window: smallest bucket covering the rows
    this block can touch, None once it reaches the stream's cache bucket."""
    from aha_tpu.core.engine import TextEngine

    assert TextEngine._live_window(80, 512) == 256
    assert TextEngine._live_window(256, 512) == 256
    assert TextEngine._live_window(257, 512) is None   # == bucket -> no bound
    assert TextEngine._live_window(80, 256) is None
    assert TextEngine._live_window(3000, 16384) == 4096
    assert TextEngine._live_window(17000, 16384) is None


def test_flash_attention_segmented_matches_masked_sdpa():
    """The segment-flash kernel (window/packing attention) reproduces the
    XLA equality-mask sdpa, including ragged S (pad rows seg=-1), multiple
    ragged segments, GQA, and a non-128-multiple head dim (ViT D=80)."""
    from aha_tpu.ops.attention import sdpa
    from aha_tpu.ops.flash_attention import flash_attention_segmented

    rng = np.random.default_rng(17)
    for (S, Hq, Hkv, D, sizes) in (
            (300, 4, 4, 80, [64, 64, 60, 64, 48]),     # ViT-ish, ragged
            (512, 4, 2, 64, [200, 200, 112]),          # GQA, exact blocks
            (640, 2, 2, 128, [640]),                   # one full segment
    ):
        q = jnp.asarray(rng.standard_normal((1, S, Hq, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((1, S, Hkv, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, S, Hkv, D)), jnp.float32)
        assert sum(sizes) == S
        seg = np.repeat(np.arange(len(sizes)), sizes).astype(np.int32)
        mask = jnp.where(seg[:, None] == seg[None, :], 0.0,
                         jnp.finfo(jnp.float32).min)[None, None]
        ref = np.asarray(sdpa(q, k, v, mask))
        got = np.asarray(flash_attention_segmented(
            q, k, v, jnp.asarray(seg), block_q=128, block_k=128,
            interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5,
                                   err_msg=f"S={S} D={D}")
