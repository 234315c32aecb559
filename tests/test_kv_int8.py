"""int8 KV cache: quantized decode must track the bf16/f32 cache closely.

Prefill always attends over the full-precision fresh block; only what later
decode steps READ is quantized, so drift is bounded by int8 row
quantization error."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.core.engine import TextEngine
from aha_tpu.core.sampling import SamplingConfig
from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model
from aha_tpu.ops.attention import quantize_kv_rows

CFG = Qwen3Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, head_dim=16)


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 5, 2, 16)), jnp.float32)
    qx, s = quantize_kv_rows(x)
    assert qx.dtype == jnp.int8 and s.shape == (3, 5, 2)
    deq = qx.astype(jnp.float32) * s[..., None]
    # absmax row scaling: error ≤ scale/2 per element
    err = np.abs(np.asarray(deq - x))
    assert (err <= np.asarray(s)[..., None] * 0.5 + 1e-7).all()


def test_int8_cache_decode_close_to_fp():
    model = Qwen3Model(CFG)
    params = model.init_random(jax.random.PRNGKey(0))
    ids = [(i * 7) % 100 + 1 for i in range(20)]

    def run(dtype):
        c = model.init_cache(1, 64, dtype)
        h, c = model.backbone(params, jnp.asarray([ids]), c)
        c = {**c, "pos": jnp.int32(len(ids))}
        outs = []
        tok = int(jnp.argmax(model.logits(params, h)[0, -1]))
        for _ in range(8):
            h, c = model.backbone(params, jnp.asarray([[tok]]), c)
            c = {**c, "pos": c["pos"] + 1}
            logits = model.logits(params, h)[0, 0]
            outs.append(np.asarray(logits))
            tok = int(jnp.argmax(logits))
        return outs

    fp = run(jnp.float32)
    q8 = run(jnp.int8)
    for a, b in zip(fp, q8):
        # logits drift stays small; greedy tokens equal on this model
        np.testing.assert_allclose(b, a, atol=0.15, rtol=0.05)
        assert int(np.argmax(a)) == int(np.argmax(b))


def test_engine_int8_stream_matches_fp_greedy():
    model = Qwen3Model(CFG)
    params = model.init_random(jax.random.PRNGKey(1))
    g = SamplingConfig(temperature=None)
    prompt = [(i * 13) % 100 + 1 for i in range(24)]
    fp = TextEngine(model, params, eos_token_ids=[], cache_dtype=jnp.float32,
                    max_seq_len=256).generate_tokens(prompt, g, max_tokens=10)
    q8 = TextEngine(model, params, eos_token_ids=[], cache_dtype=jnp.int8,
                    max_seq_len=256).generate_tokens(prompt, g, max_tokens=10)
    assert fp == q8


def test_prefill_at_q8_matches_dequant_reference():
    """attention_prefill_at_q8 == sdpa over explicitly dequantized rows."""
    from aha_tpu.ops.attention import (attention_prefill_at,
                                       attention_prefill_at_q8)

    rng = np.random.default_rng(3)
    L, B, S, Hkv, D, Hq, Sq, start = 2, 1, 32, 2, 16, 4, 8, 20
    k = jnp.asarray(rng.standard_normal((L, B, S, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((L, B, S, Hkv, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, Sq, Hq, D)), jnp.float32)
    qk, ks = quantize_kv_rows(k)       # (L,B,S,Hkv) scales
    qv, vs = quantize_kv_rows(v)
    deq_k = qk.astype(jnp.float32) * ks[..., None]
    deq_v = qv.astype(jnp.float32) * vs[..., None]
    want = attention_prefill_at(q, deq_k, deq_v, jnp.int32(1),
                                jnp.int32(start))
    got = attention_prefill_at_q8(
        q, qk.reshape(L, B, S, Hkv * D), qv.reshape(L, B, S, Hkv * D),
        ks.transpose(0, 1, 3, 2), vs.transpose(0, 1, 3, 2),
        jnp.int32(1), jnp.int32(start))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_engine_int8_prefix_cache_matches_cold():
    """q8 prefix restore: int8 rows + lane-oriented scales snapshot and
    restore; warm (prefix-hit) streams equal a cold int8 engine's."""
    model = Qwen3Model(CFG)
    params = model.init_random(jax.random.PRNGKey(2))
    g = SamplingConfig(temperature=None)
    base = [(i * 13) % 100 + 1 for i in range(40)]
    ext = base + [5, 6, 7, 8]

    cold = TextEngine(model, params, eos_token_ids=[], cache_dtype=jnp.int8,
                      max_seq_len=256)
    warm = TextEngine(model, params, eos_token_ids=[], cache_dtype=jnp.int8,
                      max_seq_len=256, prefix_cache_entries=4)
    assert warm.prefix_cache_entries == 4
    first = warm.generate_tokens(base, g, max_tokens=6)
    assert len(warm._prefix_entries) == 1
    entry = next(iter(warm._prefix_entries._entries.values()))
    assert entry["k"].dtype == jnp.int8 and "k_scale" in entry
    assert warm.generate_tokens(base, g, max_tokens=6) == first  # repeat hit
    got = warm.generate_tokens(ext, g, max_tokens=6)             # extension
    assert got == cold.generate_tokens(ext, g, max_tokens=6)
