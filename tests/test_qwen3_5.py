"""Qwen3.5 GatedDeltaNet: delta-rule parity vs HF qwen3_next reference
implementations, prefill/decode consistency, padded-prefill invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.core import cache as kvmod
from aha_tpu.models.qwen3_5 import (
    Qwen3_5Model,
    Qwen3_5TextConfig,
    chunk_gated_delta_rule,
    recurrent_gated_delta_rule,
    _l2norm,
)

TINY = Qwen3_5TextConfig(
    vocab_size=120, hidden_size=64, intermediate_size=128,
    num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, rope_theta=10000000.0, partial_rotary_factor=0.25,
    max_position_embeddings=512, full_attention_interval=4,
    linear_num_value_heads=4, linear_num_key_heads=2,
    linear_key_head_dim=16, linear_value_head_dim=16,
    linear_conv_kernel_dim=4)


def _rand_inputs(B=1, S=100, H=4, Dk=16, Dv=16, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((B, S, H, Dk)).astype(np.float32)
    k = rng.standard_normal((B, S, H, Dk)).astype(np.float32)
    v = rng.standard_normal((B, S, H, Dv)).astype(np.float32)
    g = -np.abs(rng.standard_normal((B, S, H))).astype(np.float32) * 0.1
    beta = (1 / (1 + np.exp(-rng.standard_normal((B, S, H))))).astype(
        np.float32)
    return q, k, v, g, beta


def test_chunk_rule_matches_hf_reference():
    torch = pytest.importorskip("torch")
    from transformers.models.qwen3_next.modeling_qwen3_next import (
        torch_chunk_gated_delta_rule,
    )

    q, k, v, g, beta = _rand_inputs(S=100)
    ref = torch_chunk_gated_delta_rule(
        torch.tensor(q), torch.tensor(k), torch.tensor(v), torch.tensor(g),
        torch.tensor(beta), chunk_size=64, use_qk_l2norm_in_kernel=True)
    if isinstance(ref, tuple):
        ref = ref[0]
    B, S, H, Dk = q.shape
    state0 = jnp.zeros((B, H, Dk, v.shape[-1]), jnp.float32)
    got, _ = chunk_gated_delta_rule(
        _l2norm(jnp.asarray(q)), _l2norm(jnp.asarray(k)), jnp.asarray(v),
        jnp.asarray(g), jnp.asarray(beta), state0)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_recurrent_rule_matches_hf_reference():
    torch = pytest.importorskip("torch")
    from transformers.models.qwen3_next.modeling_qwen3_next import (
        torch_recurrent_gated_delta_rule,
    )

    q, k, v, g, beta = _rand_inputs(S=6, seed=3)
    B, S, H, Dk = q.shape
    ref = torch_recurrent_gated_delta_rule(
        torch.tensor(q), torch.tensor(k), torch.tensor(v), torch.tensor(g),
        torch.tensor(beta), initial_state=None, output_final_state=False,
        use_qk_l2norm_in_kernel=True)
    if isinstance(ref, tuple):
        ref = ref[0]
    state = jnp.zeros((B, H, Dk, v.shape[-1]), jnp.float32)
    outs = []
    for t in range(S):
        o, state = recurrent_gated_delta_rule(
            _l2norm(jnp.asarray(q[:, t:t + 1])),
            _l2norm(jnp.asarray(k[:, t:t + 1])),
            jnp.asarray(v[:, t:t + 1]), jnp.asarray(g[:, t:t + 1]),
            jnp.asarray(beta[:, t:t + 1]), state)
        outs.append(o)
    got = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_chunk_then_recurrent_consistent():
    """Chunked prefill state must continue correctly into recurrent decode."""
    q, k, v, g, beta = _rand_inputs(S=80, seed=5)
    B, S, H, Dk = q.shape
    state0 = jnp.zeros((B, H, Dk, v.shape[-1]), jnp.float32)
    qn, kn = _l2norm(jnp.asarray(q)), _l2norm(jnp.asarray(k))
    full, _ = chunk_gated_delta_rule(qn, kn, jnp.asarray(v), jnp.asarray(g),
                                     jnp.asarray(beta), state0)

    split = 70
    head, state = chunk_gated_delta_rule(
        qn[:, :split], kn[:, :split], jnp.asarray(v[:, :split]),
        jnp.asarray(g[:, :split]), jnp.asarray(beta[:, :split]), state0)
    outs = [head]
    for t in range(split, S):
        o, state = recurrent_gated_delta_rule(
            qn[:, t:t + 1], kn[:, t:t + 1], jnp.asarray(v[:, t:t + 1]),
            jnp.asarray(g[:, t:t + 1]), jnp.asarray(beta[:, t:t + 1]), state)
        outs.append(o)
    got = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                               rtol=1e-3, atol=1e-3)


@pytest.fixture(scope="module")
def tiny_model():
    model = Qwen3_5Model(TINY, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(9))
    return model, params


def full_logits(model, params, ids):
    cache = model.init_cache(1, max(len(ids), 8), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([ids]), cache,
                               prompt_len=jnp.int32(len(ids)))
    return model.logits(params, hidden)[0]


def test_incremental_decode_matches_full(tiny_model):
    model, params = tiny_model
    ids = [3, 17, 42, 9, 5, 27, 31, 8, 11, 2]
    ref = full_logits(model, params, ids)

    split = 6
    cache = model.init_cache(1, 32, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([ids[:split]]), cache,
                                   prompt_len=jnp.int32(split))
    cache = kvmod.advance(cache, split)
    outs = [model.logits(params, hidden)[0, -1]]
    for tok in ids[split:-1]:
        hidden, cache = model.backbone(params, jnp.asarray([[tok]]), cache)
        cache = kvmod.advance(cache, 1)
        outs.append(model.logits(params, hidden)[0, 0])
    got = jnp.stack(outs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[split - 1:-1]),
                               atol=5e-3)
    assert jnp.argmax(got, -1).tolist() == \
        jnp.argmax(ref[split - 1:-1], -1).tolist()


def test_padded_prefill_state_invariance(tiny_model):
    """Right-padded prefill must leave conv + recurrent state identical to
    exact-length prefill (padded positions are no-ops)."""
    model, params = tiny_model
    ids = [3, 17, 42, 9, 5, 27]
    cache_a = model.init_cache(1, 32, jnp.float32)
    _, cache_a = model.backbone(params, jnp.asarray([ids]), cache_a,
                                prompt_len=jnp.int32(len(ids)))
    padded = ids + [0] * 10
    cache_b = model.init_cache(1, 32, jnp.float32)
    hidden_b, cache_b = model.backbone(params, jnp.asarray([padded]), cache_b,
                                       prompt_len=jnp.int32(len(ids)))
    np.testing.assert_allclose(np.asarray(cache_a["rec"]),
                               np.asarray(cache_b["rec"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache_a["conv"]),
                               np.asarray(cache_b["conv"]),
                               rtol=1e-4, atol=1e-5)
    # and decoding from the padded cache matches the exact continuation
    ref = full_logits(model, params, ids + [31])
    cache_b = kvmod.advance(cache_b, len(ids))
    hidden, _ = model.backbone(params, jnp.asarray([[31]]), cache_b)
    got = model.logits(params, hidden)[0, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[len(ids)]),
                               atol=5e-3)


def test_engine_generates(tiny_model):
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig

    model, params = tiny_model
    engine = TextEngine(model, params, eos_token_ids=[],
                        cache_dtype=jnp.float32, max_seq_len=256)
    out = engine.generate_tokens([3, 17, 42], SamplingConfig(), max_tokens=8)
    assert len(out) == 8
    out2 = engine.generate_tokens([3, 17, 42], SamplingConfig(), max_tokens=8)
    assert out == out2
