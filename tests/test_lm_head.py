"""Fused head-GEMV+argmax kernel (ops/lm_head.py) vs logits + jnp.argmax,
interpret mode on CPU.  Covers the three head layouts (bf16 dense, int8
grid, nibble q4 grid), ragged vocab tiles, tie-breaking, and the
greedy_token model hook's fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.ops.lm_head import head_argmax
from aha_tpu.ops.quant_matmul import (pack_q4_rows, pack_q8_rows,
                                      quant_matmul_q4_xla, quant_matmul_xla)


def _h(rng, K):
    return jnp.asarray(rng.standard_normal((1, 1, K)), jnp.float32)


def test_dense_head_matches_argmax():
    rng = np.random.default_rng(0)
    K, V = 256, 1000                      # V % any 128-tile != 0: ragged edge
    w = jnp.asarray(rng.standard_normal((K, V)) * 0.1, jnp.float32)
    h = _h(rng, K)
    tok = int(head_argmax({"w": w}, h, interpret=True))
    ref = int(jnp.argmax(h.reshape(1, K) @ w))
    assert tok == ref


def test_dense_head_tie_breaks_first():
    """Equal maxima resolve to the FIRST index, matching jnp.argmax —
    including ties that span vocab tiles."""
    K, V = 128, 512
    w = np.zeros((K, V), np.float32)
    w[0, 37] = 1.0
    w[0, 411] = 1.0                       # same logit, later column
    h = jnp.zeros((1, 1, K), jnp.float32).at[0, 0, 0].set(1.0)
    tok = int(head_argmax({"w": jnp.asarray(w)}, h, interpret=True))
    assert tok == 37


def test_q8_head_matches_xla_argmax():
    rng = np.random.default_rng(1)
    K, V = 1024, 1000
    w = rng.standard_normal((V, K)).astype(np.float32) * 0.1
    p = pack_q8_rows(w)
    p = {k: jnp.asarray(v) for k, v in p.items()}
    h = _h(rng, K)
    tok = int(head_argmax(p, h, interpret=True))
    # reference: the same int8 dequant grid's logits (activation quant is
    # the kernel's only numerics delta; argmax must land on the same token
    # for a spread-out random head)
    ref_logits = quant_matmul_xla(h.reshape(1, K), p["qt"], p["st"])
    assert tok == int(jnp.argmax(ref_logits))


def test_q4_head_matches_xla_argmax():
    rng = np.random.default_rng(2)
    K, V = 1024, 1280
    w = rng.standard_normal((V, K)).astype(np.float32) * 0.1 + 0.02
    p = pack_q4_rows(w)
    p = {k: jnp.asarray(v) for k, v in p.items()}
    h = _h(rng, K)
    tok = int(head_argmax(p, h, interpret=True))
    ref_logits = quant_matmul_q4_xla(h.reshape(1, K), p["q4"], p["s4"],
                                     p["b4"])
    assert tok == int(jnp.argmax(ref_logits))


def test_rejects_unsupported_layouts():
    rng = np.random.default_rng(3)
    h = _h(rng, 64)
    with pytest.raises(ValueError):
        head_argmax({"w": jnp.zeros((64, 128)), "b": jnp.zeros((128,))},
                    h, interpret=True)
    with pytest.raises(ValueError):      # batch > 1
        head_argmax({"w": jnp.zeros((64, 128), jnp.float32)},
                    jnp.zeros((2, 64)), interpret=True)
    with pytest.raises(ValueError):      # int8 K not chunk-aligned
        head_argmax({"qt": jnp.zeros((512, 128), jnp.int8),
                     "st": jnp.zeros((4, 128), jnp.float32)},
                    _h(rng, 512), interpret=True)


def test_greedy_token_hook_falls_back_off_tpu():
    """Off-TPU, Qwen3Model.greedy_token must agree with argmax(logits) —
    the engine's plain-greedy paths call it every decode step."""
    from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model

    cfg = Qwen3Config(vocab_size=128, hidden_size=64, intermediate_size=96,
                      num_hidden_layers=1, num_attention_heads=2,
                      num_key_value_heads=1, head_dim=32,
                      max_position_embeddings=64)
    model = Qwen3Model(cfg, max_rope_len=64)
    params = model.init_random(jax.random.PRNGKey(0))
    hidden = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 64))
    tok = int(model.greedy_token(params, hidden))
    ref = int(jnp.argmax(model.logits(params, hidden)[0, 0]))
    assert tok == ref
