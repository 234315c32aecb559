import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core.sampling import (
    SamplingConfig,
    apply_repeat_penalty,
    sample_token,
)


def test_greedy():
    logits = jnp.asarray([0.1, 2.0, -1.0, 1.9])
    cfg = SamplingConfig(temperature=None)
    tok = sample_token(logits, jax.random.PRNGKey(0), cfg)
    assert int(tok) == 1
    # temperature below the reference's 1e-7 threshold is also greedy
    cfg = SamplingConfig(temperature=1e-9)
    assert int(sample_token(logits, jax.random.PRNGKey(0), cfg)) == 1


def test_top_k_restricts_support():
    logits = jnp.asarray([5.0, 4.0, 3.0, -10.0, -10.0])
    cfg = SamplingConfig(temperature=1.0, top_k=2)
    toks = {
        int(sample_token(logits, jax.random.PRNGKey(i), cfg))
        for i in range(50)
    }
    assert toks <= {0, 1}


def test_top_p_keeps_head():
    logits = jnp.asarray([10.0, 0.0, 0.0, 0.0])
    cfg = SamplingConfig(temperature=1.0, top_p=0.5)
    toks = {
        int(sample_token(logits, jax.random.PRNGKey(i), cfg))
        for i in range(20)
    }
    assert toks == {0}


def test_repeat_penalty_matches_reference_semantics():
    # candle apply_repeat_penalty: positive logits /= p, negative *= p
    logits = jnp.asarray([2.0, -2.0, 1.0, 3.0])
    recent = jnp.asarray([0, 1], dtype=jnp.int32)
    out = apply_repeat_penalty(logits, recent, jnp.int32(2), 2.0)
    np.testing.assert_allclose(np.asarray(out), [1.0, -4.0, 1.0, 3.0])


def test_repeat_penalty_window_validity():
    logits = jnp.asarray([2.0, 2.0, 2.0])
    recent = jnp.asarray([1, 2, 0, 0], dtype=jnp.int32)
    # only first 2 slots valid -> token 0 unpenalized
    out = apply_repeat_penalty(logits, recent, jnp.int32(2), 2.0)
    np.testing.assert_allclose(np.asarray(out), [2.0, 1.0, 1.0])


def test_sampled_distribution_tracks_temperature():
    logits = jnp.asarray([1.0, 1.0, 1.0, 8.0])
    cfg = SamplingConfig(temperature=0.05)
    toks = [int(sample_token(logits, jax.random.PRNGKey(i), cfg)) for i in range(30)]
    assert all(t == 3 for t in toks)
