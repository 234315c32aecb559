"""Prompt-prefix KV caching: restored-prefix + suffix prefill must equal a
cold full prefill (greedy streams identical), across exact repeats and
conversation-style prompt extensions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.core.engine import TextEngine
from aha_tpu.core.sampling import SamplingConfig
from aha_tpu.models.llama import LlamaConfig, LlamaModel
from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model

CFG = Qwen3Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, head_dim=16)


@pytest.fixture(scope="module")
def qwen3():
    model = Qwen3Model(CFG)
    return model, model.init_random(jax.random.PRNGKey(0))


def test_suffix_prefill_matches_full(qwen3):
    """backbone(from_cache=True) over a suffix == tail of a full prefill."""
    model, params = qwen3
    ids = [(i * 7) % 100 + 1 for i in range(48)]
    p = 40

    full = model.init_cache(1, 64, jnp.float32)
    h_full, c_full = model.backbone(params, jnp.asarray([ids]), full)

    c = model.init_cache(1, 64, jnp.float32)
    _, c = model.backbone(params, jnp.asarray([ids[:p]]), c)
    c = {**c, "pos": jnp.int32(p)}
    h_suf, c = model.backbone(params, jnp.asarray([ids[p:]]), c,
                              from_cache=True)
    np.testing.assert_allclose(np.asarray(h_suf[0]),
                               np.asarray(h_full[0, p:]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c["k"][:, :, :48]),
                               np.asarray(c_full["k"][:, :, :48]), atol=2e-5)


def _engine(model, params, entries):
    return TextEngine(model, params, eos_token_ids=[],
                      cache_dtype=jnp.float32, max_seq_len=256,
                      prefix_cache_entries=entries)


@pytest.mark.parametrize("family", ["qwen3", "llama"])
def test_prefix_cached_stream_matches_cold(family, qwen3):
    if family == "qwen3":
        model, params = qwen3
    else:
        model = LlamaModel(LlamaConfig(
            vocab_size=128, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256))
        params = model.init_random(jax.random.PRNGKey(1))
    cold = _engine(model, params, 0)
    warm = _engine(model, params, 4)
    g = SamplingConfig(temperature=None)

    base = [(i * 13) % 100 + 1 for i in range(40)]     # ≥ PREFIX_MIN_TOKENS
    ext = base + [5, 6, 7, 8]                          # conversation turn 2

    assert warm.prefix_cache_entries == 4
    first = warm.generate_tokens(base, g, max_tokens=6)
    assert len(warm._prefix_entries) == 1              # stored
    # exact repeat: hits with p = n-1
    again = warm.generate_tokens(base, g, max_tokens=6)
    assert first == again == cold.generate_tokens(base, g, max_tokens=6)
    # extension: hits with p = len(base)
    got = warm.generate_tokens(ext, g, max_tokens=6)
    assert got == cold.generate_tokens(ext, g, max_tokens=6)
    assert len(warm._prefix_entries) == 2


def test_prefix_entries_evict_lru(qwen3):
    model, params = qwen3
    warm = _engine(model, params, 2)
    g = SamplingConfig(temperature=None)
    prompts = [[(i * 17 + j) % 100 + 1 for j in range(36)] for i in range(3)]
    for p in prompts:
        warm.generate_tokens(p, g, max_tokens=2)
    assert len(warm._prefix_entries) == 2
    assert (tuple(prompts[0]), None) not in warm._prefix_entries  # LRU evicted


def test_short_prompts_skip_prefix_cache(qwen3):
    model, params = qwen3
    warm = _engine(model, params, 4)
    g = SamplingConfig(temperature=None)
    short = [1, 2, 3]                                  # < PREFIX_MIN_TOKENS
    a = warm.generate_tokens(short, g, max_tokens=4)
    b = warm.generate_tokens(short, g, max_tokens=4)
    assert a == b


# ---------------------------------------------------------------------------
# Hybrid models: prefix snapshots carry conv/rec rolling state
# ---------------------------------------------------------------------------


def _hybrid(family):
    if family == "lfm2":
        from aha_tpu.models.lfm2 import Lfm2Config, Lfm2Model
        model = Lfm2Model(Lfm2Config(
            vocab_size=120, hidden_size=48, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=256, block_ff_dim=96,
            block_auto_adjust_ff_dim=False,
            layer_types=("conv", "full_attention", "conv",
                         "full_attention")), max_rope_len=256)
        return model, model.init_random(jax.random.PRNGKey(3))
    from aha_tpu.models.qwen3_5 import Qwen3_5Model, Qwen3_5TextConfig
    model = Qwen3_5Model(Qwen3_5TextConfig(
        vocab_size=120, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=10000000.0, partial_rotary_factor=0.25,
        max_position_embeddings=512, full_attention_interval=4,
        linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4), max_rope_len=256)
    return model, model.init_random(jax.random.PRNGKey(9))


@pytest.mark.parametrize("family", ["lfm2", "qwen3_5"])
def test_hybrid_prefix_cached_stream_matches_cold(family):
    """Extension prompts restore K/V AND conv/rec state; exact repeats are
    deliberately not matched (rolling state can't rewind one token) but
    must still stream identically via a fresh prefill."""
    model, params = _hybrid(family)
    assert model.supports_prefix_cache
    cold = _engine(model, params, 0)
    warm = _engine(model, params, 4)
    g = SamplingConfig(temperature=None)

    base = [(i * 13) % 100 + 1 for i in range(40)]     # ≥ PREFIX_MIN_TOKENS
    ext = base + [5, 6, 7, 8]

    first = warm.generate_tokens(base, g, max_tokens=6)
    assert len(warm._prefix_entries) == 1
    entry = next(iter(warm._prefix_entries._entries.values()))
    assert "conv" in entry                             # rolling state stored
    if family == "qwen3_5":
        assert "rec" in entry

    # exact repeat: the state-carrying entry is skipped by match(); the
    # fresh prefill must not be polluted by pooled-cache stale state
    again = warm.generate_tokens(base, g, max_tokens=6)
    assert first == again == cold.generate_tokens(base, g, max_tokens=6)

    # extension: hits with p = len(base), continuing conv/rec at the cut
    got = warm.generate_tokens(ext, g, max_tokens=6)
    assert got == cold.generate_tokens(ext, g, max_tokens=6)
    assert len(warm._prefix_entries) == 2


def test_hybrid_exact_repeat_not_matched():
    from aha_tpu.core.engine import PrefixStore
    model, params = _hybrid("lfm2")
    warm = _engine(model, params, 4)
    g = SamplingConfig(temperature=None)
    base = [(i * 13) % 100 + 1 for i in range(40)]
    warm.generate_tokens(base, g, max_tokens=2)
    store: PrefixStore = warm._prefix_entries
    entry, p = store.match(list(base), None)
    assert entry is None and p == 0                    # no one-token rewind
    entry, p = store.match(list(base) + [5], None)
    assert entry is not None and p == len(base)        # extension still hits


@pytest.mark.parametrize("family", ["lfm2", "qwen3_5"])
def test_pooled_cache_reset_clears_rolling_state(family):
    """A pooled cache reused across requests must hand the next prompt
    zeroed conv/rec state (kv.reset), not the previous request's."""
    import aha_tpu.core.cache as kv

    model, params = _hybrid(family)
    cache = model.init_cache(1, 64, jnp.float32)
    polluted = {**cache,
                "conv": cache["conv"] + 1.0,
                "pos": jnp.int32(17)}
    if "rec" in cache:
        polluted["rec"] = cache["rec"] + 1.0
    out = kv.reset(polluted)
    assert int(out["pos"]) == 0
    assert float(jnp.abs(out["conv"]).max()) == 0.0
    if "rec" in out:
        assert float(jnp.abs(out["rec"]).max()) == 0.0

    # end-to-end: request B on an engine whose pool holds request A's cache
    eng = _engine(model, params, 0)
    g = SamplingConfig(temperature=None)
    prompt_a = [(i * 7) % 100 + 1 for i in range(20)]
    prompt_b = [(i * 11) % 100 + 1 for i in range(20)]
    fresh = _engine(model, params, 0).generate_tokens(prompt_b, g,
                                                      max_tokens=6)
    eng.generate_tokens(prompt_a, g, max_tokens=6)     # pollutes the pool
    assert eng.generate_tokens(prompt_b, g, max_tokens=6) == fresh


# ---------------------------------------------------------------------------
# Block decode (multi-token decode per dispatch)
# ---------------------------------------------------------------------------


def test_block_decode_matches_per_token(qwen3):
    model, params = qwen3
    g = SamplingConfig(temperature=None)
    prompt = [(i * 13) % 100 + 1 for i in range(10)]
    base = TextEngine(model, params, eos_token_ids=[],
                      cache_dtype=jnp.float32, max_seq_len=256)
    want = base.generate_tokens(prompt, g, max_tokens=23)
    blk = TextEngine(model, params, eos_token_ids=[],
                     cache_dtype=jnp.float32, max_seq_len=256, decode_block=4)
    got = blk.generate_tokens(prompt, g, max_tokens=23)   # 5 blocks + tail
    assert got == want
    assert blk.last_timing.completion_tokens == 23


def test_block_decode_eos_mid_block(qwen3):
    model, params = qwen3
    g = SamplingConfig(temperature=None)
    prompt = [1, 2, 3]
    base = TextEngine(model, params, eos_token_ids=[],
                      cache_dtype=jnp.float32, max_seq_len=256)
    probe = base.generate_tokens(prompt, g, max_tokens=12)
    eos = probe[5]                       # lands mid-block for block=4
    want = probe[:probe.index(eos) + 1]
    blk = TextEngine(model, params, eos_token_ids=[eos],
                     cache_dtype=jnp.float32, max_seq_len=256, decode_block=4)
    got = list(blk.stream_tokens(prompt, g, max_tokens=12))
    assert got == want


def test_block_decode_sampled_stream_deterministic(qwen3):
    model, params = qwen3
    g = SamplingConfig(temperature=0.9, top_k=20, seed=7)
    prompt = [4, 5, 6, 7]
    blk = TextEngine(model, params, eos_token_ids=[],
                     cache_dtype=jnp.float32, max_seq_len=256, decode_block=4)
    a = blk.generate_tokens(prompt, g, max_tokens=9)
    b = blk.generate_tokens(prompt, g, max_tokens=9)
    assert a == b and len(a) == 9
