"""Qwen3 backbone correctness: decode-with-cache must match full forward,
and numerics must match the HF transformers implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.core import cache as kv
from aha_tpu.core.engine import TextEngine
from aha_tpu.core.sampling import SamplingConfig
from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model

TINY = Qwen3Config(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    tie_word_embeddings=True,
    max_position_embeddings=512,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = Qwen3Model(TINY, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(1))
    return model, params


def full_forward_logits(model, params, ids):
    """Teacher-forced forward over the whole sequence, no padding."""
    cache = model.init_cache(1, len(ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([ids]), cache)
    return model.logits(params, hidden)[0]


def test_incremental_decode_matches_full_forward(tiny_model):
    model, params = tiny_model
    ids = [3, 17, 42, 99, 7, 23]
    ref_logits = full_forward_logits(model, params, ids)

    # prefill on first 3 tokens then decode the rest one-by-one
    cache = model.init_cache(1, 16, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([ids[:3]]), cache)
    cache = kv.advance(cache, 3)
    got = [model.logits(params, hidden)[0, -1]]
    for t, tok in enumerate(ids[3:-1], start=3):
        hidden, cache = model.backbone(params, jnp.asarray([[tok]]), cache)
        cache = kv.advance(cache, 1)
        got.append(model.logits(params, hidden)[0, 0])
    got = jnp.stack(got)
    # fp32 roundoff differs between the S=6 and S=1 fusions and is amplified
    # by rms_norm on tiny random-init activations; a real cache/position bug
    # would produce O(1) errors and different argmaxes.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_logits[2:-1]),
                               atol=5e-3)
    assert jnp.argmax(got, -1).tolist() == jnp.argmax(ref_logits[2:-1], -1).tolist()


def test_prefill_padding_is_invisible(tiny_model):
    model, params = tiny_model
    ids = [5, 9, 2, 77]
    ref = full_forward_logits(model, params, ids)[-1]

    padded = ids + [0] * 4
    cache = model.init_cache(1, 16, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([padded]), cache)
    got = model.logits(params, hidden)[0, len(ids) - 1]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3)
    assert int(jnp.argmax(got)) == int(jnp.argmax(ref))


def test_engine_greedy_deterministic(tiny_model):
    model, params = tiny_model
    engine = TextEngine(model, params, eos_token_ids=[127],
                        cache_dtype=jnp.float32, max_seq_len=256)
    cfg = SamplingConfig(temperature=None)
    out1 = engine.generate_tokens([3, 17, 42], cfg, max_tokens=8)
    out2 = engine.generate_tokens([3, 17, 42], cfg, max_tokens=8)
    assert out1 == out2
    assert 1 <= len(out1) <= 8
    t = engine.last_timing
    assert t.prompt_tokens == 3 and t.completion_tokens >= len(out1)


def test_engine_matches_unpadded_greedy(tiny_model):
    """Greedy generation through the bucketed/padded engine must equal naive
    greedy decoding with exact shapes."""
    model, params = tiny_model
    engine = TextEngine(model, params, eos_token_ids=[],
                        cache_dtype=jnp.float32, max_seq_len=256)
    prompt = [3, 17, 42, 9, 55]
    got = engine.generate_tokens(prompt, SamplingConfig(temperature=None),
                                 max_tokens=6)

    ids = list(prompt)
    for _ in range(6):
        logits = full_forward_logits(model, params, ids)
        ids.append(int(jnp.argmax(logits[-1])))
    assert got == ids[len(prompt):]


def test_engine_repeat_penalty_changes_output(tiny_model):
    model, params = tiny_model
    engine = TextEngine(model, params, eos_token_ids=[],
                        cache_dtype=jnp.float32, max_seq_len=256)
    base = engine.generate_tokens([3, 17, 42], SamplingConfig(), max_tokens=10)
    pen = engine.generate_tokens(
        [3, 17, 42], SamplingConfig(repeat_penalty=5.0), max_tokens=10)
    assert base != pen or len(set(base)) == len(base)


@pytest.mark.parametrize("tie", [True, False])
def test_hf_transformers_parity(tie):
    """Backbone numerics vs HF transformers Qwen3 (torch CPU)."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config as HFConfig
    from transformers.models.qwen3 import Qwen3ForCausalLM

    hf_cfg = HFConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        num_key_value_heads=TINY.num_key_value_heads,
        head_dim=TINY.head_dim,
        tie_word_embeddings=tie,
        rope_theta=TINY.rope_theta,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = Qwen3ForCausalLM(hf_cfg).eval()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    from aha_tpu.io.weights import DictSource

    cfg = Qwen3Config(
        vocab_size=TINY.vocab_size, hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        num_key_value_heads=TINY.num_key_value_heads,
        head_dim=TINY.head_dim, tie_word_embeddings=tie,
    )
    model = Qwen3Model(cfg, max_rope_len=128)
    params = model.load_params(DictSource(sd), dtype=jnp.float32)

    ids = [[1, 5, 9, 100, 42, 7]]
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    got = np.asarray(full_forward_logits(model, params, ids[0]))
    # In float64 this parity is ~3e-7 (weight-quantization noise only); in
    # fp32 the tiny random-init activations make every rms_norm amplify
    # roundoff, so tolerance is loose here while semantics are exact.
    np.testing.assert_allclose(got, ref[0], atol=1e-2)
    assert (np.argmax(got, -1) == np.argmax(ref[0], -1)).mean() > 0.8


def test_fused_decode_params_bit_exact(tiny_model):
    """fuse_decode_params (one [q|k|v] and one [gate|up] matmul per layer —
    the single-device serving default) must not change a single logit:
    column blocks of a matmul are independent, so fused == separate."""
    from aha_tpu.models.qwen3 import fuse_decode_params

    model, params = tiny_model
    fused = fuse_decode_params(params)
    layers = fused["layers"]
    assert "qkv" in layers and "q" not in layers
    assert "gateup" in layers["mlp"] and "gate" not in layers["mlp"]
    # idempotent / quant-layout safe: a second call is a no-op
    assert fuse_decode_params(fused) is fused or "qkv" in fuse_decode_params(fused)["layers"]

    ids = [3, 17, 42, 9, 55, 2, 88]
    ref = full_forward_logits(model, params, ids)
    cache = model.init_cache(1, len(ids), jnp.float32)
    hidden, _ = model.backbone(fused, jnp.asarray([ids]), cache)
    got = model.logits(fused, hidden)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_engine_fuse_toggle_same_tokens(tiny_model, monkeypatch):
    """Greedy tokens are identical with AHA_FUSE_DECODE on and off (the
    engine fuses at init for single-device serving)."""
    model, params = tiny_model
    cfg = SamplingConfig(temperature=None)
    prompt = [3, 17, 42, 9]

    monkeypatch.setenv("AHA_FUSE_DECODE", "0")
    plain = TextEngine(model, params, eos_token_ids=[],
                       cache_dtype=jnp.float32, max_seq_len=256)
    assert "q" in plain.params["layers"]
    t_plain = plain.generate_tokens(prompt, cfg, max_tokens=12)

    monkeypatch.setenv("AHA_FUSE_DECODE", "1")
    fused = TextEngine(model, params, eos_token_ids=[],
                       cache_dtype=jnp.float32, max_seq_len=256)
    assert "qkv" in fused.params["layers"]
    t_fused = fused.generate_tokens(prompt, cfg, max_tokens=12)
    assert t_plain == t_fused
