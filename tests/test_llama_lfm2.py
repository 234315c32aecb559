"""Llama-variant and LFM2 backbones: decode-with-cache consistency and HF
parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.core import cache as kvmod
from aha_tpu.io.weights import DictSource
from aha_tpu.models.lfm2 import Lfm2Config, Lfm2Model
from aha_tpu.models.llama import LlamaConfig, LlamaModel


def full_logits(model, params, ids):
    cache = model.init_cache(1, len(ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([ids]), cache,
                               prompt_len=jnp.int32(len(ids)))
    return model.logits(params, hidden)[0]


def incremental_logits(model, params, ids, split, cache_len=32):
    cache = model.init_cache(1, cache_len, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([ids[:split]]), cache,
                                   prompt_len=jnp.int32(split))
    cache = kvmod.advance(cache, split)
    outs = [model.logits(params, hidden)[0, -1]]
    for tok in ids[split:-1]:
        hidden, cache = model.backbone(params, jnp.asarray([[tok]]), cache)
        cache = kvmod.advance(cache, 1)
        outs.append(model.logits(params, hidden)[0, 0])
    return jnp.stack(outs)


LLAMA_TINY = LlamaConfig(
    vocab_size=120, hidden_size=48, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=256)

MINICPM_TINY = LlamaConfig(
    vocab_size=120, hidden_size=48, intermediate_size=96,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=64, scale_emb=12.0, scale_depth=1.4,
    dim_model_base=16,
    rope_scaling={"short_factor": [1.0] * 6, "long_factor": [2.0] * 6,
                  "original_max_position_embeddings": 32})

LFM2_TINY = Lfm2Config(
    vocab_size=120, hidden_size=48, num_hidden_layers=4,
    num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=256, block_ff_dim=96,
    block_auto_adjust_ff_dim=False,
    layer_types=("conv", "full_attention", "conv", "full_attention"))


@pytest.mark.parametrize("cfg", [LLAMA_TINY, MINICPM_TINY],
                         ids=["llama", "minicpm4"])
def test_llama_incremental_matches_full(cfg):
    model = LlamaModel(cfg, max_rope_len=64)
    params = model.init_random(jax.random.PRNGKey(2))
    ids = [3, 17, 42, 9, 5, 27, 31]
    ref = full_logits(model, params, ids)
    got = incremental_logits(model, params, ids, split=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[2:-1]),
                               atol=5e-3)
    assert jnp.argmax(got, -1).tolist() == jnp.argmax(ref[2:-1], -1).tolist()


def test_lfm2_incremental_matches_full():
    model = Lfm2Model(LFM2_TINY, max_rope_len=64)
    params = model.init_random(jax.random.PRNGKey(4))
    ids = [3, 17, 42, 9, 5, 27, 31, 8]
    ref = full_logits(model, params, ids)
    got = incremental_logits(model, params, ids, split=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[3:-1]),
                               atol=5e-3)
    assert jnp.argmax(got, -1).tolist() == jnp.argmax(ref[3:-1], -1).tolist()


def test_lfm2_short_prompt_conv_state():
    """Prompt shorter than conv_L_cache exercises the zero-padded state."""
    model = Lfm2Model(LFM2_TINY, max_rope_len=64)
    params = model.init_random(jax.random.PRNGKey(4))
    ids = [3, 17, 42, 9, 5]
    ref = full_logits(model, params, ids)
    got = incremental_logits(model, params, ids, split=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[1:-1]),
                               atol=5e-3)


def test_lfm2_padded_prefill():
    """Right-padded prefill must produce the same last-token logits and a
    correct conv state for subsequent decode."""
    model = Lfm2Model(LFM2_TINY, max_rope_len=64)
    params = model.init_random(jax.random.PRNGKey(4))
    ids = [3, 17, 42, 9, 5, 27]
    ref = full_logits(model, params, ids + [31])

    padded = ids + [0] * 6
    cache = model.init_cache(1, 32, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([padded]), cache,
                                   prompt_len=jnp.int32(len(ids)))
    got_last = model.logits(params, hidden)[0, len(ids) - 1]
    np.testing.assert_allclose(np.asarray(got_last), np.asarray(ref[len(ids) - 1]),
                               atol=5e-3)
    # decode one step from the padded prefill state
    cache = kvmod.advance(cache, len(ids))
    hidden, cache = model.backbone(params, jnp.asarray([[31]]), cache)
    got = model.logits(params, hidden)[0, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[len(ids)]),
                               atol=5e-3)


def test_lfm2_hf_parity():
    torch = pytest.importorskip("torch")
    from transformers import Lfm2Config as HFConfig
    from transformers.models.lfm2 import Lfm2ForCausalLM

    hf_cfg = HFConfig(
        vocab_size=120, hidden_size=48, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=96, block_auto_adjust_ff_dim=False,
        layer_types=["conv", "full_attention", "conv", "full_attention"],
        norm_eps=1e-5, rope_theta=1000000.0)
    torch.manual_seed(0)
    hf = Lfm2ForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    model = Lfm2Model(LFM2_TINY, max_rope_len=64)
    params = model.load_params(DictSource(sd), dtype=jnp.float32)
    ids = [[1, 5, 9, 100, 42, 7]]
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    got = np.asarray(full_logits(model, params, ids[0]))
    np.testing.assert_allclose(got, ref[0], atol=1e-2)
    assert (np.argmax(got, -1) == np.argmax(ref[0], -1)).mean() > 0.8


def test_minicpm_scalings_affect_output():
    base = LlamaModel(LLAMA_TINY, max_rope_len=64)
    scaled = LlamaModel(MINICPM_TINY, max_rope_len=64)
    params = base.init_random(jax.random.PRNGKey(2))
    ids = [3, 17, 42]
    a = full_logits(base, params, ids)
    b = full_logits(scaled, params, ids)
    assert not np.allclose(np.asarray(a), np.asarray(b))
