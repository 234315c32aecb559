"""GLM-ASR-Nano: token-length formula, splice, decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.core import cache as kvmod
from aha_tpu.models.glm_asr_nano import (
    GlmAsrAudioConfig,
    GlmAsrNanoConfig,
    GlmAsrNanoModel,
    audio_token_length,
)
from aha_tpu.models.llama import LlamaConfig

AUDIO_TOK = 90
TINY = GlmAsrNanoConfig(
    audio=GlmAsrAudioConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, head_dim=16,
        num_mel_bins=128, partial_rotary_factor=0.5),
    text=LlamaConfig(
        vocab_size=100, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=True),
    audio_token_id=AUDIO_TOK)


def test_audio_token_length_formula():
    # full 30s window: 3000 mel frames → 1500 after conv2 → 375 tokens
    assert audio_token_length(3000) == 375
    assert audio_token_length(8) == 1
    assert audio_token_length(100) == 12


@pytest.fixture(scope="module")
def tiny():
    model = GlmAsrNanoModel(TINY, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(11))
    return model, params


def _mm(frames=64, seed=0):
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((1, 128, frames)).astype(np.float32)
    n_tok = audio_token_length(frames)
    gather = np.arange(n_tok, dtype=np.int32)
    return {"mel": jnp.asarray(mel), "gather": jnp.asarray(gather)}, n_tok


def test_splice_and_decode_consistency(tiny):
    model, params = tiny
    mm, n_tok = _mm()
    ids = [1, 2] + [AUDIO_TOK] * n_tok + [3, 4, 5]
    full_ids = ids + [7]

    cache = model.init_cache(1, len(full_ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([full_ids]), cache, mm=mm)
    ref = model.logits(params, hidden)[0]

    cache = model.init_cache(1, 64, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([ids]), cache, mm=mm)
    cache = kvmod.advance(cache, len(ids))
    out0 = model.logits(params, hidden)[0, -1]
    hidden, cache = model.backbone(params, jnp.asarray([[7]]), cache)
    out1 = model.logits(params, hidden)[0, 0]
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref[len(ids) - 1]),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref[len(ids)]),
                               atol=5e-3)


def test_audio_changes_output(tiny):
    model, params = tiny
    mm, n_tok = _mm(seed=1)
    ids = [1] + [AUDIO_TOK] * n_tok + [3]
    cache = model.init_cache(1, 64, jnp.float32)
    h1, _ = model.backbone(params, jnp.asarray([ids]), cache, mm=mm)
    mm2, _ = _mm(seed=2)
    cache = model.init_cache(1, 64, jnp.float32)
    h2, _ = model.backbone(params, jnp.asarray([ids]), cache, mm=mm2)
    assert not np.allclose(np.asarray(h1), np.asarray(h2))
