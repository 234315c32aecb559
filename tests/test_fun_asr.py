"""Fun-ASR-Nano: frontend formulas, FSMN encoder, splice consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.core import cache as kvmod
from aha_tpu.models.fun_asr_nano import (
    FunAsrAdaptorConfig,
    FunAsrEncoderConfig,
    FunAsrNanoConfig,
    FunAsrNanoModel,
    fun_asr_token_length,
)
from aha_tpu.models.qwen3 import Qwen3Config

TINY = FunAsrNanoConfig(
    encoder=FunAsrEncoderConfig(
        output_size=32, attention_heads=2, linear_units=64, num_blocks=2,
        tp_blocks=1, kernel_size=5, n_mels=80, lfr_m=7, lfr_n=6),
    adaptor=FunAsrAdaptorConfig(
        downsample_rate=2, encoder_dim=32, llm_dim=48, ffn_dim=64,
        n_layer=1, attention_heads=4),
    llm=Qwen3Config(
        vocab_size=100, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, tie_word_embeddings=True, max_position_embeddings=512))


def test_kaldi_fbank_and_lfr_shapes():
    from aha_tpu.ops.audio_feats import apply_lfr, kaldi_fbank

    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1
    fb = kaldi_fbank(wav)
    # snip_edges: 1 + (16000-400)//160 = 98 frames
    assert fb.shape == (98, 80)
    lfr = apply_lfr(fb, 7, 6)
    assert lfr.shape == (int(np.ceil(98 / 6)), 560)
    assert np.isfinite(lfr).all()


def test_token_length_formula():
    assert fun_asr_token_length(17) == 3
    assert fun_asr_token_length(100) == 13


@pytest.fixture(scope="module")
def tiny():
    model = FunAsrNanoModel(TINY, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(13))
    return model, params


def _mm(t_lfr=17, bucket=32, seed=0):
    rng = np.random.default_rng(seed)
    speech = np.zeros((1, bucket, 560), np.float32)
    speech[0, :t_lfr] = rng.standard_normal((t_lfr, 560)) * 0.1
    seg = np.full(bucket, -1, np.int32)
    seg[:t_lfr] = 0
    n_tok = fun_asr_token_length(t_lfr)
    return {"speech": jnp.asarray(speech), "seg": jnp.asarray(seg),
            "gather": jnp.asarray(np.arange(n_tok, dtype=np.int32))}, n_tok


def test_splice_decode_consistency(tiny):
    model, params = tiny
    mm, n_tok = _mm()
    head, tail = [1, 2], [3, 4]
    ids = head + [0] * n_tok + tail
    full_ids = ids + [7]
    fmask = np.zeros(len(full_ids), bool)
    fmask[len(head):len(head) + n_tok] = True
    mm_full = dict(mm, fbank_mask=jnp.asarray(fmask))

    cache = model.init_cache(1, len(full_ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([full_ids]), cache,
                               mm=mm_full)
    ref = model.logits(params, hidden)[0]

    mm_pre = dict(mm, fbank_mask=jnp.asarray(fmask[:len(ids)]))
    cache = model.init_cache(1, 32, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([ids]), cache,
                                   mm=mm_pre)
    cache = kvmod.advance(cache, len(ids))
    out0 = model.logits(params, hidden)[0, -1]
    hidden, cache = model.backbone(params, jnp.asarray([[7]]), cache)
    out1 = model.logits(params, hidden)[0, 0]
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref[len(ids) - 1]),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref[len(ids)]),
                               atol=5e-3)


def test_encoder_padding_invariance(tiny):
    model, params = tiny
    mm_a, n_tok = _mm(t_lfr=17, bucket=32)
    mm_b, _ = _mm(t_lfr=17, bucket=64)
    f_a = model.encode_audio(params["audio"], mm_a["speech"], mm_a["seg"])
    f_b = model.encode_audio(params["audio"], mm_b["speech"], mm_b["seg"])
    np.testing.assert_allclose(np.asarray(f_a[:n_tok]),
                               np.asarray(f_b[:n_tok]), rtol=1e-4, atol=1e-4)
