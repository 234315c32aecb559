"""Building blocks: GPT-2 backbone (HF parity) and BigVGAN vocoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.core import cache as kvmod
from aha_tpu.models.bigvgan import BigVGAN, BigVGANConfig
from aha_tpu.models.gpt2 import GPT2Config, GPT2Model

GPT2_TINY = GPT2Config(vocab_size=120, n_positions=64, n_embd=48,
                       n_layer=2, n_head=4)


def test_gpt2_hf_parity():
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config as HFConfig, GPT2LMHeadModel

    hf_cfg = HFConfig(vocab_size=120, n_positions=64, n_embd=48, n_layer=2,
                      n_head=4, resid_pdrop=0.0, embd_pdrop=0.0,
                      attn_pdrop=0.0)
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(hf_cfg).eval()
    sd = {k.replace("transformer.", ""): v.detach().numpy()
          for k, v in hf.state_dict().items()}
    from aha_tpu.io.weights import DictSource

    model = GPT2Model(GPT2_TINY)
    params = model.load_params(DictSource(sd), dtype=jnp.float32)
    ids = [[1, 5, 9, 100, 42, 7]]
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()[0]
    cache = model.init_cache(1, 6, jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray(ids), cache)
    got = np.asarray(model.logits(params, hidden)[0])
    np.testing.assert_allclose(got, ref, atol=1e-2)
    assert (np.argmax(got, -1) == np.argmax(ref, -1)).all()


def test_gpt2_incremental_decode():
    model = GPT2Model(GPT2_TINY)
    params = model.init_random(jax.random.PRNGKey(1))
    ids = [3, 17, 42, 9, 5]
    cache = model.init_cache(1, len(ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([ids]), cache)
    ref = model.logits(params, hidden)[0]

    cache = model.init_cache(1, 16, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([ids[:3]]), cache)
    cache = kvmod.advance(cache, 3)
    outs = [model.logits(params, hidden)[0, -1]]
    for tok in ids[3:-1]:
        hidden, cache = model.backbone(params, jnp.asarray([[tok]]), cache)
        cache = kvmod.advance(cache, 1)
        outs.append(model.logits(params, hidden)[0, 0])
    got = jnp.stack(outs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[2:-1]),
                               atol=5e-3)


BIGVGAN_TINY = BigVGANConfig(
    num_mels=16, upsample_initial_channel=32,
    upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),))


def test_bigvgan_shapes_and_range():
    model = BigVGAN(BIGVGAN_TINY)
    params = model.init_random(jax.random.PRNGKey(2))
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 16, 20)).astype(np.float32))
    wav = model(params, mel)
    # total upsampling 4*2 = 8x
    assert wav.shape == (1, 1, 160)
    assert float(jnp.abs(wav).max()) <= 1.0


def test_bigvgan_upsample_is_lowpass_interp():
    """The anti-aliased 2x upsampler must preserve a DC signal."""
    from aha_tpu.models.bigvgan import _upsample2

    model = BigVGAN(BIGVGAN_TINY)
    params = model.init_random(jax.random.PRNGKey(2))
    filt = params["resblocks"][0]["acts"][0]["up_filter"]
    x = jnp.ones((1, 3, 32))
    y = _upsample2(x, filt)
    assert y.shape == (1, 3, 64)
    mid = np.asarray(y)[0, 0, 8:-8]
    np.testing.assert_allclose(mid, 1.0, atol=0.05)


def test_snake_beta():
    from aha_tpu.models.bigvgan import snake_beta

    x = jnp.asarray(np.linspace(-2, 2, 11, dtype=np.float32))[None, None, :]
    x = jnp.broadcast_to(x, (1, 2, 11))
    alpha = jnp.zeros(2)
    beta = jnp.zeros(2)
    y = np.asarray(snake_beta(x, alpha, beta))
    ref = np.asarray(x) + np.sin(np.asarray(x)) ** 2 / (1 + 1e-9)
    np.testing.assert_allclose(y, ref, atol=1e-6)
