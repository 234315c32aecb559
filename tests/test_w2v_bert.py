"""W2V-BERT 2.0 conformer encoder: HF full-model parity + padding
invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.io.weights import DictSource
from aha_tpu.models.w2v_bert import W2VBertConfig, W2VBertModel

TINY = W2VBertConfig(
    feature_projection_input_dim=24, hidden_size=32, output_hidden_size=32,
    num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
    position_embeddings_type="relative_key",
    left_max_position_embeddings=8, right_max_position_embeddings=4,
    conv_depthwise_kernel_size=7)


def _hf_tiny(torch):
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    cfg = Wav2Vec2BertConfig(
        feature_projection_input_dim=24, hidden_size=32,
        output_hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, position_embeddings_type="relative_key",
        left_max_position_embeddings=8, right_max_position_embeddings=4,
        conv_depthwise_kernel_size=7, hidden_act="swish",
        attention_dropout=0.0, hidden_dropout=0.0, feat_proj_dropout=0.0,
        activation_dropout=0.0, conformer_conv_dropout=0.0,
        add_adapter=False, mask_time_prob=0.0, mask_feature_prob=0.0)
    torch.manual_seed(0)
    return Wav2Vec2BertModel(cfg).eval()


def test_full_model_parity_with_hf():
    torch = pytest.importorskip("torch")
    hf = _hf_tiny(torch)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    model = W2VBertModel(TINY)
    params = model.load_params(DictSource(sd), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 12, 24)).astype(np.float32)
    with torch.no_grad():
        ref = hf(input_features=torch.tensor(feats)).last_hidden_state.numpy()
    got, _ = model.forward(params, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-4)


def test_layer_tap():
    model = W2VBertModel(TINY)
    params = model.init_random(jax.random.PRNGKey(1))
    feats = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 8, 24)).astype(np.float32))
    out, tap = model.forward(params, feats, layer_id=1)
    assert tap is not None and tap.shape == out.shape
    # tap is the INPUT of layer 1, not the output
    out0, _ = model.forward(params, feats, layer_id=0)
    assert not np.allclose(np.asarray(tap), np.asarray(out))


def test_padding_invariance():
    torch = pytest.importorskip("torch")
    hf = _hf_tiny(torch)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    model = W2VBertModel(TINY)
    params = model.load_params(DictSource(sd), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((1, 10, 24)).astype(np.float32)
    padded = np.zeros((1, 16, 24), np.float32)
    padded[:, :10] = feats
    out_a, _ = model.forward(params, jnp.asarray(feats))
    out_b, _ = model.forward(params, jnp.asarray(padded),
                             valid_len=jnp.asarray([10]))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b[:, :10]),
                               rtol=1e-4, atol=1e-5)
