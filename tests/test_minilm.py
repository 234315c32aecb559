"""BERT/MiniLM parity vs HF transformers, plus pooling behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.io.weights import DictSource
from aha_tpu.models.minilm import BertConfig, BertModel

TINY = BertConfig(
    vocab_size=100,
    hidden_size=48,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=96,
    max_position_embeddings=64,
)


def test_embed_is_unit_norm():
    model = BertModel(TINY)
    params = model.init_random(jax.random.PRNGKey(0))
    ids = jnp.asarray([[1, 2, 3, 0, 0], [4, 5, 6, 7, 8]])
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]])
    emb = model.embed(params, ids, mask)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1),
                               [1.0, 1.0], rtol=1e-5)


def test_padding_does_not_change_embedding():
    model = BertModel(TINY)
    params = model.init_random(jax.random.PRNGKey(0))
    short = model.embed(params, jnp.asarray([[1, 2, 3]]), jnp.asarray([[1, 1, 1]]))
    padded = model.embed(params, jnp.asarray([[1, 2, 3, 0, 0, 0]]),
                         jnp.asarray([[1, 1, 1, 0, 0, 0]]))
    np.testing.assert_allclose(np.asarray(short), np.asarray(padded),
                               rtol=1e-5, atol=1e-6)


def test_hf_transformers_parity():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFConfig, BertModel as HFBert

    hf_cfg = HFConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_hidden_layers,
        num_attention_heads=TINY.num_attention_heads,
        intermediate_size=TINY.intermediate_size,
        max_position_embeddings=TINY.max_position_embeddings,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = HFBert(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    model = BertModel(TINY)
    params = model.load_params(DictSource(sd))

    ids = [[2, 7, 11, 3, 0, 0], [2, 9, 5, 8, 14, 3]]
    mask = [[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]]
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    got = np.asarray(model.encode(params, jnp.asarray(ids), jnp.asarray(mask)))
    # padded rows differ (HF computes them; values are irrelevant) — compare
    # valid positions only.  Tolerance: with random-init weights activations
    # are ~0.02, so each LayerNorm divides by a tiny std and amplifies fp32
    # roundoff ~50×; 1e-3 on the O(1) post-LN outputs is pure roundoff.
    np.testing.assert_allclose(got[0, :4], ref[0, :4], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got[1], ref[1], rtol=1e-3, atol=1e-3)
