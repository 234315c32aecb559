"""Qwen3 served models: chat LLM, embedding, reranker.

Parity targets:
- chat: src/models/qwen3/generate.rs (generation_config defaults for
  temperature/top_p/top_k, chat template with enable_thinking defaulting to
  false, <think> stream routing via the shared GenerateModel base)
- embedding: src/models/qwen3_embedding/mod.rs (last-token hidden, L2)
- reranker: src/models/qwen3_reranker/mod.rs (cosine similarity of
  query/doc embeddings)
"""

from __future__ import annotations

import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core.engine import bucket_for
from aha_tpu.core.tokenizer import TokenizerModel
from aha_tpu.models.base import LoadedModel
from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model
from aha_tpu.models.text_served import TextChatModel
from aha_tpu.registry import ModelEntry
from aha_tpu.utils.device import get_dtype


class Qwen3Chat(TextChatModel):
    """Text chat for the Qwen3 family (src/models/qwen3/generate.rs)."""

    @classmethod
    def load(cls, entry: ModelEntry, path: str, max_seq_len: int = 8192,
             **kw) -> "Qwen3Chat":
        from aha_tpu.io.weights import open_weights

        def build(path, max_seq_len):
            dtype = get_dtype()
            config = Qwen3Config.from_file(path)
            model = Qwen3Model(config, max_rope_len=max_seq_len)
            return model, model.load_params(open_weights(path), dtype=dtype)

        return super().load(entry, path, build, max_seq_len=max_seq_len,
                            tp=kw.get("tp", 1), dp=kw.get("dp", 1),
                            batch_slots=kw.get("batch_slots", 1),
                            prefix_cache=kw.get("prefix_cache", 4),
                            spec_tokens=kw.get("spec_tokens", 0))


class Qwen3EmbeddingServed(LoadedModel):
    def __init__(self, entry: ModelEntry, model: Qwen3Model, params,
                 tokenizer: TokenizerModel):
        super().__init__(entry)
        self.model = model
        self.params = params
        self.tokenizer = tokenizer

        @jax.jit
        def _embed(params, ids, valid_len):
            hidden = model.forward_hidden(params, ids)
            last = jax.vmap(
                lambda h, n: jax.lax.dynamic_slice_in_dim(h, n - 1, 1, 0)[0]
            )(hidden, valid_len)
            last = last.astype(jnp.float32)
            return last / jnp.maximum(
                jnp.linalg.norm(last, axis=-1, keepdims=True), 1e-12)

        self._embed = _embed

    @classmethod
    def load(cls, entry: ModelEntry, path: str, **kw) -> "Qwen3EmbeddingServed":
        from aha_tpu.io.weights import open_weights
        from aha_tpu.parallel.mesh import shard_for_serving

        dtype = get_dtype()
        config = Qwen3Config.from_file(path)
        model = Qwen3Model(config, max_rope_len=8192)
        params = model.load_params(open_weights(path), dtype=dtype)
        # embeddings have no KV cache: TP is just sharded params under the
        # same jitted forward (the 4B/8B embedding checkpoints are the
        # multi-chip case)
        params, _, _ = shard_for_serving(model, params, tp=kw.get("tp", 1))
        return cls(entry, model, params, TokenizerModel.init(path))

    def embed_one_array(self, text: str) -> np.ndarray:
        ids = self.tokenizer.encode(text)
        if not ids:
            raise ValueError("embedding tokenized input cannot be empty")
        blen = bucket_for(len(ids))
        arr = np.zeros((1, blen), np.int32)
        arr[0, :len(ids)] = ids
        out = self._embed(self.params, jnp.asarray(arr),
                          jnp.asarray([len(ids)], jnp.int32))
        return np.asarray(out[0], np.float32)

    def embedding(self, texts: list[str]) -> list[list[float]]:
        if not texts:
            raise ValueError("embedding input cannot be empty")
        return [self.embed_one_array(t).tolist() for t in texts]


class Qwen3RerankerServed(LoadedModel):
    """Cosine-similarity reranker over Qwen3 embeddings
    (qwen3_reranker/mod.rs:24-31)."""

    def __init__(self, entry: ModelEntry, embedding: Qwen3EmbeddingServed):
        super().__init__(entry)
        self._embedding = embedding

    @classmethod
    def load(cls, entry: ModelEntry, path: str, **kw) -> "Qwen3RerankerServed":
        return cls(entry, Qwen3EmbeddingServed.load(entry, path, **kw))

    def rerank(self, query: str, documents: list[str]) -> list[float]:
        q = self._embedding.embed_one_array(query)
        docs = np.stack([self._embedding.embed_one_array(d) for d in documents])
        # embeddings are L2-normalized → cosine == dot
        return (docs @ q).astype(np.float32).tolist()
