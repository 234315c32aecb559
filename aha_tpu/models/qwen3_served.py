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
        return self.embed_arrays([text])[0]

    def embed_arrays(self, texts: list[str]) -> np.ndarray:
        """(N, D) float32, L2-normalized.  Inputs are grouped by length
        bucket and each group runs as ONE batched forward — N sequential
        single-row prefills would leave the MXU mostly idle (same batching
        the MiniLM path uses; the reference embeds one string at a time,
        qwen3_embedding/mod.rs:38-66)."""
        encs = []
        for t in texts:
            ids = self.tokenizer.encode(t)
            if not ids:
                raise ValueError("embedding tokenized input cannot be empty")
            encs.append(ids)
        out = np.empty((len(texts), self.model.config.hidden_size),
                       np.float32)
        by_bucket: dict[int, list[int]] = {}
        for i, ids in enumerate(encs):
            by_bucket.setdefault(bucket_for(len(ids)), []).append(i)
        for blen, idxs in by_bucket.items():
            # pad the ROW count to a power of two as well: without it every
            # distinct request size compiles a fresh program (lengths are
            # already bucketed; pad rows repeat row 0 and are discarded)
            rows = 1 << (len(idxs) - 1).bit_length()
            arr = np.zeros((rows, blen), np.int32)
            lens = np.ones(rows, np.int32)
            for row, i in enumerate(idxs):
                arr[row, :len(encs[i])] = encs[i]
                lens[row] = len(encs[i])
            arr[len(idxs):] = arr[0]
            lens[len(idxs):] = lens[0]
            vecs = self._embed(self.params, jnp.asarray(arr),
                               jnp.asarray(lens))
            out[idxs] = np.asarray(vecs, np.float32)[:len(idxs)]
        return out

    def embedding(self, texts: list[str]) -> list[list[float]]:
        if not texts:
            raise ValueError("embedding input cannot be empty")
        return self.embed_arrays(texts).tolist()


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
        # one batched forward for query + documents together
        vecs = self._embedding.embed_arrays([query] + documents)
        q, docs = vecs[0], vecs[1:]
        # embeddings are L2-normalized → cosine == dot
        return (docs @ q).astype(np.float32).tolist()
