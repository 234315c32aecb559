"""all-MiniLM-L6-v2 as a served embedding model.

Behavior parity with src/models/all_minilm_l6_v2/mod.rs: token id 0 ([PAD])
filtered from the encoding, unmasked mean pool, L2 normalize, float32.
Texts are batched per length bucket so repeated requests reuse compiled
graphs (the reference loops one text at a time; one jit per bucket is the
TPU-shaped version of the same semantics since pooling ignores padding via
the attention mask).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core.tokenizer import TokenizerModel
from aha_tpu.models.base import LoadedModel
from aha_tpu.models.minilm import BertConfig, BertModel
from aha_tpu.registry import ModelEntry

_LEN_BUCKETS = (16, 32, 64, 128, 256, 512)


def _bucket(n: int) -> int:
    for b in _LEN_BUCKETS:
        if n <= b:
            return b
    return _LEN_BUCKETS[-1]


class MiniLMServed(LoadedModel):
    def __init__(self, entry: ModelEntry, model: BertModel, params,
                 tokenizer: TokenizerModel):
        super().__init__(entry)
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self._embed = jax.jit(model.embed)

    @classmethod
    def load(cls, entry: ModelEntry, path: str) -> "MiniLMServed":
        from aha_tpu.io.weights import open_weights

        config = BertConfig.from_file(path)
        model = BertModel(config)
        params = model.load_params(open_weights(path), dtype=jnp.float32)
        return cls(entry, model, params, TokenizerModel.init(path))

    def embedding(self, texts: list[str]) -> list[list[float]]:
        if not texts:
            raise ValueError("embedding input cannot be empty")
        max_pos = self.model.config.max_position_embeddings
        encs = []
        for t in texts:
            ids = [i for i in self.tokenizer.encode(t) if i != 0][:max_pos]
            if not ids:
                raise ValueError("embedding tokenized input cannot be empty")
            encs.append(ids)
        out: list[list[float]] = [None] * len(texts)  # type: ignore
        # group by bucket to bound compilation
        by_bucket: dict[int, list[int]] = {}
        for i, ids in enumerate(encs):
            by_bucket.setdefault(_bucket(len(ids)), []).append(i)
        for blen, idxs in by_bucket.items():
            # rows padded to a power of two so request size doesn't mint a
            # new compile (pad rows repeat row 0 and are discarded)
            rows = 1 << (len(idxs) - 1).bit_length()
            ids_arr = np.zeros((rows, blen), np.int32)
            mask = np.zeros((rows, blen), np.int32)
            for row, i in enumerate(idxs):
                ids_arr[row, :len(encs[i])] = encs[i]
                mask[row, :len(encs[i])] = 1
            ids_arr[len(idxs):] = ids_arr[0]
            mask[len(idxs):] = mask[0]
            emb = self._embed(self.params, jnp.asarray(ids_arr), jnp.asarray(mask))
            emb = np.asarray(emb, np.float32)
            for row, i in enumerate(idxs):
                out[i] = emb[row].tolist()
        return out
