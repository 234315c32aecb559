"""BERT encoder for sentence embeddings (all-MiniLM-L6-v2).

The reference wraps candle_transformers' BertModel and mean-pools + L2
normalizes (src/models/all_minilm_l6_v2/mod.rs:9-66).  This is our own
BERT: embeddings (word+position+token_type → LayerNorm), post-LN encoder
blocks, masked mean pooling, L2 norm.  float32 throughout — BASELINE.json
demands bit-exact embeddings vs the reference.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp

from aha_tpu.core import nn
from aha_tpu.ops.attention import sdpa
from aha_tpu.ops.norms import l2_normalize
from aha_tpu.io.weights import batched_load


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_hidden_layers: int = 6
    num_attention_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    @classmethod
    def from_dict(cls, d: dict) -> "BertConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    @classmethod
    def from_file(cls, model_dir: str) -> "BertConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            return cls.from_dict(json.load(f))


class BertModel:
    def __init__(self, config: BertConfig):
        self.config = config
        self.head_dim = config.hidden_size // config.num_attention_heads

    def encode(self, params, input_ids: jnp.ndarray,
               attention_mask: jnp.ndarray) -> jnp.ndarray:
        """(B, S) ids + (B, S) 0/1 mask → (B, S, D) hidden states."""
        c = self.config
        B, S = input_ids.shape
        pe = params["embeddings"]
        x = (nn.embedding(pe["word"], input_ids)
             + pe["position"]["w"][None, :S]
             + pe["token_type"]["w"][0][None, None, :])
        x = nn.ln(pe["ln"], x, c.layer_norm_eps)

        neg = jnp.finfo(jnp.float32).min
        mask = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
        for lp in params["layers"]:
            x = self._layer(lp, x, mask)
        return x

    def _layer(self, lp, x, mask):
        c = self.config
        B, S, D = x.shape
        H, hd = c.num_attention_heads, self.head_dim
        q = nn.linear(lp["q"], x).reshape(B, S, H, hd)
        k = nn.linear(lp["k"], x).reshape(B, S, H, hd)
        v = nn.linear(lp["v"], x).reshape(B, S, H, hd)
        attn = sdpa(q, k, v, mask).reshape(B, S, D)
        x = nn.ln(lp["attn_ln"], x + nn.linear(lp["attn_out"], attn),
                  c.layer_norm_eps)
        h = jax.nn.gelu(nn.linear(lp["ffn_in"], x), approximate=False)
        x = nn.ln(lp["ffn_ln"], x + nn.linear(lp["ffn_out"], h),
                  c.layer_norm_eps)
        return x

    def embed(self, params, input_ids: jnp.ndarray,
              attention_mask: jnp.ndarray) -> jnp.ndarray:
        """Masked mean pool + L2 normalize (mod.rs:47-66)."""
        hidden = self.encode(params, input_ids, attention_mask)
        m = attention_mask[..., None].astype(hidden.dtype)
        pooled = jnp.sum(hidden * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
        return l2_normalize(pooled)

    # -- loading ------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.float32) -> dict:
        keys = src.keys()
        prefix = "bert." if any(k.startswith("bert.") for k in keys) else ""
        e = prefix + "embeddings."
        layers = []
        for i in range(self.config.num_hidden_layers):
            p = f"{prefix}encoder.layer.{i}."
            layers.append({
                "q": nn.take_linear(src, p + "attention.self.query", dtype),
                "k": nn.take_linear(src, p + "attention.self.key", dtype),
                "v": nn.take_linear(src, p + "attention.self.value", dtype),
                "attn_out": nn.take_linear(src, p + "attention.output.dense", dtype),
                "attn_ln": nn.take_norm(src, p + "attention.output.LayerNorm", dtype),
                "ffn_in": nn.take_linear(src, p + "intermediate.dense", dtype),
                "ffn_out": nn.take_linear(src, p + "output.dense", dtype),
                "ffn_ln": nn.take_norm(src, p + "output.LayerNorm", dtype),
            })
        return {
            "embeddings": {
                "word": nn.take_embedding(src, e + "word_embeddings", dtype),
                "position": nn.take_embedding(src, e + "position_embeddings", dtype),
                "token_type": nn.take_embedding(src, e + "token_type_embeddings", dtype),
                "ln": nn.take_norm(src, e + "LayerNorm", dtype),
            },
            "layers": layers,
        }

    def init_random(self, key, dtype=jnp.float32, scale: float = 0.02) -> dict:
        c = self.config
        d = c.hidden_size
        ks = jax.random.split(key, 8 * c.num_hidden_layers + 3)
        ki = iter(range(len(ks)))

        def w(shape):
            return jax.random.normal(ks[next(ki)], shape, dtype) * scale

        def lin(i, o):
            return {"w": w((i, o)), "b": jnp.zeros(o, dtype)}

        def norm():
            return {"w": jnp.ones(d, dtype), "b": jnp.zeros(d, dtype)}

        layers = [{
            "q": lin(d, d), "k": lin(d, d), "v": lin(d, d),
            "attn_out": lin(d, d), "attn_ln": norm(),
            "ffn_in": lin(d, c.intermediate_size),
            "ffn_out": lin(c.intermediate_size, d), "ffn_ln": norm(),
        } for _ in range(c.num_hidden_layers)]
        return {
            "embeddings": {
                "word": {"w": w((c.vocab_size, d))},
                "position": {"w": w((c.max_position_embeddings, d))},
                "token_type": {"w": w((c.type_vocab_size, d))},
                "ln": norm(),
            },
            "layers": layers,
        }
