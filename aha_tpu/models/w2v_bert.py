"""W2V-BERT 2.0: conformer SSL audio encoder (semantic features for TTS
pipelines).

Parity with src/models/w2v_bert_2_0/model.rs:
- feature_projection (:20-49): LayerNorm → Linear on 160-dim stacked fbank
  features.
- conformer layer (:332-426): ½·ffn1 → self-attention (relative_key
  position bias over clamped distances, :181-216) → conv module (GLU
  pointwise, causally-padded depthwise k=31, LayerNorm, swish, pointwise,
  :232-330) → ½·ffn2 → final LayerNorm.
- encoder (:434-526): optional rotary table, per-layer hidden-state taps
  (layer_id), padding masks zero features and mask attention.

The reference also loads (but never evaluates) the Transformer-XL style
"relative" u/v-bias path; the released W2V-BERT 2.0 checkpoint uses
"relative_key", which is implemented here along with "rotary".
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core import nn
from aha_tpu.ops.rope import apply_rope, rope_table
from aha_tpu.io.weights import batched_load


@dataclasses.dataclass(frozen=True)
class W2VBertConfig:
    feature_projection_input_dim: int = 160
    hidden_size: int = 1024
    output_hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    layer_norm_eps: float = 1e-5
    position_embeddings_type: str = "relative_key"
    left_max_position_embeddings: int = 64
    right_max_position_embeddings: int = 8
    conv_depthwise_kernel_size: int = 31

    @classmethod
    def from_file(cls, model_dir: str) -> "W2VBertConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            d = json.load(f)
        d.setdefault("output_hidden_size", d.get("hidden_size", 1024))
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


class W2VBertModel:
    def __init__(self, config: W2VBertConfig, max_len: int = 8192):
        self.config = config
        c = config
        self.head_dim = c.hidden_size // c.num_attention_heads
        if c.position_embeddings_type == "rotary":
            self.cos, self.sin = rope_table(self.head_dim, max_len, 10000.0)
        else:
            self.cos = self.sin = None

    # -- pieces -----------------------------------------------------------------

    def _rel_key_bias(self, emb, q, scale):
        """relative_key positional scores (model.rs:181-213):
        einsum('bhld,lrd->bhlr', q, E[clamp(r−l)+left])·scale."""
        c = self.config
        L = q.shape[2]
        dist = jnp.arange(L)[None, :] - jnp.arange(L)[:, None]
        dist = jnp.clip(dist, -c.left_max_position_embeddings,
                        c.right_max_position_embeddings) \
            + c.left_max_position_embeddings
        pos = emb[dist]                                # (L, L, hd)
        return jnp.einsum("bhld,lrd->bhlr", q, pos.astype(q.dtype)) * scale

    def _attention(self, p, x, mask):
        c = self.config
        B, L, _ = x.shape
        H, hd = c.num_attention_heads, self.head_dim
        q = nn.linear(p["q"], x).reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        k = nn.linear(p["k"], x).reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        v = nn.linear(p["v"], x).reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        if self.cos is not None:
            qr, kr = apply_rope(q.transpose(0, 2, 1, 3),
                                k.transpose(0, 2, 1, 3),
                                self.cos[:L], self.sin[:L])
            q, k = qr.transpose(0, 2, 1, 3), kr.transpose(0, 2, 1, 3)
        scale = hd ** -0.5
        scores = jnp.einsum("bhld,bhrd->bhlr", q, k,
                            preferred_element_type=jnp.float32) * scale
        if "distance_embedding" in p:
            scores = scores + self._rel_key_bias(p["distance_embedding"]["w"],
                                                 q.astype(jnp.float32), scale)
        if mask is not None:
            scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhlr,bhrd->bhld", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, H * hd)
        return nn.linear(p["o"], out)

    def _conv_module(self, p, x, pad_mask):
        c = self.config
        h = nn.ln(p["ln"], x, c.layer_norm_eps)
        if pad_mask is not None:
            h = jnp.where(pad_mask[..., None], h, 0.0)
        h = nn.linear(p["pw1"], h)                     # (B, L, 2H) k=1 conv
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)                      # GLU over channels
        K = c.conv_depthwise_kernel_size
        hp = jnp.pad(h, ((0, 0), (K - 1, 0), (0, 0)))  # causal pad
        w = p["dw"]["w"]                               # (K, H)
        h = sum(hp[:, j:j + h.shape[1], :] * w[j] for j in range(K))
        h = nn.ln(p["dw_ln"], h, c.layer_norm_eps)
        h = jax.nn.silu(h)                             # swish
        return nn.linear(p["pw2"], h)

    def _ffn(self, p, x):
        return nn.linear(p["out"], jax.nn.silu(nn.linear(p["inter"], x)))

    # -- forward ----------------------------------------------------------------

    def forward(self, params, feats, valid_len=None, layer_id=None):
        """feats (B, T, 160) → (last_hidden, tap) where tap is the input of
        encoder layer `layer_id` (None → None)."""
        c = self.config
        B, L, _ = feats.shape
        x = nn.ln(params["fp_ln"], feats, c.layer_norm_eps)
        x = nn.linear(params["fp_proj"], x)
        pad_mask = None
        attn_mask = None
        if valid_len is not None:
            pad_mask = jnp.arange(L)[None, :] < valid_len
            x = jnp.where(pad_mask[..., None], x, 0.0)
            attn_mask = jnp.where(pad_mask[:, None, None, :], 0.0,
                                  jnp.finfo(jnp.float32).min)
        tap = None
        for i, lp in enumerate(params["layers"]):
            if layer_id is not None and i == layer_id:
                tap = x
            r = x + 0.5 * self._ffn(lp["ffn1"],
                                    nn.ln(lp["ffn1_ln"], x, c.layer_norm_eps))
            r = r + self._attention(lp["attn"],
                                    nn.ln(lp["attn_ln"], r, c.layer_norm_eps),
                                    attn_mask)
            r = r + self._conv_module(lp["conv"], r, pad_mask)
            r = r + 0.5 * self._ffn(lp["ffn2"],
                                    nn.ln(lp["ffn2_ln"], r, c.layer_norm_eps))
            x = nn.ln(lp["final_ln"], r, c.layer_norm_eps)
        return x, tap

    # -- loading ------------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.float32, prefix: str = "") -> dict:
        c = self.config

        def lyr(i):
            p = f"{prefix}encoder.layers.{i}."
            a = p + "self_attn."
            lp = {
                "ffn1_ln": nn.take_norm(src, p + "ffn1_layer_norm", dtype),
                "ffn1": {"inter": nn.take_linear(
                    src, p + "ffn1.intermediate_dense", dtype),
                    "out": nn.take_linear(src, p + "ffn1.output_dense",
                                          dtype)},
                "attn_ln": nn.take_norm(src, p + "self_attn_layer_norm",
                                        dtype),
                "attn": {
                    "q": nn.take_linear(src, a + "linear_q", dtype),
                    "k": nn.take_linear(src, a + "linear_k", dtype),
                    "v": nn.take_linear(src, a + "linear_v", dtype),
                    "o": nn.take_linear(src, a + "linear_out", dtype),
                },
                "conv": {
                    "ln": nn.take_norm(src, p + "conv_module.layer_norm",
                                       dtype),
                    "pw1": {"w": src.get(
                        p + "conv_module.pointwise_conv1.weight",
                        dtype)[:, :, 0].T},
                    "dw": {"w": src.get(
                        p + "conv_module.depthwise_conv.weight",
                        dtype)[:, 0, :].T},
                    "dw_ln": nn.take_norm(
                        src, p + "conv_module.depthwise_layer_norm", dtype),
                    "pw2": {"w": src.get(
                        p + "conv_module.pointwise_conv2.weight",
                        dtype)[:, :, 0].T},
                },
                "ffn2_ln": nn.take_norm(src, p + "ffn2_layer_norm", dtype),
                "ffn2": {"inter": nn.take_linear(
                    src, p + "ffn2.intermediate_dense", dtype),
                    "out": nn.take_linear(src, p + "ffn2.output_dense",
                                          dtype)},
                "final_ln": nn.take_norm(src, p + "final_layer_norm", dtype),
            }
            if c.position_embeddings_type == "relative_key":
                lp["attn"]["distance_embedding"] = nn.take_embedding(
                    src, a + "distance_embedding", dtype)
            return lp

        return {
            "fp_ln": nn.take_norm(src, prefix + "feature_projection.layer_norm",
                                  dtype),
            "fp_proj": nn.take_linear(src, prefix + "feature_projection.projection",
                                      dtype),
            "layers": [lyr(i) for i in range(c.num_hidden_layers)],
        }

    def init_random(self, key, scale: float = 0.02) -> dict:
        c = self.config
        ks = iter(jax.random.split(key, 16 * c.num_hidden_layers + 4))

        def lin(i, o, bias=True):
            out = {"w": jax.random.normal(next(ks), (i, o),
                                          jnp.float32) * scale}
            if bias:
                out["b"] = jnp.zeros(o)
            return out

        def norm(d):
            return {"w": jnp.ones(d), "b": jnp.zeros(d)}

        H, I = c.hidden_size, c.intermediate_size
        n_pos = (c.left_max_position_embeddings
                 + c.right_max_position_embeddings + 1)
        layers = []
        for _ in range(c.num_hidden_layers):
            lp = {
                "ffn1_ln": norm(H),
                "ffn1": {"inter": lin(H, I), "out": lin(I, H)},
                "attn_ln": norm(H),
                "attn": {"q": lin(H, H), "k": lin(H, H), "v": lin(H, H),
                         "o": lin(H, H)},
                "conv": {"ln": norm(H), "pw1": {"w": lin(H, 2 * H, 0)["w"]},
                         "dw": {"w": lin(c.conv_depthwise_kernel_size,
                                         H, 0)["w"]},
                         "dw_ln": norm(H), "pw2": {"w": lin(H, H, 0)["w"]}},
                "ffn2_ln": norm(H),
                "ffn2": {"inter": lin(H, I), "out": lin(I, H)},
                "final_ln": norm(H),
            }
            if c.position_embeddings_type == "relative_key":
                lp["attn"]["distance_embedding"] = {
                    "w": jax.random.normal(next(ks), (n_pos, self.head_dim),
                                           jnp.float32) * scale}
            layers.append(lp)
        return {"fp_ln": norm(c.feature_projection_input_dim),
                "fp_proj": lin(c.feature_projection_input_dim, H),
                "layers": layers}
