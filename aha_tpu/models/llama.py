"""Parameterized llama-style decoder — the shared text backbone.

Covers the reference's building blocks with one scan-based implementation:
- `llama` (src/models/llama/mod.rs:12-107): backbone of MiniCPM5 and
  GLM-ASR-Nano's decoder
- `qwen2` (src/models/qwen2/mod.rs): q/k/v-bias attention (qkv_bias)
- `minicpm4` (src/models/minicpm4/model.rs): LongRoPE frequency scaling +
  mup-style scale_emb / scale_depth / dim_model_base scalings

Flags in LlamaConfig select the variant; the forward is one code path so
every family gets the same KV-cache/prefill/decode treatment as Qwen3.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core import cache as kv
from aha_tpu.core import nn
from aha_tpu.ops.attention import (attention_decode_at, attention_prefill,
                                   attention_prefill_at, causal_mask, sdpa)
from aha_tpu.ops.norms import rms_norm
from aha_tpu.ops.rope import apply_rope, gather_rope, rope_table
from aha_tpu.io.weights import batched_load


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_hidden_layers: int = 22
    num_attention_heads: int = 32
    num_key_value_heads: int = 4
    head_dim: int | None = None
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    qkv_bias: bool = False          # qwen2-style q/k/v bias
    o_bias: bool = False
    mlp_bias: bool = False
    qk_norm: bool = False           # qwen3-style per-head rms q/k norm
    # mup-style scalings (minicpm4/config.rs:26-28); neutral defaults
    scale_emb: float = 1.0
    scale_depth: float | None = None   # residual scale = scale_depth/sqrt(L)
    dim_model_base: int | None = None  # hidden scale = 1/(d/dim_model_base)
    rope_scaling: Any = None           # {"short_factor": [...], ...} LongRoPE

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @classmethod
    def from_dict(cls, d: dict) -> "LlamaConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    @classmethod
    def from_file(cls, model_dir: str) -> "LlamaConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            return cls.from_dict(json.load(f))


def longrope_table(cfg: LlamaConfig, max_len: int,
                   dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """LongRoPE (minicpm4/model.rs:17-97): per-frequency ext factors with a
    log-scaled amplitude multiplier.  Uses long_factor beyond the original
    context (the reference accidentally always uses short_factor,
    model.rs:33 — we follow the intended/HF behavior)."""
    rs = cfg.rope_scaling
    half = cfg.head_dim_ // 2
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, half) / half))
    original = rs["original_max_position_embeddings"]
    factor = np.asarray(rs["long_factor"] if max_len > original
                        else rs["short_factor"], np.float64)
    scale = cfg.max_position_embeddings / original
    scaling_factor = math.sqrt(1.0 + math.log(scale) / math.log(original)) \
        if scale > 1.0 else 1.0
    t = np.arange(max_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq / factor)
    return (jnp.asarray(np.cos(freqs) * scaling_factor, dtype),
            jnp.asarray(np.sin(freqs) * scaling_factor, dtype))


class LlamaModel:
    """Implements the CausalLM protocol (aha_tpu.core.engine)."""

    #: decode accepts a per-slot (B,) cache["pos"] vector (continuous
    #: batching, core.batch_engine)
    supports_slot_decode = True
    #: pure K/V cache; prefill accepts from_cache=True (prefix caching)
    supports_prefix_cache = True
    #: pure K/V + position-gated reads: the cache can REWIND (pos -= k) with
    #: no state to unwind — speculative decoding verifies drafts then rolls
    #: back rejected rows for free (hybrids cannot: conv/rec state advanced
    #: by rejected tokens is unrecoverable)
    supports_token_rewind = True

    def __init__(self, config: LlamaConfig, max_rope_len: int = 8192):
        self.config = config
        c = config
        self.n_layers = c.num_hidden_layers
        self.n_heads = c.num_attention_heads
        self.n_kv_heads = c.num_key_value_heads
        self.head_dim = c.head_dim_
        max_rope_len = min(max_rope_len, c.max_position_embeddings)
        if c.rope_scaling and "short_factor" in c.rope_scaling:
            self.cos, self.sin = longrope_table(c, max_rope_len)
        else:
            self.cos, self.sin = rope_table(self.head_dim, max_rope_len,
                                            c.rope_theta)
        self.residual_scale = (c.scale_depth / math.sqrt(c.num_hidden_layers)
                               if c.scale_depth else 1.0)
        self.hidden_scale = (1.0 / (c.hidden_size / c.dim_model_base)
                             if c.dim_model_base else 1.0)

    def init_cache(self, batch: int, max_len: int, dtype=jnp.bfloat16) -> dict:
        return kv.init_kv_cache(self.n_layers, batch, max_len,
                                self.n_kv_heads, self.head_dim, dtype)

    def _layer(self, lp, x, cos, sin, kc, vc, li, pos, is_prefill,
               from_cache=False):
        c = self.config
        B, S, _ = x.shape
        h = rms_norm(x, lp["ln1"]["w"], c.rms_norm_eps)
        q = nn.linear(lp["q"], h).reshape(B, S, self.n_heads, self.head_dim)
        k = nn.linear(lp["k"], h).reshape(B, S, self.n_kv_heads, self.head_dim)
        v = nn.linear(lp["v"], h).reshape(B, S, self.n_kv_heads, self.head_dim)
        if c.qk_norm:
            q = rms_norm(q, lp["q_norm"]["w"], c.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"]["w"], c.rms_norm_eps)
        q, k = apply_rope(q, k, cos, sin)
        zero = jnp.zeros((), jnp.int32)
        li = li.astype(jnp.int32)
        if jnp.ndim(pos) == 0:
            kc = jax.lax.dynamic_update_slice(kc, k[None],
                                              (li, zero, pos, zero, zero))
            vc = jax.lax.dynamic_update_slice(vc, v[None],
                                              (li, zero, pos, zero, zero))
        else:
            # per-slot decode (continuous batching): one scatter writes each
            # slot's new row at its own position
            b_idx = jnp.arange(pos.shape[0])
            kc = kc.at[li, b_idx, pos].set(k[:, 0])
            vc = vc.at[li, b_idx, pos].set(v[:, 0])
        if is_prefill and from_cache:
            attn = attention_prefill_at(q, kc, vc, li, pos)
        elif is_prefill:
            attn = attention_prefill(q, k, v, causal=True)
        else:
            attn = attention_decode_at(q, kc, vc, li, pos)
        attn = attn.reshape(B, S, self.n_heads * self.head_dim)
        x = x + nn.linear(lp["o"], attn) * self.residual_scale
        h = rms_norm(x, lp["ln2"]["w"], c.rms_norm_eps)
        x = x + nn.swiglu_mlp(lp["mlp"], h) * self.residual_scale
        return x, kc, vc

    def backbone(self, params, input_ids, cache, mm=None, prompt_len=None,
                 from_cache=False):
        x = nn.embedding(params["embed"], input_ids) * self.config.scale_emb
        return self.run_layers(params, x, cache, from_cache=from_cache)

    def run_layers(self, params, x, cache, cos_sin=None, from_cache=False):
        """Decoder stack over input embeddings; `cos_sin` overrides the
        default arange RoPE gather (M-RoPE wrappers like Qwen2.5-VL)."""
        B, S, _ = x.shape
        pos = cache["pos"]
        if cos_sin is not None:
            cos, sin = cos_sin
        elif jnp.ndim(pos) == 0:
            positions = pos + jnp.arange(S)          # (S,)
            cos, sin = gather_rope(self.cos, self.sin, positions)
        else:
            positions = pos[:, None] + jnp.arange(S)  # (B, S) per-slot decode
            cos, sin = gather_rope(self.cos, self.sin, positions)
        def body(carry, xs):
            x, kc, vc = carry
            lp, li = xs
            x, kc, vc = self._layer(lp, x, cos, sin, kc, vc, li, pos, S > 1,
                                    from_cache)
            return (x, kc, vc), None

        (x, kc, vc), _ = jax.lax.scan(
            body, (x, cache["k"], cache["v"]),
            (params["layers"], jnp.arange(self.n_layers)))
        cache = {**cache, "k": kc, "v": vc}
        x = rms_norm(x, params["norm"]["w"], self.config.rms_norm_eps)
        return x * self.hidden_scale, cache

    def run_layers_no_cache(self, params, x, mask=None):
        """Encoder-style pass: no KV cache, RoPE from position 0, optional
        custom additive attention mask (DeepSeek-OCR v2's
        Qwen2Decoder2Encoder, deepseek_ocr/model.rs:1123-1161)."""
        c = self.config
        B, S, _ = x.shape
        cos, sin = gather_rope(self.cos, self.sin, jnp.arange(S))
        if mask is None:
            mask = causal_mask(S, S)

        def body(x, lp):
            h = rms_norm(x, lp["ln1"]["w"], c.rms_norm_eps)
            q = nn.linear(lp["q"], h).reshape(B, S, self.n_heads,
                                              self.head_dim)
            k = nn.linear(lp["k"], h).reshape(B, S, self.n_kv_heads,
                                              self.head_dim)
            v = nn.linear(lp["v"], h).reshape(B, S, self.n_kv_heads,
                                              self.head_dim)
            if c.qk_norm:
                q = rms_norm(q, lp["q_norm"]["w"], c.rms_norm_eps)
                k = rms_norm(k, lp["k_norm"]["w"], c.rms_norm_eps)
            q, k = apply_rope(q, k, cos, sin)
            attn = sdpa(q, k, v, mask).reshape(B, S,
                                               self.n_heads * self.head_dim)
            x = x + nn.linear(lp["o"], attn) * self.residual_scale
            h = rms_norm(x, lp["ln2"]["w"], c.rms_norm_eps)
            x = x + nn.swiglu_mlp(lp["mlp"], h) * self.residual_scale
            return x, None

        x, _ = jax.lax.scan(body, x, params["layers"])
        x = rms_norm(x, params["norm"]["w"], c.rms_norm_eps)
        return x * self.hidden_scale

    def logits(self, params, hidden):
        return nn.linear(params["lm_head"], hidden)

    # -- loading ------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.bfloat16, prefix: str = "model.") -> dict:
        c = self.config
        layers = []
        for i in range(self.n_layers):
            p = f"{prefix}layers.{i}."
            lp = {
                "ln1": nn.take_norm(src, p + "input_layernorm", dtype),
                "ln2": nn.take_norm(src, p + "post_attention_layernorm", dtype),
                "q": nn.take_linear(src, p + "self_attn.q_proj", dtype),
                "k": nn.take_linear(src, p + "self_attn.k_proj", dtype),
                "v": nn.take_linear(src, p + "self_attn.v_proj", dtype),
                "o": nn.take_linear(src, p + "self_attn.o_proj", dtype),
                "mlp": {
                    "gate": nn.take_linear(src, p + "mlp.gate_proj", dtype),
                    "up": nn.take_linear(src, p + "mlp.up_proj", dtype),
                    "down": nn.take_linear(src, p + "mlp.down_proj", dtype),
                },
            }
            if c.qk_norm:
                lp["q_norm"] = nn.take_norm(src, p + "self_attn.q_norm", dtype)
                lp["k_norm"] = nn.take_norm(src, p + "self_attn.k_norm", dtype)
            layers.append(lp)
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *layers)
        embed = nn.take_embedding(src, prefix + "embed_tokens", dtype)
        if c.tie_word_embeddings and "lm_head.weight" not in src:
            lm_head = {"w": embed["w"].T}
        else:
            lm_head = nn.take_linear(src, "lm_head", dtype)
        return {
            "embed": embed,
            "layers": stacked,
            "norm": nn.take_norm(src, prefix + "norm", dtype),
            "lm_head": lm_head,
        }

    def init_random(self, key, dtype=jnp.float32, scale: float = 0.02) -> dict:
        c = self.config
        d, hd = c.hidden_size, self.head_dim
        ks = iter(jax.random.split(key, 8 * self.n_layers + 4))

        def w(shape):
            return jax.random.normal(next(ks), shape, dtype) * scale

        def lin(i, o, bias):
            p = {"w": w((i, o))}
            if bias:
                p["b"] = jnp.zeros(o, dtype)
            return p

        def layer():
            lp = {
                "ln1": {"w": jnp.ones(d, dtype)},
                "ln2": {"w": jnp.ones(d, dtype)},
                "q": lin(d, self.n_heads * hd, c.qkv_bias),
                "k": lin(d, self.n_kv_heads * hd, c.qkv_bias),
                "v": lin(d, self.n_kv_heads * hd, c.qkv_bias),
                "o": lin(self.n_heads * hd, d, c.o_bias),
                "mlp": {
                    "gate": lin(d, c.intermediate_size, c.mlp_bias),
                    "up": lin(d, c.intermediate_size, c.mlp_bias),
                    "down": lin(c.intermediate_size, d, c.mlp_bias),
                },
            }
            if c.qk_norm:
                lp["q_norm"] = {"w": jnp.ones(hd, dtype)}
                lp["k_norm"] = {"w": jnp.ones(hd, dtype)}
            return lp

        layers = [layer() for _ in range(self.n_layers)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        embed_w = w((c.vocab_size, d))
        return {
            "embed": {"w": embed_w},
            "layers": stacked,
            "norm": {"w": jnp.ones(d, dtype)},
            "lm_head": {"w": embed_w.T if c.tie_word_embeddings
                        else w((d, c.vocab_size))},
        }


LLAMA_PARTITION_RULES = (
    (r"layers\.(q|k|v)\.w", (None, None, "tp")),
    (r"layers\.o\.w", (None, "tp", None)),
    (r"layers\.mlp\.(gate|up)\.w", (None, None, "tp")),
    (r"layers\.mlp\.down\.w", (None, "tp", None)),
    # segment-anchored: must not catch vision towers' patch_embed/pos_embed
    (r"(^|\.)embed\.w", ("tp", None)),
    (r"lm_head\.w", (None, "tp")),
)
LLAMA_CACHE_RULES = ((r"^(k|v)$", (None, "dp", None, "tp", None)),)
LlamaModel.partition_rules = LLAMA_PARTITION_RULES
LlamaModel.cache_rules = LLAMA_CACHE_RULES
