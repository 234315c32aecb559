"""GPT-2 backbone (src/models/gpt2/mod.rs) — the global/local transformer
building block of Moss-TTS-Nano.

Learned positions, pre-LN blocks, fused c_attn qkv, gelu MLP.  HF gpt2
Conv1D weights are already (in, out) — loaded untransposed.  Implements the
CausalLM protocol so it runs on the shared engine/caching machinery.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp

from aha_tpu.core import cache as kvmod
from aha_tpu.core import nn
from aha_tpu.ops.attention import attention_decode_at, attention_prefill
from aha_tpu.ops.norms import layer_norm
from aha_tpu.io.weights import batched_load
import numpy as np


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5

    @classmethod
    def from_dict(cls, d: dict) -> "GPT2Config":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    @classmethod
    def from_file(cls, model_dir: str) -> "GPT2Config":
        with open(os.path.join(model_dir, "config.json")) as f:
            return cls.from_dict(json.load(f))


class GPT2Model:
    """Implements the CausalLM protocol."""

    def __init__(self, config: GPT2Config):
        self.config = config
        self.n_layers = config.n_layer
        self.n_heads = config.n_head
        self.head_dim = config.n_embd // config.n_head

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16):
        return kvmod.init_kv_cache(self.n_layers, batch, max_len,
                                   self.n_heads, self.head_dim, dtype)

    def _layer(self, lp, x, kc, vc, li, pos, is_prefill):
        c = self.config
        B, S, D = x.shape
        h = layer_norm(x, lp["ln1"]["w"], lp["ln1"].get("b"),
                       c.layer_norm_epsilon)
        qkv = nn.linear(lp["c_attn"], h).reshape(B, S, 3, self.n_heads,
                                                 self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        zero = jnp.zeros((), pos.dtype)
        li = li.astype(pos.dtype)
        kc = jax.lax.dynamic_update_slice(kc, k[None],
                                          (li, zero, pos, zero, zero))
        vc = jax.lax.dynamic_update_slice(vc, v[None],
                                          (li, zero, pos, zero, zero))
        attn = (attention_prefill(q, k, v, causal=True) if is_prefill
                else attention_decode_at(q, kc, vc, li, pos))
        x = x + nn.linear(lp["c_proj"], attn.reshape(B, S, D))
        h = layer_norm(x, lp["ln2"]["w"], lp["ln2"].get("b"),
                       c.layer_norm_epsilon)
        h = jax.nn.gelu(nn.linear(lp["mlp_fc"], h))
        x = x + nn.linear(lp["mlp_proj"], h)
        return x, kc, vc

    def backbone(self, params, input_ids, cache, mm: Any = None,
                 prompt_len=None):
        x = nn.embedding(params["wte"], input_ids)
        return self.run_layers(params, x, cache)

    def run_layers(self, params, x, cache):
        """Over embeddings (Moss-TTS feeds summed audio-codebook embeds)."""
        B, S, _ = x.shape
        pos = cache["pos"]
        positions = pos + jnp.arange(S)
        x = x + jnp.take(params["wpe"]["w"], positions, axis=0)[None]
        def body(carry, xs):
            x, kc, vc = carry
            lp, li = xs
            x, kc, vc = self._layer(lp, x, kc, vc, li, pos, S > 1)
            return (x, kc, vc), None

        (x, kc, vc), _ = jax.lax.scan(
            body, (x, cache["k"], cache["v"]),
            (params["layers"], jnp.arange(self.n_layers)))
        cache = {**cache, "k": kc, "v": vc}
        x = layer_norm(x, params["ln_f"]["w"], params["ln_f"].get("b"),
                       self.config.layer_norm_epsilon)
        return x, cache

    def logits(self, params, hidden):
        return hidden @ params["wte"]["w"].T  # tied head

    @batched_load
    def load_params(self, src, dtype=jnp.bfloat16, prefix: str = "") -> dict:
        """HF gpt2 layout: Conv1D weights already (in, out)."""
        def conv1d(name):
            p = {"w": src.get(prefix + name + ".weight", dtype)}
            if prefix + name + ".bias" in src:
                p["b"] = src.get(prefix + name + ".bias", dtype)
            return p

        layers = []
        for i in range(self.n_layers):
            h = f"h.{i}."
            layers.append({
                "ln1": nn.take_norm(src, prefix + h + "ln_1", dtype),
                "ln2": nn.take_norm(src, prefix + h + "ln_2", dtype),
                "c_attn": conv1d(h + "attn.c_attn"),
                "c_proj": conv1d(h + "attn.c_proj"),
                "mlp_fc": conv1d(h + "mlp.c_fc"),
                "mlp_proj": conv1d(h + "mlp.c_proj"),
            })
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        return {
            "wte": nn.take_embedding(src, prefix + "wte", dtype),
            "wpe": nn.take_embedding(src, prefix + "wpe", dtype),
            "layers": stacked,
            "ln_f": nn.take_norm(src, prefix + "ln_f", dtype),
        }

    def init_random(self, key, dtype=jnp.float32, scale: float = 0.02) -> dict:
        c = self.config
        d = c.n_embd
        ks = iter(jax.random.split(key, 6 * self.n_layers + 3))

        def w(shape):
            return jax.random.normal(next(ks), shape, dtype) * scale

        def lin(i, o):
            return {"w": w((i, o)), "b": jnp.zeros(o, dtype)}

        def norm():
            return {"w": jnp.ones(d, dtype), "b": jnp.zeros(d, dtype)}

        layers = [{
            "ln1": norm(), "ln2": norm(),
            "c_attn": lin(d, 3 * d), "c_proj": lin(d, d),
            "mlp_fc": lin(d, 4 * d), "mlp_proj": lin(4 * d, d),
        } for _ in range(self.n_layers)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        return {
            "wte": {"w": w((c.vocab_size, d))},
            "wpe": {"w": w((c.n_positions, d))},
            "layers": stacked,
            "ln_f": norm(),
        }
