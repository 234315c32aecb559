"""LFM2 hybrid conv/attention model.

Parity with src/models/lfm2/: gated short-conv token mixers
(Lfm2ShortConv, model.rs:18-96) alternating with QK-norm attention per
layer_types/full_attn_idxs (config.rs), shared SwiGLU feed_forward
(w1/w3/w2), operator_norm/ffn_norm pre-norms, embedding_norm final norm.

Functional state: attention layers use slots of the shared KV cache;
conv layers keep a rolling (B, L_cache, D) state in cache["conv"] —
placed at the true prompt end during padded prefill via `prompt_len`.
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
from aha_tpu.ops.attention import (attention_decode_at, attention_prefill,
                                   attention_prefill_at)
from aha_tpu.ops.norms import rms_norm
from aha_tpu.ops.rope import apply_rope, gather_rope, rope_table
from aha_tpu.io.weights import batched_load


@dataclasses.dataclass(frozen=True)
class Lfm2Config:
    vocab_size: int = 65536
    hidden_size: int = 2048
    num_hidden_layers: int = 16
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    max_position_embeddings: int = 128000
    norm_eps: float = 1e-5
    rope_theta: float = 1000000.0
    conv_L_cache: int = 3
    conv_bias: bool = False
    block_dim: int = 2048
    block_ff_dim: int = 10752
    block_ffn_dim_multiplier: float = 1.0
    block_multiple_of: int = 256
    block_auto_adjust_ff_dim: bool = True
    layer_types: tuple[str, ...] = ()
    tie_word_embeddings: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def intermediate_size(self) -> int:
        if not self.block_auto_adjust_ff_dim:
            return self.block_ff_dim
        inter = int(self.block_ffn_dim_multiplier * (2 * self.block_ff_dim // 3))
        m = self.block_multiple_of
        return m * ((inter + m - 1) // m)

    @classmethod
    def from_dict(cls, d: dict) -> "Lfm2Config":
        d = dict(d)
        # HF checkpoints may carry the ff width as either name
        if "block_ff_dim" not in d and "intermediate_size" in d:
            d["block_ff_dim"] = d["intermediate_size"]
        layer_types = d.get("layer_types")
        if layer_types is None and d.get("full_attn_idxs") is not None:
            idxs = set(d["full_attn_idxs"])
            layer_types = ["full_attention" if i in idxs else "conv"
                          for i in range(d["num_hidden_layers"])]
        if layer_types is None:
            raise ValueError("lfm2 config needs layer_types or full_attn_idxs")
        d["layer_types"] = tuple(layer_types)
        if d.get("rope_theta") is None and "rope_parameters" in d:
            d["rope_theta"] = d["rope_parameters"]["rope_theta"]
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    @classmethod
    def from_file(cls, model_dir: str) -> "Lfm2Config":
        with open(os.path.join(model_dir, "config.json")) as f:
            return cls.from_dict(json.load(f))


class Lfm2Model:
    """Implements the CausalLM protocol (aha_tpu.core.engine)."""

    #: decode accepts a per-slot (B,) cache["pos"] vector (continuous
    #: batching); the conv rolling state is per-row and position-free
    supports_slot_decode = True
    #: prefix caching / chunked prefill: from_cache suffix prefill attends
    #: over restored K/V rows AND continues the short-conv rolling window
    #: captured in the snapshot (exact-repeat matches are skipped for
    #: state-carrying entries — the window can't rewind one token)
    supports_prefix_cache = True

    def __init__(self, config: Lfm2Config, max_rope_len: int = 8192):
        self.config = config
        c = config
        self.n_layers = c.num_hidden_layers
        self.n_heads = c.num_attention_heads
        self.n_kv_heads = c.num_key_value_heads
        self.head_dim = c.head_dim
        self.layer_types = c.layer_types
        # attention layers get consecutive slots in the shared KV cache
        self.attn_slot = {}
        slot = 0
        for i, t in enumerate(self.layer_types):
            if t == "full_attention":
                self.attn_slot[i] = slot
                slot += 1
        self.n_attn_layers = slot
        self.n_conv_layers = self.n_layers - slot
        self.conv_slot = {i: j for j, i in enumerate(
            i for i, t in enumerate(self.layer_types) if t != "full_attention")}
        self.cos, self.sin = rope_table(
            c.head_dim, min(max_rope_len, c.max_position_embeddings),
            c.rope_theta)

    def init_cache(self, batch: int, max_len: int, dtype=jnp.bfloat16) -> dict:
        c = self.config
        cache = kvmod.init_kv_cache(max(self.n_attn_layers, 1), batch, max_len,
                                    self.n_kv_heads, self.head_dim, dtype)
        cache["conv"] = jnp.zeros(
            (max(self.n_conv_layers, 1), batch, c.conv_L_cache, c.hidden_size),
            dtype)
        return cache

    # -- layer kinds --------------------------------------------------------

    def _attn(self, lp, x, cos, sin, kc, vc, slot, pos, is_prefill,
              from_cache=False):
        c = self.config
        B, S, _ = x.shape
        q = nn.linear(lp["q"], x).reshape(B, S, self.n_heads, self.head_dim)
        k = nn.linear(lp["k"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        v = nn.linear(lp["v"], x).reshape(B, S, self.n_kv_heads, self.head_dim)
        q = rms_norm(q, lp["q_norm"]["w"], c.norm_eps)
        k = rms_norm(k, lp["k_norm"]["w"], c.norm_eps)
        q, k = apply_rope(q, k, cos, sin)
        zero = jnp.zeros((), jnp.int32)
        sl = jnp.asarray(slot, jnp.int32)
        if jnp.ndim(pos) == 0:
            kc = jax.lax.dynamic_update_slice(kc, k[None],
                                              (sl, zero, pos, zero, zero))
            vc = jax.lax.dynamic_update_slice(vc, v[None],
                                              (sl, zero, pos, zero, zero))
        else:
            # per-slot decode (continuous batching): one scatter writes each
            # slot's new row at its own position
            b_idx = jnp.arange(pos.shape[0])
            kc = kc.at[sl, b_idx, pos].set(k[:, 0])
            vc = vc.at[sl, b_idx, pos].set(v[:, 0])
        if is_prefill and from_cache:
            # suffix/chunk prefill at offset pos over previously written rows
            attn = attention_prefill_at(q, kc, vc, sl, pos)
        elif is_prefill:
            attn = attention_prefill(q, k, v, causal=True)
        else:
            attn = attention_decode_at(q, kc, vc, sl, pos)
        return nn.linear(lp["o"], attn.reshape(B, S, -1)), kc, vc

    def _conv(self, lp, x, conv_state, prompt_len, is_prefill,
              from_cache=False):
        """Gated causal short conv (lfm2/model.rs:62-96).

        conv_state: (B, L, D) rolling window of the last L gated inputs bx.
        from_cache prefill takes the conv window's left context from the
        restored state instead of zero padding (prefix caching / chunked
        prefill).
        """
        c = self.config
        B, S, D = x.shape
        L = c.conv_L_cache
        bcx = nn.linear(lp["in_proj"], x)  # (B, S, 3D)
        b, cg, xg = jnp.split(bcx, 3, axis=-1)
        bx = b * xg  # (B, S, D)
        w = lp["conv"]["w"]  # (L, D)
        bias = lp["conv"].get("b")

        if is_prefill:
            # causal depthwise conv over the block; left context is zeros
            # for a fresh prompt, the restored window's last L-1 inputs
            # when continuing from stored state
            left = (conv_state[:, 1:].astype(bx.dtype) if from_cache
                    else jnp.zeros((B, L - 1, D), bx.dtype))
            padded = jnp.concatenate([left, bx], axis=1)
            out = sum(padded[:, k:k + S, :] * w[k] for k in range(L))
            # stash the last L gated inputs ending at the true prompt end
            start = jnp.maximum(prompt_len - 1, 0)
            conv_state = jax.lax.dynamic_slice(
                padded, (jnp.zeros((), start.dtype), start,
                         jnp.zeros((), start.dtype)), (B, L, D))
        else:
            conv_state = jnp.concatenate([conv_state[:, 1:], bx], axis=1)
            out = jnp.einsum("bld,ld->bd", conv_state, w)[:, None, :]
        if bias is not None:
            out = out + bias
        y = cg * out
        return nn.linear(lp["out_proj"], y), conv_state

    # -- forward ------------------------------------------------------------

    def backbone(self, params, input_ids, cache, mm=None, prompt_len=None,
                 inputs_embeds=None, from_cache: bool = False):
        c = self.config
        B, S = input_ids.shape
        pos = cache["pos"]
        is_prefill = S > 1
        if prompt_len is None:
            prompt_len = jnp.asarray(S, jnp.int32)
        x = (inputs_embeds if inputs_embeds is not None
             else nn.embedding(params["embed"], input_ids))
        if jnp.ndim(pos) == 0:
            positions = pos + jnp.arange(S)          # (S,)
        else:
            positions = pos[:, None] + jnp.arange(S)  # (B, S) per-slot decode
        cos, sin = gather_rope(self.cos, self.sin, positions)

        kc, vc, conv = cache["k"], cache["v"], cache["conv"]
        # mixed layer kinds → unrolled loop (layer params are per-layer lists)
        for i, lp in enumerate(params["layers"]):
            h = rms_norm(x, lp["operator_norm"]["w"], c.norm_eps)
            if self.layer_types[i] == "full_attention":
                s = self.attn_slot[i]
                out, kc, vc = self._attn(lp, h, cos, sin, kc, vc, s,
                                         pos, is_prefill, from_cache)
            else:
                s = self.conv_slot[i]
                out, state = self._conv(lp, h, conv[s], prompt_len,
                                        is_prefill, from_cache)
                conv = conv.at[s].set(state)
            x = x + out
            h = rms_norm(x, lp["ffn_norm"]["w"], c.norm_eps)
            x = x + nn.swiglu_mlp(lp["mlp"], h)

        cache = {**cache, "k": kc, "v": vc, "conv": conv}
        x = rms_norm(x, params["embedding_norm"]["w"], c.norm_eps)
        return x, cache

    def logits(self, params, hidden):
        return nn.linear(params["lm_head"], hidden)

    # -- loading ------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.bfloat16) -> dict:
        c = self.config
        prefix = "model."
        layers = []
        for i, kind in enumerate(self.layer_types):
            p = f"{prefix}layers.{i}."
            lp = {
                "operator_norm": nn.take_norm(src, p + "operator_norm", dtype),
                "ffn_norm": nn.take_norm(src, p + "ffn_norm", dtype),
                "mlp": {
                    "gate": nn.take_linear(src, p + "feed_forward.w1", dtype),
                    "up": nn.take_linear(src, p + "feed_forward.w3", dtype),
                    "down": nn.take_linear(src, p + "feed_forward.w2", dtype),
                },
            }
            if kind == "full_attention":
                lp.update({
                    "q": nn.take_linear(src, p + "self_attn.q_proj", dtype),
                    "k": nn.take_linear(src, p + "self_attn.k_proj", dtype),
                    "v": nn.take_linear(src, p + "self_attn.v_proj", dtype),
                    "o": nn.take_linear(src, p + "self_attn.out_proj", dtype),
                    "q_norm": nn.take_norm(src, p + "self_attn.q_layernorm", dtype),
                    "k_norm": nn.take_norm(src, p + "self_attn.k_layernorm", dtype),
                })
            else:
                # torch depthwise Conv1d weight (D, 1, L) → (L, D)
                wconv = src.get(p + "conv.conv.weight", dtype)
                lp["conv"] = {"w": jnp.transpose(wconv[:, 0, :], (1, 0))}
                if p + "conv.conv.bias" in src:
                    lp["conv"]["b"] = src.get(p + "conv.conv.bias", dtype)
                lp["in_proj"] = nn.take_linear(src, p + "conv.in_proj", dtype)
                lp["out_proj"] = nn.take_linear(src, p + "conv.out_proj", dtype)
            layers.append(lp)
        embed = nn.take_embedding(src, prefix + "embed_tokens", dtype)
        if c.tie_word_embeddings and "lm_head.weight" not in src:
            lm_head = {"w": embed["w"].T}
        else:
            lm_head = nn.take_linear(src, "lm_head", dtype)
        return {
            "embed": embed,
            "layers": layers,
            "embedding_norm": nn.take_norm(src, prefix + "embedding_norm", dtype),
            "lm_head": lm_head,
        }

    def init_random(self, key, dtype=jnp.float32, scale: float = 0.02) -> dict:
        c = self.config
        d = c.hidden_size
        ks = iter(jax.random.split(key, 12 * self.n_layers + 4))

        def w(shape):
            return jax.random.normal(next(ks), shape, dtype) * scale

        layers = []
        for kind in self.layer_types:
            lp = {
                "operator_norm": {"w": jnp.ones(d, dtype)},
                "ffn_norm": {"w": jnp.ones(d, dtype)},
                "mlp": {"gate": {"w": w((d, c.intermediate_size))},
                        "up": {"w": w((d, c.intermediate_size))},
                        "down": {"w": w((c.intermediate_size, d))}},
            }
            if kind == "full_attention":
                lp.update({
                    "q": {"w": w((d, d))},
                    "k": {"w": w((d, self.n_kv_heads * self.head_dim))},
                    "v": {"w": w((d, self.n_kv_heads * self.head_dim))},
                    "o": {"w": w((d, d))},
                    "q_norm": {"w": jnp.ones(self.head_dim, dtype)},
                    "k_norm": {"w": jnp.ones(self.head_dim, dtype)},
                })
            else:
                lp["conv"] = {"w": w((c.conv_L_cache, d))}
                lp["in_proj"] = {"w": w((d, 3 * d))}
                lp["out_proj"] = {"w": w((d, d))}
            layers.append(lp)
        embed_w = w((c.vocab_size, d))
        return {
            "embed": {"w": embed_w},
            "layers": layers,
            "embedding_norm": {"w": jnp.ones(d, dtype)},
            "lm_head": {"w": embed_w.T},
        }


# Tensor-parallel rules (SURVEY §2.5 — the reference is single-device;
# "TP is config, not surgery").  Attention is column-parallel q/k/v +
# row-parallel o; the MLP is column-parallel gate/up + row-parallel down;
# embeddings/vocab shard like qwen3.  The short-conv mixer stays REPLICATED:
# its fused in_proj splits (b|c|x) at hidden-size boundaries that don't
# align with contiguous tp shards of the 3d axis, so sharding it would make
# XLA reshard every split — and conv layers are a small share of the FLOPs.
# `\.` anchors keep `q.w` rules off `q_norm.w`.
LFM2_PARTITION_RULES = (
    # ^layers anchors keep these off nested towers that reuse the same
    # leaf names (lfm2vl's SigLIP params live under visual.layers.*)
    (r"^layers\.\d+\.(q|k|v)\.w$", (None, "tp")),
    (r"^layers\.\d+\.o\.w$", ("tp", None)),
    (r"^layers\.\d+\.mlp\.(gate|up)\.w$", (None, "tp")),
    (r"^layers\.\d+\.mlp\.down\.w$", ("tp", None)),
    (r"^embed\.w$", ("tp", None)),
    (r"^lm_head\.w$", (None, "tp")),
)
# KV cache (L, B, S, Hkv, D): slots over dp, kv heads over tp; the conv
# rolling state (Lc, B, L, D) shards slots over dp and replicates D (the
# conv mixer's weights are replicated too).
LFM2_CACHE_RULES = (
    (r"^(k|v)$", (None, "dp", None, "tp", None)),
    (r"^conv$", (None, "dp", None, None)),
)
Lfm2Model.partition_rules = LFM2_PARTITION_RULES
Lfm2Model.cache_rules = LFM2_CACHE_RULES
