"""Qwen3 text model — the canonical decode path.

Feature parity with src/models/qwen3/ (QKNormAttention GQA + SwiGLU MLP +
tied-embedding option, model.rs:19-200), built TPU-first:

- one `lax.scan` over stacked layer params (one compiled layer body instead
  of 28 unrolled ones — seconds, not minutes, of XLA time),
- KV cache as explicit state written with dynamic_update_slice (in-place
  under donation),
- prefill attends over the fresh block (cache is empty at pos 0); decode
  attends over the padded cache with a length mask.

Checkpoint layout is the HF one (model.layers.N.self_attn.q_proj.weight …).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core import cache as kv
from aha_tpu.core import nn
from aha_tpu.ops.attention import (attention_decode_at, attention_prefill,
                                   attention_prefill_at)
from aha_tpu.ops.norms import rms_norm
from aha_tpu.ops.rope import apply_rope, gather_rope, rope_table
from aha_tpu.io.weights import batched_load


@dataclasses.dataclass(frozen=True)
class Qwen3Config:
    vocab_size: int = 151936
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    max_position_embeddings: int = 40960
    tie_word_embeddings: bool = True
    attention_bias: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "Qwen3Config":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    @classmethod
    def from_file(cls, model_dir: str) -> "Qwen3Config":
        with open(os.path.join(model_dir, "config.json")) as f:
            return cls.from_dict(json.load(f))


class Qwen3Model:
    """Implements the CausalLM protocol (aha_tpu.core.engine)."""

    #: decode accepts a per-slot (B,) cache["pos"] vector — the contract the
    #: continuous-batching engine (core.batch_engine) needs
    supports_slot_decode = True
    #: cache pytree is pure K/V + pos, and prefill accepts from_cache=True —
    #: the engine may restore a stored prompt-prefix KV and prefill only the
    #: suffix (prefix caching)
    supports_prefix_cache = True
    #: pure K/V + position-gated reads: the cache can REWIND (pos -= k) with
    #: no state to unwind — speculative decoding verifies drafts then rolls
    #: back rejected rows for free (hybrids cannot: conv/rec state advanced
    #: by rejected tokens is unrecoverable)
    supports_token_rewind = True
    #: decode reads an int8 KV cache (init_cache(dtype=jnp.int8); serve with
    #: AHA_KV_INT8=1) — halves long-context cache bandwidth
    supports_kv_int8 = True

    def __init__(self, config: Qwen3Config, max_rope_len: int = 32768):
        self.config = config
        c = config
        self.n_layers = c.num_hidden_layers
        self.n_heads = c.num_attention_heads
        self.n_kv_heads = c.num_key_value_heads
        self.head_dim = c.head_dim
        self.cos, self.sin = rope_table(c.head_dim,
                                        min(max_rope_len, c.max_position_embeddings),
                                        c.rope_theta)

    # -- cache --------------------------------------------------------------

    def init_cache(self, batch: int, max_len: int, dtype=jnp.bfloat16) -> dict:
        import os

        # flat rows (see core/cache.py) — measured on one v5e: 220 vs 167
        # tok/s at a 16k cache and +30% at short context over trailing
        # (Hkv, D) minor dims.  AHA_KV_FLAT=0 opts back out.
        flat = os.environ.get("AHA_KV_FLAT", "1") == "1"
        return kv.init_kv_cache(self.n_layers, batch, max_len,
                                self.n_kv_heads, self.head_dim, dtype,
                                flat=flat)

    # -- forward ------------------------------------------------------------

    def _layer(self, lp: dict, x: jnp.ndarray, cos, sin,
               kc, vc, li, pos, is_prefill: bool, from_cache: bool = False,
               ksc=None, vsc=None):
        """One decoder block.  kc/vc: the whole stacked (L, B, S, Hkv, D)
        cache — the new K/V rows are written in place at (li, :, pos) and
        decode attention reads the addressed layer straight from the stack
        (attention_decode_at), so the 67 MB-per-layer slice copy a
        `cache[li]` gather would cost never materializes.  ksc/vsc: the
        per-(row, kv-head) f32 scale stacks of the int8 cache layout (None
        for the bf16 cache)."""
        c = self.config
        B, S, _ = x.shape
        quant = ksc is not None
        h = rms_norm(x, lp["ln1"]["w"], c.rms_norm_eps)
        nq = self.n_heads * self.head_dim
        nkv = self.n_kv_heads * self.head_dim
        if "qkv" in lp:
            # fused [q|k|v] projection (fuse_decode_params): one weight
            # stream instead of three — column blocks are independent, so
            # the split is bit-identical to separate matmuls
            qkv = nn.linear(lp["qkv"], h)
            q, k, v = (qkv[..., :nq], qkv[..., nq:nq + nkv],
                       qkv[..., nq + nkv:])
        else:
            q, k, v = (nn.linear(lp["q"], h), nn.linear(lp["k"], h),
                       nn.linear(lp["v"], h))
        q = q.reshape(B, S, self.n_heads, self.head_dim)
        k = k.reshape(B, S, self.n_kv_heads, self.head_dim)
        v = v.reshape(B, S, self.n_kv_heads, self.head_dim)
        q = rms_norm(q, lp["q_norm"]["w"], c.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"]["w"], c.rms_norm_eps)
        q, k = apply_rope(q, k, cos, sin)

        if quant:
            from aha_tpu.ops.attention import quantize_kv_rows

            k_store, k_s = quantize_kv_rows(k)
            v_store, v_s = quantize_kv_rows(v)
        else:
            k_store, v_store = k, v
        zero = jnp.zeros((), jnp.int32)
        li = li.astype(jnp.int32)
        flat = kc.ndim == 4
        if flat:
            # flat cache rows (B, S, Hkv·D) — int8 always, bf16 via
            # AHA_KV_FLAT; see core/cache.py for the tiling rationale
            k_store = k_store.reshape(B, S, -1)
            v_store = v_store.reshape(B, S, -1)
        if jnp.ndim(pos) == 0:
            idx = ((li, zero, pos, zero) if flat
                   else (li, zero, pos, zero, zero))
            kc = jax.lax.dynamic_update_slice(kc, k_store[None], idx)
            vc = jax.lax.dynamic_update_slice(vc, v_store[None], idx)
            if quant:
                # scale stacks are (L, B, Hkv, S) — write the (B, Hkv, S)
                # transpose of the per-row scales at column `pos`
                ksc = jax.lax.dynamic_update_slice(
                    ksc, k_s.transpose(0, 2, 1)[None], (li, zero, zero, pos))
                vsc = jax.lax.dynamic_update_slice(
                    vsc, v_s.transpose(0, 2, 1)[None], (li, zero, zero, pos))
        else:
            # per-slot decode (continuous batching): one scatter writes each
            # slot's new row at its own position
            b_idx = jnp.arange(pos.shape[0])
            kc = kc.at[li, b_idx, pos].set(k_store[:, 0])
            vc = vc.at[li, b_idx, pos].set(v_store[:, 0])
            if quant:
                ksc = ksc.at[li, b_idx, :, pos].set(k_s[:, 0])
                vsc = vsc.at[li, b_idx, :, pos].set(v_s[:, 0])
        if is_prefill and from_cache:
            # chunk prefill at offset pos: attend to the cached prefix rows
            # plus causal within the chunk (prefix caching / chunked prefill)
            if quant:
                from aha_tpu.ops.attention import attention_prefill_at_q8

                attn = attention_prefill_at_q8(q, kc, vc, ksc, vsc, li, pos)
            else:
                attn = attention_prefill_at(q, kc, vc, li, pos)
        elif is_prefill:
            # fresh block only (cache starts empty); flash kernel on TPU.
            # The quantized cache only affects what later steps READ — the
            # prefill itself attends over the full-precision fresh block.
            attn = attention_prefill(q, k, v, causal=True)
        elif quant:
            from aha_tpu.ops.attention import attention_decode_at_q8

            attn = attention_decode_at_q8(q, kc, vc, ksc, vsc, li, pos)
        else:
            # Pallas dynamic-length kernel: reads only live cache rows
            attn = attention_decode_at(q, kc, vc, li, pos)
        attn = attn.reshape(B, S, self.n_heads * self.head_dim)
        x = x + nn.linear(lp["o"], attn)

        h = rms_norm(x, lp["ln2"]["w"], c.rms_norm_eps)
        x = x + nn.swiglu_mlp(lp["mlp"], h)
        return x, kc, vc, ksc, vsc

    def backbone(self, params, input_ids: jnp.ndarray, cache: dict,
                 mm: Any = None, prompt_len=None,
                 from_cache: bool = False) -> tuple[jnp.ndarray, dict]:
        x = nn.embedding(params["embed"], input_ids)
        return self.run_layers(params, x, cache, from_cache=from_cache)

    def _use_fused_layer(self, params, x, cache,
                         is_prefill: bool) -> str | None:
        """Static (trace-time) gate for the one-launch fused decode layer.
        Returns the kernel variant ("bf16" dense / "q8" GGUF int8 grid)
        or None for the per-op path."""
        from aha_tpu.ops import attention as A
        from aha_tpu.utils.device import on_tpu

        if (is_prefill or os.environ.get("AHA_FUSED_LAYER", "1") != "1"
                or not on_tpu()):
            return None
        B, S, _ = x.shape
        if (B != 1 or S != 1 or x.dtype != jnp.bfloat16
                or jnp.ndim(cache["pos"]) != 0
                or cache["k"].dtype != jnp.bfloat16
                or cache["k"].ndim != 4):      # flat bf16 rows only
            return None
        from aha_tpu.ops.fused_layer import (fused_layer_q8_supported,
                                             fused_layer_supported)

        geo = (params["layers"], self.config.hidden_size, self.n_heads,
               self.n_kv_heads, self.head_dim,
               self.config.intermediate_size, A._window())
        if fused_layer_supported(*geo):
            return "bf16"
        if fused_layer_q8_supported(*geo):
            return "q8"
        return None

    def run_layers(self, params, x: jnp.ndarray, cache: dict,
                   from_cache: bool = False) -> tuple[jnp.ndarray, dict]:
        """Decoder stack over precomputed input embeddings — multimodal
        wrappers (ASR/VLM) splice their modality embeddings first."""
        B, S, _ = x.shape
        pos = cache["pos"]
        if jnp.ndim(pos) == 0:
            positions = pos + jnp.arange(S)          # (S,)
        else:
            positions = pos[:, None] + jnp.arange(S)  # (B, S) per-slot decode
        cos, sin = gather_rope(self.cos, self.sin, positions)
        is_prefill = S > 1
        quant = cache["k"].dtype == jnp.int8

        fused_mode = self._use_fused_layer(params, x, cache, is_prefill)
        if fused_mode:
            # whole-stack fused decode kernel (ops/fused_layer.py): one
            # Pallas launch per decode step streams every layer's weights
            # via manual DMA and runs norms/rope/attention/SwiGLU in VMEM —
            # measured 489 vs 431 tok/s over the XLA backbone + per-layer
            # attention kernel at short windows (BENCH_NOTES r5)
            from aha_tpu.ops import attention as A

            win = A._window()
            lyr = params["layers"]
            eps = self.config.rms_norm_eps
            cosr = jnp.concatenate([cos, cos], axis=-1).reshape(
                1, self.head_dim)
            sinr = jnp.concatenate([sin, sin], axis=-1).reshape(
                1, self.head_dim)
            if fused_mode == "bf16":
                from aha_tpu.ops.fused_layer import fused_decode_stack

                x, kc, vc = fused_decode_stack(
                    x, lyr, pos, cosr, sinr, cache["k"], cache["v"],
                    win, eps)
            else:
                from aha_tpu.ops.fused_layer import fused_decode_stack_q8

                x, kc, vc = fused_decode_stack_q8(
                    x, lyr, pos, cosr, sinr, cache["k"], cache["v"],
                    win, eps)
            cache = {**cache, "k": kc, "v": vc}
            x = rms_norm(x, params["norm"]["w"], self.config.rms_norm_eps)
            return x, cache

        def body(carry, xs):
            x, kc, vc, ksc, vsc = carry
            lp, li = xs
            x, kc, vc, ksc, vsc = self._layer(lp, x, cos, sin, kc, vc, li,
                                              pos, is_prefill, from_cache,
                                              ksc, vsc)
            return (x, kc, vc, ksc, vsc), None

        carry0 = (x, cache["k"], cache["v"],
                  cache.get("k_scale") if quant else None,
                  cache.get("v_scale") if quant else None)
        unroll = int(os.environ.get("AHA_LAYER_UNROLL", "1"))
        (x, kc, vc, ksc, vsc), _ = jax.lax.scan(
            body, carry0, (params["layers"], jnp.arange(self.n_layers)),
            unroll=min(unroll, self.n_layers) if unroll > 1 else 1)
        cache = {**cache, "k": kc, "v": vc}
        if quant:
            cache["k_scale"] = ksc
            cache["v_scale"] = vsc
        x = rms_norm(x, params["norm"]["w"], self.config.rms_norm_eps)
        return x, cache

    def logits(self, params, hidden: jnp.ndarray) -> jnp.ndarray:
        return nn.linear(params["lm_head"], hidden)

    def greedy_token(self, params, hidden: jnp.ndarray) -> jnp.ndarray:
        """Greedy next token for ONE hidden state — on TPU the fused
        head-GEMV+argmax Pallas kernel (ops/lm_head.py: the 600 KB logits
        vector never round-trips through HBM); elsewhere, or for head
        layouts the kernel doesn't cover, logits + fast_argmax.  Both
        pick the FIRST index of the maximum; the fused dot's f32
        accumulation order may differ from XLA's, so ties between
        float-adjacent logits can break differently — same numerics class
        as any kernel/XLA matmul pairing."""
        from aha_tpu.core.sampling import fast_argmax
        from aha_tpu.utils.device import on_tpu

        if on_tpu():
            try:
                from aha_tpu.ops.lm_head import head_argmax

                return head_argmax(params["lm_head"], hidden)
            except ValueError:
                pass
        logits = self.logits(params, hidden).astype(jnp.float32)
        return fast_argmax(logits.reshape(-1)).astype(jnp.int32)

    def forward_hidden(self, params, input_ids: jnp.ndarray,
                       valid_len: jnp.ndarray | None = None) -> jnp.ndarray:
        """Cache-free full forward returning final hidden states — the
        embedding/reranker path (qwen3_embedding/mod.rs:38-66)."""
        cache = self.init_cache(input_ids.shape[0], input_ids.shape[1],
                                jnp.float32)
        hidden, _ = self.backbone(params, input_ids, cache)
        return hidden

    # -- loading ------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.bfloat16) -> dict:
        c = self.config
        prefix = "model."
        layers = []
        for i in range(self.n_layers):
            p = f"{prefix}layers.{i}."
            layers.append({
                "ln1": nn.take_norm(src, p + "input_layernorm", dtype),
                "ln2": nn.take_norm(src, p + "post_attention_layernorm", dtype),
                "q": nn.take_linear(src, p + "self_attn.q_proj", dtype),
                "k": nn.take_linear(src, p + "self_attn.k_proj", dtype),
                "v": nn.take_linear(src, p + "self_attn.v_proj", dtype),
                "o": nn.take_linear(src, p + "self_attn.o_proj", dtype),
                "q_norm": nn.take_norm(src, p + "self_attn.q_norm", dtype),
                "k_norm": nn.take_norm(src, p + "self_attn.k_norm", dtype),
                "mlp": {
                    "gate": nn.take_linear(src, p + "mlp.gate_proj", dtype),
                    "up": nn.take_linear(src, p + "mlp.up_proj", dtype),
                    "down": nn.take_linear(src, p + "mlp.down_proj", dtype),
                },
            })
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
        """Tiny random params for weight-free tests."""
        c = self.config
        ks = iter(jax.random.split(key, 64))
        d, hd = c.hidden_size, c.head_dim

        def w(k, shape):
            return jax.random.normal(k, shape, dtype) * scale

        def layer(k):
            kk = iter(jax.random.split(k, 16))
            return {
                "ln1": {"w": jnp.ones(d, dtype)},
                "ln2": {"w": jnp.ones(d, dtype)},
                "q": {"w": w(next(kk), (d, self.n_heads * hd))},
                "k": {"w": w(next(kk), (d, self.n_kv_heads * hd))},
                "v": {"w": w(next(kk), (d, self.n_kv_heads * hd))},
                "o": {"w": w(next(kk), (self.n_heads * hd, d))},
                "q_norm": {"w": jnp.ones(hd, dtype)},
                "k_norm": {"w": jnp.ones(hd, dtype)},
                "mlp": {
                    "gate": {"w": w(next(kk), (d, c.intermediate_size))},
                    "up": {"w": w(next(kk), (d, c.intermediate_size))},
                    "down": {"w": w(next(kk), (c.intermediate_size, d))},
                },
            }

        layers = [layer(next(ks)) for _ in range(self.n_layers)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        embed_w = w(next(ks), (c.vocab_size, d))
        return {
            "embed": {"w": embed_w},
            "layers": stacked,
            "norm": {"w": jnp.ones(d, dtype)},
            "lm_head": {"w": embed_w.T if c.tie_word_embeddings
                        else w(next(ks), (d, c.vocab_size))},
        }


def _fuse_out_axis(parts: list) -> dict | None:
    """Concatenate weight dicts on the output (column) axis — dense "w"
    or the quantized grids ("qt"/"st", "q4"/"s4"[/"b4"]).  Column blocks
    of a matmul are independent, and both quant grids scale per
    (K-group, column), so the concat is bit-identical to separate
    matmuls.  Returns None for mixed grids (e.g. a Q6_K tensor packed
    int8 next to Q4_K tensors packed int4 — llama.cpp mixes formats
    per-tensor): those stay separate."""
    if all("w" in p for p in parts):
        fused = {"w": jnp.concatenate([p["w"] for p in parts], axis=-1)}
        if "b" in parts[0]:
            if not all("b" in p for p in parts):
                return None
            fused["b"] = jnp.concatenate([p["b"] for p in parts], axis=-1)
        return fused
    if any("b" in p for p in parts):
        return None
    if all("qt" in p for p in parts):
        if len({p["qt"].shape[-2] for p in parts}) != 1:
            return None
        return {"qt": jnp.concatenate([p["qt"] for p in parts], axis=-1),
                "st": jnp.concatenate([p["st"] for p in parts], axis=-1)}
    if all("q4" in p for p in parts):
        if len({p["q4"].shape[-2] for p in parts}) != 1:
            return None
        return {"q4": jnp.concatenate([p["q4"] for p in parts], axis=-1),
                "s4": jnp.concatenate([p["s4"] for p in parts], axis=-1),
                "b4": jnp.concatenate([p["b4"] for p in parts], axis=-1)}
    return None


def pad_quant_cols(p: dict, mult: int = 128) -> dict:
    """Zero-pad a quantized weight dict's output axis to a multiple of
    `mult` (the quant kernels' column grid).  Pad columns carry zero int
    values AND zero scales, so they dequantize to exact zeros; callers
    slice them off after the matmul.  Dense "w" dicts pass through."""
    key = "qt" if "qt" in p else ("q4" if "q4" in p else None)
    if key is None:
        return p
    n = p[key].shape[-1]
    pad = (-n) % mult
    if pad == 0:
        return p
    widths = [(0, 0)] * (p[key].ndim - 1) + [(0, pad)]
    return {k: jnp.pad(v, widths) for k, v in p.items()}


def fuse_decode_params(params: dict) -> dict:
    """Concatenate each layer's q/k/v (and gate/up) weights into single
    [q|k|v] / [gate|up] matrices on the output axis.

    M=1 decode is weight-bandwidth-bound and pays a fixed per-op cost for
    every HLO — and for every Pallas quant-matmul launch: the r5 breakdown
    measured the UNFUSED q8 layer matmuls at 1.43 ms/step, identical to
    bf16 despite streaming half the bytes, because 7 small kernel calls
    per layer ate the savings.  Fusing turns them into qkv|o|gateup|down
    without changing a single output bit (column blocks are independent;
    both quant grids scale per column).  Applied by TextEngine at init for
    single-device serving only — the fused output axis interleaves q/k/v
    shard boundaries, so tensor-parallel layouts keep the separate weights
    (partition rules anchor on the q|k|v names).  Layers mixing quant
    grids per tensor (q8 next to q4) stay separate.
    """
    layers = params.get("layers")
    if (not isinstance(layers, dict) or "q" not in layers
            or not isinstance(layers.get("mlp"), dict)):
        return params
    layers = dict(layers)
    fused = _fuse_out_axis([layers["q"], layers["k"], layers["v"]])
    if fused is not None:
        for k_ in ("q", "k", "v"):
            layers.pop(k_)
        layers["qkv"] = fused
    mlp = layers["mlp"]
    if "gate" in mlp:
        gu = _fuse_out_axis([mlp["gate"], mlp["up"]])
        if gu is not None:
            mlp = dict(mlp)
            mlp.pop("gate")
            mlp.pop("up")
            mlp["gateup"] = gu
            layers["mlp"] = mlp
    return {**params, "layers": layers}


Qwen3Model.fuse_params = staticmethod(fuse_decode_params)


# Tensor-parallel partition rules (aha_tpu.parallel.shard_params):
# attention heads and MLP hidden split over "tp"; embeddings/vocab split on
# the vocab axis; norms replicated.
QWEN3_PARTITION_RULES = (
    (r"layers\.(q|k|v)\.w", (None, None, "tp")),
    (r"layers\.o\.w", (None, "tp", None)),
    (r"layers\.mlp\.(gate|up)\.w", (None, None, "tp")),
    (r"layers\.mlp\.down\.w", (None, "tp", None)),
    # segment-anchored: must not catch vision towers' patch_embed/pos_embed
    (r"(^|\.)embed\.w", ("tp", None)),
    (r"lm_head\.w", (None, "tp")),
)

# KV cache: shard the kv-head axis over tp — (L, B, S, Hkv, D), or the
# flat (L, B, S, Hkv·D) layout where a contiguous Hkv·D shard is exactly a
# head group (the 5-tuple spec truncates to the 4-D rank in shard_params).
# The int8 layout's per-(row, kv-head) scale stacks (L, B, Hkv, S) shard
# their Hkv axis the same way so scales stay co-located with their rows.
# The slot axis B shards over "dp" (continuous batching data-parallel:
# each device group decodes B/dp slots); shard_params drops the dp axis
# wherever B isn't divisible — in particular B=1 single-stream caches and
# the batch engine's B=1 admission-prefill caches stay replicated.
QWEN3_CACHE_RULES = (
    (r"^(k|v)$", (None, "dp", None, "tp", None)),
    (r"^(k|v)_scale$", (None, "dp", "tp", None)),
)
Qwen3Model.partition_rules = QWEN3_PARTITION_RULES
Qwen3Model.cache_rules = QWEN3_CACHE_RULES


def load_stop_token_ids(model_dir: str, default: tuple[int, ...] = ()) -> list[int]:
    """eos ids from generation_config.json (falls back to config.json)."""
    for name in ("generation_config.json", "config.json"):
        p = os.path.join(model_dir, name)
        if os.path.exists(p):
            with open(p) as f:
                eos = json.load(f).get("eos_token_id")
            if eos is None:
                continue
            return list(eos) if isinstance(eos, list) else [eos]
    return list(default)
