"""GLM-OCR: GLM-4V-style vision tower + GLM text decoder with partial-rotary
interleaved M-RoPE.

Reference: src/models/glm_ocr/model.rs (vision :450-869, text :152-448 /
:914-1270) and position_embed/rope.rs:245-313 (partial interleaved rotary).

Where the reference and the upstream transformers Glm4v implementation
disagree, this follows transformers (the checkpoint's training semantics):
- patches are arranged in merge-blocked order (the reference's processor
  emits row-major patches but its downsample assumes blocked units,
  processor.rs:117 vs model.rs:859);
- the vision tower applies the learned position embedding, resampled
  bicubically to the image grid (Glm4vVisionEmbeddings; absent from the
  reference) and a post-conv RMS norm;
- text attention carries q/k/v biases (reference uses linear_no_bias;
  biases are loaded when present so both layouts work).

TPU-first: vision cos/sin and pos-embed gather coordinates are host
geometry (mm arrays padded to patch buckets); the text stack is
scan-stacked with the engine's donated KV cache; decode reuses the
rope_delta trick from the Qwen-VL families.
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
from aha_tpu.ops.attention import (attention_decode_at,
                                   attention_prefill, sdpa)
from aha_tpu.ops.norms import rms_norm
from aha_tpu.io.weights import batched_load


@dataclasses.dataclass(frozen=True)
class GlmOcrVisionConfig:
    depth: int = 24
    hidden_size: int = 1024
    num_heads: int = 8
    in_channels: int = 3
    image_size: int = 336
    patch_size: int = 14
    rms_norm_eps: float = 1e-5
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    out_hidden_size: int = 1536
    intermediate_size: int = 4096
    attention_bias: bool = False
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def from_dict(cls, d: dict) -> "GlmOcrVisionConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


@dataclasses.dataclass(frozen=True)
class GlmOcrTextConfig:
    vocab_size: int = 59264
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int | None = None
    max_position_embeddings: int = 32768
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    partial_rotary_factor: float = 0.5
    mrope_section: tuple = (8, 12, 12)
    attention_bias: bool = True

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim_ * self.partial_rotary_factor)


@dataclasses.dataclass(frozen=True)
class GlmOcrConfig:
    vision: GlmOcrVisionConfig = GlmOcrVisionConfig()
    text: GlmOcrTextConfig = GlmOcrTextConfig()
    image_token_id: int = 59280
    image_start_token_id: int = 59256
    image_end_token_id: int = 59257

    @classmethod
    def from_file(cls, model_dir: str) -> "GlmOcrConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            d = json.load(f)
        tc = d.get("text_config", d)
        rp = tc.get("rope_parameters") or tc.get("rope_scaling") or {}
        tf = {f.name for f in dataclasses.fields(GlmOcrTextConfig)}
        text_kw = {k: v for k, v in tc.items() if k in tf}
        if "mrope_section" in rp:
            text_kw["mrope_section"] = tuple(rp["mrope_section"])
        if "partial_rotary_factor" in rp:
            text_kw["partial_rotary_factor"] = rp["partial_rotary_factor"]
        if "rope_theta" in rp:
            text_kw["rope_theta"] = rp["rope_theta"]
        text = GlmOcrTextConfig(**text_kw)
        vision = GlmOcrVisionConfig.from_dict(d.get("vision_config", {}))
        return cls(vision=vision, text=text,
                   image_token_id=d.get("image_token_id", 59280),
                   image_start_token_id=d.get("image_start_token_id", 59256),
                   image_end_token_id=d.get("image_end_token_id", 59257))


# ---------------------------------------------------------------------------
# Host geometry
# ---------------------------------------------------------------------------


def glm_vision_geometry(grids: list[tuple[int, int, int]],
                        v: GlmOcrVisionConfig) -> dict:
    """Per-patch rope freqs and pos-embed coordinates in merge-blocked order
    (transformers Glm4vVisionModel.rot_pos_emb)."""
    m = v.spatial_merge_size
    hs, ws, seg = [], [], []
    for n, (t, h, w) in enumerate(grids):
        hp = np.broadcast_to(np.arange(h)[:, None], (h, w))
        wp = np.broadcast_to(np.arange(w)[None, :], (h, w))

        def block(a):
            return (a.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3)
                    .reshape(-1))

        hb, wb = block(hp), block(wp)
        hs.append(np.tile(hb, t))
        ws.append(np.tile(wb, t))
        seg.append(np.full(t * h * w, n, np.int32))
    return {"h": np.concatenate(hs).astype(np.int32),
            "w": np.concatenate(ws).astype(np.int32),
            "seg": np.concatenate(seg)}


def glm_rope_index(input_ids: list[int], grids: list[tuple[int, int, int]],
                   cfg: GlmOcrConfig) -> tuple[np.ndarray, int]:
    """(3, S) t/h/w position ids + rope_delta (model.rs:1088-1167)."""
    m = cfg.vision.spatial_merge_size
    ids = np.asarray(input_ids)
    pos = np.zeros((3, len(ids)), np.int64)
    st = 0
    i = 0
    g = 0
    while i < len(ids):
        if ids[i] == cfg.image_token_id:
            t, h, w = grids[g]
            g += 1
            lh, lw = h // m, w // m
            n = t * lh * lw
            tt = np.repeat(np.arange(t), lh * lw)
            hh = np.tile(np.repeat(np.arange(lh), lw), t)
            ww = np.tile(np.arange(lw), t * lh)
            pos[0, i:i + n] = tt + st
            pos[1, i:i + n] = hh + st
            pos[2, i:i + n] = ww + st
            st += max(t, lh, lw)
            i += n
        else:
            start = i
            while i < len(ids) and ids[i] != cfg.image_token_id:
                i += 1
            run = i - start
            pos[:, start:i] = st + np.arange(run)
            st += run
    return pos, int(st - len(ids))


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------


class GlmOcrVisionTower:
    def __init__(self, v: GlmOcrVisionConfig):
        self.v = v

    def encode(self, p: dict, mm: dict) -> jnp.ndarray:
        """mm: patches (N, C·tp·p·p) padded to a bucket, vis_cos/vis_sin
        (N, hd), pos_resample (N, g²) — a host-computed bicubic-resize ×
        blocked-gather matrix over the learned pos table, applied as one
        matmul — and patch_mask (1,1,1,N) masking the padded keys."""
        v = self.v
        x = nn.linear(p["patch"], mm["patches"])          # (N, D)
        x = rms_norm(x, p["post_conv_norm"]["w"], v.rms_norm_eps)
        pos = mm["pos_resample"] @ p["pos_embed"].astype(jnp.float32)
        x = x + pos.astype(x.dtype)

        cos, sin = mm["vis_cos"], mm["vis_sin"]           # (N, hd)
        nh, hd = v.num_heads, v.head_dim

        def block(x, lp):
            h = rms_norm(x, lp["norm1"]["w"], v.rms_norm_eps)
            qkv = nn.linear(lp["qkv"], h).reshape(-1, 3, nh, hd)
            q, k_, vv = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            q = _rot_vision(q, cos, sin)
            k_ = _rot_vision(k_, cos, sin)
            a = sdpa(q[None], k_[None], vv[None],
                     mm.get("patch_mask"))[0]
            x = x + nn.linear(lp["proj"], a.reshape(-1, nh * hd))
            h = rms_norm(x, lp["norm2"]["w"], v.rms_norm_eps)
            x = x + nn.swiglu_mlp(lp["mlp"], h)
            return x, None

        x, _ = jax.lax.scan(block, x, p["blocks"])
        x = rms_norm(x, p["post_norm"]["w"], v.rms_norm_eps)

        # downsample: conv m×m stride m over one blocked unit == a single
        # full-window dot product per unit
        m = v.spatial_merge_size
        D = v.hidden_size
        x = x.reshape(-1, m, m, D)                        # blocked units
        w = p["downsample"]["w"].astype(x.dtype)          # (O, D, m, m)
        x = jnp.einsum("nijd,odij->no", x, w) + p["downsample"]["b"]
        # merger (model.rs:604-653)
        mp = p["merger"]
        h = nn.linear(mp["proj"], x)
        h = nn.ln(mp["post_norm"], h, eps=v.rms_norm_eps)
        h = jax.nn.gelu(h, approximate=False)
        return nn.linear(mp["down"], jax.nn.silu(nn.linear(mp["gate"], h))
                         * nn.linear(mp["up"], h))

def glm_pos_resample_matrix(geom: dict, grids: list[tuple[int, int, int]],
                            table_grid: int) -> np.ndarray:
    """(N, g²) matrix R with R @ pos_table == per-patch interpolated pos
    embedding: bicubic (torch standard, border-replicate) resize of the
    (g, g) table to each image's grid, gathered at the blocked coords
    (transformers Glm4vVisionEmbeddings with grid_sample
    padding_mode=border)."""
    from aha_tpu.utils.interpolate import resize_weights_1d

    g = table_grid
    rows = np.zeros((len(geom["h"]), g * g), np.float32)
    for n, (t, gh, gw) in enumerate(grids):
        sel = geom["seg"] == n
        wh = resize_weights_1d(g, gh, "cubic")            # (gh, g)
        ww = resize_weights_1d(g, gw, "cubic")            # (gw, g)
        hh = geom["h"][sel]
        wwc = geom["w"][sel]
        rows[sel] = (wh[hh][:, :, None] * ww[wwc][:, None, :]).reshape(
            sel.sum(), g * g)
    return rows


def _rot_vision(x, cos, sin):
    """Split-half rotation on (N, nh, hd) with (N, hd) tables
    (rope.rs:75-94)."""
    c = cos[:, None, :].astype(x.dtype)
    s = sin[:, None, :].astype(x.dtype)
    h1, h2 = jnp.split(x, 2, axis=-1)
    rot = jnp.concatenate([-h2, h1], axis=-1)
    return x * c + rot * s


def glm_vision_rope(h: np.ndarray, w: np.ndarray,
                    v: GlmOcrVisionConfig) -> tuple[np.ndarray, np.ndarray]:
    """(N, hd) cos/sin from 2-D coords (model.rs:271-341)."""
    dim = v.head_dim // 2
    inv = 1.0 / (v.rope_theta ** (np.arange(0, dim, 2) / dim))
    hf = h[:, None] * inv[None]
    wf = w[:, None] * inv[None]
    freqs = np.concatenate([hf, wf], axis=1)              # (N, hd/2)
    emb = np.concatenate([freqs, freqs], axis=1)          # (N, hd)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


# ---------------------------------------------------------------------------
# Text decoder with partial interleaved M-RoPE
# ---------------------------------------------------------------------------


def _glm_mrope_cos_sin(pos: jnp.ndarray, cfg: GlmOcrTextConfig
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """pos (3, S) → interleaved cos/sin (S, rotary_dim)
    (rope.rs:245-313 / transformers apply_multimodal_rotary_pos_emb)."""
    rd = cfg.rotary_dim
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, rd, 2) / rd))
    freqs = pos[:, :, None].astype(jnp.float32) * jnp.asarray(
        inv, jnp.float32)[None, None]                    # (3, S, rd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)        # (3, S, rd)
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    sections = [s * 2 for s in cfg.mrope_section]

    def select(t):
        parts = []
        off = 0
        for i, s in enumerate(sections):
            parts.append(t[i % 3, :, off:off + s])
            off += s
        return jnp.concatenate(parts, axis=-1)            # (S, rd)

    cos, sin = select(cos), select(sin)
    # interleave the first half: [c0, c0, c1, c1, ...]
    cos = jnp.repeat(cos[:, :rd // 2], 2, axis=-1)
    sin = jnp.repeat(sin[:, :rd // 2], 2, axis=-1)
    return cos, sin


def _apply_partial_interleaved(x, cos, sin):
    """Rotate the first rotary_dim of (B, S, H, hd) with interleaved pairs."""
    rd = cos.shape[-1]
    xr, xp = x[..., :rd], x[..., rd:]
    pairs = xr.reshape(*xr.shape[:-1], rd // 2, 2)
    rot = jnp.stack([-pairs[..., 1], pairs[..., 0]],
                    axis=-1).reshape(xr.shape)
    c = cos[None, :, None, :].astype(x.dtype)
    s = sin[None, :, None, :].astype(x.dtype)
    return jnp.concatenate([xr * c + rot * s, xp], axis=-1)


class GlmOcrModel:
    """Implements the CausalLM protocol; vision features scatter into the
    embedding sequence at image-token positions."""

    def __init__(self, config: GlmOcrConfig, max_rope_len: int = 8192):
        self.config = config
        self.tower = GlmOcrVisionTower(config.vision)
        c = config.text
        self.n_layers = c.num_hidden_layers
        self.n_heads = c.num_attention_heads
        self.n_kv_heads = c.num_key_value_heads
        self.head_dim = c.head_dim_

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16):
        cache = kv.init_kv_cache(self.n_layers, batch, max_len,
                                 self.n_kv_heads, self.head_dim, dtype)
        cache["rope_delta"] = jnp.zeros((), jnp.int32)
        return cache

    def backbone(self, params, input_ids, cache, mm: Any = None,
                 prompt_len=None):
        c = self.config.text
        B, S = input_ids.shape
        x = nn.embedding(params["text"]["embed"], input_ids)
        if mm is not None:
            feats = self.tower.encode(params["visual"], mm)
            vis_mask = (input_ids == self.config.image_token_id)[0]
            idx = jnp.clip(jnp.cumsum(vis_mask) - 1, 0, feats.shape[0] - 1)
            x = jnp.where(vis_mask[None, :, None],
                          feats[idx][None].astype(x.dtype), x)
            pos = mm["position_ids"]
            cache = {**cache, "rope_delta": mm["rope_delta"]}
        else:
            eff = cache["pos"] + cache.get("rope_delta", 0)
            pos = jnp.broadcast_to(eff + jnp.arange(S), (3, S))
            if S > 1:
                cache = {**cache, "rope_delta": jnp.zeros((), jnp.int32)}
        cos, sin = _glm_mrope_cos_sin(pos, c)

        pos_c = cache["pos"]

        def body(carry, xs):
            x, kc, vc = carry
            lp, li = xs
            h = rms_norm(x, lp["ln_in"]["w"], c.rms_norm_eps)
            q = nn.linear(lp["q"], h).reshape(B, S, self.n_heads,
                                              self.head_dim)
            k = nn.linear(lp["k"], h).reshape(B, S, self.n_kv_heads,
                                              self.head_dim)
            v = nn.linear(lp["v"], h).reshape(B, S, self.n_kv_heads,
                                              self.head_dim)
            q = _apply_partial_interleaved(q, cos, sin)
            k = _apply_partial_interleaved(k, cos, sin)
            zero = jnp.zeros((), pos_c.dtype)
            lii = li.astype(pos_c.dtype)
            kc = jax.lax.dynamic_update_slice(kc, k[None],
                                              (lii, zero, pos_c, zero, zero))
            vc = jax.lax.dynamic_update_slice(vc, v[None],
                                              (lii, zero, pos_c, zero, zero))
            attn = (attention_prefill(q, k, v, causal=True) if S > 1
                    else attention_decode_at(q, kc, vc, lii, pos_c))
            attn = attn.reshape(B, S, self.n_heads * self.head_dim)
            attn = nn.linear(lp["o"], attn)
            attn = rms_norm(attn, lp["ln_post_attn"]["w"], c.rms_norm_eps)
            x = x + attn
            h = rms_norm(x, lp["ln_mid"]["w"], c.rms_norm_eps)
            gu = nn.linear(lp["gate_up"], h)
            g, u = jnp.split(gu, 2, axis=-1)
            h = nn.linear(lp["down"], jax.nn.silu(g) * u)
            h = rms_norm(h, lp["ln_post_mlp"]["w"], c.rms_norm_eps)
            x = x + h
            return (x, kc, vc), None

        tp = params["text"]
        (x, kc, vc), _ = jax.lax.scan(
            body, (x, cache["k"], cache["v"]),
            (tp["layers"], jnp.arange(self.n_layers)))
        cache = {**cache, "k": kc, "v": vc}
        x = rms_norm(x, tp["norm"]["w"], c.rms_norm_eps)
        return x, cache

    def logits(self, params, hidden):
        return nn.linear(params["text"]["lm_head"], hidden)

    # -- loading --------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.bfloat16) -> dict:
        c = self.config
        vs = "model.visual."
        blocks = []
        for i in range(c.vision.depth):
            b = f"{vs}blocks.{i}."
            blocks.append({
                "norm1": nn.take_norm(src, b + "norm1", dtype),
                "norm2": nn.take_norm(src, b + "norm2", dtype),
                "qkv": nn.take_linear(src, b + "attn.qkv", dtype),
                "proj": nn.take_linear(src, b + "attn.proj", dtype),
                "mlp": {
                    "gate": nn.take_linear(src, b + "mlp.gate_proj", dtype),
                    "up": nn.take_linear(src, b + "mlp.up_proj", dtype),
                    "down": nn.take_linear(src, b + "mlp.down_proj", dtype),
                },
            })
        patch_w = src.get(vs + "patch_embed.proj.weight")
        patch = {"w": jnp.asarray(
            np.asarray(patch_w).reshape(c.vision.hidden_size, -1).T, dtype)}
        if vs + "patch_embed.proj.bias" in src:
            patch["b"] = jnp.asarray(src.get(vs + "patch_embed.proj.bias"),
                                     dtype)
        visual = {
            "patch": patch,
            "post_conv_norm": nn.take_norm(src, vs + "post_conv_layernorm",
                                           dtype),
            "pos_embed": jnp.asarray(
                src.get(vs + "embeddings.position_embedding.weight"), dtype),
            "blocks": jax.tree.map(lambda *xs: np.stack(xs), *blocks),
            "post_norm": nn.take_norm(src, vs + "post_layernorm", dtype),
            "downsample": {
                "w": jnp.asarray(src.get(vs + "downsample.weight"), dtype),
                "b": jnp.asarray(src.get(vs + "downsample.bias"), dtype),
            },
            "merger": {
                "proj": nn.take_linear(src, vs + "merger.proj", dtype),
                "post_norm": nn.take_norm(
                    src, vs + "merger.post_projection_norm", dtype),
                "gate": nn.take_linear(src, vs + "merger.gate_proj", dtype),
                "up": nn.take_linear(src, vs + "merger.up_proj", dtype),
                "down": nn.take_linear(src, vs + "merger.down_proj", dtype),
            },
        }
        ts = "model.language_model."
        layers = []
        for i in range(c.text.num_hidden_layers):
            p = f"{ts}layers.{i}."
            layers.append({
                "ln_in": nn.take_norm(src, p + "input_layernorm", dtype),
                "ln_mid": nn.take_norm(src, p + "post_attention_layernorm",
                                       dtype),
                "ln_post_attn": nn.take_norm(
                    src, p + "post_self_attn_layernorm", dtype),
                "ln_post_mlp": nn.take_norm(src, p + "post_mlp_layernorm",
                                            dtype),
                "q": nn.take_linear(src, p + "self_attn.q_proj", dtype),
                "k": nn.take_linear(src, p + "self_attn.k_proj", dtype),
                "v": nn.take_linear(src, p + "self_attn.v_proj", dtype),
                "o": nn.take_linear(src, p + "self_attn.o_proj", dtype),
                "gate_up": nn.take_linear(src, p + "mlp.gate_up_proj", dtype),
                "down": nn.take_linear(src, p + "mlp.down_proj", dtype),
            })
        embed = nn.take_embedding(src, ts + "embed_tokens", dtype)
        if "lm_head.weight" in src:
            lm_head = nn.take_linear(src, "lm_head", dtype)
        else:
            lm_head = {"w": embed["w"].T}
        text = {
            "embed": embed,
            "layers": jax.tree.map(lambda *xs: np.stack(xs), *layers),
            "norm": nn.take_norm(src, ts + "norm", dtype),
            "lm_head": lm_head,
        }
        return {"visual": visual, "text": text}


# Tensor-parallel partition rules (SURVEY §5.8).  Stacked text layers
# (leading L axis): attention heads and the fused gate_up MLP split over
# tp; the ViT (stacked "visual.blocks") shards its FFN.  GSPMD handles the
# gate/up interleave of the fused projection.
GLM_OCR_PARTITION_RULES = (
    (r"text\.layers\.(q|k|v)\.w", (None, None, "tp")),
    (r"text\.layers\.(q|k|v)\.b", (None, "tp")),
    (r"text\.layers\.o\.w", (None, "tp", None)),
    (r"text\.layers\.gate_up\.w", (None, None, "tp")),
    (r"text\.layers\.down\.w", (None, "tp", None)),
    (r"text\.embed\.w", ("tp", None)),
    (r"text\.lm_head\.w", (None, "tp")),
    (r"visual\.blocks\.mlp\.(gate|up)\.w", (None, None, "tp")),
    (r"visual\.blocks\.mlp\.(gate|up)\.b", (None, "tp")),
    (r"visual\.blocks\.mlp\.down\.w", (None, "tp", None)),
    (r"visual\.merger\.(gate|up)\.w", (None, "tp")),
    (r"visual\.merger\.(gate|up)\.b", ("tp",)),
    (r"visual\.merger\.down\.w", ("tp", None)),
)
GLM_OCR_CACHE_RULES = ((r"^(k|v)$", (None, None, None, "tp", None)),)
GlmOcrModel.partition_rules = GLM_OCR_PARTITION_RULES
GlmOcrModel.cache_rules = GLM_OCR_CACHE_RULES
