"""DeepSeek-OCR: SAM-ViTDet + CLIP dual vision towers feeding a DeepSeek-V2
MoE decoder.

Reference: src/models/deepseek_ocr/model.rs (SAM ImageEncoderViT :400-521,
CLIP VitModel :523-762, MoE :764-954, DeepseekV2 decoder :956-1086, feature
assembly :1252-1431) and processor.rs (Gundam tiling :54-202).

TPU-first design notes:
- All image geometry (tile grid, token layout with per-row newline tokens,
  view separator) is resolved on the HOST into a flat gather index over the
  projected feature rows; the jitted prefill just does `rows[gather_idx]`
  and a cumsum-scatter into the embedding sequence — no data-dependent
  control flow crosses into XLA.
- SAM window partition/unpartition are static reshapes (image sizes are
  bucketed), rel-pos tables gather with host-precomputed static indices, and
  pos-embed resizes are trace-time-constant matmul pairs
  (aha_tpu.utils.interpolate — exact torch bicubic/antialias semantics).
- The MoE FFN uses capacity-bucketed scatter dispatch + batched expert
  einsums (aha_tpu.ops.moe) instead of the reference's host-side
  nonzero/index_select loop.
- The CLIP tower consumes the SAM features as injected patch embeddings
  (model.rs:598-611), scan-stacked for compile speed.
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
from aha_tpu.ops.attention import (attention_decode_at,
                                   attention_prefill, sdpa)
from aha_tpu.ops.conv import conv2d, layer_norm_2d
from aha_tpu.ops.moe import default_capacity, moe_ffn
from aha_tpu.ops.norms import rms_norm
from aha_tpu.ops.rope import apply_rope, gather_rope, rope_table
from aha_tpu.utils.interpolate import interpolate
from aha_tpu.io.weights import batched_load


# ---------------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SamViTConfig:
    """SAM ViTDet-B (model.rs:1185-1208; sizes fixed by the checkpoint)."""
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: tuple = (2, 5, 8, 11)
    net2_chans: int = 512
    net3_chans: int = 1024  # 896 for version 2


@dataclasses.dataclass(frozen=True)
class ClipViTConfig:
    """CLIP-L/14-224 tower (model.rs:1214-1224)."""
    image_size: int = 224
    patch_size: int = 14
    num_layers: int = 24
    hidden_size: int = 1024
    num_heads: int = 16
    ffn_hidden_size: int = 4096
    eps: float = 1e-5


@dataclasses.dataclass(frozen=True)
class DeepseekV2Config:
    vocab_size: int = 129280
    hidden_size: int = 1280
    intermediate_size: int = 6848
    moe_intermediate_size: int = 896
    num_hidden_layers: int = 12
    num_attention_heads: int = 10
    num_key_value_heads: int = 10
    n_routed_experts: int = 64
    n_shared_experts: int = 2
    num_experts_per_tok: int = 6
    first_k_dense_replace: int = 1
    moe_layer_freq: int = 1
    routed_scaling_factor: float = 1.0
    scoring_func: str = "softmax"
    topk_method: str = "greedy"
    norm_topk_prob: bool = False
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    max_position_embeddings: int = 8192
    bos_token_id: int = 0
    eos_token_id: int = 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    def is_moe_layer(self, i: int) -> bool:
        return (self.n_routed_experts > 0 and i >= self.first_k_dense_replace
                and i % self.moe_layer_freq == 0)


@dataclasses.dataclass(frozen=True)
class DeepseekOCRConfig:
    language: DeepseekV2Config = DeepseekV2Config()
    sam: SamViTConfig = SamViTConfig()
    clip: ClipViTConfig = ClipViTConfig()
    projector_input_dim: int = 2048
    projector_n_embed: int = 1280
    image_token_id: int = 128815
    version: int = 1  # 2 = qwen2-decoder-as-encoder, no CLIP / image_newline

    @classmethod
    def from_file(cls, model_dir: str) -> "DeepseekOCRConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            d = json.load(f)
        lang = d.get("language_config", d)
        lf = {f.name for f in dataclasses.fields(DeepseekV2Config)}
        language = DeepseekV2Config(
            **{k: v for k, v in lang.items() if k in lf})
        vis = d.get("vision_config", {})
        width = vis.get("width", {})
        sam_d = width.get("sam_vit_b", {})
        version = 2 if width.get("qwen2-0-5b") else 1
        down = sam_d.get("downsample_channels",
                         (512, 896) if version == 2 else (512, 1024))
        sam = SamViTConfig(
            img_size=vis.get("image_size", 1024),
            embed_dim=sam_d.get("width", 768),
            depth=sam_d.get("layers", 12),
            num_heads=sam_d.get("heads", 12),
            mlp_ratio=vis.get("mlp_ratio", 4.0),
            window_size=sam_d.get("window_size", 14),
            out_chans=sam_d.get("out_chans", 256),
            global_attn_indexes=tuple(
                sam_d.get("global_attn_indexes", (2, 5, 8, 11))),
            net2_chans=down[0], net3_chans=down[1])
        clip_d = width.get("clip-l-14-224") or {}
        clip = ClipViTConfig(
            image_size=clip_d.get("image_size", 224),
            patch_size=clip_d.get("patch_size", 14),
            num_layers=clip_d.get("layers", 24),
            hidden_size=clip_d.get("width", 1024),
            num_heads=clip_d.get("heads", 16),
            ffn_hidden_size=4 * clip_d.get("width", 1024))
        proj = d.get("projector_config", {})
        return cls(language=language, sam=sam, clip=clip,
                   projector_input_dim=proj.get("input_dim", 2048),
                   projector_n_embed=proj.get("n_embed", 1280),
                   image_token_id=d.get("image_token_id", 128815),
                   version=version)


# ---------------------------------------------------------------------------
# SAM ViTDet encoder
# ---------------------------------------------------------------------------


def _rel_pos_table(table: jnp.ndarray, q_size: int, k_size: int) -> jnp.ndarray:
    """get_rel_pos (model.rs:121-154): resize the (L, hd) table to
    2*max(q,k)-1 rows via torch linear interpolation, then gather the
    (q, k) relative-coordinate entries (host-static indices)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if table.shape[0] != max_rel_dist:
        t = table.astype(jnp.float32).T[None]              # (1, hd, L)
        t = interpolate(t, max_rel_dist, "linear")
        table = t[0].T.astype(table.dtype)
    qc = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    kc = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    idx = (qc - kc + (k_size - 1) * max(q_size / k_size, 1.0))
    idx = np.asarray(idx, np.int64)
    return jnp.take(table, jnp.asarray(idx), axis=0)        # (q, k, hd)


def _sam_attention(p: dict, x: jnp.ndarray, num_heads: int,
                   use_rel_pos: bool = True) -> jnp.ndarray:
    """Decomposed-rel-pos attention on (B, H, W, C) grids (model.rs:186-239)."""
    B, H, W, C = x.shape
    hd = C // num_heads
    qkv = nn.linear(p["qkv"], x).reshape(B, H * W, 3, num_heads, hd)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)                  # (B, nh, HW, hd)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    scores = jnp.einsum("bnqd,bnkd->bnqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    if use_rel_pos:
        rh = _rel_pos_table(p["rel_pos_h"], H, H)           # (H, H, hd)
        rw = _rel_pos_table(p["rel_pos_w"], W, W)
        r_q = q.reshape(B, num_heads, H, W, hd)
        rel_h = jnp.einsum("bnhwd,hkd->bnhwk", r_q, rh.astype(q.dtype),
                           preferred_element_type=jnp.float32)
        rel_w = jnp.einsum("bnhwd,wkd->bnhwk", r_q, rw.astype(q.dtype),
                           preferred_element_type=jnp.float32)
        # bias(q=(h,w), k=(hk,wk)) = rel_h[h,w,hk] + rel_w[h,w,wk]
        bias = rel_h[:, :, :, :, :, None] + rel_w[:, :, :, :, None, :]
        scores = scores + bias.reshape(B, num_heads, H * W, H * W)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bnqk,bnkd->bnqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, H, W, C)
    return nn.linear(p["proj"], out)


def _window_partition(x: jnp.ndarray, ws: int):
    B, H, W, C = x.shape
    ph, pw = (ws - H % ws) % ws, (ws - W % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = H + ph, W + pw
    x = x.reshape(B, hp // ws, ws, wp // ws, ws, C)
    win = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return win, (hp, wp)


def _window_unpartition(win: jnp.ndarray, ws: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    C = win.shape[-1]
    B = win.shape[0] // (hp * wp // ws // ws)
    x = win.reshape(B, hp // ws, wp // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, hp, wp, C)
    return x[:, :h, :w]


def sam_encode(p: dict, pixels: jnp.ndarray, cfg: SamViTConfig) -> jnp.ndarray:
    """(B, 3, S, S) → (B, net3_chans, S/64, S/64) (model.rs:503-520)."""
    x = conv2d(p["patch"], pixels, stride=cfg.patch_size)   # (B, E, h, w)
    x = x.transpose(0, 2, 3, 1)                             # (B, h, w, E)
    h = x.shape[1]
    pos = p["pos"]                                          # (1, g, g, E)
    if pos.shape[1] != h:
        pos = interpolate(pos.transpose(0, 3, 1, 2).astype(jnp.float32),
                          (h, h), "bicubic", antialias=True)
        pos = pos.transpose(0, 2, 3, 1).astype(x.dtype)
    x = x + pos
    for i, bp in enumerate(p["blocks"]):
        shortcut = x
        xn = nn.ln(bp["norm1"], x, eps=1e-6)
        if i in cfg.global_attn_indexes:
            attn = _sam_attention(bp["attn"], xn, cfg.num_heads)
        else:
            win, pad_hw = _window_partition(xn, cfg.window_size)
            win = _sam_attention(bp["attn"], win, cfg.num_heads)
            attn = _window_unpartition(win, cfg.window_size, pad_hw,
                                       (x.shape[1], x.shape[2]))
        x = shortcut + attn
        xn = nn.ln(bp["norm2"], x, eps=1e-6)
        x = x + nn.linear(bp["lin2"], jax.nn.gelu(
            nn.linear(bp["lin1"], xn), approximate=False))
    x = x.transpose(0, 3, 1, 2)                             # (B, E, h, w)
    x = conv2d(p["neck0"], x)
    x = layer_norm_2d(p["neck1"], x)
    x = conv2d(p["neck2"], x, padding=1)
    x = layer_norm_2d(p["neck3"], x)
    x = conv2d(p["net2"], x, stride=2, padding=1)
    x = conv2d(p["net3"], x, stride=2, padding=1)
    return x


# ---------------------------------------------------------------------------
# CLIP tower (v1) — consumes SAM features as patch embeddings
# ---------------------------------------------------------------------------


def clip_encode(p: dict, patch_embeds: jnp.ndarray,
                cfg: ClipViTConfig) -> jnp.ndarray:
    """(B, hidden, h, w) SAM features → (B, 1+h*w, hidden) CLIP output
    (model.rs:598-611, 756-761)."""
    B, D, h, w = patch_embeds.shape
    x = patch_embeds.reshape(B, D, h * w).transpose(0, 2, 1)
    cls = jnp.broadcast_to(p["cls"][None, None], (B, 1, D)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)                   # (B, 1+hw, D)

    pos = p["pos"]                                          # (n_pos, D)
    src = int(math.isqrt(pos.shape[0] - 1))
    tgt = int(math.isqrt(x.shape[1]))
    if src != tgt:
        grid = pos[1:].reshape(1, src, src, D).transpose(0, 3, 1, 2)
        grid = interpolate(grid.astype(jnp.float32), (tgt, tgt), "bicubic",
                           antialias=True)
        grid = grid.transpose(0, 2, 3, 1).reshape(tgt * tgt, D)
        pos = jnp.concatenate([pos[:1], grid.astype(pos.dtype)], axis=0)
    x = x + pos[None].astype(x.dtype)
    x = nn.ln(p["pre_ln"], x, eps=cfg.eps)

    nh = cfg.num_heads
    hd = cfg.hidden_size // nh

    def block(x, lp):
        h_ = nn.ln(lp["ln1"], x, eps=cfg.eps)
        qkv = nn.linear(lp["qkv"], h_)
        q, k_, v = jnp.split(qkv, 3, axis=-1)
        S = x.shape[1]
        q = q.reshape(B, S, nh, hd)
        k_ = k_.reshape(B, S, nh, hd)
        v = v.reshape(B, S, nh, hd)
        a = sdpa(q, k_, v).reshape(B, S, nh * hd)
        res = x + nn.linear(lp["out"], a)
        h_ = nn.ln(lp["ln2"], res, eps=cfg.eps)
        h_ = nn.linear(lp["fc1"], h_)
        h_ = h_ * jax.nn.sigmoid(1.702 * h_)                # quick_gelu
        return res + nn.linear(lp["fc2"], h_), None

    x, _ = jax.lax.scan(block, x, p["layers"])
    return x


# ---------------------------------------------------------------------------
# DeepSeek-V2 decoder (dense + MoE layers)
# ---------------------------------------------------------------------------


class DeepseekOCRModel:
    """Implements the CausalLM protocol (aha_tpu.core.engine)."""

    def __init__(self, config: DeepseekOCRConfig, max_rope_len: int = 8192):
        self.config = config
        c = config.language
        self.n_layers = c.num_hidden_layers
        self.n_heads = c.num_attention_heads
        self.n_kv_heads = c.num_key_value_heads
        self.head_dim = c.head_dim
        max_rope_len = min(max_rope_len, c.max_position_embeddings)
        self.cos, self.sin = rope_table(self.head_dim, max_rope_len,
                                        c.rope_theta)
        if config.version == 2:
            from aha_tpu.models.llama import LlamaConfig, LlamaModel

            self.qwen2_model = LlamaModel(
                LlamaConfig(vocab_size=151936, hidden_size=896,
                            intermediate_size=4864, num_hidden_layers=24,
                            num_attention_heads=14, num_key_value_heads=2,
                            rope_theta=1000000.0, rms_norm_eps=1e-6,
                            qkv_bias=True), max_rope_len=1024)

    # -- vision ---------------------------------------------------------------

    def encode_views(self, p: dict, pixels: jnp.ndarray) -> jnp.ndarray:
        """(B, 3, S, S) image batch → (B, nq*nq, n_embed) projected features
        (global/local branch of model.rs:1285-1326)."""
        sam = sam_encode(p["sam"], pixels, self.config.sam)  # (B, C, h, w)
        B, C, h, w = sam.shape
        sam_flat = sam.reshape(B, C, h * w).transpose(0, 2, 1)
        if self.config.version == 1:
            clip_out = clip_encode(p["clip"], sam, self.config.clip)
            feats = jnp.concatenate([clip_out[:, 1:], sam_flat], axis=-1)
        else:
            feats = qwen2_encode(self.qwen2_model, p["qwen2enc"], sam_flat)
        return nn.linear(p["projector"], feats)

    def assemble_vision(self, p: dict, mm: dict) -> jnp.ndarray:
        """Projected rows for every view + newline/separator, gathered into
        the token-order layout prepared on the host (deepseek_vision_layout)."""
        parts = []
        if "crops" in mm:
            cf = self.encode_views(p, mm["crops"])
            parts.append(cf.reshape(-1, cf.shape[-1]))
        gf = self.encode_views(p, mm["global"])
        parts.append(gf.reshape(-1, gf.shape[-1]))
        if "image_newline" in p:
            parts.append(p["image_newline"][None])
        parts.append(p["view_seperator"][None])
        rows = jnp.concatenate(parts, axis=0)
        return rows[mm["gather_idx"]]

    # -- CausalLM -------------------------------------------------------------

    def init_cache(self, batch: int, max_len: int, dtype=jnp.bfloat16) -> dict:
        return kv.init_kv_cache(self.n_layers, batch, max_len,
                                self.n_kv_heads, self.head_dim, dtype)

    def _layer(self, lp, x, cos, sin, kc, vc, li, pos, is_prefill,
               is_moe):
        c = self.config.language
        B, S, _ = x.shape
        h = rms_norm(x, lp["ln1"]["w"], c.rms_norm_eps)
        q = nn.linear(lp["q"], h).reshape(B, S, self.n_heads, self.head_dim)
        k = nn.linear(lp["k"], h).reshape(B, S, self.n_kv_heads, self.head_dim)
        v = nn.linear(lp["v"], h).reshape(B, S, self.n_kv_heads, self.head_dim)
        q, k = apply_rope(q, k, cos, sin)
        zero = jnp.zeros((), pos.dtype)
        sl = jnp.asarray(li, pos.dtype)
        kc = jax.lax.dynamic_update_slice(kc, k[None],
                                          (sl, zero, pos, zero, zero))
        vc = jax.lax.dynamic_update_slice(vc, v[None],
                                          (sl, zero, pos, zero, zero))
        attn = (attention_prefill(q, k, v, causal=True) if is_prefill
                else attention_decode_at(q, kc, vc, sl, pos))
        attn = attn.reshape(B, S, self.n_heads * self.head_dim)
        x = x + nn.linear(lp["o"], attn)
        h = rms_norm(x, lp["ln2"]["w"], c.rms_norm_eps)
        if is_moe:
            hf = h.reshape(B * S, -1)
            out = moe_ffn(
                lp["moe"], hf, c.num_experts_per_tok,
                scoring=c.scoring_func,
                norm_topk_prob=c.norm_topk_prob,
                routed_scaling_factor=c.routed_scaling_factor,
                capacity=default_capacity(B * S, c.num_experts_per_tok,
                                          c.n_routed_experts))
            x = x + out.reshape(B, S, -1)
        else:
            x = x + nn.swiglu_mlp(lp["mlp"], h)
        return x, kc, vc

    def backbone(self, params, input_ids, cache, mm: Any = None,
                 prompt_len=None):
        c = self.config.language
        B, S = input_ids.shape
        x = nn.embedding(params["embed"], input_ids)
        if mm is not None:
            feats = self.assemble_vision(params, mm)
            is_img = input_ids == self.config.image_token_id
            vis_mask = is_img[0]
            idx = jnp.clip(jnp.cumsum(vis_mask) - 1, 0, feats.shape[0] - 1)
            x = jnp.where(vis_mask[None, :, None],
                          feats[idx][None].astype(x.dtype), x)
        pos = cache["pos"]
        positions = pos + jnp.arange(S)
        cos, sin = gather_rope(self.cos, self.sin, positions)
        kc, vc = cache["k"], cache["v"]
        for i in range(self.n_layers):
            lp = params["layers"][i]
            x, kc, vc = self._layer(
                lp, x, cos, sin, kc, vc, i, pos, S > 1,
                c.is_moe_layer(i))
        cache = {**cache, "k": kc, "v": vc}
        x = rms_norm(x, params["norm"]["w"], c.rms_norm_eps)
        return x, cache

    def logits(self, params, hidden):
        return nn.linear(params["lm_head"], hidden)

    # -- loading --------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.bfloat16) -> dict:
        c = self.config
        lc = c.language
        sam = {"patch": {"w": jnp.asarray(src.get("model.sam_model.patch_embed.proj.weight"), dtype),
                         "b": jnp.asarray(src.get("model.sam_model.patch_embed.proj.bias"), dtype)},
               "pos": jnp.asarray(src.get("model.sam_model.pos_embed"), dtype),
               "blocks": []}
        for i in range(c.sam.depth):
            b = f"model.sam_model.blocks.{i}."
            sam["blocks"].append({
                "norm1": nn.take_norm(src, b + "norm1", dtype),
                "norm2": nn.take_norm(src, b + "norm2", dtype),
                "attn": {
                    "qkv": nn.take_linear(src, b + "attn.qkv", dtype),
                    "proj": nn.take_linear(src, b + "attn.proj", dtype),
                    "rel_pos_h": jnp.asarray(src.get(b + "attn.rel_pos_h"), dtype),
                    "rel_pos_w": jnp.asarray(src.get(b + "attn.rel_pos_w"), dtype),
                },
                "lin1": nn.take_linear(src, b + "mlp.lin1", dtype),
                "lin2": nn.take_linear(src, b + "mlp.lin2", dtype),
            })
        for j, name in (("0", "neck0"), ("1", "neck1"), ("2", "neck2"),
                        ("3", "neck3")):
            w = jnp.asarray(src.get(f"model.sam_model.neck.{j}.weight"), dtype)
            pp = {"w": w}
            if f"model.sam_model.neck.{j}.bias" in src:
                pp["b"] = jnp.asarray(src.get(f"model.sam_model.neck.{j}.bias"), dtype)
            sam[name] = pp
        sam["net2"] = {"w": jnp.asarray(src.get("model.sam_model.net_2.weight"), dtype)}
        sam["net3"] = {"w": jnp.asarray(src.get("model.sam_model.net_3.weight"), dtype)}

        params = {"sam": sam,
                  "projector": nn.take_linear(src, "model.projector.layers", dtype),
                  "view_seperator": jnp.asarray(src.get("model.view_seperator"), dtype)}
        if c.version == 1:
            cl = "model.vision_model."
            layers = []
            for i in range(c.clip.num_layers):
                b = f"{cl}transformer.layers.{i}."
                layers.append({
                    "ln1": nn.take_norm(src, b + "layer_norm1", dtype),
                    "ln2": nn.take_norm(src, b + "layer_norm2", dtype),
                    "qkv": nn.take_linear(src, b + "self_attn.qkv_proj", dtype),
                    "out": nn.take_linear(src, b + "self_attn.out_proj", dtype),
                    "fc1": nn.take_linear(src, b + "mlp.fc1", dtype),
                    "fc2": nn.take_linear(src, b + "mlp.fc2", dtype),
                })
            params["clip"] = {
                "cls": jnp.asarray(src.get(cl + "embeddings.class_embedding"), dtype),
                "patch": {"w": jnp.asarray(src.get(cl + "embeddings.patch_embedding.weight"), dtype)},
                "pos": jnp.asarray(src.get(cl + "embeddings.position_embedding.weight"), dtype),
                "pre_ln": nn.take_norm(src, cl + "pre_layrnorm", dtype),
                "layers": jax.tree.map(lambda *xs: np.stack(xs), *layers),
            }
            params["image_newline"] = jnp.asarray(src.get("model.image_newline"), dtype)
        else:
            params["qwen2enc"] = load_qwen2_encoder(self.qwen2_model, src,
                                                    dtype)

        layers = []
        for i in range(lc.num_hidden_layers):
            p = f"model.layers.{i}."
            lp = {
                "ln1": nn.take_norm(src, p + "input_layernorm", dtype),
                "ln2": nn.take_norm(src, p + "post_attention_layernorm", dtype),
                "q": nn.take_linear(src, p + "self_attn.q_proj", dtype),
                "k": nn.take_linear(src, p + "self_attn.k_proj", dtype),
                "v": nn.take_linear(src, p + "self_attn.v_proj", dtype),
                "o": nn.take_linear(src, p + "self_attn.o_proj", dtype),
            }
            if lc.is_moe_layer(i):
                ex = {"gate": [], "up": [], "down": []}
                for e in range(lc.n_routed_experts):
                    q = f"{p}mlp.experts.{e}."
                    for n, hf in (("gate", "gate_proj"), ("up", "up_proj"),
                                  ("down", "down_proj")):
                        ex[n].append(jnp.asarray(src.get(q + hf + ".weight"),
                                                 dtype).T)
                lp["moe"] = {
                    "gate": {"w": jnp.asarray(
                        src.get(p + "mlp.gate.weight"), jnp.float32).T},
                    "experts": {n: {"w": jnp.stack(ex[n])} for n in ex},
                    "shared": {
                        "gate": nn.take_linear(src, p + "mlp.shared_experts.gate_proj", dtype),
                        "up": nn.take_linear(src, p + "mlp.shared_experts.up_proj", dtype),
                        "down": nn.take_linear(src, p + "mlp.shared_experts.down_proj", dtype),
                    },
                }
            else:
                lp["mlp"] = {
                    "gate": nn.take_linear(src, p + "mlp.gate_proj", dtype),
                    "up": nn.take_linear(src, p + "mlp.up_proj", dtype),
                    "down": nn.take_linear(src, p + "mlp.down_proj", dtype),
                }
            layers.append(lp)
        params["layers"] = layers
        params["embed"] = nn.take_embedding(src, "model.embed_tokens", dtype)
        params["norm"] = nn.take_norm(src, "model.norm", dtype)
        params["lm_head"] = nn.take_linear(src, "lm_head", dtype)
        return params

    def init_random(self, key, dtype=jnp.float32, scale: float = 0.02) -> dict:
        c = self.config
        lc = c.language
        keys = iter(jax.random.split(key, 4096))

        def w(shape):
            return jax.random.normal(next(keys), shape, dtype) * scale

        def lin(i, o, bias=True):
            p = {"w": w((i, o))}
            if bias:
                p["b"] = jnp.zeros(o, dtype)
            return p

        def norm(d):
            return {"w": jnp.ones(d, dtype), "b": jnp.zeros(d, dtype)}

        s = c.sam
        g = s.img_size // s.patch_size
        sam = {
            "patch": {"w": w((s.embed_dim, 3, s.patch_size, s.patch_size)),
                      "b": jnp.zeros(s.embed_dim, dtype)},
            "pos": w((1, g, g, s.embed_dim)),
            "blocks": [],
            "neck0": {"w": w((s.out_chans, s.embed_dim, 1, 1))},
            "neck1": norm(s.out_chans),
            "neck2": {"w": w((s.out_chans, s.out_chans, 3, 3))},
            "neck3": norm(s.out_chans),
            "net2": {"w": w((s.net2_chans, s.out_chans, 3, 3))},
            "net3": {"w": w((s.net3_chans, s.net2_chans, 3, 3))},
        }
        mlp_dim = int(s.embed_dim * s.mlp_ratio)
        hd = s.embed_dim // s.num_heads
        for i in range(s.depth):
            size = g if i in s.global_attn_indexes else s.window_size
            sam["blocks"].append({
                "norm1": norm(s.embed_dim), "norm2": norm(s.embed_dim),
                "attn": {"qkv": lin(s.embed_dim, 3 * s.embed_dim),
                         "proj": lin(s.embed_dim, s.embed_dim),
                         "rel_pos_h": w((2 * size - 1, hd)),
                         "rel_pos_w": w((2 * size - 1, hd))},
                "lin1": lin(s.embed_dim, mlp_dim),
                "lin2": lin(mlp_dim, s.embed_dim),
            })
        params = {
            "sam": sam,
            "projector": lin(c.projector_input_dim, c.projector_n_embed),
            "view_seperator": w((c.projector_n_embed,)),
        }
        if c.version == 1:
            cv = c.clip
            n_pos = (cv.image_size // cv.patch_size) ** 2 + 1

            def clip_layer():
                return {"ln1": norm(cv.hidden_size), "ln2": norm(cv.hidden_size),
                        "qkv": lin(cv.hidden_size, 3 * cv.hidden_size),
                        "out": lin(cv.hidden_size, cv.hidden_size),
                        "fc1": lin(cv.hidden_size, cv.ffn_hidden_size),
                        "fc2": lin(cv.ffn_hidden_size, cv.hidden_size)}

            layers = [clip_layer() for _ in range(cv.num_layers)]
            params["clip"] = {
                "cls": w((cv.hidden_size,)),
                "patch": {"w": w((cv.hidden_size, 3, cv.patch_size,
                                  cv.patch_size))},
                "pos": w((n_pos, cv.hidden_size)),
                "pre_ln": norm(cv.hidden_size),
                "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
            }
            params["image_newline"] = w((c.projector_n_embed,))

        d = lc.hidden_size
        layers = []
        for i in range(lc.num_hidden_layers):
            lp = {"ln1": {"w": jnp.ones(d, dtype)},
                  "ln2": {"w": jnp.ones(d, dtype)},
                  "q": lin(d, self.n_heads * self.head_dim, False),
                  "k": lin(d, self.n_kv_heads * self.head_dim, False),
                  "v": lin(d, self.n_kv_heads * self.head_dim, False),
                  "o": lin(self.n_heads * self.head_dim, d, False)}
            if lc.is_moe_layer(i):
                E, F = lc.n_routed_experts, lc.moe_intermediate_size
                lp["moe"] = {
                    "gate": {"w": w((d, E)).astype(jnp.float32)},
                    "experts": {"gate": {"w": w((E, d, F))},
                                "up": {"w": w((E, d, F))},
                                "down": {"w": w((E, F, d))}},
                    "shared": {
                        "gate": {"w": w((d, F * lc.n_shared_experts))},
                        "up": {"w": w((d, F * lc.n_shared_experts))},
                        "down": {"w": w((F * lc.n_shared_experts, d))}},
                }
            else:
                lp["mlp"] = {"gate": lin(d, lc.intermediate_size, False),
                             "up": lin(d, lc.intermediate_size, False),
                             "down": lin(lc.intermediate_size, d, False)}
            layers.append(lp)
        params["layers"] = layers
        params["embed"] = {"w": w((lc.vocab_size, d))}
        params["norm"] = {"w": jnp.ones(d, dtype)}
        params["lm_head"] = {"w": w((d, lc.vocab_size))}
        return params


def qwen2_encode(model, p: dict, sam_flat: jnp.ndarray) -> jnp.ndarray:
    """DeepSeek-OCR v2 Qwen2Decoder2Encoder (model.rs:1088-1162): SAM tokens
    + learned query tokens through a qwen2 stack with a mixed
    bidirectional/causal mask; returns the query-position outputs."""
    B, n, _ = sam_flat.shape
    query = p["query_768"] if n == 144 else p["query_1024"]   # (n, 896)
    x = jnp.concatenate(
        [sam_flat, jnp.broadcast_to(query[None], (B, n, query.shape[-1])
                                    ).astype(sam_flat.dtype)], axis=1)
    # image rows attend only image positions; query rows attend all image
    # positions + causal among queries (model.rs:1137-1155)
    up = jnp.concatenate([jnp.ones((n, n)), jnp.zeros((n, n))], axis=1)
    down = jnp.concatenate([jnp.ones((n, n)), jnp.tril(jnp.ones((n, n)))],
                           axis=1)
    allow = jnp.concatenate([up, down], axis=0) > 0
    mask = jnp.where(allow, 0.0, jnp.finfo(jnp.float32).min)[None, None]
    out = model.run_layers_no_cache(p["params"], x, mask)
    return out[:, n:]


def load_qwen2_encoder(model, src, dtype) -> dict:
    params = model.load_params(src, dtype,
                               prefix="model.qwen2_model.model.model.")
    return {"params": params,
            "query_768": jnp.asarray(
                src.get("model.qwen2_model.query_768.weight"), dtype),
            "query_1024": jnp.asarray(
                src.get("model.qwen2_model.query_1024.weight"), dtype)}


# ---------------------------------------------------------------------------
# Host-side geometry: Gundam tiling layout → flat gather index
# ---------------------------------------------------------------------------


def deepseek_vision_layout(images: list[dict], version: int,
                           crop_rows_total: int | None = None) -> np.ndarray:
    """Token-order gather index over the concatenated feature rows.

    images: per-image dicts {"nq": crop-view queries/side, "nb": base-view
    queries/side, "wr"/"hr": crop grid ratio (1,1 = no crops)}.
    Feature row layout (matches assemble_vision): all crop views of all
    images first (crop-major, each nq*nq rows; `crop_rows_total` overrides
    the region size when the crop batch is padded to a bucket), then all
    global views (nb*nb each), then [image_newline (v1 only)], then
    view_seperator.  Per-image token order (model.rs:1336-1418): local rows
    (newline-terminated in v1), global rows (same), view separator.
    """
    n_crop_rows = sum(d["wr"] * d["hr"] * d["nq"] ** 2 for d in images
                      if d["wr"] * d["hr"] > 1)
    if crop_rows_total is not None:
        assert crop_rows_total >= n_crop_rows
        n_crop_rows = crop_rows_total
    n_global_rows = sum(d["nb"] ** 2 for d in images)
    newline_row = n_crop_rows + n_global_rows  # v1 only
    sep_row = newline_row + (1 if version == 1 else 0)
    idx = []
    crop_base = 0
    global_base = n_crop_rows
    for d in images:
        nq, nb, wr, hr = d["nq"], d["nb"], d["wr"], d["hr"]
        if wr * hr > 1:
            # local tiles: (hr, wr, nq, nq) → (hr*nq, wr*nq) row-major,
            # newline at the end of each row (v1)
            for r in range(hr * nq):
                for cc in range(wr * nq):
                    crop = (r // nq) * wr + (cc // nq)
                    within = (r % nq) * nq + (cc % nq)
                    idx.append(crop_base + crop * nq * nq + within)
                if version == 1:
                    idx.append(newline_row)
            crop_base += wr * hr * nq * nq
        for r in range(nb):
            for cc in range(nb):
                idx.append(global_base + r * nb + cc)
            if version == 1:
                idx.append(newline_row)
        global_base += nb * nb
        idx.append(sep_row)
    return np.asarray(idx, np.int32)


# Tensor-parallel partition rules (SURVEY §5.8).  Decoder layers are an
# unstacked list (dense and MoE layers have different pytrees); attention
# and dense MLPs split over tp, routed experts shard EXPERT-parallel on
# their leading (E, in, out) axis — each device holds E/tp experts and the
# capacity-bucketed dispatch einsum reduces across them.  SAM/CLIP towers
# are small and stay replicated.
DEEPSEEK_OCR_PARTITION_RULES = (
    (r"^layers\.\d+\.(q|k|v)\.w", (None, "tp")),
    (r"^layers\.\d+\.(q|k|v)\.b", ("tp",)),
    (r"^layers\.\d+\.o\.w", ("tp", None)),
    (r"^layers\.\d+\.mlp\.(gate|up)\.w", (None, "tp")),
    (r"^layers\.\d+\.mlp\.down\.w", ("tp", None)),
    (r"moe\.experts\.(gate|up|down)\.w", ("tp", None, None)),
    (r"moe\.shared\.(gate|up)\.w", (None, "tp")),
    (r"moe\.shared\.down\.w", ("tp", None)),
    (r"^embed\.w", ("tp", None)),
    (r"^lm_head\.w", (None, "tp")),
)
DEEPSEEK_OCR_CACHE_RULES = ((r"^(k|v)$", (None, None, None, "tp", None)),)
DeepseekOCRModel.partition_rules = DEEPSEEK_OCR_PARTITION_RULES
DeepseekOCRModel.cache_rules = DEEPSEEK_OCR_CACHE_RULES
