"""Hunyuan-OCR: ViT (interpolated pos embeds, full attention) + Hunyuan
decoder (post-rope q/k RMS norm, alpha-scaled rope theta, xdrope on layer 0).

Reference: src/models/hunyuan_ocr/model.rs (vision :25-264, text :266-539,
assembled :541-591), processor.rs (smart-resize patches, per-row newline
token accounting patch_h*(patch_w+1)+2 :164, 4-channel xd position ids
:176-217) and position_embed/rope.rs:644-684 (get_xd_cos_sin).

TPU-first notes: the vision tower runs over patch buckets with a padding
key-mask; the per-image perceive/merger geometry (conv over merge units,
per-row newline, begin/end) is host-resolved into a gather index like
DeepSeek-OCR's layout; xdrope cos/sin are computed from host-built
4-channel position ids only for the prefill call (decode uses the plain
1-D rope for every layer, matching model.rs:515-528).
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
from aha_tpu.ops.rope import apply_rope, gather_rope, rope_table
from aha_tpu.utils.interpolate import interpolate
from aha_tpu.io.weights import batched_load


@dataclasses.dataclass(frozen=True)
class HunyuanVisionConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    patch_size: int = 16
    max_image_size: int = 2048
    spatial_merge_size: int = 2
    out_hidden_size: int = 1024
    rms_norm_eps: float = 1e-5
    num_channels: int = 3

    @classmethod
    def from_dict(cls, d: dict) -> "HunyuanVisionConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


@dataclasses.dataclass(frozen=True)
class HunyuanOCRConfig:
    vocab_size: int = 120818
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    attention_bias: bool = False
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_alpha: float = 1.0
    xdrope_section: tuple = (16, 24, 24)
    max_position_embeddings: int = 32768
    image_token_id: int = 120120
    vision: HunyuanVisionConfig = HunyuanVisionConfig()

    @property
    def scaled_theta(self) -> float:
        """theta · alpha^(d/(d-2)) (model.rs:478-483)."""
        d = self.head_dim
        return self.rope_theta * self.rope_alpha ** (d / (d - 2))

    @classmethod
    def from_file(cls, model_dir: str) -> "HunyuanOCRConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            d = json.load(f)
        names = {f.name for f in dataclasses.fields(cls)} - {"vision",
                                                             "rope_alpha",
                                                             "xdrope_section"}
        kw = {k: v for k, v in d.items() if k in names}
        rs = d.get("rope_scaling", {}) or {}
        if "alpha" in rs:
            kw["rope_alpha"] = rs["alpha"]
        if "xdrope_section" in rs:
            kw["xdrope_section"] = tuple(rs["xdrope_section"])
        vision = HunyuanVisionConfig.from_dict(d.get("vision_config", {}))
        return cls(vision=vision, **kw)


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------


def hunyuan_pos_resample_matrix(grids: list[tuple[int, int, int]],
                                table_grid: int) -> np.ndarray:
    """(N, g²) bilinear-resize matrix over the learned pos table
    (model.rs:85-99: interpolate_bilinear align_corners=false per image),
    rows in row-major patch order."""
    from aha_tpu.utils.interpolate import resize_weights_1d

    g = table_grid
    rows = []
    for (t, gh, gw) in grids:
        wh = resize_weights_1d(g, gh, "linear")
        ww = resize_weights_1d(g, gw, "linear")
        r = (wh[:, None, :, None] * ww[None, :, None, :]).reshape(
            gh * gw, g * g)
        rows.append(np.tile(r, (t, 1)))
    return np.concatenate(rows).astype(np.float32)


class HunyuanVisionTower:
    def __init__(self, v: HunyuanVisionConfig):
        self.v = v

    def encode(self, p: dict, mm: dict) -> jnp.ndarray:
        """mm: patches (N, C·p·p) bucket-padded row-major, pos_resample
        (N, g²), patch_mask (1,1,1,N).  Returns per-patch features (N, D)
        BEFORE the perceive merger (merger needs per-image geometry)."""
        v = self.v
        x = nn.linear(p["patch"], mm["patches"])
        pos = mm["pos_resample"] @ p["pos_embed"].astype(jnp.float32)
        x = x + pos.astype(x.dtype)
        nh = v.num_attention_heads
        hd = v.hidden_size // nh

        def block(x, lp):
            h = nn.ln(lp["ln1"], x, eps=v.rms_norm_eps)
            q = nn.linear(lp["q"], h).reshape(-1, nh, hd)
            k = nn.linear(lp["k"], h).reshape(-1, nh, hd)
            vv = nn.linear(lp["v"], h).reshape(-1, nh, hd)
            a = sdpa(q[None], k[None], vv[None], mm.get("patch_mask"))[0]
            x = x + nn.linear(lp["o"], a.reshape(-1, nh * hd))
            h = nn.ln(lp["ln2"], x, eps=v.rms_norm_eps)
            x = x + nn.linear(lp["fc2"], jax.nn.gelu(
                nn.linear(lp["fc1"], h), approximate=False))
            return x, None

        x, _ = jax.lax.scan(block, x, p["blocks"])
        return x

    def perceive(self, p: dict, feats: jnp.ndarray, mm: dict) -> jnp.ndarray:
        """All images' patch features → merged token sequence
        (model.rs:166-194): merge conv (einsum over host-gathered m×m
        units), gelu, 1×1 conv, per-row newline + begin/end via a
        host-built gather index (geometry never enters the traced graph)."""
        v = self.v
        m = v.spatial_merge_size
        D = v.hidden_size
        x = rms_norm(feats, p["before_rms"]["w"], v.rms_norm_eps)
        units = x[mm["unit_gather"]]                      # (U, m, m, D)
        w0 = p["proj0"]["w"].astype(x.dtype)              # (2D, D, m, m)
        u = jnp.einsum("uijd,odij->uo", units, w0) + p["proj0"]["b"]
        u = jax.nn.gelu(u, approximate=False)
        u = nn.linear(p["proj2"], u)                      # 1×1 conv (U, 4D)
        rows = jnp.concatenate([
            nn.linear(p["mlp"], u),
            nn.linear(p["mlp"], p["image_newline"][None].astype(u.dtype)),
            p["image_begin"][None].astype(u.dtype),
            p["image_end"][None].astype(u.dtype),
        ], axis=0)
        out = rows[mm["token_gather"]]
        return rms_norm(out, p["after_rms"]["w"], v.rms_norm_eps)


def hunyuan_vision_geometry(grids: list[tuple[int, int, int]], m: int,
                            unit_bucket: int | None = None
                            ) -> tuple[np.ndarray, np.ndarray]:
    """(unit_gather (U, m, m), token_gather (T,)) for the perceive merger.

    unit_gather: patch-row indices of each merge unit, row-major per image.
    token_gather indexes rows = [units(0..U_pad), newline, begin, end] in
    the reference's per-image order: begin, each unit row followed by a
    newline, end (model.rs:166-194; count ph·(pw+1)+2, processor.rs:164).
    """
    units, tokens = [], []
    patch_off = 0
    for (t, gh, gw) in grids:
        for _ in range(t):
            ph, pw = gh // m, gw // m
            for r in range(ph):
                for cc in range(pw):
                    units.append([[patch_off + (r * m + i) * gw + cc * m + j
                                   for j in range(m)] for i in range(m)])
            patch_off += gh * gw
    U = len(units)
    U_pad = unit_bucket if unit_bucket is not None else U
    assert U_pad >= U
    newline, begin, end = U_pad, U_pad + 1, U_pad + 2
    unit_off = 0
    for (t, gh, gw) in grids:
        for _ in range(t):
            ph, pw = gh // m, gw // m
            tokens.append(begin)
            for r in range(ph):
                tokens.extend(range(unit_off + r * pw, unit_off + (r + 1) * pw))
                tokens.append(newline)
            tokens.append(end)
            unit_off += ph * pw
    unit_arr = np.zeros((U_pad, m, m), np.int32)
    unit_arr[:U] = np.asarray(units, np.int32)
    return unit_arr, np.asarray(tokens, np.int32)


def hunyuan_position_ids(input_ids: list[int], grids: list[tuple[int, int, int]],
                         m: int, image_token_id: int) -> np.ndarray:
    """(4, S) xdrope position ids: [seq, h, w, t]; image token runs get
    per-row/col grid coords, t=0 (processor.rs:176-217)."""
    ids = np.asarray(input_ids)
    S = len(ids)
    seq = np.arange(S, dtype=np.int64)
    h = seq.copy()
    w = seq.copy()
    t = seq.copy()
    img_pos = np.flatnonzero(ids == image_token_id)
    cum = 0
    for (tt, gh, gw) in grids:
        for _ in range(tt):
            ph, pw = gh // m, gw // m
            n = ph * (pw + 1) + 2
            start = int(img_pos[cum]) + 1
            rep = (pw + 1) * ph
            w[start:start + rep] = np.tile(np.arange(pw + 1), ph)
            h[start:start + rep] = np.repeat(np.arange(ph), pw + 1)
            t[start:start + rep] = 0
            cum += n
    return np.stack([seq, h, w, t])


# ---------------------------------------------------------------------------
# Text model
# ---------------------------------------------------------------------------


class HunyuanOCRModel:
    """Implements the CausalLM protocol."""

    def __init__(self, config: HunyuanOCRConfig, max_rope_len: int = 8192):
        self.config = config
        self.tower = HunyuanVisionTower(config.vision)
        c = config
        self.n_layers = c.num_hidden_layers
        self.n_heads = c.num_attention_heads
        self.n_kv_heads = c.num_key_value_heads
        self.head_dim = c.head_dim
        max_rope_len = min(max_rope_len, c.max_position_embeddings)
        self.cos, self.sin = rope_table(self.head_dim, max_rope_len,
                                        c.scaled_theta)

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16):
        return kv.init_kv_cache(self.n_layers, batch, max_len,
                                self.n_kv_heads, self.head_dim, dtype)

    # -- vision ---------------------------------------------------------------

    def encode_vision(self, vp, mm) -> jnp.ndarray:
        feats = self.tower.encode(vp, mm)
        return self.tower.perceive(vp["perceive"], feats, mm)

    def _xd_cos_sin(self, pos4: jnp.ndarray):
        """xdrope (rope.rs:644-684): gather full cos/sin at the 4 position
        channels, interleave per xdrope_section (×2 dims, cycling channels).
        pos4: (4, S)."""
        c = self.config
        cos4, sin4 = gather_rope(self.cos, self.sin, pos4)  # (4, S, hd/2)
        cos4 = jnp.concatenate([cos4, cos4], axis=-1)       # (4, S, hd)
        sin4 = jnp.concatenate([sin4, sin4], axis=-1)
        x_dim = len(c.xdrope_section)
        parts_c, parts_s = [], []
        off = 0
        for i, s in enumerate([s * 2 for s in c.xdrope_section]):
            ch = i % x_dim
            parts_c.append(cos4[ch, :, off:off + s])
            parts_s.append(sin4[ch, :, off:off + s])
            off += s
        return (jnp.concatenate(parts_c, axis=-1),
                jnp.concatenate(parts_s, axis=-1))          # (S, hd)

    # -- CausalLM -------------------------------------------------------------

    def backbone(self, params, input_ids, cache, mm: Any = None,
                 prompt_len=None):
        c = self.config
        B, S = input_ids.shape
        x = nn.embedding(params["embed"], input_ids)
        if mm is not None:
            feats = self.encode_vision(params["visual"], mm)
            vis_mask = (input_ids == c.image_token_id)[0]
            idx = jnp.clip(jnp.cumsum(vis_mask) - 1, 0, feats.shape[0] - 1)
            x = jnp.where(vis_mask[None, :, None],
                          feats[idx][None].astype(x.dtype), x)
        pos = cache["pos"]
        positions = pos + jnp.arange(S)
        cos, sin = gather_rope(self.cos, self.sin, positions)
        cos = jnp.concatenate([cos, cos], axis=-1)          # (S, hd)
        sin = jnp.concatenate([sin, sin], axis=-1)
        if mm is not None and "position_ids" in mm:
            xd_cos, xd_sin = self._xd_cos_sin(mm["position_ids"])
        else:
            xd_cos, xd_sin = cos, sin
        kc, vc = cache["k"], cache["v"]
        for i in range(self.n_layers):
            lp = params["layers"][i]
            ci, si = (xd_cos, xd_sin) if i == 0 else (cos, sin)
            x, kc, vc = self._layer(lp, x, ci, si, kc, vc, i, pos, S > 1)
        cache = {**cache, "k": kc, "v": vc}
        x = rms_norm(x, params["norm"]["w"], c.rms_norm_eps)
        return x, cache

    def _layer(self, lp, x, cos, sin, kc, vc, li, pos, is_prefill):
        c = self.config
        B, S, _ = x.shape
        h = rms_norm(x, lp["ln1"]["w"], c.rms_norm_eps)
        q = nn.linear(lp["q"], h).reshape(B, S, self.n_heads, self.head_dim)
        k = nn.linear(lp["k"], h).reshape(B, S, self.n_kv_heads,
                                          self.head_dim)
        v = nn.linear(lp["v"], h).reshape(B, S, self.n_kv_heads,
                                          self.head_dim)
        # rope FIRST, q/k RMS norm AFTER (model.rs:359-362)
        c2 = cos[None, :, None, :].astype(q.dtype)
        s2 = sin[None, :, None, :].astype(q.dtype)

        def rot(t):
            h1, h2 = jnp.split(t, 2, axis=-1)
            return t * c2 + jnp.concatenate([-h2, h1], axis=-1) * s2

        q, k = rot(q), rot(k)
        q = rms_norm(q, lp["q_norm"]["w"], c.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"]["w"], c.rms_norm_eps)
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
        return x + nn.swiglu_mlp(lp["mlp"], h), kc, vc

    def logits(self, params, hidden):
        return nn.linear(params["lm_head"], hidden)

    # -- loading --------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.bfloat16) -> dict:
        c = self.config
        v = c.vision
        vs = "vit."
        g = v.max_image_size // v.patch_size
        pe = np.asarray(src.get(vs + "embeddings.position_embedding.weight"))
        visual = {
            "patch": {"w": jnp.asarray(
                np.asarray(src.get(vs + "embeddings.patch_embedding.weight"))
                .reshape(v.hidden_size, -1).T, dtype),
                "b": jnp.asarray(
                    src.get(vs + "embeddings.patch_embedding.bias"), dtype)},
            # drop the CLS row (model.rs:55-59)
            "pos_embed": jnp.asarray(pe[1:1 + g * g], dtype),
            "blocks": [],
            "perceive": {
                "before_rms": nn.take_norm(src, vs + "perceive.before_rms",
                                           dtype),
                "after_rms": nn.take_norm(src, vs + "perceive.after_rms",
                                          dtype),
                "proj0": {"w": jnp.asarray(
                    src.get(vs + "perceive.proj.0.weight"), dtype),
                    "b": jnp.asarray(src.get(vs + "perceive.proj.0.bias"),
                                     dtype)},
                "proj2": {"w": jnp.asarray(
                    np.asarray(src.get(vs + "perceive.proj.2.weight"))
                    .reshape(4 * v.hidden_size, 2 * v.hidden_size).T, dtype),
                    "b": jnp.asarray(src.get(vs + "perceive.proj.2.bias"),
                                     dtype)},
                "mlp": nn.take_linear(src, vs + "perceive.mlp", dtype),
                "image_newline": jnp.asarray(
                    src.get(vs + "perceive.image_newline"), dtype),
                "image_begin": jnp.asarray(
                    src.get(vs + "perceive.image_begin"), dtype),
                "image_end": jnp.asarray(
                    src.get(vs + "perceive.image_end"), dtype),
            },
        }
        blocks = []
        for i in range(v.num_hidden_layers):
            b = f"{vs}layers.{i}."
            blocks.append({
                "ln1": nn.take_norm(src, b + "input_layernorm", dtype),
                "ln2": nn.take_norm(src, b + "post_attention_layernorm",
                                    dtype),
                "q": nn.take_linear(src, b + "self_attn.q_proj", dtype),
                "k": nn.take_linear(src, b + "self_attn.k_proj", dtype),
                "v": nn.take_linear(src, b + "self_attn.v_proj", dtype),
                "o": nn.take_linear(src, b + "self_attn.o_proj", dtype),
                "fc1": nn.take_linear(src, b + "mlp.dense_h_to_4h", dtype),
                "fc2": nn.take_linear(src, b + "mlp.dense_4h_to_h", dtype),
            })
        visual["blocks"] = jax.tree.map(lambda *xs: np.stack(xs), *blocks)

        layers = []
        for i in range(c.num_hidden_layers):
            p = f"model.layers.{i}."
            layers.append({
                "ln1": nn.take_norm(src, p + "input_layernorm", dtype),
                "ln2": nn.take_norm(src, p + "post_attention_layernorm",
                                    dtype),
                "q": nn.take_linear(src, p + "self_attn.q_proj", dtype),
                "k": nn.take_linear(src, p + "self_attn.k_proj", dtype),
                "v": nn.take_linear(src, p + "self_attn.v_proj", dtype),
                "o": nn.take_linear(src, p + "self_attn.o_proj", dtype),
                "q_norm": nn.take_norm(src, p + "self_attn.query_layernorm",
                                       dtype),
                "k_norm": nn.take_norm(src, p + "self_attn.key_layernorm",
                                       dtype),
                "mlp": {
                    "gate": nn.take_linear(src, p + "mlp.gate_proj", dtype),
                    "up": nn.take_linear(src, p + "mlp.up_proj", dtype),
                    "down": nn.take_linear(src, p + "mlp.down_proj", dtype),
                },
            })
        embed = nn.take_embedding(src, "model.embed_tokens", dtype)
        return {"visual": visual,
                "layers": layers,
                "embed": embed,
                "norm": nn.take_norm(src, "model.norm", dtype),
                "lm_head": {"w": embed["w"].T}}  # tied (model.rs:553)


# Tensor-parallel partition rules (SURVEY §5.8).  The text decoder's layers
# are an unstacked list ("layers.<i>.q.w" paths); attention and MLP shard
# over tp, the ViT FFN likewise.
HUNYUAN_OCR_PARTITION_RULES = (
    (r"^layers\.\d+\.(q|k|v)\.w", (None, "tp")),
    (r"^layers\.\d+\.(q|k|v)\.b", ("tp",)),
    (r"^layers\.\d+\.o\.w", ("tp", None)),
    (r"^layers\.\d+\.mlp\.(gate|up)\.w", (None, "tp")),
    (r"^layers\.\d+\.mlp\.(gate|up)\.b", ("tp",)),
    (r"^layers\.\d+\.mlp\.down\.w", ("tp", None)),
    (r"^embed\.w", ("tp", None)),
    (r"^lm_head\.w", (None, "tp")),
    (r"visual\.blocks\.(fc1)\.w", (None, None, "tp")),
    (r"visual\.blocks\.(fc1)\.b", (None, "tp")),
    (r"visual\.blocks\.(fc2)\.w", (None, None, "tp")),
)
HUNYUAN_OCR_CACHE_RULES = ((r"^(k|v)$", (None, None, None, "tp", None)),)
HunyuanOCRModel.partition_rules = HUNYUAN_OCR_PARTITION_RULES
HunyuanOCRModel.cache_rules = HUNYUAN_OCR_CACHE_RULES
