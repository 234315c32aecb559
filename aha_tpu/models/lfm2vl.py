"""LFM2-VL: SigLIP2-NaViT vision tower + pixel-unshuffle projector on the
LFM2 hybrid (conv/attention) decoder.

Parity with src/models/lfm2vl/model.rs:
- Siglip2VisionEmbeddings (:20-97): linear patch embedding over flattened
  (patch²·3) pixels; the square learned position table is bilinearly
  resized to each image's (h, w) patch grid and added (pad rows reuse
  row 0).
- Siglip2Encoder (:99-139): pre-LN ViT blocks with biases, gelu MLP;
  padding handled by an attention mask over real patches.
- Lfm2VlMultiModalProjector (:179-244): space-to-depth by
  downsample_factor (the exact double-reshape ordering of the reference),
  optional LayerNorm, 2-layer gelu MLP into the text width.
- Lfm2VLModel (:246-320): projected image features scatter into the
  input embeddings at image_token_id positions; text runs through the
  shared Lfm2Model (CausalLM protocol, hybrid conv/attention cache).

TPU notes: the position-table resize happens once per request on host
(numpy/jax.image outside jit); the packed NaViT batch (pixels, pixel
mask, per-image shapes) rides the mm pytree padded to patch buckets.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core import nn
from aha_tpu.models.lfm2 import Lfm2Config, Lfm2Model
from aha_tpu.ops.attention import sdpa
from aha_tpu.ops.norms import layer_norm
from aha_tpu.io.weights import batched_load


@dataclasses.dataclass(frozen=True)
class Lfm2VLVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_attention_heads: int = 12
    num_hidden_layers: int = 12
    num_channels: int = 3
    num_patches: int = 256
    patch_size: int = 16
    layer_norm_eps: float = 1e-6

    @classmethod
    def from_dict(cls, d: dict) -> "Lfm2VLVisionConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


@dataclasses.dataclass(frozen=True)
class Lfm2VLConfig:
    text: Lfm2Config
    vision: Lfm2VLVisionConfig
    image_token_id: int = 396
    downsample_factor: int = 2
    projector_hidden_size: int = 2560
    projector_bias: bool = True
    projector_use_layernorm: bool = True
    tile_size: int = 512
    max_image_tokens: int = 256
    min_image_tokens: int = 64
    use_image_special_tokens: bool = True

    @classmethod
    def from_file(cls, model_dir: str) -> "Lfm2VLConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            d = json.load(f)
        names = {f.name for f in dataclasses.fields(cls)} - {"text", "vision"}
        return cls(text=Lfm2Config.from_dict(d["text_config"]),
                   vision=Lfm2VLVisionConfig.from_dict(d["vision_config"]),
                   **{k: v for k, v in d.items() if k in names})


def resize_pos_embeddings(table: np.ndarray, h: int, w: int,
                          max_len: int) -> np.ndarray:
    """Square (n², d) learned table → bilinear (h·w, d), padded to max_len
    with row 0 (model.rs:51-87).  Host-side, once per request."""
    side = int(np.sqrt(table.shape[0]))
    grid = jnp.asarray(table, jnp.float32).reshape(side, side, -1)
    resized = jax.image.resize(grid, (h, w, grid.shape[-1]), "bilinear")
    out = np.asarray(resized).reshape(h * w, -1)
    if h * w < max_len:
        out = np.concatenate(
            [out, np.repeat(out[:1], max_len - h * w, axis=0)])
    return out


class Siglip2VisionTower:
    def __init__(self, cfg: Lfm2VLVisionConfig):
        self.v = cfg
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads

    def encode(self, vp, pixels, pixel_mask, pos_embeds):
        """pixels (B, N, patch²·3); pixel_mask (B, N) bool;
        pos_embeds (B, N, D) host-resized → hidden (B, N, D)."""
        v = self.v
        x = nn.linear(vp["patch_embedding"], pixels) + pos_embeds.astype(
            pixels.dtype)
        neg = jnp.finfo(jnp.float32).min
        mask = jnp.where(pixel_mask[:, None, None, :], 0.0, neg)
        H, hd = v.num_attention_heads, self.head_dim
        B, N, D = x.shape
        for lp in vp["layers"]:
            h = layer_norm(x, lp["ln1"]["w"], lp["ln1"]["b"],
                           v.layer_norm_eps)
            q = nn.linear(lp["q"], h).reshape(B, N, H, hd)
            k = nn.linear(lp["k"], h).reshape(B, N, H, hd)
            val = nn.linear(lp["v"], h).reshape(B, N, H, hd)
            attn = sdpa(q, k, val, mask).reshape(B, N, D)
            x = x + nn.linear(lp["o"], attn)
            h = layer_norm(x, lp["ln2"]["w"], lp["ln2"]["b"],
                           v.layer_norm_eps)
            x = x + nn.linear(lp["fc2"], jax.nn.gelu(
                nn.linear(lp["fc1"], h), approximate=False))
        return layer_norm(x, vp["post_ln"]["w"], vp["post_ln"]["b"],
                          v.layer_norm_eps)

    @batched_load
    def load_params(self, src, dtype, vt: str) -> dict:
        v = self.v
        p = {
            "patch_embedding": nn.take_linear(
                src, vt + "embeddings.patch_embedding", dtype),
            "pos_table": src.get(
                vt + "embeddings.position_embedding.weight", jnp.float32),
            "post_ln": nn.take_norm(src, vt + "post_layernorm", dtype),
            "layers": [],
        }
        for i in range(v.num_hidden_layers):
            b = f"{vt}encoder.layers.{i}."
            p["layers"].append({
                "ln1": nn.take_norm(src, b + "layer_norm1", dtype),
                "ln2": nn.take_norm(src, b + "layer_norm2", dtype),
                "q": nn.take_linear(src, b + "self_attn.q_proj", dtype),
                "k": nn.take_linear(src, b + "self_attn.k_proj", dtype),
                "v": nn.take_linear(src, b + "self_attn.v_proj", dtype),
                "o": nn.take_linear(src, b + "self_attn.out_proj", dtype),
                "fc1": nn.take_linear(src, b + "mlp.fc1", dtype),
                "fc2": nn.take_linear(src, b + "mlp.fc2", dtype),
            })
        return p

    def init_random(self, key, scale=0.02) -> dict:
        v = self.v
        ks = iter(jax.random.split(key, 8 * v.num_hidden_layers + 4))

        def lin(i, o):
            return {"w": jax.random.normal(next(ks), (i, o),
                                           jnp.float32) * scale,
                    "b": jnp.zeros(o)}

        def norm(d):
            return {"w": jnp.ones(d), "b": jnp.zeros(d)}

        D, I = v.hidden_size, v.intermediate_size
        in_dim = v.num_channels * v.patch_size ** 2
        return {
            "patch_embedding": lin(in_dim, D),
            "pos_table": jax.random.normal(
                next(ks), (v.num_patches, D), jnp.float32) * scale,
            "post_ln": norm(D),
            "layers": [{
                "ln1": norm(D), "ln2": norm(D),
                "q": lin(D, D), "k": lin(D, D), "v": lin(D, D),
                "o": lin(D, D), "fc1": lin(D, I), "fc2": lin(I, D),
            } for _ in range(v.num_hidden_layers)],
        }


def unshuffle_gather(shapes: list[tuple[int, int]], n_padded: int,
                     factor: int, units_bucket: int | None = None
                     ) -> np.ndarray:
    """Host-side index map replicating the projector's space-to-depth.

    The reference's double-reshape (model.rs:226-236) concatenates, for
    output unit (r, c), the f² patch features at rows r·f+dr, cols c·f+dc
    in row-major (dr, dc) order.  Returns (units, f²) indices into the
    flattened (B·n_padded) tower output."""
    rows = []
    for i, (h, w) in enumerate(shapes):
        base = i * n_padded
        for r in range(h // factor):
            for c in range(w // factor):
                rows.append([base + (r * factor + dr) * w + (c * factor + dc)
                             for dr in range(factor)
                             for dc in range(factor)])
        # use_thumbnail/tiling: each packed row is one image
    out = np.asarray(rows, np.int32)
    if units_bucket and units_bucket > len(out):
        pad = np.zeros((units_bucket - len(out), factor * factor), np.int32)
        out = np.concatenate([out, pad])
    return out


class Lfm2VLModel:
    """Implements the CausalLM protocol; mm carries the packed NaViT batch
    plus host-resized positional embeddings."""

    def __init__(self, config: Lfm2VLConfig, max_rope_len: int = 8192):
        self.config = config
        self.text = Lfm2Model(config.text, max_rope_len=max_rope_len)
        self.n_layers = self.text.n_layers
        self.tower = Siglip2VisionTower(config.vision)

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16):
        return self.text.init_cache(batch, max_len, dtype)

    def encode_vision(self, params, mm) -> jnp.ndarray:
        """→ (units, text_hidden) projected image features in input order
        (model.rs:286-304); mm["gather"] (units, f²) packs the per-image
        space-to-depth, fully jittable."""
        c = self.config
        hidden = self.tower.encode(params["visual"], mm["pixels"],
                                   mm["pixel_mask"], mm["pos_embeds"])
        flat = hidden.reshape(-1, hidden.shape[-1])      # (B·N, D)
        units = flat[mm["gather"]]                       # (units, f², D)
        x = units.reshape(units.shape[0], -1)            # (units, f²·D)
        p = params["projector"]
        if "ln" in p:
            x = layer_norm(x, p["ln"]["w"], p["ln"]["b"],
                           c.vision.layer_norm_eps)
        x = jax.nn.gelu(nn.linear(p["l1"], x), approximate=False)
        return nn.linear(p["l2"], x)

    def backbone(self, params, input_ids, cache, mm: Any = None,
                 prompt_len=None):
        embeds = None
        if mm is not None:
            feats = self.encode_vision(params, mm)
            embeds = nn.embedding(params["embed"], input_ids)
            is_img = input_ids == self.config.image_token_id
            idx = jnp.clip(jnp.cumsum(is_img[0]) - 1, 0, feats.shape[0] - 1)
            embeds = jnp.where(is_img[0][None, :, None],
                               feats[idx][None].astype(embeds.dtype), embeds)
        return self.text.backbone(params, input_ids, cache,
                                  prompt_len=prompt_len,
                                  inputs_embeds=embeds)

    def logits(self, params, hidden):
        return self.text.logits(params, hidden)

    # -- loading ------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.bfloat16) -> dict:
        c = self.config

        class _Scoped:
            """lfm2vl nests the decoder under model.language_model."""

            def __init__(self, src):
                self.src = src

            def _map(self, name):
                if name.startswith("model."):
                    return "model.language_model." + name[len("model."):]
                return name

            def get(self, name, dtype=None):
                return self.src.get(self._map(name), dtype)

            def __contains__(self, name):
                return self._map(name) in self.src

        params = self.text.load_params(_Scoped(src), dtype)
        vt = "model.vision_tower.vision_model."
        params["visual"] = self.tower.load_params(src, dtype, vt)
        mp = "model.multi_modal_projector."
        proj = {
            "l1": nn.take_linear(src, mp + "linear_1", dtype),
            "l2": nn.take_linear(src, mp + "linear_2", dtype),
        }
        if mp + "layer_norm.weight" in src:
            proj["ln"] = nn.take_norm(src, mp + "layer_norm", dtype)
        params["projector"] = proj
        return params

    def init_random(self, key, dtype=jnp.float32, scale: float = 0.02) -> dict:
        c = self.config
        k1, k2, k3 = jax.random.split(key, 3)
        params = self.text.init_random(k1, dtype, scale)
        params["visual"] = self.tower.init_random(k2, scale)
        in_dim = c.vision.hidden_size * c.downsample_factor ** 2
        ks = iter(jax.random.split(k3, 4))

        def lin(i, o):
            return {"w": jax.random.normal(next(ks), (i, o),
                                           jnp.float32) * scale,
                    "b": jnp.zeros(o)}

        params["projector"] = {
            "ln": {"w": jnp.ones(in_dim), "b": jnp.zeros(in_dim)},
            "l1": lin(in_dim, c.projector_hidden_size),
            "l2": lin(c.projector_hidden_size, c.text.hidden_size),
        }
        return params


# The decoder params sit at the pytree top level (load_params strips the
# model.language_model prefix), so the lfm2 rules apply verbatim; the
# SigLIP2 tower + projector have no matching rules and replicate — a small
# share of the params, and the NaViT packed batch is prefill-only.
from aha_tpu.models.lfm2 import LFM2_CACHE_RULES, LFM2_PARTITION_RULES  # noqa: E402

Lfm2VLModel.partition_rules = LFM2_PARTITION_RULES
Lfm2VLModel.cache_rules = LFM2_CACHE_RULES
