"""PaddleOCR-VL: SigLIP NaViT vision tower + Ernie4.5 decoder.

Parity with src/models/paddleocr_vl/model.rs:
- SigLIP embeddings: per-patch conv (one 14×14 conv per packed patch,
  :96-198) + bilinearly interpolated learned positions per image grid
  (interpolate_pos_encoding, torch half-pixel convention)
- encoder: bias attention (out_proj) + gelu-tanh fc1/fc2 MLP, LayerNorm
  pre-norms, 2-D rotary over row-major (h, w) coords, full attention
  (:199-273); post_layernorm
- mlp_AR projector: pre-norm LN → row-major 2×2 merge → linear/gelu/linear
  (:31-94)
- Ernie4.5 text: llama-style decoder (configurable bias) with contiguous
  M-RoPE sections and rope_deltas decode handling (:316-760)

TPU split mirrors qwen2.5-vl: grid-dependent indices (positions, merge
gather, 4-tap pos-embed interpolation) are host-computed; the device jit
consumes padded patch buckets.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.io.weights import batched_load
from aha_tpu.core import nn
from aha_tpu.models.llama import LlamaConfig, LlamaModel
from aha_tpu.models.qwen2_5vl import get_rope_index as _qwen_rope_index
from aha_tpu.ops.attention import sdpa, segment_attention
from aha_tpu.ops.norms import layer_norm
from aha_tpu.ops.rope import apply_rope, gather_rope


@dataclasses.dataclass(frozen=True)
class PaddleVisionConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    num_channels: int = 3
    image_size: int = 384
    patch_size: int = 14
    spatial_merge_size: int = 2
    layer_norm_eps: float = 1e-6
    tokens_per_second: int = 2  # for the shared get_rope_index video path

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_dict(cls, d: dict) -> "PaddleVisionConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


@dataclasses.dataclass(frozen=True)
class PaddleOCRVLConfig:
    vision: PaddleVisionConfig
    text: LlamaConfig
    mrope_section: tuple[int, ...] = (16, 24, 24)
    image_token_id: int = 100295
    video_token_id: int = 100296
    vision_start_token_id: int = 101305

    @classmethod
    def from_file(cls, model_dir: str) -> "PaddleOCRVLConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            d = json.load(f)
        vision = PaddleVisionConfig.from_dict(d.get("vision_config", {}))
        use_bias = d.get("use_bias", False)
        text = LlamaConfig.from_dict({
            **d, "qkv_bias": use_bias, "o_bias": use_bias,
            "mlp_bias": use_bias})
        rs = d.get("rope_scaling") or {}
        return cls(
            vision=vision, text=text,
            mrope_section=tuple(rs.get("mrope_section", (16, 24, 24))),
            image_token_id=d.get("image_token_id", 100295),
            video_token_id=d.get("video_token_id", 100296),
            vision_start_token_id=d.get("vision_start_token_id", 101305))


# ---------------------------------------------------------------------------
# Host geometry
# ---------------------------------------------------------------------------


def paddle_vision_geometry(grid_thw: list[tuple[int, int, int]],
                           cfg: PaddleVisionConfig) -> dict[str, np.ndarray]:
    """Row-major (h, w) coords, 4-tap interpolated pos-embed taps (torch
    bilinear half-pixel), segment ids per image, and the row-major →
    merge-unit gather for the projector."""
    m = cfg.spatial_merge_size
    side = cfg.image_size // cfg.patch_size
    pos_hw, pidx, pw, seg, merge_gather = [], [], [], [], []
    base = 0
    for img_i, (t, h, w) in enumerate(grid_thw):
        hpos = np.repeat(np.arange(h), w)
        wpos = np.tile(np.arange(w), h)
        for _ in range(t):
            pos_hw.append(np.stack([hpos, wpos], -1))
            seg.append(np.full(h * w, 0, np.int32))  # full attention: one seg

        # torch bilinear (align_corners=False): src = (dst+0.5)*scale - 0.5
        def taps(n_dst):
            scale = side / n_dst
            src = (np.arange(n_dst) + 0.5) * scale - 0.5
            i0 = np.clip(np.floor(src), 0, side - 1).astype(np.int64)
            i1 = np.clip(i0 + 1, 0, side - 1)
            frac = np.clip(src - np.floor(src), 0.0, 1.0)
            frac = np.where(src < 0, 0.0, frac)
            return i0, i1, frac

        h0, h1, dh = taps(h)
        w0, w1, dw = taps(w)
        idx4 = np.stack([
            np.add.outer(h0 * side, w0), np.add.outer(h0 * side, w1),
            np.add.outer(h1 * side, w0), np.add.outer(h1 * side, w1)],
            -1).reshape(h * w, 4)
        w4 = np.stack([
            np.outer(1 - dh, 1 - dw), np.outer(1 - dh, dw),
            np.outer(dh, 1 - dw), np.outer(dh, dw)], -1).reshape(h * w, 4)
        for _ in range(t):
            pidx.append(idx4)
            pw.append(w4)

        # projector merge gather: unit (t, hu, wu) pulls rows in 2x2 order
        idx = np.arange(t * h * w).reshape(t, h, w) + base
        g = idx.reshape(t, h // m, m, w // m, m).transpose(0, 1, 3, 2, 4)
        merge_gather.append(g.reshape(-1))
        base += t * h * w
    return {
        "pos_hw": np.concatenate(pos_hw).astype(np.int32),
        "seg": np.concatenate(seg),
        "pos_idx": np.concatenate(pidx).astype(np.int32),
        "pos_w": np.concatenate(pw).astype(np.float32),
        "merge_gather": np.concatenate(merge_gather).astype(np.int32),
    }


get_rope_index = _qwen_rope_index  # same algorithm/family (model.rs:446-665)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class PaddleOCRVLModel:
    """Implements the CausalLM protocol; mm carries patches + host indices."""

    def __init__(self, config: PaddleOCRVLConfig, max_rope_len: int = 8192):
        self.config = config
        self.text = LlamaModel(config.text, max_rope_len=max_rope_len)
        self.n_layers = self.text.n_layers
        v = config.vision
        half = v.head_dim // 4
        self.v_inv_freq = 1.0 / (10000.0 ** (np.arange(half) / half))

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16):
        cache = self.text.init_cache(batch, max_len, dtype)
        cache["rope_delta"] = jnp.zeros((), jnp.int32)
        return cache

    # -- vision ---------------------------------------------------------------

    def encode_vision(self, vp, mm) -> jnp.ndarray:
        """patches (N, C·p·p) → (N_units, text_hidden) in original order."""
        v = self.config.vision
        patches = mm["patches"]
        N = patches.shape[0]
        unit = v.spatial_merge_size ** 2
        dt = vp["patch_embed"]["w"].dtype
        # per-patch conv == matmul over the flattened patch
        x = patches.astype(dt) @ vp["patch_embed"]["w"] + vp["patch_embed"]["b"]
        table = vp["pos_embed"]["w"]
        pe = (table[mm["pos_idx"]].astype(jnp.float32)
              * mm["pos_w"][..., None]).sum(axis=1)
        x = x + pe.astype(dt)

        inv = jnp.asarray(self.v_inv_freq, jnp.float32)
        fh = mm["pos_hw"][:, 0:1].astype(jnp.float32) * inv[None, :]
        fw = mm["pos_hw"][:, 1:2].astype(jnp.float32) * inv[None, :]
        # (N, head_dim/2) then repeat(1, 2) in the reference — our apply_rope
        # performs the duplication
        freqs = jnp.concatenate([fh, fw], -1)
        cos, sin = jnp.cos(freqs), jnp.sin(freqs)

        seg = mm["seg"]
        H, hd = v.num_attention_heads, v.head_dim
        for lp in vp["layers"]:
            h = layer_norm(x, lp["ln1"]["w"], lp["ln1"].get("b"),
                           v.layer_norm_eps)
            q = nn.linear(lp["q"], h).reshape(N, H, hd)[None]
            k = nn.linear(lp["k"], h).reshape(N, H, hd)[None]
            vv = nn.linear(lp["v"], h).reshape(N, H, hd)[None]
            q, k = apply_rope(q, k, cos, sin)
            attn = segment_attention(q, k, vv, seg).reshape(N, v.hidden_size)
            x = x + nn.linear(lp["o"], attn)
            h = layer_norm(x, lp["ln2"]["w"], lp["ln2"].get("b"),
                           v.layer_norm_eps)
            h = jax.nn.gelu(nn.linear(lp["fc1"], h))
            x = x + nn.linear(lp["fc2"], h)
        x = layer_norm(x, vp["post_ln"]["w"], vp["post_ln"].get("b"),
                       v.layer_norm_eps)

        # projector: pre-norm, row-major 2x2 merge via host gather, mlp
        h = layer_norm(x, vp["proj"]["pre_norm"]["w"],
                       vp["proj"]["pre_norm"].get("b"),
                       self.config.text.rms_norm_eps)
        h = h[mm["merge_gather"]].reshape(N // unit, unit * v.hidden_size)
        h = jax.nn.gelu(nn.linear(vp["proj"]["fc1"], h), approximate=False)
        return nn.linear(vp["proj"]["fc2"], h)

    # -- M-RoPE (contiguous sections, same as qwen2.5-vl) ---------------------

    def _mrope_cos_sin(self, position_ids):
        cos3, sin3 = gather_rope(self.text.cos, self.text.sin, position_ids)
        half = self.text.cos.shape[-1]
        sec = np.zeros(half, np.int64)
        start = 0
        for i, width in enumerate(self.config.mrope_section):
            sec[start:start + width] = i
            start += width
        sel = jnp.asarray(sec)
        cos = jnp.take_along_axis(cos3, sel[None, None, :], axis=0)[0]
        sin = jnp.take_along_axis(sin3, sel[None, None, :], axis=0)[0]
        return cos, sin

    # -- CausalLM --------------------------------------------------------------

    def backbone(self, params, input_ids, cache, mm: Any = None,
                 prompt_len=None):
        B, S = input_ids.shape
        x = nn.embedding(params["text"]["embed"], input_ids)
        if mm is not None:
            feats = self.encode_vision(params["visual"], mm)
            is_img = (input_ids == self.config.image_token_id) | \
                     (input_ids == self.config.video_token_id)
            idx = jnp.clip(jnp.cumsum(is_img[0]) - 1, 0, feats.shape[0] - 1)
            x = jnp.where(is_img[0][None, :, None],
                          feats[idx][None].astype(x.dtype), x)
            cos, sin = self._mrope_cos_sin(mm["position_ids"])
            cache = {**cache, "rope_delta": mm["rope_delta"]}
        elif S == 1:
            pos_eff = cache["pos"] + cache["rope_delta"]
            cos, sin = gather_rope(self.text.cos, self.text.sin,
                                   pos_eff[None] + jnp.arange(S))
        else:
            positions = cache["pos"] + jnp.arange(S)
            cos, sin = gather_rope(self.text.cos, self.text.sin, positions)
            cache = {**cache, "rope_delta": jnp.zeros((), jnp.int32)}
        hidden, cache = self.text.run_layers(params["text"], x, cache,
                                             cos_sin=(cos, sin))
        return hidden, cache

    def logits(self, params, hidden):
        return self.text.logits(params["text"], hidden)

    # -- loading ------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.bfloat16) -> dict:
        v = self.config.vision
        vm = "visual.vision_model."
        conv = src.get(vm + "embeddings.patch_embedding.weight", dtype)
        in_dim = v.num_channels * v.patch_size ** 2
        visual = {
            "patch_embed": {
                "w": conv.reshape(v.hidden_size, in_dim).T,
                "b": src.get(vm + "embeddings.patch_embedding.bias", dtype),
            },
            "pos_embed": nn.take_embedding(
                src, vm + "embeddings.position_embedding", dtype),
            "post_ln": nn.take_norm(src, vm + "post_layernorm", dtype),
            "proj": {
                "pre_norm": nn.take_norm(src, "mlp_AR.pre_norm", dtype),
                "fc1": nn.take_linear(src, "mlp_AR.linear_1", dtype),
                "fc2": nn.take_linear(src, "mlp_AR.linear_2", dtype),
            },
            "layers": [],
        }
        for i in range(v.num_hidden_layers):
            p = f"{vm}encoder.layers.{i}."
            visual["layers"].append({
                "ln1": nn.take_norm(src, p + "layer_norm1", dtype),
                "ln2": nn.take_norm(src, p + "layer_norm2", dtype),
                "q": nn.take_linear(src, p + "self_attn.q_proj", dtype),
                "k": nn.take_linear(src, p + "self_attn.k_proj", dtype),
                "v": nn.take_linear(src, p + "self_attn.v_proj", dtype),
                "o": nn.take_linear(src, p + "self_attn.out_proj", dtype),
                "fc1": nn.take_linear(src, p + "mlp.fc1", dtype),
                "fc2": nn.take_linear(src, p + "mlp.fc2", dtype),
            })
        text = self.text.load_params(src, dtype=dtype)
        return {"visual": visual, "text": text}

    def init_random(self, key, dtype=jnp.float32, scale: float = 0.02) -> dict:
        v = self.config.vision
        k1, k2 = jax.random.split(key)
        text = self.text.init_random(k1, dtype, scale)
        ks = iter(jax.random.split(k2, 8 * v.num_hidden_layers + 12))

        def w(shape):
            return jax.random.normal(next(ks), shape, dtype) * scale

        def lin(i, o):
            return {"w": w((i, o)), "b": jnp.zeros(o, dtype)}

        def norm(d):
            return {"w": jnp.ones(d, dtype), "b": jnp.zeros(d, dtype)}

        d = v.hidden_size
        unit = v.spatial_merge_size ** 2
        side = v.image_size // v.patch_size
        visual = {
            "patch_embed": {"w": w((v.num_channels * v.patch_size ** 2, d)),
                            "b": jnp.zeros(d, dtype)},
            "pos_embed": {"w": w((side * side, d))},
            "post_ln": norm(d),
            "proj": {"pre_norm": norm(d),
                     "fc1": lin(unit * d, unit * d),
                     "fc2": lin(unit * d, self.config.text.hidden_size)},
            "layers": [{
                "ln1": norm(d), "ln2": norm(d),
                "q": lin(d, d), "k": lin(d, d), "v": lin(d, d),
                "o": lin(d, d),
                "fc1": lin(d, v.intermediate_size),
                "fc2": lin(v.intermediate_size, d),
            } for _ in range(v.num_hidden_layers)],
        }
        return {"visual": visual, "text": text}


# Tensor-parallel partition rules (SURVEY §5.8).  Text decoder = Ernie4.5
# served through the parameterized LlamaModel under "text." (llama regexes
# match by substring); the SigLIP tower is small and stays replicated.
from aha_tpu.models.llama import LLAMA_CACHE_RULES, LLAMA_PARTITION_RULES

PADDLEOCR_VL_PARTITION_RULES = LLAMA_PARTITION_RULES
PADDLEOCR_VL_CACHE_RULES = LLAMA_CACHE_RULES
PaddleOCRVLModel.partition_rules = PADDLEOCR_VL_PARTITION_RULES
PaddleOCRVLModel.cache_rules = PADDLEOCR_VL_CACHE_RULES
