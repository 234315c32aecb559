"""Qwen3-VL: ViT with interpolated learned positions + deepstack injection,
Qwen3 text decoder with interleaved M-RoPE.

Parity with src/models/qwen3vl/model.rs:
- patch embed matmul + bias (:32-105); learned pos_embed bilinearly
  interpolated to each grid (fast_pos_embed_interpolate, :512-640) — the
  4-tap indices/weights are host-computed, the gather runs on device
- vision blocks: LayerNorm pre-norms, fused-qkv attention with 2-D rotary,
  gelu MLP (linear_fc1/fc2); full attention block-diagonal per frame
  (cu_seqlens, :692-741)
- patch merger (+ per-deepstack-level mergers with post-shuffle norm,
  :106-186); deepstack features added to hidden states at visual positions
  after each of the first N text layers (:775-829)
- text: Qwen3 decoder with **interleaved** M-RoPE (rope.rs:444-481:
  channel c takes axis c%3 within each section's 3× range)
- rope_deltas cached for decode (:901-1133)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core import cache as kvmod
from aha_tpu.core import nn
from aha_tpu.io.weights import batched_load
from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model
from aha_tpu.ops.attention import causal_mask, sdpa, segment_attention
from aha_tpu.ops.norms import layer_norm
from aha_tpu.ops.rope import apply_rope, gather_rope


@dataclasses.dataclass(frozen=True)
class Qwen3VLVisionConfig:
    depth: int = 27
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_heads: int = 16
    in_channels: int = 3
    out_hidden_size: int = 2048
    patch_size: int = 16
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    num_position_embeddings: int = 2304
    deepstack_visual_indexes: tuple[int, ...] = (8, 16, 24)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def from_dict(cls, d: dict) -> "Qwen3VLVisionConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        d = {k: tuple(v) if isinstance(v, list) else v
             for k, v in d.items() if k in names}
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class Qwen3VLConfig:
    vision: Qwen3VLVisionConfig
    text: Qwen3Config
    mrope_section: tuple[int, ...] = (24, 20, 20)
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652

    @classmethod
    def from_file(cls, model_dir: str) -> "Qwen3VLConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            d = json.load(f)
        vision = Qwen3VLVisionConfig.from_dict(d.get("vision_config", {}))
        text_d = {**d, **d.get("text_config", {})}
        text = Qwen3Config.from_dict(text_d)
        rope_scaling = text_d.get("rope_scaling") or {}
        return cls(
            vision=vision, text=text,
            mrope_section=tuple(rope_scaling.get("mrope_section",
                                                 (24, 20, 20))),
            image_token_id=d.get("image_token_id", 151655),
            video_token_id=d.get("video_token_id", 151656),
            vision_start_token_id=d.get("vision_start_token_id", 151652))


# ---------------------------------------------------------------------------
# Host-side geometry
# ---------------------------------------------------------------------------


def _unitize(a: np.ndarray, h: int, w: int, m: int) -> np.ndarray:
    """(h, w) row-major → merge-unit order flat."""
    return a.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)


def vision_geometry_qwen3vl(grid_thw: list[tuple[int, int, int]],
                            cfg: Qwen3VLVisionConfig) -> dict[str, np.ndarray]:
    """Per-patch (h, w) rotary coords, frame segments, and 4-tap bilinear
    pos-embed indices/weights (fast_pos_embed_interpolate), all in the
    merge-unit patch order the processor emits."""
    m = cfg.spatial_merge_size
    side = int(cfg.num_position_embeddings ** 0.5)
    pos_hw, seg, pidx, pw = [], [], [], []
    frame = 0
    for (t, h, w) in grid_thw:
        hpos = np.arange(h)[:, None] * np.ones(w, np.int64)[None]
        wpos = np.ones(h, np.int64)[:, None] * np.arange(w)[None]
        hu, wu = _unitize(hpos, h, w, m), _unitize(wpos, h, w, m)
        # bilinear taps from the side×side learned grid
        hg = np.linspace(0, side - 1, h)
        wg = np.linspace(0, side - 1, w)
        h0, w0 = np.floor(hg).astype(np.int64), np.floor(wg).astype(np.int64)
        h1, w1 = np.minimum(h0 + 1, side - 1), np.minimum(w0 + 1, side - 1)
        dh, dw = hg - h0, wg - w0
        idx4 = np.stack([
            np.add.outer(h0 * side, w0), np.add.outer(h0 * side, w1),
            np.add.outer(h1 * side, w0), np.add.outer(h1 * side, w1)], -1)
        w4 = np.stack([
            np.outer(1 - dh, 1 - dw), np.outer(1 - dh, dw),
            np.outer(dh, 1 - dw), np.outer(dh, dw)], -1)
        idx4u = np.stack([_unitize(idx4[..., i], h, w, m)
                          for i in range(4)], -1)
        w4u = np.stack([_unitize(w4[..., i], h, w, m) for i in range(4)], -1)
        for _ in range(t):
            pos_hw.append(np.stack([hu, wu], -1))
            pidx.append(idx4u)
            pw.append(w4u)
            seg.append(np.full(h * w, frame, np.int32))
            frame += 1
    return {
        "pos_hw": np.concatenate(pos_hw).astype(np.int32),
        "seg": np.concatenate(seg),
        "pos_idx": np.concatenate(pidx).astype(np.int32),
        "pos_w": np.concatenate(pw).astype(np.float32),
    }


def get_rope_index_qwen3vl(input_ids: list[int],
                           grid_thw: list[tuple[int, int, int]],
                           cfg: Qwen3VLConfig) -> tuple[np.ndarray, int]:
    """(3, S) M-RoPE ids + rope_delta. Image semantics match qwen2.5-vl;
    qwen3-vl videos place timestamps in the prompt, so t advances by 1 per
    frame (model.rs get_rope_index)."""
    m = cfg.vision.spatial_merge_size
    ids = np.asarray(input_ids)
    S = len(ids)
    pos = np.zeros((3, S), np.int64)
    vision_tokens = (cfg.image_token_id, cfg.video_token_id)
    current, img_i, i = 0, 0, 0
    while i < S:
        if ids[i] in vision_tokens:
            t, h, w = grid_thw[img_i]
            lh, lw = h // m, w // m
            n = t * lh * lw
            t_idx = np.broadcast_to(np.arange(t)[:, None, None],
                                    (t, lh, lw)) + current
            h_idx = np.broadcast_to(np.arange(lh)[None, :, None],
                                    (t, lh, lw)) + current
            w_idx = np.broadcast_to(np.arange(lw)[None, None, :],
                                    (t, lh, lw)) + current
            pos[0, i:i + n] = t_idx.reshape(-1)
            pos[1, i:i + n] = h_idx.reshape(-1)
            pos[2, i:i + n] = w_idx.reshape(-1)
            current = int(pos[:, i:i + n].max()) + 1
            i += n
            img_i += 1
        else:
            pos[:, i] = current
            current += 1
            i += 1
    return pos, int(pos.max()) + 1 - S


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------



class Qwen3VLVisionTower:
    """Standalone deepstack ViT (shared by Qwen3-VL and Qwen3.5)."""

    def __init__(self, vision: Qwen3VLVisionConfig):
        self.v = vision
        half = vision.head_dim // 4
        self.inv_freq = 1.0 / (10000.0 ** (np.arange(half) / half))

    def encode(self, vp, mm) -> tuple[jnp.ndarray, jnp.ndarray]:
        """patches (N, in_dim) → (main (N_units, out), deepstack
        (n_ds, N_units, out)); pad rows isolated by seg=-1."""
        v = self.v
        patches = mm["patches"]
        N = patches.shape[0]
        unit = v.spatial_merge_size ** 2
        dt = vp["patch_embed"]["w"].dtype
        x = patches.astype(dt) @ vp["patch_embed"]["w"] + vp["patch_embed"]["b"]
        table = vp["pos_embed"]["w"]
        pe = (table[mm["pos_idx"]].astype(jnp.float32)
              * mm["pos_w"][..., None]).sum(axis=1)
        x = x + pe.astype(dt)

        inv = jnp.asarray(self.inv_freq, jnp.float32)
        fh = mm["pos_hw"][:, 0:1].astype(jnp.float32) * inv[None, :]
        fw = mm["pos_hw"][:, 1:2].astype(jnp.float32) * inv[None, :]
        freqs = jnp.concatenate([fh, fw], -1)
        cos, sin = jnp.cos(freqs), jnp.sin(freqs)

        seg = mm["seg"]

        H, hd = v.num_heads, v.head_dim
        ds_feats = []
        for i, lp in enumerate(vp["blocks"]):
            h = layer_norm(x, lp["norm1"]["w"], lp["norm1"].get("b"), 1e-6)
            qkv = nn.linear(lp["qkv"], h).reshape(N, 3, H, hd)
            q, k, vv = qkv[:, 0][None], qkv[:, 1][None], qkv[:, 2][None]
            q, k = apply_rope(q, k, cos, sin)
            attn = segment_attention(q, k, vv, seg).reshape(N, v.hidden_size)
            x = x + nn.linear(lp["proj"], attn)
            h = layer_norm(x, lp["norm2"]["w"], lp["norm2"].get("b"), 1e-6)
            x = x + nn.linear(lp["fc2"], jax.nn.gelu(nn.linear(lp["fc1"], h)))
            if i in v.deepstack_visual_indexes:
                j = v.deepstack_visual_indexes.index(i)
                ds_feats.append(self._merger(vp["ds_mergers"][j], x, unit,
                                             post_shuffle=True))
        main = self._merger(vp["merger"], x, unit, post_shuffle=False)
        return main, jnp.stack(ds_feats) if ds_feats else jnp.zeros(
            (0,) + main.shape, main.dtype)

    def _merger(self, mp, x, unit, post_shuffle: bool):
        N = x.shape[0]
        if post_shuffle:
            h = x.reshape(N // unit, unit * x.shape[-1])
            h = layer_norm(h, mp["norm"]["w"], mp["norm"].get("b"), 1e-6)
        else:
            h = layer_norm(x, mp["norm"]["w"], mp["norm"].get("b"), 1e-6)
            h = h.reshape(N // unit, unit * x.shape[-1])
        h = jax.nn.gelu(nn.linear(mp["fc1"], h), approximate=False)
        return nn.linear(mp["fc2"], h)

    @batched_load
    def load_params(self, src, dtype, vt: str) -> dict:
        v = self.v
        in_dim = v.in_channels * v.temporal_patch_size * v.patch_size ** 2
        pe = src.get(vt + "patch_embed.proj.weight", dtype)

        def merger(prefix):
            return {
                "norm": nn.take_norm(src, prefix + "norm", dtype),
                "fc1": nn.take_linear(src, prefix + "linear_fc1", dtype),
                "fc2": nn.take_linear(src, prefix + "linear_fc2", dtype),
            }

        visual = {
            "patch_embed": {
                "w": pe.reshape(v.hidden_size, in_dim).T,
                "b": src.get(vt + "patch_embed.proj.bias", dtype),
            },
            "pos_embed": nn.take_embedding(src, vt + "pos_embed", dtype),
            "merger": merger(vt + "merger."),
            "ds_mergers": [merger(f"{vt}deepstack_merger_list.{i}.")
                           for i in range(len(v.deepstack_visual_indexes))],
            "blocks": [],
        }
        for i in range(v.depth):
            p = f"{vt}blocks.{i}."
            visual["blocks"].append({
                "norm1": nn.take_norm(src, p + "norm1", dtype),
                "norm2": nn.take_norm(src, p + "norm2", dtype),
                "qkv": nn.take_linear(src, p + "attn.qkv", dtype),
                "proj": nn.take_linear(src, p + "attn.proj", dtype),
                "fc1": nn.take_linear(src, p + "mlp.linear_fc1", dtype),
                "fc2": nn.take_linear(src, p + "mlp.linear_fc2", dtype),
            })
        return visual

    def init_random(self, key, text_hidden: int, dtype=jnp.float32,
                    scale: float = 0.02) -> dict:
        v = self.v
        ks = iter(jax.random.split(key, 8 * v.depth + 8 * 8))

        def w(shape):
            return jax.random.normal(next(ks), shape, dtype) * scale

        def lin(i, o):
            return {"w": w((i, o)), "b": jnp.zeros(o, dtype)}

        def norm(d):
            return {"w": jnp.ones(d, dtype), "b": jnp.zeros(d, dtype)}

        d = v.hidden_size
        unit = v.spatial_merge_size ** 2
        in_dim = v.in_channels * v.temporal_patch_size * v.patch_size ** 2

        def merger(post):
            return {"norm": norm(unit * d if post else d),
                    "fc1": lin(unit * d, unit * d),
                    "fc2": lin(unit * d, text_hidden)}

        return {
            "patch_embed": {"w": w((in_dim, d)), "b": jnp.zeros(d, dtype)},
            "pos_embed": {"w": w((v.num_position_embeddings, d))},
            "merger": merger(False),
            "ds_mergers": [merger(True)
                           for _ in v.deepstack_visual_indexes],
            "blocks": [{
                "norm1": norm(d), "norm2": norm(d),
                "qkv": lin(d, 3 * d), "proj": lin(d, d),
                "fc1": lin(d, v.intermediate_size),
                "fc2": lin(v.intermediate_size, d),
            } for _ in range(v.depth)],
        }


class Qwen3VLModel:
    """Implements the CausalLM protocol; mm carries patches + host indices."""

    #: prefix caching works for this model: from_cache suffix prefill over
    #: restored rows, rope_delta captured in the snapshot (multimodal
    #: prompts key on the mm digest)
    supports_prefix_cache = True

    def __init__(self, config: Qwen3VLConfig, max_rope_len: int = 8192):
        self.config = config
        self.text = Qwen3Model(config.text, max_rope_len=max_rope_len)
        self.n_layers = self.text.n_layers
        self.tower = Qwen3VLVisionTower(config.vision)
        # interleaved M-RoPE channel→axis map (rope.rs:455-476)
        half_t = self.text.cos.shape[-1]
        sec = np.zeros(half_t, np.int64)
        for axis in (1, 2):
            limit = config.mrope_section[axis] * 3
            idx = np.arange(axis, limit, 3)
            sec[idx] = axis
        self._mrope_sel = sec

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16):
        cache = self.text.init_cache(batch, max_len, dtype)
        cache["rope_delta"] = jnp.zeros((), jnp.int32)
        return cache

    # -- vision tower --------------------------------------------------------

    def encode_vision(self, vp, mm):
        return self.tower.encode(vp, mm)

    # -- M-RoPE (interleaved) -------------------------------------------------

    def _mrope_cos_sin(self, position_ids: jnp.ndarray):
        cos3, sin3 = gather_rope(self.text.cos, self.text.sin, position_ids)
        sel = jnp.asarray(self._mrope_sel)
        cos = jnp.take_along_axis(cos3, sel[None, None, :], axis=0)[0]
        sin = jnp.take_along_axis(sin3, sel[None, None, :], axis=0)[0]
        return cos, sin

    # -- CausalLM ------------------------------------------------------------

    def backbone(self, params, input_ids, cache, mm: Any = None,
                 prompt_len=None, from_cache: bool = False):
        B, S = input_ids.shape
        x = nn.embedding(params["text"]["embed"], input_ids)
        ds = None
        vis_mask = None
        if mm is not None:
            feats, ds = self.encode_vision(params["visual"], mm)
            is_img = (input_ids == self.config.image_token_id) | \
                     (input_ids == self.config.video_token_id)
            vis_mask = is_img[0]
            idx = jnp.clip(jnp.cumsum(vis_mask) - 1, 0, feats.shape[0] - 1)
            x = jnp.where(vis_mask[None, :, None],
                          feats[idx][None].astype(x.dtype), x)
            self._ds_idx = idx
            cos, sin = self._mrope_cos_sin(mm["position_ids"])
            cache = {**cache, "rope_delta": mm["rope_delta"]}
        elif S == 1 or from_cache:
            # decode, or a text-only suffix prefill over a restored
            # multimodal prefix: positions continue at pos + rope_delta
            # (text tokens advance all three M-RoPE axes together, which
            # degenerates to standard RoPE)
            pos_eff = cache["pos"] + cache["rope_delta"]
            cos, sin = gather_rope(self.text.cos, self.text.sin,
                                   pos_eff[None] + jnp.arange(S))
        else:
            positions = cache["pos"] + jnp.arange(S)
            cos, sin = gather_rope(self.text.cos, self.text.sin, positions)
            cache = {**cache, "rope_delta": jnp.zeros((), jnp.int32)}

        hidden, cache = self._run_text(params["text"], x, cache, (cos, sin),
                                       ds, vis_mask, from_cache=from_cache)
        return hidden, cache

    def _run_text(self, tp, x, cache, cos_sin, ds, vis_mask,
                  from_cache: bool = False):
        """Qwen3 decoder with deepstack injection after the first n_ds
        layers (unrolled); the remainder runs as one scan."""
        text = self.text
        n_ds = 0 if ds is None else int(ds.shape[0])
        B, S, _ = x.shape
        pos = cache["pos"]
        cos, sin = cos_sin

        kc, vc = cache["k"], cache["v"]
        for i in range(n_ds):
            lp = jax.tree.map(lambda a: a[i], tp["layers"])
            x, kc, vc, _, _ = text._layer(lp, x, cos, sin, kc, vc,
                                          jnp.asarray(i), pos, S > 1,
                                          from_cache)
            # deepstack: add level-i features at visual token positions
            inject = ds[i][self._ds_idx].astype(x.dtype)
            x = x + jnp.where(vis_mask[None, :, None], inject[None], 0.0)

        def body(carry, xs):
            x, kc, vc = carry
            lp, li = xs
            x, kc, vc, _, _ = text._layer(lp, x, cos, sin, kc, vc, li, pos,
                                          S > 1, from_cache)
            return (x, kc, vc), None

        rest = jax.tree.map(lambda a: a[n_ds:], tp["layers"])
        (x, kc, vc), _ = jax.lax.scan(
            body, (x, kc, vc),
            (rest, jnp.arange(n_ds, text.n_layers)))
        cache = {**cache, "k": kc, "v": vc}
        from aha_tpu.ops.norms import rms_norm

        x = rms_norm(x, tp["norm"]["w"], self.config.text.rms_norm_eps)
        return x, cache

    def logits(self, params, hidden):
        return self.text.logits(params["text"], hidden)

    def fuse_params(self, params: dict) -> dict:
        """Single-device serving: fuse the text decoder's q/k/v and gate/up
        projections (models/qwen3.fuse_decode_params, bit-identical); the
        vision tower is untouched."""
        from aha_tpu.models.qwen3 import fuse_decode_params

        return {**params, "text": fuse_decode_params(params["text"])}

    # -- loading ------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.bfloat16) -> dict:
        vt = "visual." if "visual.patch_embed.proj.weight" in src \
            else "model.visual."
        visual = self.tower.load_params(src, dtype, vt)

        class _Pref:
            def __init__(self, src, frm):
                self.src, self.frm = src, frm

            def get(self, name, dtype=None):
                return self.src.get(self._m(name), dtype)

            def __contains__(self, name):
                return self._m(name) in self.src

            def _m(self, name):
                if name.startswith("model."):
                    return self.frm + name[len("model."):]
                return name

        text_prefix = ("model.language_model."
                       if "model.language_model.embed_tokens.weight" in src
                       else "model.")
        text = self.text.load_params(_Pref(src, text_prefix), dtype=dtype)
        return {"visual": visual, "text": text}

    def init_random(self, key, dtype=jnp.float32, scale: float = 0.02) -> dict:
        k1, k2 = jax.random.split(key)
        text = self.text.init_random(k1, dtype, scale)
        visual = self.tower.init_random(k2, self.config.text.hidden_size,
                                        dtype, scale)
        return {"visual": visual, "text": text}


# Tensor-parallel partition rules (SURVEY §5.8: "TP is config, not
# surgery").  The text decoder dominates the weights (Qwen3-VL-32B is
# ~64 GB bf16 — unservable on one 16 GB v5e without TP, registry.py:86);
# its rules are the Qwen3 ones, whose regexes match under the "text."
# prefix.  In the ViT, the MLPs and mergers (the bulk of tower params)
# shard over tp; the fused-qkv attention (small, head count not generally
# tp-aligned) stays replicated.
from aha_tpu.models.qwen3 import QWEN3_CACHE_RULES, QWEN3_PARTITION_RULES

QWEN3VL_PARTITION_RULES = (
    *QWEN3_PARTITION_RULES,
    (r"visual\.blocks\.\d+\.fc1\.w", (None, "tp")),
    (r"visual\.blocks\.\d+\.fc1\.b", ("tp",)),
    (r"visual\.blocks\.\d+\.fc2\.w", ("tp", None)),
    (r"merger.*\.fc1\.w", (None, "tp")),
    (r"merger.*\.fc1\.b", ("tp",)),
    (r"merger.*\.fc2\.w", ("tp", None)),
)
QWEN3VL_CACHE_RULES = QWEN3_CACHE_RULES
Qwen3VLModel.partition_rules = QWEN3VL_PARTITION_RULES
Qwen3VLModel.cache_rules = QWEN3VL_CACHE_RULES
