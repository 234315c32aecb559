"""Qwen2.5-VL: windowed ViT vision tower + Qwen2 text decoder with M-RoPE.

Parity with src/models/qwen2_5vl/model.rs:
- patch embed as one matmul over flattened conv3d weight (:20-56)
- vision blocks: fused qkv + rms norms + SwiGLU MLP (bias), 2-D rotary over
  (h, w) patch coordinates (:96-223, rope.rs:424-443)
- window attention with full-attention blocks at fullatt_block_indexes;
  window permutation + block-diagonal masks (:224-513)
- 2x2 patch merger into the text hidden size (:57-95)
- text model: Qwen2 decoder (q/k/v bias) with M-RoPE sections
  (rope.rs:358-423); image embeds spliced at image_token positions;
  rope_deltas cached for decode (:601-941)

TPU split: everything that depends only on grid_thw (window permutation,
attention segment ids, rotary position ids, M-RoPE text position ids,
rope_delta) is computed host-side in numpy; the device jit consumes padded
patch buckets + precomputed indices, so one compile per patch bucket.
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
from aha_tpu.io.weights import batched_load
from aha_tpu.models.llama import LlamaConfig, LlamaModel
from aha_tpu.ops.attention import sdpa, segment_attention
from aha_tpu.ops.norms import rms_norm
from aha_tpu.ops.rope import apply_rope, gather_rope


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    depth: int = 32
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    in_chans: int = 3
    out_hidden_size: int = 2048
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: tuple[int, ...] = (7, 15, 23, 31)
    tokens_per_second: int = 4

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def from_dict(cls, d: dict) -> "VisionConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        d = {k: tuple(v) if isinstance(v, list) else v
             for k, v in d.items() if k in names}
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class Qwen2_5VLConfig:
    vision: VisionConfig
    text: LlamaConfig
    mrope_section: tuple[int, ...] = (16, 24, 24)
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    rms_norm_eps: float = 1e-6

    @classmethod
    def from_file(cls, model_dir: str) -> "Qwen2_5VLConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            d = json.load(f)
        vision = VisionConfig.from_dict(d.get("vision_config", {}))
        # original checkpoints keep text fields top-level; newer HF exports
        # nest them under text_config — merge both views
        text_d = {**d, **d.get("text_config", {})}
        text = LlamaConfig.from_dict({**text_d, "qkv_bias": True})
        rope_scaling = (text_d.get("rope_scaling") or {})
        mrope = tuple(rope_scaling.get("mrope_section", (16, 24, 24)))
        return cls(
            vision=vision, text=text, mrope_section=mrope,
            image_token_id=d.get("image_token_id", 151655),
            video_token_id=d.get("video_token_id", 151656),
            vision_start_token_id=d.get("vision_start_token_id", 151652),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6))


# ---------------------------------------------------------------------------
# Host-side geometry: window permutation, segments, rotary ids, M-RoPE ids
# ---------------------------------------------------------------------------


def vision_geometry(grid_thw: list[tuple[int, int, int]], cfg: VisionConfig
                    ) -> dict[str, np.ndarray]:
    """All grid-dependent indices (model.rs rot_pos_emb/get_window_index),
    computed once per request on host.

    Returns (over the merge-unit axis N_units = N_patches / merge²):
      window_index  (N_units,)  permutation applied before the blocks
      inverse_index (N_units,)  undo permutation after the merger
      window_seg    (N_patches,) window id per *permuted* patch
      full_seg      (N_patches,) image id per *permuted* patch
      pos_hw        (N_patches, 2) (h, w) coords per *permuted* patch
    """
    m = cfg.spatial_merge_size
    unit = m * m
    win = cfg.window_size // m // cfg.patch_size  # merge-units per window side

    window_index = []
    window_sizes_units = []  # units per window, in permuted order
    full_sizes_units = []
    pos_hw_units = []  # (N_units, unit, 2) pre-permutation
    base = 0
    for (t, h, w) in grid_thw:
        lh, lw = h // m, w // m
        idx = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = (-lh) % win
        pad_w = (-lw) % win
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        padded[:, :lh, :lw] = idx
        nwh, nww = (lh + pad_h) // win, (lw + pad_w) // win
        padded = padded.reshape(t, nwh, win, nww, win).transpose(0, 1, 3, 2, 4)
        padded = padded.reshape(t, nwh * nww, win, win)
        seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        keep = flat[flat != -100]
        window_index.append(keep + base)
        window_sizes_units.extend(int(s) for s in seqlens if s > 0)
        full_sizes_units.append(t * lh * lw)

        # (h, w) coords per patch in merge-unit order (rot_pos_emb)
        hpos = np.arange(h)[:, None] * np.ones(w, np.int64)[None]
        wpos = np.ones(h, np.int64)[:, None] * np.arange(w)[None]

        def unitize(a):
            a = a.reshape(lh, m, lw, m).transpose(0, 2, 1, 3).reshape(-1)
            return np.tile(a, t)

        pos_hw_units.append(
            np.stack([unitize(hpos), unitize(wpos)], -1).reshape(-1, unit, 2))
        base += t * lh * lw

    window_index = np.concatenate(window_index)
    inverse_index = np.argsort(window_index, kind="stable")
    pos_hw = np.concatenate(pos_hw_units)  # (N_units, unit, 2)
    pos_hw = pos_hw[window_index].reshape(-1, 2)  # permuted patch order

    window_seg = np.repeat(np.arange(len(window_sizes_units)),
                           np.asarray(window_sizes_units) * unit)
    # full segments: image id per unit in ORIGINAL order → permute
    full_per_unit = np.repeat(np.arange(len(full_sizes_units)),
                              full_sizes_units)
    full_seg = np.repeat(full_per_unit[window_index], unit)
    return {
        "window_index": window_index.astype(np.int32),
        "inverse_index": inverse_index.astype(np.int32),
        "window_seg": window_seg.astype(np.int32),
        "full_seg": full_seg.astype(np.int32),
        "pos_hw": pos_hw.astype(np.int32),
    }


def get_rope_index(input_ids: list[int], grid_thw: list[tuple[int, int, int]],
                   cfg: "Qwen2_5VLConfig",
                   second_per_grid_ts: list[float] | None = None
                   ) -> tuple[np.ndarray, int]:
    """(3, S) M-RoPE position ids + rope_delta (model.rs get_rope_index /
    HF Qwen2_5_VL.get_rope_index), single sequence."""
    m = cfg.vision.spatial_merge_size
    tokens_per_second = cfg.vision.tokens_per_second
    ids = np.asarray(input_ids)
    S = len(ids)
    pos = np.zeros((3, S), np.int64)
    st = 0
    out_idx = 0
    img_i = 0
    current = 0
    vision_tokens = (cfg.image_token_id, cfg.video_token_id)
    i = 0
    while i < S:
        if ids[i] in vision_tokens:
            t, h, w = grid_thw[img_i]
            lh, lw = h // m, w // m
            n = t * lh * lw
            if ids[i] == cfg.video_token_id and second_per_grid_ts:
                # HF casts second_per_grid_t to the int64 range dtype before
                # multiplying (modeling_qwen2_5_vl get_rope_index), so the
                # fractional part is truncated — mirrored for parity
                interval = int(second_per_grid_ts[img_i]) * tokens_per_second
            else:
                interval = 0.0
            t_idx = (np.arange(t)[:, None, None] * interval).astype(np.int64) \
                + current
            t_idx = np.broadcast_to(t_idx, (t, lh, lw))
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
    rope_delta = int(pos.max()) + 1 - S
    return pos, rope_delta


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class Qwen2_5VLModel:
    """Implements the CausalLM protocol; mm carries patches + host indices."""

    #: prefix caching works for this model: from_cache suffix prefill over
    #: restored rows, rope_delta captured in the snapshot (multimodal
    #: prompts key on the mm digest)
    supports_prefix_cache = True

    def __init__(self, config: Qwen2_5VLConfig, max_rope_len: int = 8192):
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

    # -- vision tower --------------------------------------------------------

    def _vision_cos_sin(self, pos_hw: jnp.ndarray):
        """(N, 2) permuted (h, w) coords → (N, head_dim/2) cos/sin."""
        inv = jnp.asarray(self.v_inv_freq, jnp.float32)
        fh = pos_hw[:, 0:1].astype(jnp.float32) * inv[None, :]
        fw = pos_hw[:, 1:2].astype(jnp.float32) * inv[None, :]
        freqs = jnp.concatenate([fh, fw], -1)
        return jnp.cos(freqs), jnp.sin(freqs)

    def encode_vision(self, vp, mm) -> jnp.ndarray:
        """patches (N, in_dim) [padded; pad rows have seg=-1] →
        (N_units, out_hidden) in original (pre-window) order."""
        v = self.config.vision
        patches = mm["patches"]
        N = patches.shape[0]
        unit = v.spatial_merge_size ** 2
        x = patches.astype(vp["patch_embed"]["w"].dtype) @ vp["patch_embed"]["w"]
        # window permutation over merge units
        x = x.reshape(N // unit, unit, v.hidden_size)
        x = x[mm["window_index"]].reshape(N, v.hidden_size)
        cos, sin = self._vision_cos_sin(mm["pos_hw"])
        cos = cos[None, :, None, :]  # broadcast like gather_rope output
        sin = sin[None, :, None, :]

        # pad rows carry seg=-1 and therefore attend only each other —
        # finite garbage, never NaN, and invisible to real rows.
        # segment_attention rides the Pallas segment-flash kernel on TPU
        # (block-sparse over the sorted window band — the XLA masked-sdpa
        # form materialized a 1.9 GB (N, N) score matrix per layer at the
        # 5476-patch geometry and dominated r3's flat 0.47 s TTFT).
        wseg, fseg = mm["window_seg"], mm["full_seg"]

        H, hd = v.num_heads, v.head_dim
        for i, lp in enumerate(vp["blocks"]):
            seg = fseg if i in v.fullatt_block_indexes else wseg
            h = rms_norm(x, lp["norm1"]["w"], self.config.rms_norm_eps)
            qkv = nn.linear(lp["qkv"], h).reshape(N, 3, H, hd)
            q, k, vv = (qkv[:, 0][None], qkv[:, 1][None], qkv[:, 2][None])
            q, k = apply_rope(q, k, cos[0, :, 0], sin[0, :, 0])
            attn = segment_attention(q, k, vv, seg).reshape(N, v.hidden_size)
            x = x + nn.linear(lp["proj"], attn)
            h = rms_norm(x, lp["norm2"]["w"], self.config.rms_norm_eps)
            x = x + nn.swiglu_mlp(lp["mlp"], h)

        # merger: rmsnorm → (N_units, unit*D) → mlp
        x = rms_norm(x, vp["merger"]["ln_q"]["w"], self.config.rms_norm_eps)
        x = x.reshape(N // unit, unit * v.hidden_size)
        x = nn.linear(vp["merger"]["mlp0"], x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.linear(vp["merger"]["mlp2"], x)
        return x[mm["inverse_index"]]

    # -- M-RoPE --------------------------------------------------------------

    def _mrope_cos_sin(self, position_ids: jnp.ndarray):
        """(3, S) ids → (S, head_dim/2) cos/sin with contiguous sections."""
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

    # -- CausalLM ------------------------------------------------------------

    def backbone(self, params, input_ids, cache, mm: Any = None,
                 prompt_len=None, from_cache: bool = False):
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
        elif S == 1 or from_cache:
            # decode, or a text-only suffix prefill over a restored
            # multimodal prefix: positions continue at pos + rope_delta
            pos_eff = cache["pos"] + cache["rope_delta"]
            cos, sin = gather_rope(self.text.cos, self.text.sin,
                                   pos_eff[None] + jnp.arange(S))
        else:
            # text-only prefill: standard positions (rope_delta stays 0)
            positions = cache["pos"] + jnp.arange(S)
            cos, sin = gather_rope(self.text.cos, self.text.sin, positions)
            cache = {**cache, "rope_delta": jnp.zeros((), jnp.int32)}
        hidden, cache = self.text.run_layers(params["text"], x, cache,
                                             cos_sin=(cos, sin),
                                             from_cache=from_cache)
        return hidden, cache

    def logits(self, params, hidden):
        return self.text.logits(params["text"], hidden)

    # -- loading ------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.bfloat16) -> dict:
        v = self.config.vision
        # original checkpoints use visual./model.; post-refactor HF exports
        # use model.visual./model.language_model.
        vt = "visual."
        if vt + "patch_embed.proj.weight" not in src:
            vt = "model.visual."
        in_dim = v.in_chans * v.temporal_patch_size * v.patch_size ** 2
        pe = src.get(vt + "patch_embed.proj.weight", dtype)
        visual = {
            "patch_embed": {"w": pe.reshape(v.hidden_size, in_dim).T},
            "merger": {
                "ln_q": nn.take_norm(src, vt + "merger.ln_q", dtype),
                "mlp0": nn.take_linear(src, vt + "merger.mlp.0", dtype),
                "mlp2": nn.take_linear(src, vt + "merger.mlp.2", dtype),
            },
            "blocks": [],
        }
        for i in range(v.depth):
            p = f"{vt}blocks.{i}."
            visual["blocks"].append({
                "norm1": nn.take_norm(src, p + "norm1", dtype),
                "norm2": nn.take_norm(src, p + "norm2", dtype),
                "qkv": nn.take_linear(src, p + "attn.qkv", dtype),
                "proj": nn.take_linear(src, p + "attn.proj", dtype),
                "mlp": {
                    "gate": nn.take_linear(src, p + "mlp.gate_proj", dtype),
                    "up": nn.take_linear(src, p + "mlp.up_proj", dtype),
                    "down": nn.take_linear(src, p + "mlp.down_proj", dtype),
                },
            })
        text_prefix = ("model.language_model."
                       if "model.language_model.embed_tokens.weight" in src
                       else "model.")
        text = self.text.load_params(src, dtype=dtype, prefix=text_prefix)
        return {"visual": visual, "text": text}

    def init_random(self, key, dtype=jnp.float32, scale: float = 0.02) -> dict:
        v = self.config.vision
        k1, k2 = jax.random.split(key)
        text = self.text.init_random(k1, dtype, scale)
        ks = iter(jax.random.split(k2, 8 * v.depth + 8))

        def w(shape):
            return jax.random.normal(next(ks), shape, dtype) * scale

        def lin(i, o, bias=True):
            p = {"w": w((i, o))}
            if bias:
                p["b"] = jnp.zeros(o, dtype)
            return p

        d = v.hidden_size
        unit = v.spatial_merge_size ** 2
        in_dim = v.in_chans * v.temporal_patch_size * v.patch_size ** 2
        visual = {
            "patch_embed": {"w": w((in_dim, d))},
            "merger": {
                "ln_q": {"w": jnp.ones(d, dtype)},
                "mlp0": lin(unit * d, unit * d),
                "mlp2": lin(unit * d, self.config.text.hidden_size),
            },
            "blocks": [{
                "norm1": {"w": jnp.ones(d, dtype)},
                "norm2": {"w": jnp.ones(d, dtype)},
                "qkv": lin(d, 3 * d),
                "proj": lin(d, d),
                "mlp": {"gate": lin(d, v.intermediate_size),
                        "up": lin(d, v.intermediate_size),
                        "down": lin(v.intermediate_size, d)},
            } for _ in range(v.depth)],
        }
        return {"visual": visual, "text": text}


# Tensor-parallel partition rules (SURVEY §5.8).  Text decoder = LlamaModel
# under "text." (the llama regexes match by substring search); in the
# windowed ViT the gated MLPs and the merger shard over tp, fused-qkv
# attention stays replicated.
from aha_tpu.models.llama import LLAMA_CACHE_RULES, LLAMA_PARTITION_RULES

QWEN2_5VL_PARTITION_RULES = (
    *LLAMA_PARTITION_RULES,
    (r"visual\.blocks\.\d+\.mlp\.(gate|up)\.w", (None, "tp")),
    (r"visual\.blocks\.\d+\.mlp\.(gate|up)\.b", ("tp",)),
    (r"visual\.blocks\.\d+\.mlp\.down\.w", ("tp", None)),
    (r"merger\.mlp0\.w", (None, "tp")),
    (r"merger\.mlp0\.b", ("tp",)),
    (r"merger\.mlp2\.w", ("tp", None)),
)
QWEN2_5VL_CACHE_RULES = LLAMA_CACHE_RULES
Qwen2_5VLModel.partition_rules = QWEN2_5VL_PARTITION_RULES
Qwen2_5VLModel.cache_rules = QWEN2_5VL_CACHE_RULES
