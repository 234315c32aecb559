"""Qwen2.5-VL served model: image chat on the shared engine.

Processor parity with src/models/qwen2_5vl/processor.rs: smart resize to the
factor-28 grid, CLIP normalization, <|image_pad|> expanded to the number of
merge units per image.  Patch buffers and all grid-derived indices are
padded to buckets so each image size class compiles once.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from aha_tpu.core.chat_template import ChatTemplate
from aha_tpu.core.engine import TextEngine
from aha_tpu.core.generate import PrepareData
from aha_tpu.core.tokenizer import TokenizerModel
from aha_tpu.models.qwen2_5vl import (
    Qwen2_5VLConfig,
    Qwen2_5VLModel,
    get_rope_index,
    vision_geometry,
)
from aha_tpu.models.text_served import (
    TextChatModel,
    load_generation_config,
    load_stop_token_ids,
)
from aha_tpu.params import ChatCompletionParameters
from aha_tpu.registry import ModelEntry
from aha_tpu.utils.device import get_dtype

IMAGE_PAD = "<|image_pad|>"
VIDEO_PAD = "<|video_pad|>"
PATCH_BUCKETS = (256, 512, 1024, 2048, 4096, 6400, 9216, 16384)


def _patch_bucket(n: int) -> int:
    for b in PATCH_BUCKETS:
        if n <= b:
            return b
    return PATCH_BUCKETS[-1]


class Qwen2_5VLChat(TextChatModel):
    def __init__(self, *args, vl_model: Qwen2_5VLModel = None,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280, **kw):
        super().__init__(*args, **kw)
        self.vl_model = vl_model
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels

    @classmethod
    def load(cls, entry: ModelEntry, path: str, max_seq_len: int = 8192,
             **kw) -> "Qwen2_5VLChat":
        from aha_tpu.io.weights import open_weights

        dtype = get_dtype()
        config = Qwen2_5VLConfig.from_file(path)
        model = Qwen2_5VLModel(config, max_rope_len=max_seq_len)
        params = model.load_params(open_weights(path), dtype=dtype)
        from aha_tpu.parallel.mesh import shard_for_serving

        params, mesh, cache_rules = shard_for_serving(
            model, params, tp=kw.get("tp", 1))
        engine = TextEngine(model, params,
                            eos_token_ids=load_stop_token_ids(path),
                            cache_dtype=dtype, max_seq_len=max_seq_len,
                            mesh=mesh, cache_rules=cache_rules)
        # preprocessor_config.json may carry min/max pixels
        import json

        pp = {}
        pp_path = os.path.join(path, "preprocessor_config.json")
        if os.path.exists(pp_path):
            with open(pp_path) as f:
                pp = json.load(f)
        return cls(entry, engine, TokenizerModel.init(path),
                   ChatTemplate.init(path), load_generation_config(path),
                   model_name=os.path.basename(path.rstrip("/")) or entry.name,
                   vl_model=model,
                   min_pixels=pp.get("min_pixels", 56 * 56),
                   max_pixels=pp.get("max_pixels", 14 * 14 * 4 * 1280))

    def get_data(self, mes: ChatCompletionParameters) -> PrepareData:
        from aha_tpu.utils.image import (
            load_image,
            preprocess_image_qwen_vl,
        )
        from aha_tpu.utils.video import (
            extract_vision_parts,
            load_video_frames,
            preprocess_video_qwen_vl,
            sample_frames,
        )

        cfg = self.vl_model.config
        v = cfg.vision
        enable_thinking = bool(mes.enable_thinking)
        rendered = self.chat_template.apply(
            [m.to_json_dict() for m in mes.messages],
            add_generation_prompt=True, enable_thinking=enable_thinking)
        parts = extract_vision_parts(mes)
        if not parts:
            return PrepareData(input_ids=self.tokenizer.encode(rendered),
                               in_reasoning=self.is_in_reasoning(rendered))

        merge_len = v.spatial_merge_size ** 2
        patches_list, grids, second_per_grid_ts = [], [], []
        for kind, src in parts:
            if kind == "image":
                patches, grid = preprocess_image_qwen_vl(
                    load_image(src), patch_size=v.patch_size,
                    merge_size=v.spatial_merge_size,
                    temporal_patch_size=v.temporal_patch_size,
                    min_pixels=self.min_pixels, max_pixels=self.max_pixels)
                n_units = grid[0] * grid[1] * grid[2] // merge_len
                rendered = rendered.replace(
                    IMAGE_PAD, "<|placeholder|>" * n_units, 1)
                second_per_grid_ts.append(0.0)
            else:
                frames, src_fps = load_video_frames(src)
                frames, _, fps = sample_frames(frames, src_fps,
                                               target_fps=2.0, min_frames=4,
                                               max_frames=64)
                patches, grid = preprocess_video_qwen_vl(
                    frames, v.patch_size, v.spatial_merge_size,
                    v.temporal_patch_size, self.min_pixels,
                    self.max_pixels * 4,
                    mean=[0.48145466, 0.4578275, 0.40821073],
                    std=[0.26862954, 0.26130258, 0.27577711])
                n_units = grid[0] * grid[1] * grid[2] // merge_len
                rendered = rendered.replace(
                    VIDEO_PAD, "<|vplaceholder|>" * n_units, 1)
                # M-RoPE temporal interval (HF Qwen2.5-VL semantics)
                second_per_grid_ts.append(v.temporal_patch_size / fps)
            patches_list.append(patches)
            grids.append(grid)
        rendered = rendered.replace("<|placeholder|>", IMAGE_PAD)
        rendered = rendered.replace("<|vplaceholder|>", VIDEO_PAD)
        input_ids = self.tokenizer.encode(rendered)

        geo = vision_geometry(grids, v)
        patches = np.concatenate(patches_list)
        n_real = patches.shape[0]
        unit = v.spatial_merge_size ** 2
        bucket = _patch_bucket(n_real)
        bucket_units = bucket // unit
        real_units = n_real // unit

        pat = np.zeros((bucket, patches.shape[1]), np.float32)
        pat[:n_real] = patches

        def pad_idx(a, fill, size):
            out = np.full(size, fill, a.dtype)
            out[:len(a)] = a
            return out

        mm = {
            "patches": jnp.asarray(pat),
            "window_index": jnp.asarray(
                pad_idx(geo["window_index"], 0, bucket_units)),
            "inverse_index": jnp.asarray(
                pad_idx(geo["inverse_index"], 0, bucket_units)),
            "window_seg": jnp.asarray(
                pad_idx(geo["window_seg"], -1, bucket)),
            "full_seg": jnp.asarray(pad_idx(geo["full_seg"], -1, bucket)),
            "pos_hw": jnp.asarray(np.concatenate([
                geo["pos_hw"],
                np.zeros((bucket - n_real, 2), np.int32)])),
        }
        position_ids, rope_delta = get_rope_index(
            input_ids, grids, cfg, second_per_grid_ts=second_per_grid_ts)
        # pad to the engine's prompt bucket so prefill shapes stay bucketed
        from aha_tpu.core.engine import bucket_for

        blen = bucket_for(len(input_ids))
        if blen > position_ids.shape[1]:
            extra = blen - position_ids.shape[1]
            cont = position_ids.max() + 1 + np.arange(extra)
            position_ids = np.concatenate(
                [position_ids, np.broadcast_to(cont, (3, extra))], axis=1)
        mm["position_ids"] = jnp.asarray(position_ids)
        mm["rope_delta"] = jnp.int32(rope_delta)
        # digest of the vision CONTENT (decoded patches + grids), not the
        # source spec — a mutable URL must not hit stale cached KV (see
        # qwen3vl_served.py)
        import hashlib

        h = hashlib.sha256(np.ascontiguousarray(patches).tobytes())
        for grid, ts in zip(grids, second_per_grid_ts):
            # temporal seconds-per-grid feeds M-RoPE positions: identical
            # frames at different source fps must NOT share cached KV
            h.update(repr((tuple(grid), float(ts))).encode())
        mm_key = h.hexdigest()
        return PrepareData(input_ids=input_ids, mm=mm,
                           in_reasoning=self.is_in_reasoning(rendered),
                           mm_key=mm_key,
                           mm_token_ids=(cfg.image_token_id,
                                         cfg.video_token_id))
