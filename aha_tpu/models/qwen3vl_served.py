"""Qwen3-VL served model: image chat with deepstack vision.

Processor parity with src/models/qwen3vl/processor.rs: smart resize to the
factor-32 grid (patch 16 × merge 2), CLIP normalization, <|image_pad|>
expanded per merge unit.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from aha_tpu.core.chat_template import ChatTemplate
from aha_tpu.core.engine import TextEngine, bucket_for
from aha_tpu.core.generate import PrepareData
from aha_tpu.core.tokenizer import TokenizerModel
from aha_tpu.models.qwen3vl import (
    Qwen3VLConfig,
    Qwen3VLModel,
    get_rope_index_qwen3vl,
    vision_geometry_qwen3vl,
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
VISION_START = "<|vision_start|>"
VISION_END = "<|vision_end|>"
PATCH_BUCKETS = (256, 512, 1024, 2048, 4096, 6400, 9216, 16384)


def _patch_bucket(n: int) -> int:
    for b in PATCH_BUCKETS:
        if n <= b:
            return b
    return PATCH_BUCKETS[-1]


class Qwen3VLChat(TextChatModel):
    def __init__(self, *args, vl_model: Qwen3VLModel = None,
                 min_pixels: int = 32 * 32 * 4,
                 max_pixels: int = 16 * 16 * 4 * 1280,
                 max_video_frames: int = 64, **kw):
        super().__init__(*args, **kw)
        self.vl_model = vl_model
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        self.max_video_frames = max_video_frames

    @classmethod
    def load(cls, entry: ModelEntry, path: str, max_seq_len: int = 8192,
             **kw) -> "Qwen3VLChat":
        from aha_tpu.io.weights import open_weights

        dtype = get_dtype()
        config = Qwen3VLConfig.from_file(path)
        model = Qwen3VLModel(config, max_rope_len=max_seq_len)
        params = model.load_params(open_weights(path), dtype=dtype)
        from aha_tpu.parallel.mesh import shard_for_serving

        params, mesh, cache_rules = shard_for_serving(
            model, params, tp=kw.get("tp", 1))
        engine = TextEngine(model, params,
                            eos_token_ids=load_stop_token_ids(path),
                            cache_dtype=dtype, max_seq_len=max_seq_len,
                            mesh=mesh, cache_rules=cache_rules)
        pp = {}
        pp_path = os.path.join(path, "preprocessor_config.json")
        if os.path.exists(pp_path):
            with open(pp_path) as f:
                pp = json.load(f)
        return cls(entry, engine, TokenizerModel.init(path),
                   ChatTemplate.init(path), load_generation_config(path),
                   model_name=os.path.basename(path.rstrip("/")) or entry.name,
                   vl_model=model,
                   min_pixels=pp.get("min_pixels") or 32 * 32 * 4,
                   max_pixels=pp.get("max_pixels") or 16 * 16 * 4 * 1280)

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
            video_timestamps,
        )

        cfg = self.vl_model.config
        v = cfg.vision
        rendered = self.chat_template.apply(
            [m.to_json_dict() for m in mes.messages],
            add_generation_prompt=True,
            enable_thinking=bool(mes.enable_thinking))
        parts = extract_vision_parts(mes)
        if not parts:
            return PrepareData(input_ids=self.tokenizer.encode(rendered),
                               in_reasoning=self.is_in_reasoning(rendered))

        merge_len = v.spatial_merge_size ** 2
        patches_list, grids = [], []
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
            else:
                frames, src_fps = load_video_frames(src)
                frames, idx, fps = sample_frames(
                    frames, src_fps, target_fps=2.0, min_frames=4,
                    max_frames=self.max_video_frames)
                patches, grid = preprocess_video_qwen_vl(
                    frames, v.patch_size, v.spatial_merge_size,
                    v.temporal_patch_size, self.min_pixels,
                    self.max_pixels * 4,
                    mean=[0.48145466, 0.4578275, 0.40821073],
                    std=[0.26862954, 0.26130258, 0.27577711])
                # timestamped per-frame placeholder (processor.rs:400-437)
                stamps = video_timestamps(idx, fps, v.temporal_patch_size)
                frame_seqlen = grid[1] * grid[2] // merge_len
                ph = "".join(
                    f"<{stamps[t]:.1f} seconds>" + VISION_START
                    + "<|vplaceholder|>" * frame_seqlen + VISION_END
                    for t in range(grid[0]))
                three = VISION_START + VIDEO_PAD + VISION_END
                if three in rendered:
                    rendered = rendered.replace(three, ph, 1)
                else:
                    rendered = rendered.replace(VIDEO_PAD, ph, 1)
                # each timestamped frame is its own vision block, so the
                # rope index sees per-frame (1, h, w) grids (HF qwen3_vl
                # get_rope_index repeat_interleaves the video grid)
                patches_list.append(patches)
                grids.extend([(1, grid[1], grid[2])] * grid[0])
                continue
            patches_list.append(patches)
            grids.append(grid)
        rendered = rendered.replace("<|placeholder|>", IMAGE_PAD)
        rendered = rendered.replace("<|vplaceholder|>", VIDEO_PAD)
        input_ids = self.tokenizer.encode(rendered)

        geo = vision_geometry_qwen3vl(grids, v)
        patches = np.concatenate(patches_list)
        n_real = patches.shape[0]
        bucket = _patch_bucket(n_real)
        pat = np.zeros((bucket, patches.shape[1]), np.float32)
        pat[:n_real] = patches

        def pad2(a, fill, size):
            out = np.full((size,) + a.shape[1:], fill, a.dtype)
            out[:len(a)] = a
            return out

        mm = {
            "patches": jnp.asarray(pat),
            "seg": jnp.asarray(pad2(geo["seg"], -1, bucket)),
            "pos_hw": jnp.asarray(pad2(geo["pos_hw"], 0, bucket)),
            "pos_idx": jnp.asarray(pad2(geo["pos_idx"], 0, bucket)),
            "pos_w": jnp.asarray(pad2(geo["pos_w"], 0.0, bucket)),
        }
        position_ids, rope_delta = get_rope_index_qwen3vl(input_ids, grids,
                                                          cfg)
        blen = bucket_for(len(input_ids))
        if blen > position_ids.shape[1]:
            extra = blen - position_ids.shape[1]
            cont = position_ids.max() + 1 + np.arange(extra)
            position_ids = np.concatenate(
                [position_ids, np.broadcast_to(cont, (3, extra))], axis=1)
        mm["position_ids"] = jnp.asarray(position_ids)
        mm["rope_delta"] = jnp.int32(rope_delta)
        # digest of the vision CONTENT (decoded patches + grids), not the
        # source spec: a remote URL can serve different bytes between turns,
        # and a source-string key would silently reuse KV computed from the
        # old image.  Identical-image prompts (multi-turn chat about the
        # same picture) join the prefix cache and skip re-encoding the
        # tower + shared prefill.
        import hashlib

        h = hashlib.sha256(np.ascontiguousarray(patches).tobytes())
        for grid in grids:
            h.update(repr(tuple(grid)).encode())
        mm_key = h.hexdigest()
        return PrepareData(input_ids=input_ids, mm=mm,
                           in_reasoning=self.is_in_reasoning(rendered),
                           mm_key=mm_key,
                           mm_token_ids=(cfg.image_token_id,
                                         cfg.video_token_id))
