"""GLM-OCR served model.

Reference: src/models/glm_ocr/{processor.rs,generate.rs} — fixed prompt
frame `[gMASK] <sop> <|user|> \\n <|begin_of_image|> <|image|>×N
<|end_of_image|> text <|assistant|> \\n` (processor.rs:158-186), Lanczos
resize to smart-resize geometry, and the 3-D M-RoPE index with rope_delta
carried into decode.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from aha_tpu.core.engine import TextEngine
from aha_tpu.core.generate import PrepareData
from aha_tpu.core.tokenizer import TokenizerModel
from aha_tpu.models.glm_ocr import (
    GlmOcrConfig,
    GlmOcrModel,
    glm_pos_resample_matrix,
    glm_rope_index,
    glm_vision_geometry,
    glm_vision_rope,
)
from aha_tpu.models.text_served import TextChatModel, load_generation_config
from aha_tpu.params import ChatCompletionParameters
from aha_tpu.registry import ModelEntry
from aha_tpu.utils.device import get_dtype

PATCH_BUCKETS = (256, 512, 1024, 2048, 4096, 9216)
GMASK, SOP, USER, NL, ASSISTANT = 59248, 59250, 59253, 10, 59254


def _bucket(n: int) -> int:
    for b in PATCH_BUCKETS:
        if n <= b:
            return b
    return PATCH_BUCKETS[-1]


class GlmOcrChat(TextChatModel):
    def __init__(self, *args, glm_model: GlmOcrModel = None,
                 preprocessor: dict | None = None, **kw):
        kw.setdefault("chat_template", None)
        super().__init__(*args, **kw)
        self.glm_model = glm_model
        self.preprocessor = preprocessor or {}

    @classmethod
    def load(cls, entry: ModelEntry, path: str, max_seq_len: int = 8192,
             **kw) -> "GlmOcrChat":
        from aha_tpu.io.weights import open_weights
        from aha_tpu.models.text_served import load_stop_token_ids

        dtype = get_dtype()
        config = GlmOcrConfig.from_file(path)
        model = GlmOcrModel(config, max_rope_len=max_seq_len)
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
                   generation_config=load_generation_config(path),
                   model_name=os.path.basename(path.rstrip("/")) or entry.name,
                   glm_model=model, preprocessor=pp)

    def get_data(self, mes: ChatCompletionParameters) -> PrepareData:
        from PIL import Image

        from aha_tpu.utils.image import (
            extract_image_sources,
            load_image,
            smart_resize,
        )

        cfg = self.glm_model.config
        v = cfg.vision
        sources = extract_image_sources(mes)
        prompt = " ".join(m.text() for m in mes.messages
                          if m.role == "user" and m.text()).strip()
        if not prompt:
            prompt = "Extract all text from this image."
        if not sources:
            ids = ([GMASK, SOP, USER, NL]
                   + self.tokenizer.encode(prompt, add_special_tokens=False)
                   + [ASSISTANT, NL])
            return PrepareData(input_ids=ids)

        pp = self.preprocessor
        size = pp.get("size", {})
        factor = pp.get("patch_size", v.patch_size) * pp.get(
            "merge_size", v.spatial_merge_size)
        mean = np.asarray(pp.get("image_mean", [0.48145466, 0.4578275,
                                                0.40821073]), np.float32)
        std = np.asarray(pp.get("image_std", [0.26862954, 0.26130258,
                                              0.27577711]), np.float32)
        min_px = size.get("shortest_edge", 12544)
        max_px = size.get("longest_edge", 9633792)
        tps = pp.get("temporal_patch_size", v.temporal_patch_size)

        patches_list, grids = [], []
        ids = [GMASK, SOP, USER, NL]
        for src in sources:
            img = load_image(src)
            w, h = img.size
            # video_smart_resize with t=tps: pixel budget scaled by frames
            h2, w2 = smart_resize(h, w, factor, min_px // tps,
                                  max_px // tps)
            img = img.resize((w2, h2), Image.LANCZOS)
            arr = np.asarray(img, np.float32) / 255.0
            arr = ((arr - mean) / std).transpose(2, 0, 1)
            from aha_tpu.utils.image import patchify_qwen_vl

            m = v.spatial_merge_size
            x, (gt, gh, gw) = patchify_qwen_vl(
                arr[None], v.patch_size, m, tps)
            patches_list.append(x)
            grids.append((gt, gh, gw))
            n_tok = gt * (gh // m) * (gw // m)
            ids += ([cfg.image_start_token_id]
                    + [cfg.image_token_id] * n_tok
                    + [cfg.image_end_token_id])
        ids += self.tokenizer.encode(prompt, add_special_tokens=False)
        ids += [ASSISTANT, NL]

        geom = glm_vision_geometry(grids, v)
        cos, sin = glm_vision_rope(geom["h"], geom["w"], v)
        g = v.image_size // v.patch_size
        resample = glm_pos_resample_matrix(geom, grids, g)

        patches = np.concatenate(patches_list)
        n = patches.shape[0]
        bucket = _bucket(n)

        def pad(a, fill=0.0):
            out = np.full((bucket,) + a.shape[1:], fill, a.dtype)
            out[:len(a)] = a
            return out

        neg = np.float32(np.finfo(np.float32).min)
        pmask = np.zeros((1, 1, 1, bucket), np.float32)
        pmask[..., n:] = neg
        mm = {
            "patches": jnp.asarray(pad(patches)),
            "vis_cos": jnp.asarray(pad(cos)),
            "vis_sin": jnp.asarray(pad(sin)),
            "pos_resample": jnp.asarray(pad(resample)),
            "patch_mask": jnp.asarray(pmask),
        }
        position_ids, rope_delta = glm_rope_index(ids, grids, cfg)
        from aha_tpu.core.engine import bucket_for

        blen = bucket_for(len(ids))
        if blen > position_ids.shape[1]:
            extra = blen - position_ids.shape[1]
            cont = position_ids.max() + 1 + np.arange(extra)
            position_ids = np.concatenate(
                [position_ids, np.broadcast_to(cont, (3, extra))], axis=1)
        mm["position_ids"] = jnp.asarray(position_ids)
        mm["rope_delta"] = jnp.int32(rope_delta)
        return PrepareData(input_ids=ids, mm=mm)
