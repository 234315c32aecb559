"""Hunyuan-OCR served model.

Reference: src/models/hunyuan_ocr/{processor.rs,generate.rs} — chat template
rendering, `<｜hy_place▁holder▁no▁102｜>` image marker expanded to
ph·(pw+1)+2 tokens via the no-799 placeholder trick, generation-config
sampling defaults, 4-channel xdrope position ids.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from aha_tpu.core.chat_template import ChatTemplate
from aha_tpu.core.engine import TextEngine
from aha_tpu.core.generate import PrepareData
from aha_tpu.core.tokenizer import TokenizerModel
from aha_tpu.models.hunyuan_ocr import (
    HunyuanOCRConfig,
    HunyuanOCRModel,
    hunyuan_pos_resample_matrix,
    hunyuan_position_ids,
    hunyuan_vision_geometry,
)
from aha_tpu.models.text_served import TextChatModel, load_generation_config
from aha_tpu.params import ChatCompletionParameters
from aha_tpu.registry import ModelEntry
from aha_tpu.utils.device import get_dtype

IMAGE_TOKEN = "<｜hy_place▁holder▁no▁102｜>"
PLACEHOLDER = "<｜hy_place▁holder▁no▁799｜>"
PATCH_BUCKETS = (256, 512, 1024, 2048, 4096, 9216)


def _bucket(n: int) -> int:
    for b in PATCH_BUCKETS:
        if n <= b:
            return b
    return PATCH_BUCKETS[-1]


class HunyuanOCRChat(TextChatModel):
    def __init__(self, *args, hy_model: HunyuanOCRModel = None,
                 preprocessor: dict | None = None, **kw):
        super().__init__(*args, **kw)
        self.hy_model = hy_model
        self.preprocessor = preprocessor or {}

    @classmethod
    def load(cls, entry: ModelEntry, path: str, max_seq_len: int = 8192,
             **kw) -> "HunyuanOCRChat":
        from aha_tpu.io.weights import open_weights
        from aha_tpu.models.text_served import load_stop_token_ids

        dtype = get_dtype()
        config = HunyuanOCRConfig.from_file(path)
        model = HunyuanOCRModel(config, max_rope_len=max_seq_len)
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
                   hy_model=model, preprocessor=pp)

    # generation-config sampling defaults (generate.rs:68-78)
    def get_temperature(self, t):
        return t if t is not None else self.generation_config.get(
            "temperature")

    def get_top_p(self, p):
        return p if p is not None else self.generation_config.get("top_p")

    def get_top_k(self, k):
        return k if k is not None else self.generation_config.get("top_k")

    def get_data(self, mes: ChatCompletionParameters) -> PrepareData:
        from PIL import Image

        from aha_tpu.utils.image import (
            extract_image_sources,
            load_image,
            smart_resize,
        )

        cfg = self.hy_model.config
        v = cfg.vision
        pp = self.preprocessor
        mean = np.asarray(pp.get("image_mean", [0.5] * 3), np.float32)
        std = np.asarray(pp.get("image_std", [0.5] * 3), np.float32)
        merge = pp.get("merge_size", v.spatial_merge_size)
        psz = pp.get("patch_size", v.patch_size)
        factor = psz * merge
        min_px = pp.get("min_pixels", factor * factor)
        max_px = pp.get("max_pixels", 16384 * 28 * 28)

        rendered = self.chat_template.apply(
            [m.to_json_dict() for m in mes.messages],
            add_generation_prompt=True)
        sources = extract_image_sources(mes)
        if not sources:
            return PrepareData(input_ids=self.tokenizer.encode(rendered))

        patches_list, grids = [], []
        for src in sources:
            img = load_image(src)
            w, h = img.size
            h2, w2 = smart_resize(h, w, factor, min_px, max_px)
            img = img.resize((w2, h2), Image.BICUBIC)
            arr = np.asarray(img, np.float32) / 255.0
            arr = ((arr - mean) / std).transpose(2, 0, 1)
            gh, gw = h2 // psz, w2 // psz
            # row-major patches (processor.rs:75-112 keeps row-major via the
            # merge-aware reshape that flattens back to grid order)
            x = arr.reshape(3, gh, psz, gw, psz).transpose(1, 3, 0, 2, 4)
            patches_list.append(x.reshape(gh * gw, -1).astype(np.float32))
            grids.append((1, gh, gw))
            n_tok = (gh // merge) * (gw // merge + 1) + 2
            rendered = rendered.replace(IMAGE_TOKEN, PLACEHOLDER * n_tok, 1)
        rendered = rendered.replace(PLACEHOLDER, IMAGE_TOKEN)
        ids = self.tokenizer.encode(rendered)

        patches = np.concatenate(patches_list)
        n = patches.shape[0]
        bucket = _bucket(n)

        def pad(a):
            out = np.zeros((bucket,) + a.shape[1:], a.dtype)
            out[:len(a)] = a
            return out

        resample = hunyuan_pos_resample_matrix(
            grids, v.max_image_size // v.patch_size)
        n_units = sum((gh // merge) * (gw // merge) for _, gh, gw in grids)
        unit_bucket = max(bucket // (merge * merge), n_units)
        unit_gather, token_gather = hunyuan_vision_geometry(
            grids, merge, unit_bucket)
        neg = np.float32(np.finfo(np.float32).min)
        pmask = np.zeros((1, 1, 1, bucket), np.float32)
        pmask[..., n:] = neg

        from aha_tpu.core.engine import bucket_for

        position_ids = hunyuan_position_ids(ids, grids, merge,
                                            cfg.image_token_id)
        blen = bucket_for(len(ids))
        if blen > position_ids.shape[1]:
            extra = blen - position_ids.shape[1]
            cont = position_ids[0, -1] + 1 + np.arange(extra)
            position_ids = np.concatenate(
                [position_ids, np.broadcast_to(cont, (4, extra))], axis=1)
        mm = {
            "patches": jnp.asarray(pad(patches)),
            "pos_resample": jnp.asarray(pad(resample)),
            "patch_mask": jnp.asarray(pmask),
            "unit_gather": jnp.asarray(unit_gather),
            "token_gather": jnp.asarray(token_gather),
            "position_ids": jnp.asarray(position_ids),
        }
        return PrepareData(input_ids=ids, mm=mm)
