"""PaddleOCR-VL served model.

Task prompts ("OCR:", "Table Recognition:", …) come from the user message
(docs/model-card.md:3-8 in the reference); the chat template inserts the
image placeholder which expands to one token per merge unit.
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
from aha_tpu.models.paddleocr_vl import (
    PaddleOCRVLConfig,
    PaddleOCRVLModel,
    get_rope_index,
    paddle_vision_geometry,
)
from aha_tpu.models.text_served import (
    TextChatModel,
    load_generation_config,
    load_stop_token_ids,
)
from aha_tpu.params import ChatCompletionParameters
from aha_tpu.registry import ModelEntry
from aha_tpu.utils.device import get_dtype

PATCH_BUCKETS = (256, 512, 1024, 2048, 4096, 6400, 9216, 16384)
IMAGE_PLACEHOLDER = "<|IMAGE_PLACEHOLDER|>"


def _patch_bucket(n: int) -> int:
    for b in PATCH_BUCKETS:
        if n <= b:
            return b
    return PATCH_BUCKETS[-1]


class PaddleOCRVLChat(TextChatModel):
    def __init__(self, *args, vl_model: PaddleOCRVLModel = None,
                 preprocessor: dict | None = None, **kw):
        super().__init__(*args, **kw)
        self.vl_model = vl_model
        self.preprocessor = preprocessor or {}

    @classmethod
    def load(cls, entry: ModelEntry, path: str, max_seq_len: int = 8192,
             **kw) -> "PaddleOCRVLChat":
        from aha_tpu.io.weights import open_weights

        dtype = get_dtype()
        config = PaddleOCRVLConfig.from_file(path)
        model = PaddleOCRVLModel(config, max_rope_len=max_seq_len)
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
                   vl_model=model, preprocessor=pp)

    def get_data(self, mes: ChatCompletionParameters) -> PrepareData:
        from aha_tpu.utils.image import (
            extract_image_sources,
            load_image,
            preprocess_image_siglip,
        )

        cfg = self.vl_model.config
        v = cfg.vision
        rendered = self.chat_template.apply(
            [m.to_json_dict() for m in mes.messages],
            add_generation_prompt=True)
        sources = extract_image_sources(mes)
        if not sources:
            return PrepareData(input_ids=self.tokenizer.encode(rendered))

        mean = self.preprocessor.get("image_mean", [0.5] * 3)[0]
        std = self.preprocessor.get("image_std", [0.5] * 3)[0]
        min_px = self.preprocessor.get("min_pixels", 28 * 28)
        max_px = self.preprocessor.get("max_pixels", 28 * 28 * 4096)
        patches_list, grids = [], []
        for src in sources:
            patches, grid = preprocess_image_siglip(
                load_image(src), patch_size=v.patch_size,
                merge_size=v.spatial_merge_size,
                min_pixels=min_px, max_pixels=max_px, mean=mean, std=std)
            patches_list.append(patches)
            grids.append(grid)
            n_units = grid[0] * grid[1] * grid[2] // v.spatial_merge_size ** 2
            rendered = rendered.replace(IMAGE_PLACEHOLDER,
                                        "<|tmp_ph|>" * n_units, 1)
        rendered = rendered.replace("<|tmp_ph|>", IMAGE_PLACEHOLDER)
        input_ids = self.tokenizer.encode(rendered)

        geo = paddle_vision_geometry(grids, v)
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
            "merge_gather": jnp.asarray(pad2(geo["merge_gather"], 0, bucket)),
        }
        position_ids, rope_delta = get_rope_index(input_ids, grids, cfg)
        blen = bucket_for(len(input_ids))
        if blen > position_ids.shape[1]:
            extra = blen - position_ids.shape[1]
            cont = position_ids.max() + 1 + np.arange(extra)
            position_ids = np.concatenate(
                [position_ids, np.broadcast_to(cont, (3, extra))], axis=1)
        mm["position_ids"] = jnp.asarray(position_ids)
        mm["rope_delta"] = jnp.int32(rope_delta)
        return PrepareData(input_ids=input_ids, mm=mm)
