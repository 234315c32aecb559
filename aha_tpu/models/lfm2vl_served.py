"""LFM2-VL served model: image chat on the hybrid decoder.

Processor parity with src/models/lfm2vl/processor.rs: smart resize to the
patch·downsample grid bounded by [min,max]_image_tokens, SigLIP
normalization (mean/std 0.5), NaViT packing (flattened patches + pixel
mask + spatial shapes), "<image>" expanded once per projected unit.
Tiling (do_image_splitting, rows×cols grids with <|img_row_x_col_y|>
markers) is the remaining gap — single-image (thumbnail-style) path here.
"""

from __future__ import annotations

import json
import math
import os

import jax.numpy as jnp
import numpy as np

from aha_tpu.core.chat_template import ChatTemplate
from aha_tpu.core.engine import TextEngine
from aha_tpu.core.generate import PrepareData
from aha_tpu.core.tokenizer import TokenizerModel
from aha_tpu.models.lfm2vl import (
    Lfm2VLConfig,
    Lfm2VLModel,
    resize_pos_embeddings,
    unshuffle_gather,
)
from aha_tpu.models.text_served import (
    TextChatModel,
    load_generation_config,
    load_stop_token_ids,
)
from aha_tpu.params import ChatCompletionParameters
from aha_tpu.registry import ModelEntry
from aha_tpu.utils.device import get_dtype

IMAGE_TOKEN = "<image>"
PATCH_BUCKETS = (64, 256, 1024, 4096)


def _bucket(n: int) -> int:
    for b in PATCH_BUCKETS:
        if n <= b:
            return b
    return PATCH_BUCKETS[-1]


class Lfm2VLChat(TextChatModel):
    def __init__(self, *args, vl_model: Lfm2VLModel = None, params=None,
                 **kw):
        super().__init__(*args, **kw)
        self.vl_model = vl_model
        self.params = params

    @classmethod
    def load(cls, entry: ModelEntry, path: str, max_seq_len: int = 8192,
             **kw) -> "Lfm2VLChat":
        from aha_tpu.io.weights import open_weights

        dtype = get_dtype()
        config = Lfm2VLConfig.from_file(path)
        model = Lfm2VLModel(config, max_rope_len=max_seq_len)
        params = model.load_params(open_weights(path), dtype=dtype)
        engine = TextEngine(model, params,
                            eos_token_ids=load_stop_token_ids(path),
                            cache_dtype=dtype, max_seq_len=max_seq_len)
        return cls(entry, engine, TokenizerModel.init(path),
                   ChatTemplate.init(path), load_generation_config(path),
                   model_name=os.path.basename(path.rstrip("/")) or entry.name,
                   vl_model=model, params=params)

    def _preprocess(self, img):
        """→ (patches (N, ps²·3), (h, w) patch grid) with token count in
        [min,max]_image_tokens (processor.rs:159-220, no tiling)."""
        from aha_tpu.utils.image import smart_resize

        c = self.vl_model.config
        ps, f = c.vision.patch_size, c.downsample_factor
        unit = ps * f
        token_pixels = (ps * f) ** 2
        h, w = smart_resize(img.height, img.width, factor=unit,
                            min_pixels=c.min_image_tokens * token_pixels,
                            max_pixels=c.max_image_tokens * token_pixels)
        img = img.convert("RGB").resize((w, h))
        # SigLIP normalization: mean/std 0.5 (processor.rs image_mean/std)
        arr = np.asarray(img, np.float32) / 255.0
        arr = (arr - 0.5) / 0.5                 # (H, W, 3)
        gh, gw = h // ps, w // ps
        patches = arr.reshape(gh, ps, gw, ps, 3).transpose(0, 2, 1, 3, 4)
        return patches.reshape(gh * gw, ps * ps * 3).astype(np.float32), \
            (gh, gw)

    def get_data(self, mes: ChatCompletionParameters) -> PrepareData:
        from aha_tpu.utils.image import extract_image_sources, load_image

        c = self.vl_model.config
        rendered = self.chat_template.apply(
            [m.to_json_dict() for m in mes.messages],
            add_generation_prompt=True,
            enable_thinking=bool(mes.enable_thinking))
        sources = extract_image_sources(mes)
        if not sources:
            return PrepareData(input_ids=self.tokenizer.encode(rendered),
                               in_reasoning=self.is_in_reasoning(rendered))
        per_image, shapes = [], []
        for src in sources:
            patches, (gh, gw) = self._preprocess(load_image(src))
            per_image.append(patches)
            shapes.append((gh, gw))
            n_units = (gh // c.downsample_factor) * (gw // c.downsample_factor)
            rendered = rendered.replace(
                IMAGE_TOKEN, "<|placeholder|>" * n_units, 1)
        rendered = rendered.replace("<|placeholder|>", IMAGE_TOKEN)
        input_ids = self.tokenizer.encode(rendered)

        n_padded = _bucket(max(len(p) for p in per_image))
        B = len(per_image)
        in_dim = per_image[0].shape[1]
        pixels = np.zeros((B, n_padded, in_dim), np.float32)
        mask = np.zeros((B, n_padded), bool)
        table = np.asarray(self.params["visual"]["pos_table"])
        pos = np.zeros((B, n_padded, table.shape[1]), np.float32)
        for i, (p, (gh, gw)) in enumerate(zip(per_image, shapes)):
            pixels[i, :len(p)] = p
            mask[i, :len(p)] = True
            pos[i] = resize_pos_embeddings(table, gh, gw, n_padded)
        gather = unshuffle_gather(shapes, n_padded, c.downsample_factor)
        mm = {"pixels": jnp.asarray(pixels), "pixel_mask": jnp.asarray(mask),
              "pos_embeds": jnp.asarray(pos), "gather": jnp.asarray(gather)}
        return PrepareData(input_ids=input_ids, mm=mm,
                           in_reasoning=self.is_in_reasoning(rendered))
