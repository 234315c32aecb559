"""LFM2-VL served model: image chat on the hybrid decoder.

Processor parity with src/models/lfm2vl/processor.rs: smart resize to the
patch·downsample grid bounded by [min,max]_image_tokens, SigLIP
normalization (mean/std 0.5), NaViT packing (flattened patches + pixel
mask + spatial shapes), "<image>" expanded once per projected unit.
Tiling: when the image exceeds max_image_tokens·tolerance and
do_image_splitting is on, it is cut into tile_size tiles on the closest
aspect grid plus a thumbnail, and "<image>" expands to
<|image_start|> <|img_row_r_col_c|> tokens... <|img_thumbnail|> tokens...
<|image_end|> (processor.rs:133-323).  The reference only emits row/col
markers when rows>1 AND cols>1 (processor.rs:277), which miscounts tokens
for N×1 grids; this follows the upstream HF processor (any split grid gets
markers).
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
                 image_processor: dict | None = None, **kw):
        super().__init__(*args, **kw)
        self.vl_model = vl_model
        self.params = params
        self.image_processor = image_processor or {}

    @classmethod
    def load(cls, entry: ModelEntry, path: str, max_seq_len: int = 8192,
             **kw) -> "Lfm2VLChat":
        from aha_tpu.io.weights import open_weights

        dtype = get_dtype()
        config = Lfm2VLConfig.from_file(path)
        model = Lfm2VLModel(config, max_rope_len=max_seq_len)
        params = model.load_params(open_weights(path), dtype=dtype)
        from aha_tpu.parallel.mesh import shard_for_serving

        params, mesh, cache_rules = shard_for_serving(
            model, params, tp=kw.get("tp", 1))
        engine = TextEngine(model, params,
                            eos_token_ids=load_stop_token_ids(path),
                            cache_dtype=dtype, max_seq_len=max_seq_len,
                            mesh=mesh, cache_rules=cache_rules)
        ip = {}
        for name, key in (("processor_config.json", "image_processor"),
                          ("preprocessor_config.json", None)):
            f = os.path.join(path, name)
            if os.path.exists(f):
                with open(f) as fh:
                    d = json.load(fh)
                ip = d.get(key, d) if key else d
                if ip:
                    break
        return cls(entry, engine, TokenizerModel.init(path),
                   ChatTemplate.init(path), load_generation_config(path),
                   model_name=os.path.basename(path.rstrip("/")) or entry.name,
                   vl_model=model, params=params, image_processor=ip)

    def _patchify(self, img):
        """normalized exact-size image → (patches (N, ps²·3), (gh, gw))."""
        c = self.vl_model.config
        ps = c.vision.patch_size
        arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
        arr = (arr - 0.5) / 0.5                 # SigLIP mean/std 0.5
        h, w = arr.shape[:2]
        gh, gw = h // ps, w // ps
        patches = arr.reshape(gh, ps, gw, ps, 3).transpose(0, 2, 1, 3, 4)
        return patches.reshape(gh * gw, ps * ps * 3).astype(np.float32), \
            (gh, gw)

    def _preprocess(self, img):
        """smart-resize to the token budget then patchify
        (processor.rs:159-187, no tiling)."""
        from PIL import Image

        from aha_tpu.utils.image import smart_resize

        c = self.vl_model.config
        ps, f = c.vision.patch_size, c.downsample_factor
        token_pixels = (ps * f) ** 2
        h, w = smart_resize(img.height, img.width, factor=ps * f,
                            min_pixels=c.min_image_tokens * token_pixels,
                            max_pixels=c.max_image_tokens * token_pixels)
        return self._patchify(img.resize((w, h), Image.BICUBIC))

    def _resize_and_split(self, img):
        """(list of (patches, shape), rows, cols, thumb (gh, gw))
        (processor.rs:109-187)."""
        from PIL import Image

        from aha_tpu.utils.image import (
            crop_img,
            find_closest_aspect_ratio,
            generate_target_ratios,
            smart_resize,
        )

        c = self.vl_model.config
        ip = self.image_processor
        ps, f = c.vision.patch_size, c.downsample_factor
        unit = ps * f
        token_pixels = unit * unit
        tolerance = ip.get("max_pixels_tolerance", 2.0)
        max_pixel_num = int(c.max_image_tokens * token_pixels * tolerance)
        hb = max(ps, round(img.height / unit) * unit)
        wb = max(ps, round(img.width / unit) * unit)
        too_large = hb * wb > max_pixel_num
        h, w = smart_resize(img.height, img.width, factor=unit,
                            min_pixels=c.min_image_tokens * token_pixels,
                            max_pixels=c.max_image_tokens * token_pixels)
        if not (too_large and ip.get("do_image_splitting", True)):
            return ([self._patchify(img.resize((w, h), Image.BICUBIC))],
                    1, 1, (h // ps, w // ps))
        tile = ip.get("tile_size", 512)
        ratios = generate_target_ratios(ip.get("min_tiles", 2),
                                        ip.get("max_tiles", 10))
        cols, rows = find_closest_aspect_ratio(
            img.width / img.height, ratios, img.width, img.height, tile)
        tiles = crop_img(img, rows, cols, tile)
        out = [self._patchify(t) for t in tiles]
        if ip.get("use_thumbnail", True) and len(tiles) != 1:
            out.append(self._patchify(img.resize((w, h), Image.BICUBIC)))
        return out, rows, cols, (h // ps, w // ps)

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
        f = c.downsample_factor
        for src in sources:
            entries, rows, cols, (th, tw) = self._resize_and_split(
                load_image(src))
            for patches, shape in entries:
                per_image.append(patches)
                shapes.append(shape)
            tokens_for_image = (th // f) * (tw // f)
            # expand "<image>" into the full marker structure
            # (processor.rs:274-293; markers for ANY split grid, see module
            # docstring)
            sub = "<|image_start|>"
            if rows * cols > 1:
                tile_units = (entries[0][1][0] // f) * (entries[0][1][1] // f)
                for r in range(rows):
                    for cc in range(cols):
                        sub += (f"<|img_row_{r + 1}_col_{cc + 1}|>"
                                + "<|placeholder|>" * tile_units)
                if len(entries) > rows * cols:
                    sub += ("<|img_thumbnail|>"
                            + "<|placeholder|>" * tokens_for_image)
            else:
                sub += "<|placeholder|>" * tokens_for_image
            sub += "<|image_end|>"
            rendered = rendered.replace(IMAGE_TOKEN, sub, 1)
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
