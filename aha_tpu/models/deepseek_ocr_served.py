"""DeepSeek-OCR served model.

Reference: src/models/deepseek_ocr/{generate.rs,processor.rs}.  No chat
template — messages are joined with newlines (processor.rs:37-52), the
`<image>` marker splits the prompt, and each image expands to its Gundam
layout token count.  Metadata knobs: base_size / image_size (one of
512/640/1024/1280, default 640) and crop_mode (default false); version 2
pins base 1024 / image 768 (generate.rs:64-79).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from aha_tpu.core.engine import TextEngine, bucket_for
from aha_tpu.core.generate import PrepareData
from aha_tpu.core.tokenizer import TokenizerModel
from aha_tpu.models.deepseek_ocr import (
    DeepseekOCRConfig,
    DeepseekOCRModel,
    deepseek_vision_layout,
)
from aha_tpu.models.text_served import TextChatModel, load_generation_config
from aha_tpu.params import ChatCompletionParameters
from aha_tpu.registry import ModelEntry
from aha_tpu.utils.device import get_dtype

IMAGE_TOKEN = "<image>"
ALLOWED_SIZES = (512, 640, 1024, 1280)
CROP_BUCKETS = (2, 4, 6, 9)
VIS_BUCKETS = (128, 256, 512, 1024, 2048, 4096)


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def _meta(mes, key, default):
    """Parse a metadata knob (values arrive as strings on the wire —
    utils/mod.rs extract_metadata_value)."""
    md = getattr(mes, "metadata", None) or {}
    v = md.get(key)
    if v is None:
        return default
    if isinstance(v, str):
        s = v.strip().lower()
        if s in ("true", "false"):
            return s == "true"
        try:
            return int(s)
        except ValueError:
            return default
    return v


class DeepseekOCRChat(TextChatModel):
    def __init__(self, *args, ocr_model: DeepseekOCRModel = None, **kw):
        kw.setdefault("chat_template", None)
        super().__init__(*args, **kw)
        self.ocr_model = ocr_model

    @classmethod
    def load(cls, entry: ModelEntry, path: str, max_seq_len: int = 8192,
             **kw) -> "DeepseekOCRChat":
        from aha_tpu.io.weights import open_weights

        dtype = get_dtype()
        config = DeepseekOCRConfig.from_file(path)
        model = DeepseekOCRModel(config, max_rope_len=max_seq_len)
        params = model.load_params(open_weights(path), dtype=dtype)
        from aha_tpu.parallel.mesh import shard_for_serving

        params, mesh, cache_rules = shard_for_serving(
            model, params, tp=kw.get("tp", 1))
        engine = TextEngine(
            model, params,
            eos_token_ids=[config.language.eos_token_id,
                           config.language.bos_token_id],
            cache_dtype=dtype, max_seq_len=max_seq_len,
            mesh=mesh, cache_rules=cache_rules)
        return cls(entry, engine, TokenizerModel.init(path),
                   generation_config=load_generation_config(path),
                   model_name=os.path.basename(path.rstrip("/")) or entry.name,
                   ocr_model=model)

    # -- prompt (processor.rs:37-52) -----------------------------------------

    def _prompt(self, mes: ChatCompletionParameters) -> str:
        parts = []
        for i, m in enumerate(mes.messages):
            text = m.text()
            if text:
                parts.append(text + ("\n" if i % 2 == 0 else ""))
        return "".join(parts).strip()

    # -- request preprocessing (processor.rs:54-201) ---------------------------

    def get_data(self, mes: ChatCompletionParameters) -> PrepareData:
        from aha_tpu.utils.image import (
            dynamic_preprocess,
            extract_image_sources,
            img_transform,
            load_image,
            resize_with_edge_padding,
        )

        cfg = self.ocr_model.config
        version = cfg.version
        base_size = int(_meta(mes, "base_size", 640))
        image_size = int(_meta(mes, "image_size", 640))
        if base_size not in ALLOWED_SIZES:
            base_size = 640
        if image_size not in ALLOWED_SIZES:
            image_size = 640
        if version == 2:
            base_size, image_size = 1024, 768
        crop_mode = bool(_meta(mes, "crop_mode", False))
        min_img_size = 768 if version == 2 else 640
        max_num = 6 if version == 2 else 9
        if crop_mode:
            # crop tiles are always min_img_size pixels (processor.rs:91), so
            # the query count must match; other image_size values would break
            # the reference's own token accounting
            image_size = min_img_size

        prompt = self._prompt(mes)
        splits = prompt.split(IMAGE_TOKEN)
        sources = extract_image_sources(mes)
        ids = [cfg.language.bos_token_id]
        if not sources:
            ids += self.tokenizer.encode(prompt, add_special_tokens=False)
            return PrepareData(input_ids=ids)

        ds = 16 * 4  # patch_size * downsample_ratio (processor.rs:30-32)
        nq = image_size // ds
        nqb = base_size // ds
        globals_, crops, layout = [], [], []
        for text_seq, src in zip(splits, sources):
            if text_seq:
                ids += self.tokenizer.encode(text_seq,
                                             add_special_tokens=False)
            img = load_image(src)
            if crop_mode:
                w, h = img.size
                if h <= min_img_size and w <= min_img_size:
                    wr, hr = 1, 1
                else:
                    tiles, (wr, hr) = dynamic_preprocess(
                        img, 2, max_num, min_img_size)
                    if wr * hr > 1:
                        crops += [img_transform(t) for t in tiles]
                gview = resize_with_edge_padding(img, base_size, base_size)
                globals_.append(img_transform(gview))
                n_tok = nqb * nqb + (nqb if version == 1 else 0) + 1
                if wr > 1 or hr > 1:
                    if version == 1:
                        n_tok += (nq * wr + 1) * (nq * hr)
                    else:
                        n_tok += (nq * wr) * (nq * hr)
                layout.append({"nq": min_img_size // ds, "nb": nqb,
                               "wr": wr, "hr": hr})
            else:
                if image_size <= min_img_size:
                    from PIL import Image

                    gview = img.resize((image_size, image_size), Image.BICUBIC)
                else:
                    gview = resize_with_edge_padding(img, image_size,
                                                     image_size)
                globals_.append(img_transform(gview))
                n_tok = nq * nq + (nq if version == 1 else 0) + 1
                layout.append({"nq": nq, "nb": nq, "wr": 1, "hr": 1})
            ids += [cfg.image_token_id] * n_tok
        if len(splits) > len(sources):
            tail = splits[-1]
            if tail:
                ids += self.tokenizer.encode(tail, add_special_tokens=False)

        mm = {"global": jnp.asarray(np.stack(globals_), jnp.float32)}
        crop_rows_total = None
        if crops:
            cb = _bucket(len(crops), CROP_BUCKETS)
            arr = np.zeros((cb,) + crops[0].shape, np.float32)
            arr[:len(crops)] = np.stack(crops)
            mm["crops"] = jnp.asarray(arr)
            crop_rows_total = cb * (min_img_size // ds) ** 2
        gather = deepseek_vision_layout(layout, version, crop_rows_total)
        vis_bucket = _bucket(len(gather), VIS_BUCKETS)
        gather_p = np.zeros(vis_bucket, np.int32)
        gather_p[:len(gather)] = gather
        mm["gather_idx"] = jnp.asarray(gather_p)
        return PrepareData(input_ids=ids, mm=mm)
