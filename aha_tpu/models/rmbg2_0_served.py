"""RMBG-2.0 served model: /images/remove_background.

Reference: src/models/rmbg2_0/generate.rs — 1024×1024 CatmullRom resize,
ImageNet mean/std, BiRefNet matte, matte resized back to the original
geometry and composited as the alpha channel of a base64 PNG
(response_utils.rs:15-66 response shape).
"""

from __future__ import annotations

import base64
import io
import os
import time
import uuid

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.models.base import LoadedModel, UnsupportedOperation
from aha_tpu.models.rmbg2_0 import BiRefNet, SwinConfig
from aha_tpu.params import (
    ChatCompletionChoice,
    ChatCompletionParameters,
    ChatCompletionResponse,
    ChatMessage,
)
from aha_tpu.registry import ModelEntry

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class RMBG2Served(LoadedModel):
    def __init__(self, entry: ModelEntry, model: BiRefNet, params,
                 model_name: str, size: int = 1024):
        super().__init__(entry)
        self.model = model
        self.params = params
        self.model_name = model_name
        self.size = size
        self._forward = jax.jit(model.forward)

    @classmethod
    def load(cls, entry: ModelEntry, path: str, **kw) -> "RMBG2Served":
        from aha_tpu.io.weights import open_weights

        swin = SwinConfig()
        cfg_path = os.path.join(path, "config.json")
        if os.path.exists(cfg_path):
            import json

            with open(cfg_path) as f:
                d = json.load(f)
            fields = {k: tuple(v) if isinstance(v, list) else v
                      for k, v in d.items()
                      if k in ("patch_size", "embed_dim", "depths",
                               "num_heads", "window_size")}
            if fields:
                swin = SwinConfig(**fields)
        model = BiRefNet(swin)
        params = model.load_params(open_weights(path), dtype=jnp.float32)
        return cls(entry, model, params,
                   model_name=os.path.basename(path.rstrip("/"))
                   or entry.name, size=kw.get("size", 1024))

    # -- inference -------------------------------------------------------------

    def remove_background(self, sources: list[str]) -> list[bytes]:
        """PNG bytes (RGBA) per input image source."""
        from PIL import Image

        from aha_tpu.utils.image import load_image

        out = []
        for src in sources:
            img = load_image(src)
            w, h = img.size
            resized = img.resize((self.size, self.size), Image.BICUBIC)
            arr = np.asarray(resized, np.float32) / 255.0
            arr = ((arr - IMAGENET_MEAN) / IMAGENET_STD).transpose(2, 0, 1)
            matte = self._forward(self.params, jnp.asarray(arr[None]))
            matte = np.asarray(matte)[0, 0]
            alpha = np.clip(matte * 255.0, 0, 255).astype(np.uint8)
            alpha_img = Image.fromarray(alpha, "L").resize((w, h),
                                                           Image.BICUBIC)
            rgba = img.convert("RGBA")
            rgba.putalpha(alpha_img)
            buf = io.BytesIO()
            rgba.save(buf, "PNG")
            out.append(buf.getvalue())
        return out

    # -- LoadedModel -----------------------------------------------------------

    def generate(self, mes: ChatCompletionParameters) -> ChatCompletionResponse:
        from aha_tpu.utils.image import extract_image_sources

        sources = extract_image_sources(mes)
        pngs = self.remove_background(sources)
        parts = [{"type": "image",
                  "image_url": {"url": "data:image/png;base64,"
                                + base64.b64encode(png).decode()}}
                 for png in pngs]
        return ChatCompletionResponse(
            id=str(uuid.uuid4()),
            choices=[ChatCompletionChoice(
                index=0,
                message=ChatMessage(role="assistant", content=parts),
                finish_reason="stop")],
            created=int(time.time()),
            model=self.model_name,
            usage=None)

    def generate_stream(self, mes: ChatCompletionParameters):
        raise UnsupportedOperation(
            f"{self.model_name} model not support stream")
