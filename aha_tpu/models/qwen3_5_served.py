"""Qwen3.5 served models: text chat and VL chat (deepstack vision on the
hybrid GatedDeltaNet decoder, model.rs:1039-1475)."""

from __future__ import annotations

import json
import os
from types import SimpleNamespace

from aha_tpu.core.chat_template import ChatTemplate
from aha_tpu.core.engine import TextEngine
from aha_tpu.core.tokenizer import TokenizerModel
from aha_tpu.models.qwen3_5 import Qwen3_5Config, Qwen3_5Model
from aha_tpu.models.qwen3vl_served import Qwen3VLChat
from aha_tpu.models.text_served import (
    TextChatModel,
    load_generation_config,
    load_stop_token_ids,
)
from aha_tpu.registry import ModelEntry
from aha_tpu.utils.device import get_dtype


class Qwen3_5Chat(TextChatModel):
    """Text-only requests on the hybrid decoder."""

    @classmethod
    def load(cls, entry: ModelEntry, path: str, max_seq_len: int = 8192,
             **kw) -> "Qwen3_5Chat":
        from aha_tpu.io.weights import open_weights

        def build(path, max_seq_len):
            cfg = Qwen3_5Config.from_file(path)
            model = Qwen3_5Model(cfg.text, max_rope_len=max_seq_len,
                                 vl_config=cfg if cfg.vision else None)
            return model, model.load_params(open_weights(path),
                                            dtype=get_dtype())

        return super().load(entry, path, build, max_seq_len=max_seq_len,
                            tp=kw.get("tp", 1), dp=kw.get("dp", 1),
                            batch_slots=kw.get("batch_slots", 1),
                            prefix_cache=kw.get("prefix_cache", 4),
                            spec_tokens=kw.get("spec_tokens", 0))


class Qwen3_5VLChat(Qwen3VLChat):
    """Image chat: Qwen3-VL processor/geometry over the Qwen3.5 decoder.
    (Qwen3VLChat.get_data only reads vl_model.config's vision fields, which
    Qwen3_5Config exposes identically.)"""

    @classmethod
    def load(cls, entry: ModelEntry, path: str, max_seq_len: int = 8192,
             **kw) -> "Qwen3_5VLChat":
        from aha_tpu.io.weights import open_weights

        dtype = get_dtype()
        cfg = Qwen3_5Config.from_file(path)
        model = Qwen3_5Model(cfg.text, max_rope_len=max_seq_len,
                             vl_config=cfg)
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
                   vl_model=SimpleNamespace(config=cfg),
                   min_pixels=pp.get("min_pixels") or 32 * 32 * 4,
                   max_pixels=pp.get("max_pixels") or 16 * 16 * 4 * 1280)


def load_qwen3_5(entry: ModelEntry, path: str, gguf: str | None = None,
                 mmproj: str | None = None, max_seq_len: int = 8192, **kw):
    if entry.is_gguf:
        if kw.get("batch_slots", 1) > 1 and mmproj is not None:
            raise ValueError(
                "--batch-slots applies to text chat; mmproj image serving "
                "is single-stream")
        if kw.get("tp", 1) > 1 or kw.get("dp", 1) > 1:
            raise ValueError(
                "GGUF serving is single-device for now; drop --tp/--dp "
                "(quantized tensors are not mesh-sharded)")
        return load_qwen3_5_gguf_chat(entry, gguf, mmproj=mmproj,
                                      max_seq_len=max_seq_len,
                                      batch_slots=kw.get("batch_slots", 1))
    cfg = Qwen3_5Config.from_file(path)
    if cfg.vision is not None:
        if kw.get("batch_slots", 1) > 1:
            raise ValueError(
                "--batch-slots applies to text chat; this checkpoint has a "
                "vision tower and is served single-stream")
        return Qwen3_5VLChat.load(entry, path, max_seq_len=max_seq_len, **kw)
    return Qwen3_5Chat.load(entry, path, max_seq_len=max_seq_len, **kw)


def load_qwen3_5_gguf_chat(entry: ModelEntry, gguf_path: str,
                           mmproj: str | None = None,
                           max_seq_len: int = 8192,
                           batch_slots: int = 1):
    """qwen35-arch gguf → chat; tokenizer/template/eos come from gguf
    metadata (the reference's gguf path, qwen3_5/model.rs:937-1135).

    With `mmproj`, the Qwen3-VL deepstack vision tower + projector load
    from the mmproj gguf and the served model takes image chat
    (qwen3_5/generate.rs:107-140, model.rs:1114-1123)."""
    import jax.numpy as jnp

    from aha_tpu.io.gguf_models import load_qwen3_5_gguf, load_qwen3_5_gguf_vl

    if mmproj is not None:
        model, params, gf, vl_config = load_qwen3_5_gguf_vl(
            gguf_path, mmproj, dtype=jnp.bfloat16, max_rope_len=max_seq_len)
    else:
        model, params, gf = load_qwen3_5_gguf(gguf_path, dtype=jnp.bfloat16,
                                              max_rope_len=max_seq_len)
    eos = gf.eos_token_id()
    eos_ids = [eos] if eos is not None else []
    if batch_slots > 1:
        # quantized weights ride continuous batching like float ones: the
        # dequant-matmul kernel is shape-polymorphic in the batch axis
        from aha_tpu.core.batch_engine import BatchEngine

        engine = BatchEngine(model, params, eos_token_ids=eos_ids,
                             slots=batch_slots, cache_dtype=jnp.bfloat16,
                             max_seq_len=max_seq_len)
    else:
        engine = TextEngine(model, params, eos_token_ids=eos_ids,
                            cache_dtype=jnp.bfloat16, max_seq_len=max_seq_len)
    tokenizer = TokenizerModel(gf.build_tokenizer())
    template = gf.chat_template()
    if template is None:
        raise ValueError("gguf file has no tokenizer.chat_template")
    name = os.path.basename(gguf_path.rstrip("/")) or entry.name
    if mmproj is not None:
        return Qwen3_5VLChat(entry, engine, tokenizer,
                             ChatTemplate.str_init(template), {},
                             model_name=name,
                             vl_model=SimpleNamespace(config=vl_config))
    served = Qwen3_5Chat(entry, engine, tokenizer,
                         ChatTemplate.str_init(template), {}, model_name=name)
    if batch_slots > 1:
        served.concurrent_streams = batch_slots
    return served
