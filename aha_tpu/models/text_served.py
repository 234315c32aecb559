"""Generic text-chat served model: any CausalLM + tokenizer + chat template.

Families that in the reference each carry their own generate.rs glued on via
impl_generate_model! (qwen3, minicpm4/5, lfm2, …) share this single class;
a family contributes only its backbone builder.
"""

from __future__ import annotations

import json
import os
from typing import Callable

import jax.numpy as jnp

from aha_tpu.core.chat_template import ChatTemplate
from aha_tpu.core.engine import CausalLM, TextEngine
from aha_tpu.core.generate import GenerateModel, PrepareData
from aha_tpu.core.tokenizer import TokenizerModel
from aha_tpu.models.base import LoadedModel
from aha_tpu.params import ChatCompletionParameters
from aha_tpu.registry import ModelEntry
from aha_tpu.utils.device import get_dtype


def load_generation_config(path: str) -> dict:
    p = os.path.join(path, "generation_config.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def load_stop_token_ids(path: str) -> list[int]:
    for name in ("generation_config.json", "config.json"):
        p = os.path.join(path, name)
        if os.path.exists(p):
            with open(p) as f:
                eos = json.load(f).get("eos_token_id")
            if eos is not None:
                return list(eos) if isinstance(eos, list) else [eos]
    return []


class TextChatModel(GenerateModel, LoadedModel):
    """Chat LLM on the shared engine (GenerateModel first in the MRO so its
    generate/generate_stream win over LoadedModel's unsupported defaults)."""

    def __init__(self, entry: ModelEntry, engine: TextEngine,
                 tokenizer: TokenizerModel, chat_template: ChatTemplate,
                 generation_config: dict, model_name: str):
        LoadedModel.__init__(self, entry)
        GenerateModel.__init__(self, engine=engine, tokenizer=tokenizer,
                               model_name=model_name)
        self.chat_template = chat_template
        self.generation_config = generation_config

    @classmethod
    def load(cls, entry: ModelEntry, path: str,
             build_model: Callable[[str, int], tuple[CausalLM, dict]],
             max_seq_len: int = 8192, tp: int = 1, dp: int = 1,
             batch_slots: int = 1,
             prefix_cache: int = 4, spec_tokens: int = 0) -> "TextChatModel":
        """build_model(path, max_seq_len) → (model, params).  tp > 1 shards
        params/cache tensor-parallel over a dp×tp mesh using the model's
        partition_rules/cache_rules (SURVEY §2.5: the reference is
        single-device; here TP is a serve-time flag).  batch_slots > 1 puts
        the model on the continuous-batching engine: up to that many chat
        requests decode together in one jitted step.  dp > 1 additionally
        shards the batch engine's SLOT axis data-parallel: params replicate
        across dp, each device group decodes batch_slots/dp slots, and
        aggregate throughput scales with dp (no collectives on the decode
        path — slots are independent)."""
        dtype = get_dtype()
        model, params = build_model(path, max_seq_len)
        # duplicated in loader.load_model (same strings) so the CLI fails
        # before weight loading while direct TextChatModel.load callers are
        # still covered — mirrors the spec_tokens/batch_slots precedent
        if dp > 1:
            if batch_slots <= 1:
                raise ValueError(
                    "--dp shards continuous-batching slots across devices; "
                    "combine it with --batch-slots N (N a multiple of dp)")
            if batch_slots % dp:
                raise ValueError(
                    f"--batch-slots {batch_slots} must be a "
                    f"multiple of --dp {dp}")
        from aha_tpu.parallel.mesh import shard_for_serving

        params, mesh, cache_rules = shard_for_serving(model, params,
                                                      tp=tp, dp=dp)
        if batch_slots > 1:
            if spec_tokens > 0:
                raise ValueError(
                    "--spec-tokens rides the single-stream engine; combine "
                    "it with --batch-slots 1 (silently dropping it would "
                    "belie the advertised speedup)")
            if not getattr(model, "supports_slot_decode", False):
                raise ValueError(
                    f"{type(model).__name__} does not support per-slot batched "
                    "decode; serve it with --batch-slots 1")
            from aha_tpu.core.batch_engine import BatchEngine
            from aha_tpu.utils.device import get_cache_dtype

            cache_dtype = (get_cache_dtype()
                           if getattr(model, "supports_kv_int8", False)
                           else dtype)
            engine = BatchEngine(model, params,
                                 eos_token_ids=load_stop_token_ids(path),
                                 slots=batch_slots, cache_dtype=cache_dtype,
                                 max_seq_len=max_seq_len,
                                 prefix_cache_entries=prefix_cache,
                                 mesh=mesh, cache_rules=cache_rules)
            served = cls(entry, engine, TokenizerModel.init(path),
                         ChatTemplate.init(path), load_generation_config(path),
                         model_name=os.path.basename(path.rstrip("/"))
                         or entry.name)
            served.concurrent_streams = batch_slots
            return served
        from aha_tpu.utils.device import get_cache_dtype

        cache_dtype = dtype
        if getattr(model, "supports_kv_int8", False):
            cache_dtype = get_cache_dtype()
        engine = TextEngine(model, params,
                            eos_token_ids=load_stop_token_ids(path),
                            cache_dtype=cache_dtype, max_seq_len=max_seq_len,
                            mesh=mesh, cache_rules=cache_rules,
                            prefix_cache_entries=prefix_cache,
                            spec_tokens=spec_tokens)
        if spec_tokens > 0 and engine.spec_tokens == 0:
            print(f"--spec-tokens ignored: {type(model).__name__} carries "
                  "rolling conv/recurrent state that cannot rewind past "
                  "rejected drafts")
        return cls(entry, engine, TokenizerModel.init(path),
                   ChatTemplate.init(path), load_generation_config(path),
                   model_name=os.path.basename(path.rstrip("/")) or entry.name)

    # generation_config defaults (e.g. qwen3/generate.rs:53-64)
    def get_temperature(self, t):
        return t if t is not None else self.generation_config.get("temperature")

    def get_top_p(self, p):
        return p if p is not None else self.generation_config.get("top_p")

    def get_top_k(self, k):
        return k if k is not None else self.generation_config.get("top_k")

    def get_data(self, mes: ChatCompletionParameters) -> PrepareData:
        enable_thinking = bool(mes.enable_thinking) or \
            (mes.metadata_value("enable_thinking") in ("true", "True", "1"))
        rendered = self.chat_template.apply(
            [m.to_json_dict() for m in mes.messages],
            add_generation_prompt=True,
            enable_thinking=enable_thinking,
            tools=[t.to_json_dict() for t in mes.tools] if mes.tools else None,
        )
        return PrepareData(
            input_ids=self.tokenizer.encode(rendered),
            in_reasoning=self.is_in_reasoning(rendered),
        )
