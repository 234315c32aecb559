"""Chat-level generation: request → prompt → engine → OpenAI responses.

Python equivalent of the reference's GenerationDataProvider +
impl_generate_model! macro (src/models/common/generate.rs:376-481) and the
stream channel routing (:287-358): UTF-8 partial-token buffering,
<think>/</think> reasoning-channel switching, <tool_call> capture into
tool-call deltas, and the final usage chunk.
"""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass, field
from typing import Any, Iterator

from aha_tpu.core.engine import TextEngine
from aha_tpu.core.sampling import DEFAULT_SEED, SamplingConfig
from aha_tpu.core.tokenizer import TokenizerModel
from aha_tpu.params import (
    ChatCompletionChunkChoice,
    ChatCompletionChunkResponse,
    ChatCompletionChoice,
    ChatCompletionParameters,
    ChatCompletionResponse,
    ChatMessage,
    DeltaChatMessage,
    DeltaFunction,
    DeltaToolCall,
    Usage,
)
from aha_tpu.params.chat import now_created

DEFAULT_MAX_TOKENS = 1024


@dataclass
class PrepareData:
    """Output of a model family's request preprocessing (generate.rs:369-374)."""

    input_ids: list[int]
    mm: Any = None  # model-specific multimodal pytree for prefill
    in_reasoning: bool = False
    #: digest of the multimodal inputs — lets identical-image prompts join
    #: the prefix cache (multi-turn image chat); None = no prefix caching
    #: for multimodal requests
    mm_key: str | None = None
    #: placeholder token ids the prefix-cache suffix must not contain
    mm_token_ids: tuple = ()


@dataclass
class GenerateModel:
    """Base for every served model family.

    Subclasses set `engine`/`tokenizer`/`model_name` and implement
    `get_data`; the shared generate/generate_stream then match the
    reference's behavior for every family that used impl_generate_model!.
    """

    engine: TextEngine
    tokenizer: TokenizerModel
    model_name: str

    # -- per-family hooks (GenerationDataProvider defaults) -----------------

    def get_data(self, mes: ChatCompletionParameters) -> PrepareData:
        raise NotImplementedError

    def get_temperature(self, t: float | None) -> float | None:
        return t

    def get_top_p(self, p: float | None) -> float | None:
        return p

    def get_top_k(self, k: int | None) -> int | None:
        return k

    def is_in_reasoning(self, rendered_prompt: str) -> bool:
        return rendered_prompt.endswith("<think>\n")

    # -- shared implementation ---------------------------------------------

    def _sampling_cfg(self, mes: ChatCompletionParameters) -> SamplingConfig:
        return SamplingConfig(
            temperature=self.get_temperature(mes.temperature),
            top_p=self.get_top_p(mes.top_p),
            top_k=self.get_top_k(mes.top_k),
            repeat_penalty=mes.repeat_penalty if mes.repeat_penalty is not None else 1.0,
            repeat_last_n=mes.repeat_last_n if mes.repeat_last_n is not None else 64,
            seed=mes.seed if mes.seed is not None else DEFAULT_SEED,
        )

    def generate(self, mes: ChatCompletionParameters) -> ChatCompletionResponse:
        cfg = self._sampling_cfg(mes)
        max_tokens = mes.max_tokens or DEFAULT_MAX_TOKENS
        data = self.get_data(mes)
        ids = self.engine.generate_tokens(data.input_ids, cfg, max_tokens,
                                          mm=data.mm, mm_key=data.mm_key,
                                          mm_token_ids=data.mm_token_ids)
        text = self.tokenizer.decode(ids)
        t = self.engine.last_timing
        usage = Usage.from_timing(t.prompt_tokens, t.prompt_secs,
                                  t.completion_tokens, t.completion_secs)
        return ChatCompletionResponse(
            id=str(uuid.uuid4()),
            choices=[ChatCompletionChoice(
                index=0,
                message=ChatMessage(role="assistant", content=text),
                finish_reason="stop",
            )],
            created=now_created(),
            model=self.model_name,
            usage=usage,
        )

    def generate_stream(self, mes: ChatCompletionParameters
                        ) -> Iterator[ChatCompletionChunkResponse]:
        cfg = self._sampling_cfg(mes)
        max_tokens = mes.max_tokens or DEFAULT_MAX_TOKENS
        data = self.get_data(mes)
        in_reasoning = data.in_reasoning
        tool_call_id: str | None = None
        tool_call_content = ""
        error_tokens: list[int] = []

        for token in self.engine.stream_tokens(data.input_ids, cfg, max_tokens,
                                               mm=data.mm,
                                               mm_key=data.mm_key,
                                               mm_token_ids=data.mm_token_ids):
            # decode skips special tokens, exactly like the reference's
            # token_decode (tokenizer/mod.rs:106-112) — eos renders as "",
            # while Qwen's <think>/<tool_call> markers are non-special
            # added tokens and surface as text for the channel routing.
            decoded = self.tokenizer.decode(error_tokens + [token])
            # UTF-8 partial-token accumulation (generate.rs:201-218)
            if "�" in decoded:
                error_tokens.append(token)
                if len(error_tokens) > 3:
                    error_tokens.clear()
                continue
            error_tokens.clear()
            if decoded == "<think>":
                in_reasoning = True
                continue
            if decoded == "</think>":
                in_reasoning = False
                continue
            if decoded == "<tool_call>":
                tool_call_id = str(uuid.uuid4())
                continue
            if decoded == "</tool_call>":
                yield _tool_call_chunk(self.model_name, tool_call_id,
                                       tool_call_content)
                tool_call_id = None
                tool_call_content = ""
            elif tool_call_id is not None:
                tool_call_content += decoded
                continue
            elif decoded:
                yield _text_chunk(self.model_name, decoded, in_reasoning)
            if token in self.engine.eos_token_ids:
                t = self.engine.last_timing
                yield _usage_chunk(self.model_name, t)
                return
        t = self.engine.last_timing
        yield _usage_chunk(self.model_name, t)


def _base_chunk(model_name: str) -> ChatCompletionChunkResponse:
    return ChatCompletionChunkResponse(
        id=str(uuid.uuid4()),
        choices=[],
        created=now_created(),
        model=model_name,
    )


def _text_chunk(model_name: str, text: str,
                reasoning: bool) -> ChatCompletionChunkResponse:
    chunk = _base_chunk(model_name)
    delta = (DeltaChatMessage(role="assistant", reasoning_content=text)
             if reasoning else DeltaChatMessage(role="assistant", content=text))
    chunk.choices.append(ChatCompletionChunkChoice(index=0, delta=delta))
    return chunk


def _tool_call_chunk(model_name: str, call_id: str,
                     content: str) -> ChatCompletionChunkResponse:
    """Parse captured <tool_call> body as {"name":…, "arguments":…}
    (response_utils.rs:353-426); unparseable bodies pass through as raw
    arguments."""
    try:
        value = json.loads(content)
        fn = DeltaFunction(
            name=value.get("name") if isinstance(value, dict) else None,
            arguments=json.dumps(value.get("arguments"), ensure_ascii=False)
            if isinstance(value, dict) and "arguments" in value else None,
        )
    except json.JSONDecodeError:
        fn = DeltaFunction(arguments=content)
    chunk = _base_chunk(model_name)
    chunk.choices.append(ChatCompletionChunkChoice(
        index=0,
        delta=DeltaChatMessage(role="assistant", tool_calls=[DeltaToolCall(
            index=0, id=call_id, type="function", function=fn)]),
    ))
    return chunk


def _usage_chunk(model_name: str, t) -> ChatCompletionChunkResponse:
    chunk = _base_chunk(model_name)
    chunk.usage = Usage.from_timing(t.prompt_tokens, t.prompt_secs,
                                    t.completion_tokens, t.completion_secs)
    chunk.choices.append(ChatCompletionChunkChoice(
        index=0, delta=DeltaChatMessage(role="assistant")))
    return chunk
