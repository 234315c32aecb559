"""OpenAI-compatible wire types (pydantic).

Field-for-field equivalent of the reference's serde schema under
`src/params/` (chat.rs, shared.rs, asr.rs, embedding.rs, rerank.rs):
same field names, same optional-field elision, same role-tagged message
encoding — so clients of the reference work unchanged.
"""

from aha_tpu.params.shared import (
    Usage,
    PromptTokensDetails,
    CompletionTokensDetails,
)
from aha_tpu.params.chat import (
    ChatCompletionParameters,
    ChatCompletionResponse,
    ChatCompletionChunkResponse,
    ChatCompletionChoice,
    ChatCompletionChunkChoice,
    ChatMessage,
    DeltaChatMessage,
    ToolCall,
    DeltaToolCall,
    FunctionCall,
    DeltaFunction,
    content_to_text,
    extract_parts,
)
from aha_tpu.params.embedding import EmbeddingRequest, EmbeddingData, EmbeddingResponse
from aha_tpu.params.rerank import RerankRequest, RerankResult, RerankResponse
from aha_tpu.params.asr import TranscriptionResponse, ErrorResponse, ErrorDetail

__all__ = [
    "Usage",
    "PromptTokensDetails",
    "CompletionTokensDetails",
    "ChatCompletionParameters",
    "ChatCompletionResponse",
    "ChatCompletionChunkResponse",
    "ChatCompletionChoice",
    "ChatCompletionChunkChoice",
    "ChatMessage",
    "DeltaChatMessage",
    "ToolCall",
    "DeltaToolCall",
    "FunctionCall",
    "DeltaFunction",
    "content_to_text",
    "extract_parts",
    "EmbeddingRequest",
    "EmbeddingData",
    "EmbeddingResponse",
    "RerankRequest",
    "RerankResult",
    "RerankResponse",
    "TranscriptionResponse",
    "ErrorResponse",
    "ErrorDetail",
]
