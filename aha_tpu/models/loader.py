"""Model factory: registry entry → LoadedModel.

Equivalent of the reference's load_model match (src/models/mod.rs:214-322).
Families are registered lazily so importing the loader doesn't pull in every
model's dependencies.
"""

from __future__ import annotations

from typing import Callable

from aha_tpu.models.base import LoadedModel
from aha_tpu.registry import ModelEntry, lookup


def _minilm(entry: ModelEntry, path: str, **kw) -> LoadedModel:
    from aha_tpu.models.minilm_served import MiniLMServed

    return MiniLMServed.load(entry, path)


def _qwen3(entry: ModelEntry, path: str, **kw) -> LoadedModel:
    from aha_tpu.models.qwen3_served import Qwen3Chat

    return Qwen3Chat.load(entry, path, **kw)


def _qwen3_embedding(entry: ModelEntry, path: str, **kw) -> LoadedModel:
    from aha_tpu.models.qwen3_served import Qwen3EmbeddingServed

    return Qwen3EmbeddingServed.load(entry, path, tp=kw.get("tp", 1))


def _qwen3_reranker(entry: ModelEntry, path: str, **kw) -> LoadedModel:
    from aha_tpu.models.qwen3_served import Qwen3RerankerServed

    return Qwen3RerankerServed.load(entry, path, tp=kw.get("tp", 1))


def _qwen3_5(entry: ModelEntry, path: str, max_seq_len: int = 8192,
             gguf: str | None = None, **kw) -> LoadedModel:
    """Qwen3.5 hybrid (GatedDeltaNet); VL variants (config.json has a
    vision_config) get the qwen3vl deepstack tower (model.rs:1039-1475);
    gguf entries load the qwen35-arch mapping with quantized linears."""
    from aha_tpu.models.qwen3_5_served import load_qwen3_5

    return load_qwen3_5(entry, path, gguf=gguf, max_seq_len=max_seq_len,
                        **kw)


def _llama_family(entry: ModelEntry, path: str, max_seq_len: int = 8192,
                  tp: int = 1, **kw) -> LoadedModel:
    """minicpm4 / minicpm5 (mod.rs: generic LlamaForCausalLM wrapper) —
    LlamaConfig picks up whatever mup/LongRoPE fields the config.json has."""
    from aha_tpu.io.weights import open_weights
    from aha_tpu.models.llama import LlamaConfig, LlamaModel
    from aha_tpu.models.text_served import TextChatModel
    from aha_tpu.utils.device import get_dtype

    def build(path, max_seq_len):
        config = LlamaConfig.from_file(path)
        model = LlamaModel(config, max_rope_len=max_seq_len)
        return model, model.load_params(open_weights(path), dtype=get_dtype())

    return TextChatModel.load(entry, path, build, max_seq_len=max_seq_len,
                              tp=tp, dp=kw.get("dp", 1),
                              batch_slots=kw.get("batch_slots", 1),
                              prefix_cache=kw.get("prefix_cache", 4),
                              spec_tokens=kw.get("spec_tokens", 0))


def _lfm2(entry: ModelEntry, path: str, max_seq_len: int = 8192,
          **kw) -> LoadedModel:
    from aha_tpu.io.weights import open_weights
    from aha_tpu.models.lfm2 import Lfm2Config, Lfm2Model
    from aha_tpu.models.text_served import TextChatModel
    from aha_tpu.utils.device import get_dtype

    def build(path, max_seq_len):
        config = Lfm2Config.from_file(path)
        model = Lfm2Model(config, max_rope_len=max_seq_len)
        return model, model.load_params(open_weights(path), dtype=get_dtype())

    return TextChatModel.load(entry, path, build, max_seq_len=max_seq_len,
                              tp=kw.get("tp", 1), dp=kw.get("dp", 1),
                              batch_slots=kw.get("batch_slots", 1),
                              prefix_cache=kw.get("prefix_cache", 4),
                              spec_tokens=kw.get("spec_tokens", 0))


def _qwen3_asr(entry: ModelEntry, path: str, **kw) -> LoadedModel:
    from aha_tpu.models.qwen3_asr_served import Qwen3ASRChat

    return Qwen3ASRChat.load(entry, path, **kw)


def _qwen2_5vl(entry: ModelEntry, path: str, **kw) -> LoadedModel:
    from aha_tpu.models.qwen2_5vl_served import Qwen2_5VLChat

    return Qwen2_5VLChat.load(entry, path, **kw)


FAMILY_LOADERS: dict[str, Callable[..., LoadedModel]] = {
    "minilm": _minilm,
    "qwen3_asr": _qwen3_asr,
    "qwen2_5vl": _qwen2_5vl,
    "paddleocr_vl": lambda entry, path, **kw: __import__(
        "aha_tpu.models.paddleocr_vl_served", fromlist=["PaddleOCRVLChat"]
    ).PaddleOCRVLChat.load(entry, path, **kw),
    "qwen3vl": lambda entry, path, **kw: __import__(
        "aha_tpu.models.qwen3vl_served", fromlist=["Qwen3VLChat"]
    ).Qwen3VLChat.load(entry, path, **kw),
    "qwen3": _qwen3,
    "qwen3_embedding": _qwen3_embedding,
    "qwen3_reranker": _qwen3_reranker,
    "qwen3_5": _qwen3_5,
    "lfm2vl": lambda entry, path, **kw: __import__(
        "aha_tpu.models.lfm2vl_served", fromlist=["Lfm2VLChat"]
    ).Lfm2VLChat.load(entry, path, **kw),
    "voxcpm": lambda entry, path, **kw: __import__(
        "aha_tpu.models.voxcpm_served", fromlist=["VoxCPMServed"]
    ).VoxCPMServed.load(entry, path, **kw),
    "fun_asr_nano": lambda entry, path, **kw: __import__(
        "aha_tpu.models.fun_asr_nano_served", fromlist=["FunAsrNanoChat"]
    ).FunAsrNanoChat.load(entry, path, **kw),
    "glm_asr_nano": lambda entry, path, **kw: __import__(
        "aha_tpu.models.glm_asr_nano_served", fromlist=["GlmAsrNanoChat"]
    ).GlmAsrNanoChat.load(entry, path, **kw),
    "minicpm4": _llama_family,
    "minicpm5": _llama_family,
    "lfm2": _lfm2,
    "deepseek_ocr": lambda entry, path, **kw: __import__(
        "aha_tpu.models.deepseek_ocr_served", fromlist=["DeepseekOCRChat"]
    ).DeepseekOCRChat.load(entry, path, **kw),
    "rmbg2_0": lambda entry, path, **kw: __import__(
        "aha_tpu.models.rmbg2_0_served", fromlist=["RMBG2Served"]
    ).RMBG2Served.load(entry, path, **kw),
    "glm_ocr": lambda entry, path, **kw: __import__(
        "aha_tpu.models.glm_ocr_served", fromlist=["GlmOcrChat"]
    ).GlmOcrChat.load(entry, path, **kw),
    "hunyuan_ocr": lambda entry, path, **kw: __import__(
        "aha_tpu.models.hunyuan_ocr_served", fromlist=["HunyuanOCRChat"]
    ).HunyuanOCRChat.load(entry, path, **kw),
}


def register_family(name: str, loader: Callable[..., LoadedModel]) -> None:
    FAMILY_LOADERS[name] = loader


# families whose serving path can sit on the continuous-batching engine
BATCHABLE_FAMILIES = {"qwen3", "minicpm4", "minicpm5", "lfm2", "qwen3_5"}

# families whose serving wrappers have no mesh path: --tp would be a silent
# no-op, so reject it before loading any weights (every other family either
# shards or raises its own "no partition rules" error)
_NO_TP_FAMILIES = {"minilm", "voxcpm", "rmbg2_0"}


def load_model(model_id: str, path: str, gguf: str | None = None,
               mmproj: str | None = None, **kw) -> LoadedModel:
    entry = lookup(model_id)
    if kw.get("tp", 1) > 1 and entry.family in _NO_TP_FAMILIES:
        raise ValueError(
            f"--tp does not apply to '{entry.family}' (no sharded serving "
            "path); serve it with --tp 1")
    if kw.get("batch_slots", 1) > 1 and entry.family not in BATCHABLE_FAMILIES:
        raise ValueError(
            f"--batch-slots applies to text chat families "
            f"({', '.join(sorted(BATCHABLE_FAMILIES))}); "
            f"'{entry.family}' is served single-stream")
    if kw.get("batch_slots", 1) > 1 and kw.get("spec_tokens", 0) > 0:
        # same check exists at engine-construction time; do it here too so
        # the conflict fails before any weights are loaded
        raise ValueError(
            "--spec-tokens rides the single-stream engine; combine "
            "it with --batch-slots 1 (silently dropping it would "
            "belie the advertised speedup)")
    if kw.get("dp", 1) > 1:
        if entry.family not in BATCHABLE_FAMILIES:
            raise ValueError(
                "--dp shards continuous-batching slots and applies to the "
                f"batchable text families; '{entry.family}' is served "
                "single-stream")
        if kw.get("batch_slots", 1) <= 1:
            raise ValueError(
                "--dp shards continuous-batching slots across devices; "
                "combine it with --batch-slots N (N a multiple of dp)")
        if kw["batch_slots"] % kw["dp"]:
            raise ValueError(
                f"--batch-slots {kw['batch_slots']} must be a "
                f"multiple of --dp {kw['dp']}")
    else:
        kw.pop("dp", None)
    if kw.get("batch_slots", 1) == 1:
        kw.pop("batch_slots", None)   # keep kwargs clean for family loaders
    if entry.family not in BATCHABLE_FAMILIES:
        # prompt-prefix KV caching + speculative decoding ride the
        # text-chat engine only
        kw.pop("prefix_cache", None)
        kw.pop("spec_tokens", None)
    if kw.get("spec_tokens", 0) == 0:
        kw.pop("spec_tokens", None)
    if entry.is_onnx:
        raise NotImplementedError("onnx comming soon but now not support")
    if entry.is_gguf and gguf is None:
        raise ValueError("gguf model need gguf model path")
    loader = FAMILY_LOADERS.get(entry.family)
    if loader is None:
        raise NotImplementedError(
            f"model family '{entry.family}' is not implemented yet")
    if entry.is_gguf:
        return loader(entry, path, gguf=gguf, mmproj=mmproj, **kw)
    return loader(entry, path, **kw)
