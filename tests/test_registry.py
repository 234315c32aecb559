from aha_tpu import registry


def test_model_count_matches_reference():
    # reference WhichModel has 43 variants (model_mapping.rs:3-91)
    assert len(registry.model_list()) == 43


def test_model_types():
    assert registry.lookup("Qwen/Qwen3-0.6B").model_type == "llm"
    assert registry.lookup("Qwen/Qwen2.5-VL-3B-Instruct").model_type == "vlm"
    assert registry.lookup("Qwen/Qwen3-ASR-0.6B").model_type == "asr"
    assert registry.lookup("OpenBMB/VoxCPM-0.5B").model_type == "tts"
    assert registry.lookup("AI-ModelScope/RMBG-2.0").model_type == "image"
    assert registry.lookup("sentence-transformers/all-MiniLM-L6-v2").model_type == "embedding"
    assert registry.lookup("Qwen/Qwen3-Reranker-0.6B").model_type == "reranker"
    assert registry.lookup("deepseek-ai/DeepSeek-OCR").model_type == "ocr"


def test_gguf_and_owner():
    assert registry.lookup("qwen3.5-gguf").is_gguf
    assert registry.lookup("qwen3.5-gguf").owner == "none"
    assert registry.lookup("Qwen/Qwen3-0.6B").owner == "Qwen"
    assert not registry.lookup("Qwen/Qwen3-0.6B").is_gguf


def test_unknown_model():
    import pytest

    with pytest.raises(KeyError):
        registry.lookup("nope/nothing")
