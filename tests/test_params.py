import json

from aha_tpu.params import (
    ChatCompletionParameters,
    ChatCompletionResponse,
    ChatCompletionChoice,
    ChatMessage,
    EmbeddingRequest,
    RerankRequest,
    Usage,
    content_to_text,
    extract_parts,
)


def test_parse_minimal_chat_request():
    body = {"messages": [{"role": "user", "content": "hi"}], "model": "m"}
    req = ChatCompletionParameters.model_validate(body)
    assert req.messages[0].role == "user"
    assert req.messages[0].text() == "hi"
    assert req.stream is None


def test_parse_multimodal_content():
    body = {
        "messages": [{
            "role": "user",
            "content": [
                {"type": "text", "text": "describe "},
                {"type": "image_url", "image_url": {"url": "file:///x.png"}},
                {"type": "audio_url", "audio_url": {"url": "file:///x.wav"}},
                {"type": "text", "text": "this"},
            ],
        }],
        "model": "m",
        "metadata": {"language": "en"},
        "top_k": 40,
        "repeat_penalty": 1.1,
        "enable_thinking": False,
    }
    req = ChatCompletionParameters.model_validate(body)
    msg = req.messages[0]
    assert content_to_text(msg.content) == "describe this"
    assert extract_parts(msg.content, "image_url")[0].image_url.url == "file:///x.png"
    assert extract_parts(msg.content, "audio_url")[0].audio_url.url == "file:///x.wav"
    assert req.metadata_value("language") == "en"
    assert req.top_k == 40 and req.repeat_penalty == 1.1
    assert req.enable_thinking is False


def test_usage_timing_fields():
    u = Usage.from_timing(10, 0.5, 20, 2.0)
    d = u.to_json_dict()
    assert d["prompt_tokens"] == 10
    assert d["prompt_secs"] == 0.5
    assert d["completion_tps"] == 10.0
    assert d["completion_per_token_secs"] == 0.1
    assert d["total_tokens"] == 30


def test_response_serialization_elides_none():
    resp = ChatCompletionResponse(
        id="x",
        choices=[ChatCompletionChoice(
            index=0, message=ChatMessage(role="assistant", content="hello"),
            finish_reason="stop")],
        created=123,
        model="m",
        usage=Usage.from_timing(1, 0.1, 2, 0.2),
    )
    d = resp.to_json_dict()
    s = json.dumps(d)
    assert '"service_tier"' not in s
    assert d["object"] == "chat.completion"
    assert d["choices"][0]["message"]["role"] == "assistant"
    assert d["choices"][0]["message"]["content"] == "hello"


def test_embedding_and_rerank_requests():
    e = EmbeddingRequest.model_validate({"input": "hello"})
    assert e.input == "hello"
    e2 = EmbeddingRequest.model_validate({"input": ["a", "b"], "model": "m"})
    assert e2.input == ["a", "b"]
    r = RerankRequest.model_validate(
        {"query": "q", "documents": ["d1", "d2"], "top_n": 1})
    assert r.top_n == 1
