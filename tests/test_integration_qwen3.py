"""End-to-end: tiny Qwen3 repo on disk → load_model → chat + stream + server."""

import asyncio
import json

import pytest

from aha_tpu.models.loader import load_model
from aha_tpu.params import ChatCompletionParameters
from tests.fixtures import build_tiny_qwen3_repo


@pytest.fixture(scope="module")
def tiny_repo(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("qwen3-tiny"))
    build_tiny_qwen3_repo(path)
    return path


@pytest.fixture(scope="module")
def chat_model(tiny_repo):
    return load_model("Qwen/Qwen3-0.6B", tiny_repo, max_seq_len=512)


def _req(text="hello world", **kw):
    return ChatCompletionParameters.model_validate({
        "messages": [{"role": "user", "content": text}],
        "model": "Qwen/Qwen3-0.6B", "max_tokens": 16, **kw})


def test_generate(chat_model):
    resp = chat_model.generate(_req(temperature=0.0))
    assert resp.object == "chat.completion"
    assert resp.choices[0].message.role == "assistant"
    assert resp.usage.prompt_tokens > 0
    assert resp.usage.completion_tokens >= 1
    assert resp.usage.completion_tps is not None


def test_generate_deterministic_greedy(chat_model):
    a = chat_model.generate(_req(temperature=0.0)).choices[0].message.content
    b = chat_model.generate(_req(temperature=0.0)).choices[0].message.content
    assert a == b


def test_generation_config_defaults_applied(chat_model):
    # request without sampling params uses generation_config.json's
    # temperature/top_p/top_k (qwen3/generate.rs:53-64)
    cfg = chat_model._sampling_cfg(_req())
    assert cfg.temperature == pytest.approx(0.7)
    assert cfg.top_p == pytest.approx(0.8)
    assert cfg.top_k == 20


def test_stream_chunks_and_usage(chat_model):
    chunks = list(chat_model.generate_stream(_req(temperature=0.0)))
    assert all(c.object == "chat.completion.chunk" for c in chunks)
    # last chunk carries usage
    assert chunks[-1].usage is not None
    assert chunks[-1].usage.prompt_tokens > 0
    # stream routes <think>/</think> markers to channel switches (consumed),
    # so compare against non-stream text with markers stripped
    text = "".join((c.choices[0].delta.content or "")
                   + (c.choices[0].delta.reasoning_content or "")
                   for c in chunks if c.choices)
    non_stream = chat_model.generate(_req(temperature=0.0))
    expected = (non_stream.choices[0].message.content
                .replace("<think>", "").replace("</think>", ""))
    assert text == expected


def test_enable_thinking_renders_differently(chat_model):
    on = chat_model.get_data(_req(enable_thinking=True))
    off = chat_model.get_data(_req(enable_thinking=False))
    assert on.input_ids != off.input_ids


def test_served_via_http(chat_model):
    from aiohttp.test_utils import TestClient, TestServer

    from aha_tpu.server.app import ServerState, create_app

    async def scenario():
        app = create_app(ServerState(model=chat_model))
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "model": "x", "stream": False, "max_tokens": 8,
                "temperature": 0.0})
            body = json.loads(await r.text())
            assert body["choices"][0]["message"]["role"] == "assistant"
            assert body["usage"]["total_tokens"] > 0

            r = await client.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "model": "x", "stream": True, "max_tokens": 8,
                "temperature": 0.0})
            text = await r.text()
            assert text.strip().endswith("data: [DONE]")
        finally:
            await client.close()

    asyncio.run(scenario())
