"""HTTP server contract tests against the reference's route behaviors,
using an in-process toy model (no weights, no sockets beyond localhost)."""

import asyncio
import json

from aiohttp.test_utils import TestClient, TestServer

from aha_tpu.models.base import LoadedModel
from aha_tpu.params import (
    ChatCompletionChunkChoice,
    ChatCompletionChunkResponse,
    ChatCompletionChoice,
    ChatCompletionResponse,
    ChatMessage,
    DeltaChatMessage,
    Usage,
)
from aha_tpu.registry import lookup
from aha_tpu.server.app import ServerState, create_app


class ToyChatModel(LoadedModel):
    def __init__(self):
        super().__init__(lookup("Qwen/Qwen3-0.6B"))

    def generate(self, mes):
        return ChatCompletionResponse(
            id="test",
            choices=[ChatCompletionChoice(
                index=0,
                message=ChatMessage(role="assistant",
                                    content=f"echo:{mes.messages[-1].text()}"),
                finish_reason="stop")],
            created=1,
            model=self.entry.model_id,
            usage=Usage.from_timing(3, 0.1, 2, 0.2),
        )

    def generate_stream(self, mes):
        for word in ["hello", " world"]:
            yield ChatCompletionChunkResponse(
                id="c", created=1, model=self.entry.model_id,
                choices=[ChatCompletionChunkChoice(
                    index=0,
                    delta=DeltaChatMessage(role="assistant", content=word))])


class ToyEmbeddingModel(LoadedModel):
    def __init__(self):
        super().__init__(lookup("sentence-transformers/all-MiniLM-L6-v2"))

    def embedding(self, texts):
        return [[float(len(t)), 1.0] for t in texts]


class ToyRerankModel(LoadedModel):
    def __init__(self):
        super().__init__(lookup("Qwen/Qwen3-Reranker-0.6B"))

    def rerank(self, query, documents):
        return [float(len(d)) for d in documents]


def with_client(model, scenario):
    async def runner():
        app = create_app(ServerState(model=model))
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            await scenario(client)
        finally:
            await client.close()

    asyncio.run(runner())


def test_health_ok():
    async def scenario(client):
        r = await client.get("/health")
        assert r.status == 200
        assert await r.json() == {"status": "ok"}

    with_client(ToyChatModel(), scenario)


def test_health_uninitialized():
    async def scenario(client):
        r = await client.get("/health")
        assert r.status == 503
        body = await r.json()
        assert body["status"] == "unhealthy"
        assert body["error"] == "model not initialized"

    with_client(None, scenario)


def test_models_listing():
    async def scenario(client):
        for path in ("/models", "/v1/models"):
            r = await client.get(path)
            assert r.status == 200
            body = await r.json()
            assert body["object"] == "list"
            assert body["data"][0]["id"] == "Qwen/Qwen3-0.6B"
            assert body["data"][0]["owned_by"] == "Qwen"

    with_client(ToyChatModel(), scenario)


def test_models_uninitialized():
    async def scenario(client):
        r = await client.get("/models")
        assert r.status == 503
        assert (await r.json())["error"] == "model not initialized"

    with_client(None, scenario)


def test_chat_non_stream():
    async def scenario(client):
        body = {"messages": [{"role": "user", "content": "hi"}],
                "model": "m", "stream": False}
        for path in ("/v1/chat/completions", "/chat/completions"):
            r = await client.post(path, json=body)
            assert r.status == 200
            data = json.loads(await r.text())
            assert data["choices"][0]["message"]["content"] == "echo:hi"
            assert data["usage"]["completion_tps"] == 10.0

    with_client(ToyChatModel(), scenario)


def test_chat_stream_sse():
    async def scenario(client):
        body = {"messages": [{"role": "user", "content": "hi"}],
                "model": "m", "stream": True}
        r = await client.post("/v1/chat/completions", json=body)
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/event-stream")
        text = await r.text()
        events = [line for line in text.split("\n\n") if line]
        assert events[-1] == "data: [DONE]"
        first = json.loads(events[0][len("data: "):])
        assert first["choices"][0]["delta"]["content"] == "hello"
        assert first["object"] == "chat.completion.chunk"

    with_client(ToyChatModel(), scenario)


def test_embeddings():
    async def scenario(client):
        r = await client.post("/v1/embeddings", json={"input": "abc"})
        assert r.status == 200
        body = await r.json()
        assert body["object"] == "list"
        assert body["data"][0]["embedding"] == [3.0, 1.0]
        assert body["model"] == "sentence-transformers/all-MiniLM-L6-v2"

        r = await client.post("/embeddings", json={"input": ["a", "bb"]})
        body = await r.json()
        assert [d["embedding"][0] for d in body["data"]] == [1.0, 2.0]

        # validation errors (embedding.rs:9-29)
        for bad in ([], [1, 2], {"x": 1}):
            r = await client.post("/v1/embeddings", json={"input": bad})
            assert r.status == 400

    with_client(ToyEmbeddingModel(), scenario)


def test_embeddings_on_chat_model():
    async def scenario(client):
        r = await client.post("/v1/embeddings", json={"input": "abc"})
        assert r.status == 400
        assert "does not support embeddings" in (await r.json())["error"]

    with_client(ToyChatModel(), scenario)


def test_rerank():
    async def scenario(client):
        r = await client.post("/v1/rerank", json={
            "query": "q", "documents": ["aa", "bbbb", "c"], "top_n": 2})
        assert r.status == 200
        body = await r.json()
        assert body["object"] == "list"
        assert len(body["results"]) == 2
        assert body["results"][0]["document"] == "bbbb"
        assert body["results"][0]["relevance_score"] == 4.0
        assert body["results"][0]["index"] == 1

        r = await client.post("/rerank", json={"query": "", "documents": ["a"]})
        assert r.status == 400
        r = await client.post("/rerank", json={"query": "q", "documents": []})
        assert r.status == 400

    with_client(ToyRerankModel(), scenario)


def test_chat_on_embedding_model():
    async def scenario(client):
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "x"}],
            "model": "m", "stream": False})
        assert "does not support chat completions" in await r.text()

    with_client(ToyEmbeddingModel(), scenario)


def test_concurrent_streams_bypass_lock():
    """A model on the continuous-batching engine (concurrent_streams > 1)
    must serve overlapping chat streams concurrently: each stream below
    blocks until BOTH requests are inside generate_stream, which deadlocks
    (and times out) if the server still serializes behind its lock."""
    import threading

    barrier = threading.Barrier(2, timeout=15)

    class ToyBatchModel(ToyChatModel):
        concurrent_streams = 2

        def generate_stream(self, mes):
            barrier.wait()          # only passes if both requests are live
            yield from super().generate_stream(mes)

    async def scenario(client):
        body = {"messages": [{"role": "user", "content": "hi"}],
                "model": "m", "stream": True}

        async def one():
            r = await client.post("/v1/chat/completions", json=body)
            return await r.text()

        texts = await asyncio.gather(one(), one())
        for text in texts:
            assert "data: [DONE]" in text
            assert "hello" in text

    with_client(ToyBatchModel(), scenario)


def test_api_key_enforced():
    """--api-key servers demand 'Authorization: Bearer <key>' on every API
    route; /health and the console page stay open (the console is where a
    human enters the key).  The reference UI's auth feature is a mock
    (aha-ui/src/features/auth/sign-in/components/user-auth-form.tsx) — this
    is the real, OpenAI-style enforcement."""
    async def runner():
        app = create_app(ServerState(model=ToyChatModel(), api_key="sk-t"))
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            # open routes
            assert (await client.get("/health")).status == 200
            assert (await client.get("/")).status == 200
            # protected: no key / wrong key → 401 with an OpenAI error shape
            body = {"messages": [{"role": "user", "content": "hi"}],
                    "model": "m", "stream": False}
            r = await client.post("/v1/chat/completions", json=body)
            assert r.status == 401
            assert (await r.json())["error"]["type"] == "authentication_error"
            r = await client.get(
                "/models", headers={"Authorization": "Bearer wrong"})
            assert r.status == 401
            # near-miss keys (prefix, one-char-off, over-long) also 401 —
            # the comparison is hmac.compare_digest, not string !=
            for near in ("Bearer sk-", "Bearer sk-u", "Bearer sk-tt",
                         "Bearer sk-t ", "bearer sk-t", "sk-t"):
                r = await client.get("/models",
                                     headers={"Authorization": near})
                assert r.status == 401, near
            r = await client.get("/manage/models")
            assert r.status == 401
            # right key → normal behavior
            hdr = {"Authorization": "Bearer sk-t"}
            r = await client.post("/v1/chat/completions", json=body,
                                  headers=hdr)
            assert r.status == 200
            data = json.loads(await r.text())
            assert data["choices"][0]["message"]["content"] == "echo:hi"
            assert (await client.get("/models", headers=hdr)).status == 200
        finally:
            await client.close()

    asyncio.run(runner())


def test_no_api_key_leaves_routes_open():
    async def scenario(client):
        assert (await client.get("/models")).status == 200

    with_client(ToyChatModel(), scenario)
