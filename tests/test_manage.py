"""Management API (/manage/*): the aha-ui backend command set over HTTP
(reference: aha-ui/src-tauri/src/lib.rs:424-434 list/download/delete/
start_server/stop_server/logs)."""

import asyncio
import json
import os

import pytest
from aiohttp.test_utils import TestClient, TestServer

from aha_tpu.server.app import ServerState, create_app
from aha_tpu.server.manage import LogRing


def with_client(scenario, save_dir=None, api_key=None):
    async def runner():
        app = create_app(ServerState(model=None, api_key=api_key))
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            await scenario(client, app)
        finally:
            await client.close()

    asyncio.run(runner())


def test_manage_models_lists_registry(tmp_path, monkeypatch):
    import aha_tpu.server.manage as manage

    monkeypatch.setattr(manage, "default_save_dir", lambda: str(tmp_path))
    # fake one downloaded model
    d = tmp_path / "Qwen" / "Qwen3-0.6B"
    d.mkdir(parents=True)
    (d / "config.json").write_text("{}")

    async def scenario(client, app):
        r = await client.get("/manage/models")
        assert r.status == 200
        body = await r.json()
        assert body["save_dir"] == str(tmp_path)
        by_id = {m["model_id"]: m for m in body["models"]}
        assert len(by_id) >= 40            # full registry
        assert by_id["Qwen/Qwen3-0.6B"]["downloaded"] is True
        assert by_id["Qwen/Qwen3-0.6B"]["bytes"] == 2
        assert by_id["Qwen/Qwen3-1.7B"]["downloaded"] is False

    with_client(scenario)


def test_manage_download_and_delete(tmp_path, monkeypatch):
    import aha_tpu.server.manage as manage
    import aha_tpu.utils.download as dl

    monkeypatch.setattr(manage, "default_save_dir", lambda: str(tmp_path))

    def fake_download(model_id, save_dir, max_retries=3, progress=None):
        progress({"files_total": 2, "bytes_total": 10})
        target = os.path.join(save_dir, model_id)
        os.makedirs(target, exist_ok=True)
        for name in ("a.bin", "b.bin"):
            progress({"file": name})
            with open(os.path.join(target, name), "wb") as f:
                f.write(b"12345")
            progress({"bytes": 5})

    monkeypatch.setattr(dl, "download_model", fake_download)

    async def scenario(client, app):
        r = await client.post("/manage/download",
                              json={"model": "Qwen/Qwen3-0.6B"})
        assert r.status == 200
        for _ in range(100):
            r = await client.get("/manage/download",
                                 params={"model": "Qwen/Qwen3-0.6B"})
            st = await r.json()
            if st["status"] in ("done", "error"):
                break
            await asyncio.sleep(0.05)
        assert st["status"] == "done", st
        assert st["bytes_done"] == 10 and st["files_done"] == 2

        r = await client.get("/manage/models")
        by_id = {m["model_id"]: m for m in (await r.json())["models"]}
        assert by_id["Qwen/Qwen3-0.6B"]["downloaded"] is True

        r = await client.post("/manage/delete",
                              json={"model": "Qwen/Qwen3-0.6B"})
        assert r.status == 200
        assert not os.path.exists(tmp_path / "Qwen" / "Qwen3-0.6B")

        # unknown model → 404
        r = await client.post("/manage/download", json={"model": "nope"})
        assert r.status == 404

    with_client(scenario)


def test_manage_logs_ring():
    async def scenario(client, app):
        ring = app["manage"].log
        ring.append("hello one", "server")
        ring.append("hello two", "serv:8001")
        r = await client.get("/manage/logs", params={"offset": 0})
        body = await r.json()
        assert [l["line"] for l in body["lines"]] == ["hello one", "hello two"]
        assert body["lines"][1]["source"] == "serv:8001"
        nxt = body["next"]
        r = await client.get("/manage/logs", params={"offset": nxt})
        assert (await r.json())["lines"] == []
        ring.append("three", "server")
        r = await client.get("/manage/logs", params={"offset": nxt})
        assert [l["line"] for l in (await r.json())["lines"]] == ["three"]
        r = await client.post("/manage/logs/clear")
        assert (await r.json())["cleared"]
        r = await client.get("/manage/logs", params={"offset": 0})
        assert (await r.json())["lines"] == []

    with_client(scenario)


def test_log_ring_bounded_offsets():
    ring = LogRing(maxlen=3)
    for i in range(5):
        ring.append(f"l{i}")
    items, nxt = ring.since(0)
    assert [x["line"] for x in items] == ["l2", "l3", "l4"]
    assert nxt == 5
    items, _ = ring.since(4)
    assert [x["line"] for x in items] == ["l4"]


def test_manage_services_and_stop_unknown():
    async def scenario(client, app):
        r = await client.get("/manage/services")
        assert r.status == 200
        assert "services" in await r.json()
        r = await client.post("/manage/stop", json={"port": 59999})
        assert r.status == 404

    with_client(scenario)


def test_manage_serve_spawns_child(tmp_path, monkeypatch):
    """/manage/serve launches a child process and pumps its output into the
    log ring; /manage/stop terminates it.  Uses a stub command instead of a
    real model server."""
    import aha_tpu.server.manage as manage
    import sys

    async def scenario(client, app):
        # patch the spawn command via a tiny echo-sleep script
        real_popen = manage.subprocess.Popen

        def fake_popen(cmd, **kw):
            # the model id is serv's POSITIONAL argument — a --model flag
            # would be rejected by the CLI parser and kill the child
            assert cmd[:5] == [sys.executable, "-m", "aha_tpu", "serv",
                               "Qwen/Qwen3-0.6B"]
            assert "--model" not in cmd
            # a real `aha serv` invocation with these args must parse
            from aha_tpu.cli.main import build_parser
            build_parser().parse_args(cmd[3:])
            return real_popen(
                [sys.executable, "-u", "-c",
                 "import time,sys; print('serv up'); sys.stdout.flush(); "
                 "time.sleep(60)"], **kw)

        monkeypatch.setattr(manage.subprocess, "Popen", fake_popen)
        r = await client.post("/manage/serve",
                              json={"model": "Qwen/Qwen3-0.6B",
                                    "port": 59998})
        assert r.status == 200
        pid = (await r.json())["pid"]
        for _ in range(100):
            r = await client.get("/manage/logs", params={"offset": 0})
            lines = (await r.json())["lines"]
            if any("serv up" in l["line"] for l in lines):
                break
            await asyncio.sleep(0.05)
        assert any("serv up" in l["line"] and l["source"] == "serv:59998"
                   for l in lines), lines
        # duplicate port refused
        r = await client.post("/manage/serve",
                              json={"model": "Qwen/Qwen3-0.6B",
                                    "port": 59998})
        assert r.status == 409
        r = await client.post("/manage/stop", json={"port": 59998})
        assert r.status == 200
        assert (await r.json())["stopped"] == pid
        proc = app["manage"].children[59998]
        for _ in range(100):
            if proc.poll() is not None:
                break
            await asyncio.sleep(0.05)
        assert proc.poll() is not None

    with_client(scenario)


def test_manage_settings_roundtrip(tmp_path, monkeypatch):
    """Settings persist (save dir override + serve defaults), survive a
    fresh ManageState (console restart), and reset cleanly; /manage/models
    honors the configured save dir (settings/model parity)."""
    import aha_tpu.server.manage as manage

    monkeypatch.setattr(manage, "default_save_dir", lambda: str(tmp_path))
    alt = tmp_path / "alt-weights"
    (alt / "Qwen" / "Qwen3-0.6B").mkdir(parents=True)
    (alt / "Qwen" / "Qwen3-0.6B" / "w.bin").write_bytes(b"xyz")

    async def scenario(client, app):
        r = await client.get("/manage/settings")
        s = await r.json()
        assert s["save_dir"] == ""
        assert s["effective_save_dir"] == str(tmp_path)

        r = await client.post("/manage/settings", json={
            "save_dir": str(alt),
            "serve_defaults": {"port": 8005, "tp": 2, "bogus": 1,
                               "spec_tokens": ""}})
        s = await r.json()
        assert s["save_dir"] == str(alt)
        assert s["serve_defaults"] == {"port": 8005, "tp": 2}  # whitelisted

        # models listing now reads the configured dir
        r = await client.get("/manage/models")
        body = await r.json()
        assert body["save_dir"] == str(alt)
        by_id = {m["model_id"]: m for m in body["models"]}
        assert by_id["Qwen/Qwen3-0.6B"]["downloaded"] is True

        # persisted to disk under the DEFAULT root
        assert json.loads(
            (tmp_path / "console.json").read_text())["save_dir"] == str(alt)
        fresh = manage.ManageState()
        assert fresh.save_dir() == str(alt)

        # reset: empty save_dir returns to the default
        r = await client.post("/manage/settings",
                              json={"save_dir": "", "serve_defaults": {}})
        s = await r.json()
        assert s["save_dir"] == "" and s["serve_defaults"] == {}
        assert s["effective_save_dir"] == str(tmp_path)

    with_client(scenario)


def test_manage_serve_applies_setting_defaults(tmp_path, monkeypatch):
    """Spawned `aha serv` children inherit persisted serve defaults for
    fields the request leaves blank — and the save-dir override."""
    import aha_tpu.server.manage as manage

    monkeypatch.setattr(manage, "default_save_dir", lambda: str(tmp_path))

    async def scenario(client, app):
        await client.post("/manage/settings", json={
            "save_dir": str(tmp_path / "alt"),
            "serve_defaults": {"batch_slots": 4, "max_seq_len": 2048}})
        seen = {}

        class FakeProc:
            pid = 4242
            stdout = iter(())

            def poll(self):
                return None

        def fake_popen(cmd, **kw):
            seen["cmd"] = cmd
            return FakeProc()

        monkeypatch.setattr(manage.subprocess, "Popen", fake_popen)
        r = await client.post("/manage/serve", json={
            "model": "Qwen/Qwen3-0.6B", "port": 8009, "tp": 2})
        assert r.status == 200
        cmd = seen["cmd"]
        assert "--save-dir" in cmd and str(tmp_path / "alt") in cmd
        assert "--tp" in cmd and cmd[cmd.index("--tp") + 1] == "2"
        assert "--batch-slots" in cmd          # from defaults
        assert cmd[cmd.index("--batch-slots") + 1] == "4"
        assert cmd[cmd.index("--max-seq-len") + 1] == "2048"

    with_client(scenario)


def test_manage_serve_child_inherits_api_key(monkeypatch):
    """A console started with --api-key spawns children that enforce the
    SAME key: it travels via the AHA_API_KEY env var, never argv (argv
    leaks through /proc and `aha ps`)."""
    import sys

    import aha_tpu.server.manage as manage

    async def scenario(client, app):
        real_popen = manage.subprocess.Popen
        seen = {}

        def fake_popen(cmd, **kw):
            seen["env"] = kw.get("env")
            seen["cmd"] = cmd
            return real_popen(
                [sys.executable, "-u", "-c", "pass"],
                **{k: v for k, v in kw.items() if k != "env"})

        monkeypatch.setattr(manage.subprocess, "Popen", fake_popen)
        hdr = {"Authorization": "Bearer sk-parent"}
        r = await client.post("/manage/serve",
                              json={"model": "Qwen/Qwen3-0.6B",
                                    "port": 59997}, headers=hdr)
        assert r.status == 200
        assert seen["env"]["AHA_API_KEY"] == "sk-parent"
        assert "--api-key" not in seen["cmd"]
        await client.post("/manage/stop", json={"port": 59997}, headers=hdr)

    with_client(scenario, api_key="sk-parent")
