"""CLI surface tests (no downloads, no server start)."""

import json
import os

import pytest

from aha_tpu.cli.main import build_parser, main


def test_parser_subcommands():
    parser = build_parser()
    args = parser.parse_args(["list", "--json"])
    assert args.command == "list" and args.json
    args = parser.parse_args(["serv", "Qwen/Qwen3-0.6B", "--port", "9000"])
    assert args.port == 9000 and not args.allow_remote_shutdown
    args = parser.parse_args(["run", "Qwen/Qwen3-0.6B", "--input", "hello"])
    assert args.input == ["hello"]
    args = parser.parse_args(["run", "m", "--input", "what is this?",
                              "--input", "img.png", "--output", "out.txt"])
    assert args.input == ["what is this?", "img.png"]
    assert args.output == "out.txt"
    args = parser.parse_args(["ps", "--compact"])
    assert args.compact
    args = parser.parse_args(["serv", "Qwen/Qwen3-0.6B", "--tp", "4"])
    assert args.tp == 4 and args.batch_slots == 1
    args = parser.parse_args(["serv", "Qwen/Qwen3-0.6B",
                              "--batch-slots", "8"])
    assert args.batch_slots == 8


def test_batch_slots_family_gate():
    from aha_tpu.models.loader import load_model

    with pytest.raises(ValueError, match="batch-slots"):
        load_model("openbmb/VoxCPM-0.5B", "/nonexistent", batch_slots=4)


def test_list_json(capsys, tmp_path, monkeypatch):
    monkeypatch.setenv("AHA_HOME", str(tmp_path))
    assert main(["list", "--json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out) == 43
    assert out[0]["model_id"] == "sentence-transformers/all-MiniLM-L6-v2"
    assert all(not m["downloaded"] for m in out)


def test_list_table(capsys, tmp_path, monkeypatch):
    monkeypatch.setenv("AHA_HOME", str(tmp_path))
    # mark one model downloaded
    os.makedirs(tmp_path / "Qwen" / "Qwen3-0.6B")
    (tmp_path / "Qwen" / "Qwen3-0.6B" / "config.json").write_text("{}")
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "Model ID" in out
    line = [l for l in out.splitlines() if "Qwen/Qwen3-0.6B " in l][0]
    assert "✔" in line


def test_serv_refuses_to_download(tmp_path, monkeypatch):
    monkeypatch.setenv("AHA_HOME", str(tmp_path))
    with pytest.raises(SystemExit) as e:
        main(["serv", "Qwen/Qwen3-0.6B"])
    assert "serv subcommand will not download model" in str(e.value)


def test_gguf_requires_path(tmp_path, monkeypatch):
    monkeypatch.setenv("AHA_HOME", str(tmp_path))
    with pytest.raises(SystemExit) as e:
        main(["serv", "qwen3.5-gguf"])
    assert "gguf model path is required" in str(e.value)


def test_delete_not_downloaded(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("AHA_HOME", str(tmp_path))
    assert main(["delete", "Qwen/Qwen3-0.6B", "-y"]) == 1


def test_delete_downloaded(tmp_path, monkeypatch):
    monkeypatch.setenv("AHA_HOME", str(tmp_path))
    target = tmp_path / "Qwen" / "Qwen3-0.6B"
    os.makedirs(target)
    (target / "x.safetensors").write_text("x")
    assert main(["delete", "Qwen/Qwen3-0.6B", "-y"]) == 0
    assert not target.exists()


def test_pid_file_lifecycle(tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_RUNTIME_DIR", str(tmp_path))
    from aha_tpu.server.process import (
        cleanup_pid_file,
        create_pid_file,
        find_aha_services,
        get_pid_dir,
    )

    assert get_pid_dir() == tmp_path / "aha"
    create_pid_file(12345, 8000)
    pid_file = tmp_path / "aha" / "8000.pid"
    assert pid_file.read_text() == "12345\n"
    # 12345 is (almost certainly) not an aha process → treated stale & removed
    services = find_aha_services()
    assert not pid_file.exists()
    assert all(s.pid != 12345 for s in services)
    create_pid_file(1, 8001)
    cleanup_pid_file(8001)
    assert not (tmp_path / "aha" / "8001.pid").exists()


def test_run_text_and_output_flags(tmp_path, capsys):
    """`aha run` on a tiny text model; file:// prompt input."""
    from tests.fixtures import build_tiny_qwen3_repo

    repo = str(tmp_path / "m")
    build_tiny_qwen3_repo(repo)
    prompt = tmp_path / "prompt.txt"
    prompt.write_text("hello from a file")
    rc = main(["run", "Qwen/Qwen3-0.6B", "--weight-path", repo,
               "--input", f"file://{prompt}", "--max-tokens", "4"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "load model use time" in out and "generate use time" in out


def test_run_asr_with_wav(tmp_path, capsys):
    """`aha run` ASR: --input audio path → transcription text path."""
    import numpy as np

    from aha_tpu.utils.audio import save_wav
    from tests.test_asr import build_tiny_asr_repo

    repo = str(tmp_path / "asr")
    build_tiny_asr_repo(repo)
    wav_path = str(tmp_path / "tone.wav")
    t = np.arange(8000) / 16000
    save_wav(wav_path, (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32),
             16000)
    rc = main(["run", "Qwen/Qwen3-ASR-0.6B", "--weight-path", repo,
               "--input", wav_path, "--max-tokens", "4"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "generate use time" in out


def test_run_rmbg_writes_png(tmp_path, capsys):
    """`aha run` RMBG: --input image → RGBA png written to --output."""
    from PIL import Image

    from tests.fixtures import build_tiny_rmbg_repo

    repo = str(tmp_path / "rmbg")
    build_tiny_rmbg_repo(repo)
    img_path = str(tmp_path / "in.png")
    Image.new("RGB", (64, 64), (120, 30, 200)).save(img_path)
    out_path = str(tmp_path / "cut.png")
    rc = main(["run", "AI-ModelScope/RMBG-2.0", "--weight-path", repo,
               "--input", img_path, "--output", out_path])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert f"Output saved to: {out_path}" in out
    cut = Image.open(out_path)
    assert cut.mode == "RGBA"
