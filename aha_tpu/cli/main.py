"""aha CLI: list / download / delete / ps / run / serv / cli.

Command surface and behaviors mirror src/cli/ (args.rs + mod.rs), including
"serv never downloads" (mod.rs:149-151), the list table format (mod.rs:50-70),
ps table/compact output (mod.rs:168-204), and interactive delete confirmation
(mod.rs:325-370).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

from aha_tpu import registry
from aha_tpu.utils.device import default_save_dir


def _add_server_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--address", default="127.0.0.1",
                   help="server bind address")
    p.add_argument("--port", type=int, default=8000, help="server port")
    p.add_argument("--allow-remote-shutdown", action="store_true",
                   help="allow POST /shutdown from non-local clients")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree (shards the model over a "
                        "dp×tp device mesh; requires dp*tp visible devices)")
    p.add_argument("--batch-slots", type=int, default=1,
                   help="continuous batching: decode up to N chat requests "
                        "together in one jitted step (text models)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel degree for continuous batching: "
                        "shards --batch-slots across a dp×tp device mesh "
                        "(slots must be a multiple of dp); params "
                        "replicate, aggregate throughput scales with dp")
    p.add_argument("--prefix-cache", type=int, default=4,
                   help="prompt-prefix KV cache entries (0 disables): "
                        "repeated system prompts / multi-turn histories "
                        "skip re-prefilling the shared prefix")
    p.add_argument("--spec-tokens", type=int, default=0,
                   help="speculative decoding: draft up to N tokens per "
                        "round by prompt-lookup (n-gram) and verify them in "
                        "one forward; greedy requests stream bit-identical "
                        "output, up to (N+1)x faster on repetitive text "
                        "(OCR/code/quotes).  Text chat families with a "
                        "pure-K/V cache only; 0 disables")
    p.add_argument("--max-seq-len", type=int, default=8192,
                   help="maximum context (prompt + generation) in tokens; "
                        "KV caches are bucketed up to this length "
                        "(131072 max).  Longer contexts cost HBM: "
                        "Qwen3-0.6B bf16 KV is ~1.7 GB per 16k tokens")
    p.add_argument("--api-key",
                   help="require 'Authorization: Bearer <key>' on every "
                        "API route (env AHA_API_KEY also works; /health "
                        "and the console page stay open)")
    p.add_argument("--profile-dir",
                   help="write a jax.profiler trace per request into this "
                        "directory (view with TensorBoard/XProf)")
    p.add_argument("--profile-port", type=int,
                   help="start the jax.profiler server on this port for "
                        "live capture")


def _add_path_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--weight-path", help="local model weight directory")
    p.add_argument("--gguf-path", help="gguf file path (gguf models)")
    p.add_argument("--mmproj-path", help="mmproj gguf path (gguf VLMs)")
    p.add_argument("--onnx-path", help="onnx path (unsupported)")
    p.add_argument("--config-path", help="config override path")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="aha", description="TPU-native multimodal inference engine")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("list", help="list supported models")
    p.add_argument("--json", action="store_true", help="JSON output")

    p = sub.add_parser("download", help="download model weights")
    p.add_argument("model", help="model id")
    p.add_argument("--save-dir", help="download directory (default ~/.aha)")
    p.add_argument("--download-retries", type=int, default=3)

    p = sub.add_parser("delete", help="delete downloaded model")
    p.add_argument("model", help="model id")
    p.add_argument("--save-dir")
    p.add_argument("-y", "--yes", action="store_true",
                   help="skip confirmation")

    p = sub.add_parser("ps", help="list running aha services")
    p.add_argument("--compact", action="store_true")

    p = sub.add_parser("serv", help="start server (never downloads)")
    p.add_argument("model", nargs="?", help="model id")
    p.add_argument("--manage-only", action="store_true",
                   help="start without a model: serves only the web console "
                        "and the /manage API (download models, spawn/stop "
                        "model servers, stream logs)")
    _add_server_common(p)
    _add_path_common(p)

    p = sub.add_parser("cli", help="download (if needed) and start server")
    p.add_argument("model", help="model id")
    p.add_argument("--save-dir")
    p.add_argument("--download-retries", type=int, default=3)
    _add_server_common(p)
    _add_path_common(p)

    p = sub.add_parser("run", help="direct model inference from the CLI")
    p.add_argument("model", help="model id")
    p.add_argument("--input", required=True, action="append",
                   help="repeatable; interpretation is model-specific "
                        "(text prompt, file:// text, audio/image path/URL)")
    p.add_argument("--output", help="output file (audio/image models)")
    _add_path_common(p)
    p.add_argument("--max-tokens", type=int, default=1024)
    p.add_argument("--max-seq-len", type=int, default=8192)
    p.add_argument("--spec-tokens", type=int, default=0,
                   help="speculative decoding drafts (text chat; see serv)")
    p.add_argument("--tp", type=int, default=1)

    return parser


def default_weight_path(model_id: str) -> str:
    return os.path.join(default_save_dir(), model_id)


def run_list(args) -> int:
    from aha_tpu.utils.download import is_model_downloaded

    save = default_save_dir()
    models = registry.model_list()
    if args.json:
        infos = [{
            "model_id": m.model_id,
            "owner": m.owner,
            "model_type": m.model_type,
            "downloaded": is_model_downloaded(m.model_id, save),
        } for m in models]
        print(json.dumps(infos, indent=2))
        return 0
    print("Available models:")
    print()
    print(f"{'Model ID':<40} {'Owner':<20} {'type':<10} {'Download':<10}")
    print("-" * 80)
    for m in models:
        mark = "  ✔" if is_model_downloaded(m.model_id, save) else ""
        print(f"{m.model_id:<40} {m.owner:<20} {m.model_type:<10} {mark:<10}")
    return 0


def run_download(args) -> int:
    from aha_tpu.utils.download import download_model

    registry.lookup(args.model)
    save = args.save_dir or default_save_dir()
    download_model(args.model, save, args.download_retries)
    return 0


def run_delete(args) -> int:
    registry.lookup(args.model)
    save = args.save_dir or default_save_dir()
    target = os.path.join(save, args.model)
    if not os.path.isdir(target):
        print(f"model {args.model} is not downloaded ({target})")
        return 1
    if not args.yes:
        answer = input(f"Delete {target}? [y/N] ").strip().lower()
        if answer not in ("y", "yes"):
            print("aborted")
            return 1
    shutil.rmtree(target)
    print(f"deleted {target}")
    return 0


def run_ps(args) -> int:
    from aha_tpu.server.process import find_aha_services

    services = find_aha_services()
    if not services:
        print("No aha services found running.")
        return 0
    if args.compact:
        for svc in services:
            print(svc.service_id)
        return 0
    print(f"{'Service ID':<20} {'PID':<10} {'Model':<20} {'Port':<10} "
          f"{'Address':<15} {'Status':<10}")
    print("-" * 85)
    for svc in services:
        model = svc.model or "N/A"
        print(f"{svc.service_id:<20} {svc.pid:<10} {model:<20} {svc.port:<10} "
              f"{svc.address:<15} {svc.status.capitalize():<10}")
    return 0


def _resolve_model_path(args, allow_download: bool) -> tuple[str, str | None, str | None]:
    entry = registry.lookup(args.model)
    if entry.is_gguf:
        if not args.gguf_path:
            raise SystemExit("gguf model path is required")
        return "GGUF", args.gguf_path, args.mmproj_path
    if entry.is_onnx:
        raise SystemExit("onnx model not support now")
    if args.weight_path:
        return args.weight_path, None, None
    path = default_weight_path(args.model)
    if not os.path.exists(path):
        if allow_download:
            from aha_tpu.utils.download import download_model

            save = getattr(args, "save_dir", None) or default_save_dir()
            download_model(args.model, save,
                           getattr(args, "download_retries", 3))
            return os.path.join(save, args.model), None, None
        raise SystemExit(
            "serv subcommand will not download model, use `weight-path` to "
            "pass the model path")
    return path, None, None


def _serve(args, allow_download: bool) -> int:
    from aha_tpu.models.loader import load_model
    from aha_tpu.server.app import ServerState, start_http_server
    from aha_tpu.utils.profiling import configure as configure_profiling

    configure_profiling(getattr(args, "profile_dir", None),
                        getattr(args, "profile_port", None))
    path, gguf, mmproj = _resolve_model_path(args, allow_download)
    t0 = time.perf_counter()
    model = load_model(args.model, path, gguf=gguf, mmproj=mmproj,
                       tp=getattr(args, "tp", 1),
                       dp=getattr(args, "dp", 1),
                       batch_slots=getattr(args, "batch_slots", 1),
                       prefix_cache=getattr(args, "prefix_cache", 4),
                       max_seq_len=getattr(args, "max_seq_len", 8192),
                       spec_tokens=getattr(args, "spec_tokens", 0))
    print(f"model loaded in {time.perf_counter() - t0:.1f}s")
    state = ServerState(model=model,
                        allow_remote_shutdown=args.allow_remote_shutdown,
                        port=args.port, api_key=_api_key(args))
    start_http_server(state, address=args.address, port=args.port)
    return 0


def _api_key(args) -> str | None:
    return getattr(args, "api_key", None) or os.environ.get("AHA_API_KEY")


def run_serv(args) -> int:
    if getattr(args, "manage_only", False):
        from aha_tpu.server.app import ServerState, start_http_server

        state = ServerState(model=None,
                            allow_remote_shutdown=args.allow_remote_shutdown,
                            port=args.port, api_key=_api_key(args))
        print(f"management console on http://{args.address}:{args.port}/ "
              f"(no model loaded)")
        start_http_server(state, address=args.address, port=args.port)
        return 0
    if not args.model:
        raise SystemExit("serv requires a model id (or --manage-only)")
    return _serve(args, allow_download=False)


def run_cli(args) -> int:
    return _serve(args, allow_download=True)


def _as_url(s: str) -> str:
    """Bare paths become file:// URLs (exec/mod.rs input convention)."""
    if s.startswith(("http://", "https://", "file://", "data:")):
        return s
    return f"file://{os.path.abspath(s)}"


def _maybe_file_text(s: str) -> str:
    """file:// inputs are read as text (exec/voxcpm.rs:15-20)."""
    if s.startswith("file://"):
        with open(s[7:]) as f:
            return f.read()
    return s


# family → default OCR instruction (mirrors the reference exec modules)
_OCR_PROMPTS = {
    "deepseek_ocr": "<image>\nConvert the document to markdown. ",
    "glm_ocr": "Text Recognition:",
    "hunyuan_ocr": "检测并识别图片中的文字，将文本坐标格式化输出。",
    "paddleocr_vl": "OCR:",
}


def _chat_req(model_id: str, content, max_tokens: int, greedy: bool = False):
    from aha_tpu.params import ChatCompletionParameters

    body = {
        "messages": [{"role": "user", "content": content}],
        "model": model_id, "max_tokens": max_tokens,
    }
    if greedy:
        # The speculative-decode gate only engages on greedy requests
        # (core/engine.py use_spec); without this a model whose
        # generation_config ships temperature>0 would silently never
        # speculate under `aha run --spec-tokens`.
        body["temperature"] = 0.0
    return ChatCompletionParameters.model_validate(body)


def run_run(args) -> int:
    """Direct inference, printing model-load and generate wall times like the
    reference exec modules (src/exec/ — one per family; e.g. qwen3.rs:58-101,
    voxcpm.rs:13-57, rmbg2_0.rs:13-75, qwen2_5vl.rs:14-60)."""
    from aha_tpu.models.loader import load_model

    entry = registry.lookup(args.model)
    inputs: list[str] = args.input
    path, gguf, mmproj = _resolve_model_path(args, allow_download=True)
    t0 = time.perf_counter()
    model = load_model(args.model, path, gguf=gguf, mmproj=mmproj,
                       tp=getattr(args, "tp", 1),
                       max_seq_len=getattr(args, "max_seq_len", 8192),
                       spec_tokens=getattr(args, "spec_tokens", 0))
    print(f"load model use time: {time.perf_counter() - t0:.2f}s")

    t0 = time.perf_counter()
    mt = entry.model_type
    if mt == "embedding":
        vecs = model.embedding([_maybe_file_text(s) for s in inputs])
        for v in vecs:
            print(f"embedding dim {len(v)}: {v[:8]}...")
    elif mt == "reranker":
        if len(inputs) < 2:
            print("reranker needs --input query --input doc [--input doc ...]")
            return 1
        scores = model.rerank(inputs[0], inputs[1:])
        order = sorted(range(len(scores)), key=lambda i: -scores[i])
        for rank, i in enumerate(order):
            print(f"#{rank + 1} score={scores[i]:.4f}  {inputs[i][:70]}")
    elif mt == "asr":
        req = _chat_req(args.model, [
            {"type": "audio_url", "audio_url": {"url": _as_url(inputs[0])}},
        ], args.max_tokens)
        resp = model.generate(req)
        print(resp.choices[0].message.text() if resp.choices else "")
    elif mt == "ocr":
        prompt = (_maybe_file_text(inputs[1]) if len(inputs) > 1
                  else _OCR_PROMPTS.get(entry.family,
                                        "Convert the document to markdown. "))
        req = _chat_req(args.model, [
            {"type": "image_url", "image_url": {"url": _as_url(inputs[0])}},
            {"type": "text", "text": prompt},
        ], args.max_tokens)
        resp = model.generate(req)
        print(resp.choices[0].message.text() if resp.choices else "")
    elif mt == "vlm":
        if len(inputs) < 2:
            print(f"{args.model} needs --input <prompt> --input <image>")
            return 1
        req = _chat_req(args.model, [
            {"type": "image_url", "image_url": {"url": _as_url(inputs[1])}},
            {"type": "text", "text": _maybe_file_text(inputs[0])},
        ], args.max_tokens)
        resp = model.generate(req)
        print(resp.choices[0].message.text() if resp.choices else "")
    elif mt == "tts":
        from aha_tpu.utils.audio import save_wav

        wav = model.synthesize(_maybe_file_text(inputs[0]))
        out = args.output or f"voxcpm_{int(time.time())}.wav"
        save_wav(out, wav, model.vae.out_sample_rate)
        print(f"Output saved to: {out}")
    elif mt == "image":
        pngs = model.remove_background([_as_url(s) for s in inputs])
        base = args.output or "output.png"
        for i, png in enumerate(pngs):
            dest = base if len(pngs) == 1 else \
                f"{base[:-4] if base.endswith('.png') else base}_{i}.png"
            with open(dest, "wb") as f:
                f.write(png)
            print(f"Output saved to: {dest}")
    else:
        spec = getattr(args, "spec_tokens", 0) > 0
        if spec:
            print("note: --spec-tokens forces greedy sampling "
                  "(speculation is exact only for greedy decoding)")
        resp = model.generate(_chat_req(
            args.model, _maybe_file_text(inputs[0]), args.max_tokens,
            greedy=spec))
        print(resp.choices[0].message.text() if resp.choices else "")
    print(f"generate use time: {time.perf_counter() - t0:.2f}s")
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    handlers = {
        "list": run_list,
        "download": run_download,
        "delete": run_delete,
        "ps": run_ps,
        "serv": run_serv,
        "cli": run_cli,
        "run": run_run,
    }
    return handlers[args.command](args)


if __name__ == "__main__":
    sys.exit(main())
