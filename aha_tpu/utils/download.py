"""ModelScope model downloader.

Equivalent of the reference's ModelScope::download + retry wrapper
(src/utils/mod.rs:498-533): 3 attempts, 2 s backoff, saving to
<save_dir>/<model_id>/ (default ~/.aha).
"""

from __future__ import annotations

import os
import time

import requests

MODELSCOPE_API = "https://modelscope.cn/api/v1/models"


def list_repo_files(model_id: str, revision: str = "master") -> list[dict]:
    url = f"{MODELSCOPE_API}/{model_id}/repo/files"
    r = requests.get(url, params={"Recursive": "true", "Revision": revision},
                     timeout=30)
    r.raise_for_status()
    body = r.json()
    if body.get("Code") != 200:
        raise RuntimeError(f"modelscope list files failed: {body.get('Message')}")
    return [f for f in body["Data"]["Files"] if f.get("Type") != "tree"]


def download_file(model_id: str, file_path: str, dest: str,
                  revision: str = "master", progress=None) -> None:
    """`progress(n_bytes)` is called per received chunk."""
    url = f"{MODELSCOPE_API}/{model_id}/repo"
    with requests.get(url, params={"Revision": revision, "FilePath": file_path},
                      stream=True, timeout=60) as r:
        r.raise_for_status()
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        tmp = dest + ".part"
        with open(tmp, "wb") as f:
            for chunk in r.iter_content(chunk_size=1 << 20):
                f.write(chunk)
                if progress is not None:
                    progress(len(chunk))
        os.replace(tmp, dest)


def download_model_once(model_id: str, save_dir: str, progress=None) -> None:
    """`progress(event: dict)` receives {"files_total", "bytes_total"} once,
    then {"file": rel} per file start and {"bytes": n} per chunk (the UI's
    download-with-progress feed, aha-ui/src-tauri/src/lib.rs:254-382)."""
    target = os.path.join(save_dir, model_id)
    files = list_repo_files(model_id)
    if progress is not None:
        progress({"files_total": len(files),
                  "bytes_total": sum(int(f.get("Size") or 0) for f in files)})
    for info in files:
        rel = info["Path"]
        dest = os.path.join(target, rel)
        if os.path.exists(dest) and info.get("Size") == os.path.getsize(dest):
            if progress is not None:
                progress({"file": rel, "bytes": int(info.get("Size") or 0)})
            continue
        print(f"downloading {model_id}/{rel}")
        if progress is not None:
            progress({"file": rel})
        download_file(model_id, rel, dest,
                      progress=(None if progress is None
                                else lambda n: progress({"bytes": n})))


def download_model(model_id: str, save_dir: str, max_retries: int = 3,
                   progress=None) -> None:
    attempts = 0
    while True:
        attempts += 1
        print(f"Attempting to download model (attempt {attempts}/{max_retries})")
        try:
            download_model_once(model_id, save_dir, progress=progress)
            print("Model downloaded successfully")
            return
        except Exception as e:  # noqa: BLE001 — retry any transport error
            if attempts >= max_retries:
                raise RuntimeError(
                    f"Failed to download model after {max_retries} attempts. "
                    f"Last error: {e}") from e
            print(f"Download failed (attempt {attempts}): {e}. "
                  f"Retrying in 2 seconds...")
            time.sleep(2)


def is_model_downloaded(model_id: str, save_dir: str) -> bool:
    d = os.path.join(save_dir, model_id)
    return os.path.isdir(d) and bool(os.listdir(d))
