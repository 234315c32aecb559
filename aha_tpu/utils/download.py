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
                  revision: str = "master") -> None:
    url = f"{MODELSCOPE_API}/{model_id}/repo"
    with requests.get(url, params={"Revision": revision, "FilePath": file_path},
                      stream=True, timeout=60) as r:
        r.raise_for_status()
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        tmp = dest + ".part"
        with open(tmp, "wb") as f:
            for chunk in r.iter_content(chunk_size=1 << 20):
                f.write(chunk)
        os.replace(tmp, dest)


def download_model_once(model_id: str, save_dir: str) -> None:
    target = os.path.join(save_dir, model_id)
    for info in list_repo_files(model_id):
        rel = info["Path"]
        dest = os.path.join(target, rel)
        if os.path.exists(dest) and info.get("Size") == os.path.getsize(dest):
            continue
        print(f"downloading {model_id}/{rel}")
        download_file(model_id, rel, dest)


def download_model(model_id: str, save_dir: str, max_retries: int = 3) -> None:
    attempts = 0
    while True:
        attempts += 1
        print(f"Attempting to download model (attempt {attempts}/{max_retries})")
        try:
            download_model_once(model_id, save_dir)
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
