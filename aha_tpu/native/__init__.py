"""Native host components, built on demand and loaded via ctypes.

The reference's runtime (loader, tokenizer, server) is compiled code; here
the hot host-side loop — GGUF block dequantization at model load — gets the
same treatment.  The C++ source ships with the package, is compiled once
with the system toolchain (g++ -O3 -march=native -fopenmp), and the shared
library is cached under ~/.cache/aha_tpu keyed by a source hash.  Anything
that can fail (no compiler, sandboxed tmp, exotic platform) degrades
silently to the numpy reference implementation in aha_tpu.io.gguf.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "dequant.cpp")

# ggml type name → (exported symbol, bytes per block, elems per block)
BLOCK_SPECS = {
    "q8_0": ("dequant_q8_0", 34, 32),
    "q4_0": ("dequant_q4_0", 18, 32),
    "q4_1": ("dequant_q4_1", 20, 32),
    "q5_0": ("dequant_q5_0", 22, 32),
    "iq4_nl": ("dequant_iq4_nl", 18, 32),
    "q4_k": ("dequant_q4_k", 144, 256),
    "q6_k": ("dequant_q6_k", 210, 256),
    "q5_k": ("dequant_q5_k", 176, 256),
    "q2_k": ("dequant_q2_k", 84, 256),
    "q3_k": ("dequant_q3_k", 110, 256),
}


def _build() -> str | None:
    """Compile dequant.cpp → cached .so; returns the path or None."""
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
    except OSError:
        return None
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache = os.environ.get("AHA_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "aha_tpu")
    so = os.path.join(cache, f"dequant-{tag}.so")
    if os.path.exists(so):
        return so
    try:
        os.makedirs(cache, exist_ok=True)
        tmp = so + f".build-{os.getpid()}"
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp",
               "-march=native", _SRC, "-o", tmp]
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            # retry without -march=native (unsupported on some toolchains)
            cmd.remove("-march=native")
            r = subprocess.run(cmd, capture_output=True, timeout=120)
            if r.returncode != 0:
                return None
        os.replace(tmp, so)   # atomic vs concurrent builders
        return so
    except Exception:
        return None


def get_lib() -> ctypes.CDLL | None:
    """The compiled library, or None when native is unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("AHA_NO_NATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            for sym, _, _ in BLOCK_SPECS.values():
                fn = getattr(lib, sym)
                fn.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.c_void_p]
                fn.restype = None
            _lib = lib
        except OSError:
            return None
    return _lib


def dequant(type_name: str, raw: np.ndarray) -> np.ndarray | None:
    """Dequantize a contiguous run of ggml blocks natively.

    raw: uint8 array of whole blocks.  Returns float32 (n_elems,) or None
    when the native library is unavailable (caller falls back to numpy).
    """
    spec = BLOCK_SPECS.get(type_name)
    lib = get_lib()
    if spec is None or lib is None:
        return None
    sym, block_bytes, block_elems = spec
    raw = np.ascontiguousarray(raw, np.uint8)
    if raw.size % block_bytes:
        return None
    n_blocks = raw.size // block_bytes
    out = np.empty(n_blocks * block_elems, np.float32)
    getattr(lib, sym)(raw.ctypes.data, n_blocks, out.ctypes.data)
    return out
