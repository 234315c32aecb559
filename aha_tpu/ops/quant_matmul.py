"""Dequant-matmul for GGUF block-quantized weights.

North-star kernel from BASELINE.json: quantized weights stay packed in HBM
(int8 qvals + per-32-block scales — 9 bits/weight vs 16 for bf16) and are
expanded to bf16 only in VMEM tiles right before hitting the MXU, so decode
HBM traffic drops ~1.8× vs bf16 weights.

Layout trick: within each 512-row K-chunk, rows are stored element-major
across the chunk's 16 quant blocks (row p ↔ block p mod 16).  Scale
expansion inside the kernel is then a pure *tile* — exactly what
pltpu.repeat provides — with no reshapes (Mosaic rejects the reshape-based
expansion).  The activation's K axis is permuted identically before the
kernel (a cheap gather vs streaming the weights).

    y = x (M, K) @ dequant(W (N, K)).T → (M, N)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 32
K_CHUNK = 512
BLOCKS_PER_CHUNK = K_CHUNK // BLOCK  # 16


def _k_permutation(K: int) -> np.ndarray:
    """perm[p] = original k for stored row p (chunk-local element-major)."""
    assert K % K_CHUNK == 0
    perm = np.empty(K, np.int64)
    for c in range(K // K_CHUNK):
        base = c * K_CHUNK
        p = np.arange(K_CHUNK)
        e, b = p // BLOCKS_PER_CHUNK, p % BLOCKS_PER_CHUNK
        perm[base + p] = base + b * BLOCK + e
    return perm


def supports_kernel_layout(K: int) -> bool:
    return K % K_CHUNK == 0


def pack_q8_rows(w: np.ndarray) -> dict:
    """(N, K) float → {"qt": int8 (K, N) chunk-permuted, "st": f32 (K/32, N)}.

    Falls back to a simple transposed layout (no permutation) when K isn't a
    multiple of 512 — the XLA path handles that case.
    """
    N, K = w.shape
    assert K % BLOCK == 0
    xb = w.reshape(N, K // BLOCK, BLOCK).astype(np.float32)
    d = np.abs(xb).max(axis=2) / 127.0
    d_safe = np.where(d == 0, 1.0, d)
    q = np.clip(np.round(xb / d_safe[..., None]), -127, 127).astype(np.int8)
    qt = q.reshape(N, K).T  # (K, N), natural order
    if supports_kernel_layout(K):
        qt = qt[_k_permutation(K)]
    return {"qt": np.ascontiguousarray(qt),
            "st": np.ascontiguousarray(d.astype(np.float32).T)}


def from_gguf_tensor(gguf, name: str) -> dict:
    """GGUF tensor → kernel layout. Q8_0 keeps its exact int8 values; other
    quant formats dequantize and repack through the int8 grid."""
    info = gguf.tensors[name]
    from aha_tpu.io.gguf import GGML_Q8_0, _f16

    if info.ggml_type == GGML_Q8_0:
        raw = gguf.tensor_bytes(name).reshape(-1, 34)
        d = _f16(raw[:, :2].reshape(-1))
        q = raw[:, 2:].view(np.int8)
        N, K = info.shape
        qt = q.reshape(N, K).T
        if supports_kernel_layout(K):
            qt = qt[_k_permutation(K)]
        return {"qt": np.ascontiguousarray(qt),
                "st": np.ascontiguousarray(
                    d.reshape(N, K // BLOCK).astype(np.float32).T)}
    w = gguf.dequantize(name)
    return pack_q8_rows(w.reshape(info.shape))


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _qmm_kernel(x_ref, qt_ref, st_ref, o_ref, acc_ref, *, n_k_blocks: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[...]                       # (bm, 512) — K-permuted
    qt = qt_ref[...]                     # (512, bn) int8, element-major rows
    st = st_ref[...]                     # (16, bn) f32 (Mosaic has no f16)
    # stored row p belongs to quant block p % 16 → tiling IS the expansion
    scales = pltpu.repeat(st.astype(jnp.bfloat16), BLOCK, axis=0)  # (512, bn)
    w = qt.astype(jnp.bfloat16) * scales
    acc_ref[:] += jax.lax.dot_general(
        x.astype(jnp.bfloat16), w,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ki == n_k_blocks - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def quant_matmul(x: jnp.ndarray, qt: jnp.ndarray, st: jnp.ndarray,
                 block_m: int = 128, block_n: int | None = None,
                 interpret: bool = False) -> jnp.ndarray:
    """x (M, K) @ dequant(qt, st) → (M, N); K must be a multiple of 512."""
    M, K = x.shape
    N = qt.shape[1]
    assert supports_kernel_layout(K), K
    bm = min(block_m, max(8, M))
    if block_n is None:
        # measured on v5e: small M (decode) favors small n-tiles, large M
        # (prefill) favors wide ones
        block_n = 512 if M <= 64 else 2048
    bn = min(block_n, N)
    while N % bn:
        bn //= 2
    bk = K_CHUNK
    assert N % bn == 0
    x = jnp.take(x, jnp.asarray(_k_permutation(K)), axis=1)
    pad_m = (-M) % bm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    Mp = x.shape[0]
    grid = (Mp // bm, N // bn, K // bk)
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, n_k_blocks=K // bk),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, n, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda m, n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCKS_PER_CHUNK, bn), lambda m, n, k: (k, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k: (m, n),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K * 2 + N * K + N * K // BLOCK * 4 + Mp * N * 2,
            transcendentals=0),
    )(x, qt, st)
    return out[:M] if pad_m else out


def _expand_scales(st: jnp.ndarray, K: int) -> jnp.ndarray:
    """(K/32, N) → (K, N) matching the stored qt row order."""
    NB, N = st.shape
    if supports_kernel_layout(K):
        nc = K // K_CHUNK
        s = st.reshape(nc, 1, BLOCKS_PER_CHUNK, N)
        s = jnp.broadcast_to(s, (nc, BLOCK, BLOCKS_PER_CHUNK, N))
        return s.reshape(K, N)
    return jnp.repeat(st, BLOCK, axis=0)


def quant_matmul_xla(x: jnp.ndarray, qt: jnp.ndarray,
                     st: jnp.ndarray) -> jnp.ndarray:
    """Reference/fallback path: dequantize then matmul (XLA)."""
    K, N = qt.shape
    if supports_kernel_layout(K):
        x = jnp.take(x, jnp.asarray(_k_permutation(K)), axis=1)
    w = qt.astype(jnp.float32) * _expand_scales(st, K).astype(jnp.float32)
    return (x.astype(jnp.float32) @ w).astype(x.dtype)


def quant_linear(p: dict, x: jnp.ndarray, use_pallas: bool | None = None
                 ) -> jnp.ndarray:
    """Linear over a quantized weight dict {"qt", "st", optional "b"}.

    x: (..., K) → (..., N).  Pallas kernel on TPU, XLA fallback elsewhere.
    """
    from aha_tpu.utils.device import on_tpu

    lead = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K)
    use = on_tpu() if use_pallas is None else use_pallas
    N = p["qt"].shape[1]
    if use and supports_kernel_layout(K) and N % 512 == 0:
        y = quant_matmul(x2, p["qt"], p["st"])
    else:
        y = quant_matmul_xla(x2, p["qt"], p["st"])
    if "b" in p:
        y = y + p["b"]
    return y.reshape(*lead, N)
