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


def _pad_to_chunks(qt: np.ndarray, st: np.ndarray) -> tuple[np.ndarray,
                                                            np.ndarray]:
    """Pad packed rows/scales so K fills whole 512-row chunks.  Padded quant
    blocks carry scale 0, so they dequantize to exact zeros and the kernel
    works for ANY K % 32 == 0 (the r2 kernel silently fell back to the XLA
    path whenever K % 512 != 0)."""
    K, N = qt.shape
    pad = (-K) % K_CHUNK
    if pad:
        qt = np.concatenate([qt, np.zeros((pad, N), qt.dtype)])
        st = np.concatenate(
            [st, np.zeros((pad // BLOCK, N), st.dtype)])
    return qt, st


def pack_q8_rows(w: np.ndarray) -> dict:
    """(N, K) float → {"qt": int8 (Kp, N) chunk-permuted, "st": f32
    (Kp/32, N)} with K zero-padded up to whole 512-row chunks."""
    N, K = w.shape
    assert K % BLOCK == 0
    xb = w.reshape(N, K // BLOCK, BLOCK).astype(np.float32)
    d = np.abs(xb).max(axis=2) / 127.0
    d_safe = np.where(d == 0, 1.0, d)
    q = np.clip(np.round(xb / d_safe[..., None]), -127, 127).astype(np.int8)
    qt, st = _pad_to_chunks(q.reshape(N, K).T,
                            d.astype(np.float32).T)
    qt = qt[_k_permutation(qt.shape[0])]
    return {"qt": np.ascontiguousarray(qt),
            "st": np.ascontiguousarray(st)}


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
        qt, st = _pad_to_chunks(
            q.reshape(N, K).T,
            d.reshape(N, K // BLOCK).astype(np.float32).T)
        qt = qt[_k_permutation(qt.shape[0])]
        return {"qt": np.ascontiguousarray(qt),
                "st": np.ascontiguousarray(st)}
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
    """x (M, K) @ dequant(qt, st) → (M, N).  qt's K is chunk-padded at pack
    time; x is zero-padded here to match (padded rows have scale 0)."""
    M, K = x.shape
    Kp = qt.shape[0]
    N = qt.shape[1]
    assert supports_kernel_layout(Kp), Kp
    if Kp > K:
        x = jnp.pad(x, ((0, 0), (0, Kp - K)))
        K = Kp
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
    if K > x.shape[-1]:
        x = jnp.pad(x, ((0, 0), (0, K - x.shape[-1])))
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
    # packed K is always chunk-padded; the kernel needs only lane-aligned N
    if use and supports_kernel_layout(p["qt"].shape[0]) and N % 128 == 0:
        y = quant_matmul(x2, p["qt"], p["st"])
    else:
        y = quant_matmul_xla(x2, p["qt"], p["st"])
    if "b" in p:
        y = y + p["b"]
    return y.reshape(*lead, N)
