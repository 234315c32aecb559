"""Fused LM-head GEMV + argmax for plain-greedy decode.

Batch-1 greedy decode ends every step with the two largest non-matmul
costs in the profile (BENCH_NOTES r5): the vocab-head GEMV (XLA: ~550 µs
for the 0.6B's 311 MB bf16 head) and a separate pass over 151k logits to
pick the argmax.  This kernel computes both in ONE pass: each vocab tile
is dotted against the hidden state and immediately reduced to a running
(max, argmax) pair held in SMEM — the 600 KB logits vector never
materializes in HBM, and the Pallas GEMV itself runs at ~600 GB/s where
XLA's M=1 GEMV reads ~565 GB/s (measured v5e; scripts in BENCH_NOTES).

Tie-breaking matches jnp.argmax exactly (first index of the maximum):
within a tile the minimum matching column wins; across tiles a strictly
greater maximum is required to displace the running best, so earlier
tiles win ties.

Quantized heads (GGUF int8-per-128 / nibble-packed q4 grids,
ops/quant_matmul.py) get the same fusion with the grids' in-kernel
activation quantization, so a quantized checkpoint's greedy path streams
quantized bytes AND skips the logits round trip.

The reference has no analogue (candle materializes logits and samples on
host, src/models/common/generate.rs:70-86); this fusion exists because
on TPU the head read IS the decode-step tail.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aha_tpu.ops.quant_matmul import (GROUP, _dot_q4_tile, _dot_q8_tile,
                                      _quant_acts, supports_kernel_layout)

_NEG = float("-inf")


def _argmax_epilogue(row, ni, bn, n_total, m_ref, i_ref, val_ref, idx_ref,
                     n_tiles):
    """Fold one tile's logits row (1, bn) f32 into the running (max, idx)
    SMEM scalars; publish to the outputs on the last tile."""
    col = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1) + ni * bn
    row = jnp.where(col < n_total, row, _NEG)   # mask ragged edge tile
    tmax = jnp.max(row)
    tidx = jnp.min(jnp.where(row == tmax, col, jnp.int32(n_total)))

    @pl.when(ni == 0)
    def _init():
        m_ref[0] = _NEG
        i_ref[0] = 0

    better = tmax > m_ref[0]
    m_ref[0] = jnp.where(better, tmax, m_ref[0])
    i_ref[0] = jnp.where(better, tidx, i_ref[0])

    @pl.when(ni == n_tiles - 1)
    def _done():
        val_ref[0] = m_ref[0]
        idx_ref[0] = i_ref[0]


def _head_argmax_bf16_kernel(x_ref, w_ref, val_ref, idx_ref, m_ref, i_ref,
                             *, bn: int, n_total: int, n_tiles: int):
    ni = pl.program_id(0)
    logits = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)      # (8, bn); row 0 is live
    _argmax_epilogue(logits[0:1], ni, bn, n_total, m_ref, i_ref,
                     val_ref, idx_ref, n_tiles)


def _head_argmax_q8_kernel(x_ref, qt_ref, st_ref, val_ref, idx_ref,
                           m_ref, i_ref, *, bn: int, n_total: int,
                           n_tiles: int):
    ni = pl.program_id(0)
    xq, sx, _ = _quant_acts(x_ref[...].astype(jnp.float32))
    acc = _dot_q8_tile(xq, sx, qt_ref[...], st_ref[...],
                       jnp.zeros((xq.shape[0], bn), jnp.float32))
    _argmax_epilogue(acc[0:1], ni, bn, n_total, m_ref, i_ref,
                     val_ref, idx_ref, n_tiles)


def _head_argmax_q4_kernel(x_ref, q4_ref, s4_ref, b4_ref, val_ref, idx_ref,
                           m_ref, i_ref, *, bn: int, n_total: int,
                           n_tiles: int):
    ni = pl.program_id(0)
    xq, sx, xsum = _quant_acts(x_ref[...].astype(jnp.float32))
    acc = _dot_q4_tile(xq, sx, xsum, q4_ref[...], s4_ref[...], b4_ref[...],
                       jnp.zeros((xq.shape[0], bn), jnp.float32))
    _argmax_epilogue(acc[0:1], ni, bn, n_total, m_ref, i_ref,
                     val_ref, idx_ref, n_tiles)


def _pick_bn(K: int, bytes_per_k: float) -> int:
    """Largest 128-multiple tile whose weight block stays ≤ ~4 MB (double
    buffering leaves room in 16 MB VMEM)."""
    bn = int(4e6 / max(1.0, K * bytes_per_k)) // 128 * 128
    return max(128, min(4096, bn))


def head_argmax(p: dict, h: jnp.ndarray, interpret: bool = False
                ) -> jnp.ndarray:
    """Greedy token for ONE hidden state: argmax over dequant(head) @ h.

    p: {"w": (K, V)} bf16 dense, {"qt","st"} int8 grid, or
    {"q4","s4","b4"} nibble grid (ops/quant_matmul.py layouts).
    h: (..., K) with exactly one row (batch-1 decode).  Returns a scalar
    int32 token id.  Raises ValueError for layouts the kernel doesn't
    cover — callers fall back to logits + fast_argmax.
    """
    x = h.reshape(-1, h.shape[-1])
    if x.shape[0] != 1:
        raise ValueError("head_argmax is batch-1 only")
    K = x.shape[1]
    x8 = jnp.pad(x, ((0, 7), (0, 0)))            # sublane-min M tile

    if "w" in p:
        w = p["w"]
        if w.ndim != 2 or w.shape[0] != K:
            raise ValueError("dense head must be (K, V)")
        V = w.shape[1]
        bn = _pick_bn(K, 2.0)
        n_tiles = pl.cdiv(V, bn)
        kernel = functools.partial(_head_argmax_bf16_kernel, bn=bn,
                                   n_total=V, n_tiles=n_tiles)
        in_specs = [
            pl.BlockSpec((8, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
        ]
        args = (x8.astype(w.dtype), w)
        bytes_w = K * V * w.dtype.itemsize
    elif "qt" in p:
        qt, st = p["qt"], p["st"]
        Kp = qt.shape[0]
        if not supports_kernel_layout(Kp):
            raise ValueError("int8 head K not chunk-aligned")
        V = qt.shape[1]
        bn = _pick_bn(Kp, 1.0)
        n_tiles = pl.cdiv(V, bn)
        kernel = functools.partial(_head_argmax_q8_kernel, bn=bn,
                                   n_total=V, n_tiles=n_tiles)
        in_specs = [
            pl.BlockSpec((8, Kp), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp // GROUP, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
        ]
        if Kp > K:
            x8 = jnp.pad(x8, ((0, 0), (0, Kp - K)))
        args = (x8, qt, st)
        bytes_w = Kp * V + Kp // GROUP * V * 4
    elif "q4" in p:
        q4, s4, b4 = p["q4"], p["s4"], p["b4"]
        Kp = q4.shape[0] * 2
        if not supports_kernel_layout(Kp):
            raise ValueError("q4 head K not chunk-aligned")
        V = q4.shape[1]
        bn = _pick_bn(Kp, 0.5)
        n_tiles = pl.cdiv(V, bn)
        kernel = functools.partial(_head_argmax_q4_kernel, bn=bn,
                                   n_total=V, n_tiles=n_tiles)
        in_specs = [
            pl.BlockSpec((8, Kp), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp // 2, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp // GROUP, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp // GROUP, bn), lambda n: (0, n),
                         memory_space=pltpu.VMEM),
        ]
        if Kp > K:
            x8 = jnp.pad(x8, ((0, 0), (0, Kp - K)))
        args = (x8, q4, s4, b4)
        bytes_w = Kp // 2 * V + Kp // GROUP * V * 8
    else:
        raise ValueError(f"unsupported head layout: {sorted(p)}")
    if "b" in p:
        raise ValueError("biased heads not fused")

    _, idx = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((1,), jnp.float32),
                   jax.ShapeDtypeStruct((1,), jnp.int32)),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32),
                        pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 8 * V * K, bytes_accessed=bytes_w,
            transcendentals=0),
    )(*args)
    return idx[0]
