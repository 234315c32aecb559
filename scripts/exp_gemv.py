"""Decode GEMV study: what bandwidth can M=1 weight-streaming matmuls
actually reach on this chip, and does a dedicated Pallas GEMV beat XLA?

Every candidate runs as 32 iterations inside ONE jitted lax.scan with a
carried data dependency (x feeds forward), because a single-op dispatch
through the tunneled runtime costs ~1 ms of launch latency — the first
version of this script timed exactly that instead of the kernels.

  ceiling.  Pallas block-sum over the 311 MB head     (practical HBM peak)
  a. XLA bf16 GEMV at the lm_head (K=1024, N=151936)
  b. Pallas bf16 GEMV, bn sweep
  c. Pallas bf16 GEMV + fused argmax epilogue (greedy head: never
     materializes the 608 KB logits row in HBM)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_gemv.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, N = 1024, 151936
STEPS = 32
DISPATCH = 8


def _force(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def bench(step, x0, w, label="", nbytes=None):
    """step(x, w) -> x'; scanned STEPS times per dispatch, DISPATCH chained
    dispatches timed."""
    @jax.jit
    def run(x, w):
        def body(c, _):
            return step(c, w), None

        c, _ = jax.lax.scan(body, x, None, length=STEPS)
        return c

    try:
        x = run(x0, w)
        _force(x)
        t0 = time.perf_counter()
        for _ in range(DISPATCH):
            x = run(x, w)
        _force(x)
        dt = (time.perf_counter() - t0) / (DISPATCH * STEPS)
        bw = f"{nbytes / dt / 1e9:7.1f} GB/s" if nbytes else ""
        print(f"{label:<44}{dt * 1e6:9.1f} us  {bw}", flush=True)
        return dt
    except Exception as e:
        print(f"{label:<44}FAILED: {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return None


def main():
    print(f"# {jax.devices()} steps/dispatch={STEPS}", flush=True)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((1, K)), jnp.bfloat16)
    wb = K * N * 2

    # -- ceiling: pallas block sum, x dependency via a (1, 128) tile ---------
    def sum_kernel(x_ref, w_ref, o_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            acc_ref[0, 0] += x_ref[0, 0].astype(jnp.float32)

        acc_ref[...] += jnp.sum(w_ref[...].astype(jnp.float32),
                                axis=0, keepdims=True)[:, :128]

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            o_ref[...] = acc_ref[...]

    def mk_sum(bn, vmem=None):
        def step(x, w):
            s = pl.pallas_call(
                sum_kernel,
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
                grid=(N // bn,),
                in_specs=[pl.BlockSpec((1, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((K, bn), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=vmem) if vmem else None,
            )(x[:, :128], w)
            return x + (s[0, 0] * 1e-30).astype(x.dtype)

        return step

    for bn, vm in ((2048, None), (4096, 64 << 20), (8192, 100 << 20)):
        bench(mk_sum(bn, vm), x0, w,
              label=f"ceiling: pallas block-sum bn={bn}", nbytes=wb)

    # -- a. XLA GEMV ----------------------------------------------------------
    def xla_step(x, w):
        y = (x @ w).astype(jnp.float32)
        return x + (y[:, :K] * 1e-30).astype(x.dtype)

    bench(xla_step, x0, w, label="a. XLA bf16 GEMV", nbytes=wb)

    def xla_step8(x, w):
        y = (jnp.broadcast_to(x, (8, K)) @ w).astype(jnp.float32)
        return x + (y[:1, :K] * 1e-30).astype(x.dtype)

    bench(xla_step8, x0, w, label="a2. XLA bf16 M=8", nbytes=wb)

    # -- b. Pallas GEMV -------------------------------------------------------
    def gemv_kernel(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mk_gemv(bn, m=8, vmem=None):
        def step(x, w):
            xp = jnp.broadcast_to(x, (m, K))
            y = pl.pallas_call(
                gemv_kernel,
                out_shape=jax.ShapeDtypeStruct((m, N), jnp.float32),
                grid=(N // bn,),
                in_specs=[
                    pl.BlockSpec((m, K), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, bn), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((m, bn), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=vmem) if vmem else None,
            )(xp, w)
            return x + (y[:1, :K] * 1e-30).astype(x.dtype)

        return step

    for bn, vm in ((1024, None), (2048, None), (4096, 64 << 20),
                   (8192, 100 << 20)):
        bench(mk_gemv(bn, vmem=vm), x0, w,
              label=f"b. pallas GEMV bn={bn}", nbytes=wb)

    # -- c. GEMV + argmax epilogue -------------------------------------------
    def head_kernel(x_ref, w_ref, m_ref, i_ref, mx_ref, ix_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            mx_ref[0, 0] = -jnp.inf
            ix_ref[0, 0] = 0

        y = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[:1]      # (1, bn)
        bn = y.shape[1]
        m = jnp.max(y)
        idx = jnp.min(jnp.where(y == m,
                                jax.lax.broadcasted_iota(jnp.int32,
                                                         y.shape, 1),
                                jnp.int32(bn)))

        @pl.when(m > mx_ref[0, 0])
        def _():
            mx_ref[0, 0] = m
            ix_ref[0, 0] = idx + i * bn

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            m_ref[0, 0] = mx_ref[0, 0]
            i_ref[0, 0] = ix_ref[0, 0]

    def mk_head(bn, vmem=None):
        def step(x, w):
            xp = jnp.broadcast_to(x, (8, K))
            m, idx = pl.pallas_call(
                head_kernel,
                out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32),
                           jax.ShapeDtypeStruct((1, 1), jnp.int32)],
                grid=(N // bn,),
                in_specs=[
                    pl.BlockSpec((8, K), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, bn), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                                        memory_space=pltpu.SMEM),
                           pl.BlockSpec((1, 1), lambda i: (0, 0),
                                        memory_space=pltpu.SMEM)],
                scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32),
                                pltpu.SMEM((1, 1), jnp.int32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=vmem) if vmem else None,
            )(xp, w)
            return x + (m[0, 0] * 1e-30 + idx[0, 0] * 1e-30).astype(x.dtype)

        return step

    for bn, vm in ((2048, None), (4096, 64 << 20)):
        bench(mk_head(bn, vm), x0, w,
              label=f"c. pallas GEMV+argmax bn={bn}", nbytes=wb)

    # numerics: c matches XLA argmax (single un-scanned call)
    def head_once(x, w):
        xp = jnp.broadcast_to(x, (8, K))
        _, idx = pl.pallas_call(
            head_kernel,
            out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.int32)],
            grid=(N // 2048,),
            in_specs=[
                pl.BlockSpec((8, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, 2048), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                                    memory_space=pltpu.SMEM),
                       pl.BlockSpec((1, 1), lambda i: (0, 0),
                                    memory_space=pltpu.SMEM)],
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32),
                            pltpu.SMEM((1, 1), jnp.int32)],
        )(xp, w)
        return idx[0, 0]

    got = int(jax.jit(head_once)(x0, w))
    ref = int(jnp.argmax((x0 @ w)[0]))
    print(f"c. argmax match: {got == ref} ({got} vs {ref})", flush=True)


if __name__ == "__main__":
    main()
