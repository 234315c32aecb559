"""Experiment: can this stack (jax 0.9 / Mosaic / v5e) run int4 weights
profitably? Decides the 4-bit GGUF kernel design.

Candidates, all at the lm_head geometry (M=8, K=1024, N=151936):
  a. bf16 dot                              (baseline: ~475 us measured r4)
  b. all-int8 Pallas quant_matmul          (baseline: ~278 us measured r4)
  c. XLA dot with int4 weights (s8 x s4)
  d. Pallas kernel with an int4 weight ref, dot after in-kernel upcast
  e. Pallas kernel streaming PACKED int8 nibbles, VPU unpack, s8 dot

A 4-bit path wins if it beats (b) — it halves the weight bytes (77 MB vs
155 MB), so anything under ~0.7x of (b)'s time is bandwidth-realized.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_int4.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 8, 1024, 151936
GROUP = 128


def _force(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def bench(fn, args, n=16, label=""):
    try:
        out = fn(*args)
        _force(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _force(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{label:<44}{dt * 1e6:10.1f} us")
        return dt
    except Exception as e:
        print(f"{label:<44}FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None


def main():
    print(f"# devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    wq8 = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))
    w4np = rng.integers(-8, 8, (K, N), dtype=np.int8)
    st = jnp.asarray(rng.random((K // GROUP, N)), jnp.float32) * 0.01
    wbf = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

    # a. bf16
    f_bf = jax.jit(lambda x, w: (x @ w))
    bench(f_bf, (x, wbf), label="a. XLA bf16 dot")

    # b. the existing all-int8 Pallas kernel
    from aha_tpu.ops.quant_matmul import quant_matmul
    f_q8 = jax.jit(lambda x, q, s: quant_matmul(x, q, s))
    bench(f_q8, (x, wq8, st), label="b. Pallas all-int8 quant_matmul")

    # c. XLA int4-weight dot (s8 activations x s4 weights -> s32)
    w4 = jnp.asarray(w4np, jnp.int4)
    xq = jnp.asarray(rng.integers(-127, 128, (M, K), dtype=np.int8))

    @jax.jit
    def f_i4_xla(xq, w4):
        return jax.lax.dot_general(xq, w4, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
    bench(f_i4_xla, (xq, w4), label="c. XLA s8 x s4 dot")

    @jax.jit
    def f_i4i4_xla(xq, w4):
        x4 = jnp.clip(xq, -8, 7).astype(jnp.int4)
        return jax.lax.dot_general(x4, w4, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
    bench(f_i4i4_xla, (xq, w4), label="c2. XLA s4 x s4 dot")

    # d. Pallas int4 weight ref
    bn = 2048

    def k_i4(x_ref, w_ref, o_ref):
        xl = x_ref[...].astype(jnp.float32)
        sx = jnp.max(jnp.abs(xl), axis=1, keepdims=True) / 127.0
        xq = jnp.round(xl / jnp.where(sx == 0, 1.0, sx)).astype(jnp.int8)
        w = w_ref[...]                        # int4 (K, bn)
        acc = jax.lax.dot_general(xq, w.astype(jnp.int8),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        o_ref[...] = (acc.astype(jnp.float32) * sx).astype(o_ref.dtype)

    @jax.jit
    def f_i4_pl(x, w4):
        return pl.pallas_call(
            k_i4,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((M, K), lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, bn), lambda n: (0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda n: (0, n),
                                   memory_space=pltpu.VMEM),
        )(x, w4)
    bench(f_i4_pl, (x, w4), label="d. Pallas int4-ref upcast dot")

    # d2. Pallas int4 ref, native s8 x s4 dot (no explicit upcast)
    def k_i4n(x_ref, w_ref, o_ref):
        xl = x_ref[...].astype(jnp.float32)
        sx = jnp.max(jnp.abs(xl), axis=1, keepdims=True) / 127.0
        xq = jnp.round(xl / jnp.where(sx == 0, 1.0, sx)).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w_ref[...],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        o_ref[...] = (acc.astype(jnp.float32) * sx).astype(o_ref.dtype)

    @jax.jit
    def f_i4n_pl(x, w4):
        return pl.pallas_call(
            k_i4n,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((M, K), lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, bn), lambda n: (0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda n: (0, n),
                                   memory_space=pltpu.VMEM),
        )(x, w4)
    bench(f_i4n_pl, (x, w4), label="d2. Pallas int4-ref native dot")

    # e. packed nibbles in int8, VPU unpack inside the kernel
    packed = ((w4np[0::2, :] & 0x0F) | ((w4np[1::2, :] & 0x0F) << 4)
              ).astype(np.int8)               # (K//2, N)
    wp = jnp.asarray(packed)

    def k_pk(x_ref, p_ref, o_ref):
        xl = x_ref[...].astype(jnp.float32)
        sx = jnp.max(jnp.abs(xl), axis=1, keepdims=True) / 127.0
        xq = jnp.round(xl / jnp.where(sx == 0, 1.0, sx)).astype(jnp.int8)
        pk = p_ref[...]                      # (K//2, bn) int8
        lo = jnp.left_shift(pk, 4) >> 4      # sign-extended low nibble
        hi = pk >> 4                         # arithmetic shift: high nibble
        # interleave back to (K, bn)
        w = jnp.stack([lo, hi], axis=1).reshape(K, -1)
        acc = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        o_ref[...] = (acc.astype(jnp.float32) * sx).astype(o_ref.dtype)

    @jax.jit
    def f_pk(x, wp):
        return pl.pallas_call(
            k_pk,
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            grid=(N // bn,),
            in_specs=[
                pl.BlockSpec((M, K), lambda n: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K // 2, bn), lambda n: (0, n),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda n: (0, n),
                                   memory_space=pltpu.VMEM),
        )(x, wp)
    bench(f_pk, (x, wp), label="e. Pallas packed-nibble VPU unpack")

    # numerics spot-check for (c): int4 dot == numpy reference
    got = np.asarray(f_i4_xla(xq, w4))[:2, :8]
    ref = (np.asarray(xq, np.int32) @ w4np.astype(np.int32))[:2, :8]
    print("c. numerics match:", np.array_equal(got, ref))


if __name__ == "__main__":
    main()
