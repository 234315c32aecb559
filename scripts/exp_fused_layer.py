"""Prototype: one-launch-per-layer decode backbone via manual-DMA streaming.

The r5 finding: per-matmul Pallas cannot beat XLA's decode backbone
(~620 GB/s effective) because each launch costs ~4-10 us and the Pallas
streaming edge is only 738 vs 620 GB/s.  The only structural win is ONE
launch per layer that streams ALL the layer's weight bytes through a
small rotating VMEM staging pool with manual async DMA, overlapping the
MXU dots (M=8 decode rows are compute-trivial).

This measures JUST the matmul chain of one Qwen3-0.6B layer (qkv -> o ->
gateup -> silu.mul -> down), scanned over 28 layers with a carried
dependency, for:
  a. XLA chain (the current backbone path)
  b. fused manual-DMA kernel, chunk-width sweep

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_fused_layer.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 28
H = 1024          # hidden
NQKV = 4096       # q(2048) | k(1024) | v(1024)
NO = 2048         # o proj input (attn out)
NI = 3072         # intermediate
STEPS = 16
DISPATCH = 6
M = 8             # padded decode rows

BYTES_PER_LAYER = 2 * (H * NQKV + NO * H + H * 2 * NI + NI * H)


def _force(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def bench(run, x0, label="", nbytes=None):
    try:
        x = run(x0)
        _force(x)
        t0 = time.perf_counter()
        for _ in range(DISPATCH):
            x = run(x)
        _force(x)
        dt = (time.perf_counter() - t0) / (DISPATCH * STEPS * L)
        bw = f"{nbytes / dt / 1e9:7.1f} GB/s" if nbytes else ""
        print(f"{label:<44}{dt * 1e6:9.2f} us/layer  {bw}", flush=True)
        return dt
    except Exception:
        import traceback
        traceback.print_exc()
        print(f"{label:<44}FAILED", flush=True)
        return None


def fused_layer_kernel(li_ref, x_ref, wqkv, wo, wgu, wdn, o_ref,
                       stage, qkv_acc, attn_buf, h_acc, sems, *, cn: int,
                       nbuf: int):
    """Stream all four weight mats of layer li_ref[0] through `stage`
    (2 rotating (H, cn) buffers) and run the M=8 dot chain.  Attention is
    faked as a cheap elementwise op on the qkv output (this prototype
    times the weight streaming only).

    Chunk kinds: 0 = qkv N-chunk (H, cn), 1 = o K-chunk (H, H),
    2 = gateup N-chunk (H, cn), 3 = down K-chunk (H, H)."""
    li = li_ref[0]
    x = x_ref[...].astype(jnp.float32)

    plan = []
    for j in range(NQKV // cn):
        plan.append((wqkv, j, 0))
    for j in range(NO // H):
        plan.append((wo, j, 1))
    for j in range(2 * NI // cn):
        plan.append((wgu, j, 2))
    for j in range(NI // H):
        plan.append((wdn, j, 3))

    def make_dma(i, slot):
        src, j, kind = plan[i]
        w1 = cn if kind in (0, 2) else H
        if kind in (0, 2):
            sl = src.at[li, :, pl.ds(j * cn, cn)]
        else:
            sl = src.at[li, pl.ds(j * H, H), :]
        return pltpu.make_async_copy(sl, stage.at[slot, :, :w1],
                                     sems.at[slot])

    dmas = {}
    for i0 in range(min(nbuf, len(plan))):
        dmas[i0] = make_dma(i0, i0 % nbuf)
        dmas[i0].start()

    attn_done = False
    for i, (src, j, kind) in enumerate(plan):
        slot = i % nbuf
        w1 = cn if kind in (0, 2) else H
        dmas[i].wait()
        w = stage[slot, :, :w1].astype(jnp.float32)
        if kind == 0:
            qkv_acc[:, j * cn:(j + 1) * cn] = jax.lax.dot(
                x, w, preferred_element_type=jnp.float32)
        elif kind == 1:
            if not attn_done:
                attn_buf[...] = jnp.tanh(qkv_acc[:, :NO])
                attn_done = True
            a = attn_buf[...]
            part = jax.lax.dot(a[:, j * H:(j + 1) * H], w,
                               preferred_element_type=jnp.float32)
            if j == 0:
                o_ref[...] = part.astype(o_ref.dtype)
            else:
                o_ref[...] = (o_ref[...].astype(jnp.float32)
                              + part).astype(o_ref.dtype)
        elif kind == 2:
            h_acc[:, j * cn:(j + 1) * cn] = jax.lax.dot(
                x, w, preferred_element_type=jnp.float32)
        else:
            g = h_acc[:, :NI]
            u = h_acc[:, NI:]
            act = g * (1.0 / (1.0 + jnp.exp(-g))) * u
            part = jax.lax.dot(act[:, j * H:(j + 1) * H], w,
                               preferred_element_type=jnp.float32)
            o_ref[...] = (o_ref[...].astype(jnp.float32)
                          + part).astype(o_ref.dtype)
        if i + nbuf < len(plan):
            dmas[i + nbuf] = make_dma(i + nbuf, (i + nbuf) % nbuf)
            dmas[i + nbuf].start()


def make_fused(ws, cn, nbuf=2):
    def step(x, wqkv, wo, wgu, wdn):
        def body(c, li):
            out = pl.pallas_call(
                functools.partial(fused_layer_kernel, cn=cn, nbuf=nbuf),
                out_shape=jax.ShapeDtypeStruct((M, H), jnp.bfloat16),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((nbuf, H, max(cn, H)), jnp.bfloat16),
                    pltpu.VMEM((M, NQKV), jnp.float32),
                    pltpu.VMEM((M, NO), jnp.float32),
                    pltpu.VMEM((M, 2 * NI), jnp.float32),
                    pltpu.SemaphoreType.DMA((nbuf,)),
                ],
            )(jnp.asarray([li], jnp.int32), c, wqkv, wo, wgu, wdn)
            return c + 1e-6 * out, None

        c, _ = jax.lax.scan(body, x, jnp.arange(L))
        return c

    @jax.jit
    def run(x, *ws):
        def sbody(c, _):
            return step(c, *ws), None

        c, _ = jax.lax.scan(sbody, x, None, length=STEPS)
        return c

    return lambda x: run(x, *ws)


def make_xla(ws):
    def step(x, wqkv, wo, wgu, wdn):
        def body(c, li):
            xf = c
            qkv = jax.lax.dot(xf, wqkv[li], preferred_element_type=jnp.float32)
            a = jnp.tanh(qkv[:, :NO]).astype(jnp.bfloat16)
            o = jax.lax.dot(a, wo[li], preferred_element_type=jnp.float32)
            h = jax.lax.dot(xf, wgu[li], preferred_element_type=jnp.float32)
            g, u = h[:, :NI], h[:, NI:]
            act = (g * (1.0 / (1.0 + jnp.exp(-g))) * u).astype(jnp.bfloat16)
            d = jax.lax.dot(act, wdn[li], preferred_element_type=jnp.float32)
            out = (o + d).astype(jnp.bfloat16)
            return c + 1e-6 * out, None

        c, _ = jax.lax.scan(body, x, jnp.arange(L))
        return c

    @jax.jit
    def run(x, *ws):
        def sbody(c, _):
            return step(c, *ws), None

        c, _ = jax.lax.scan(sbody, x, None, length=STEPS)
        return c

    return lambda x: run(x, *ws)


def main() -> None:
    print(f"# platform={jax.devices()[0].platform} "
          f"bytes/layer={BYTES_PER_LAYER / 2 ** 20:.1f} MB", flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    scale = 0.02
    wqkv = scale * jax.random.normal(ks[0], (L, H, NQKV), jnp.bfloat16)
    wo = scale * jax.random.normal(ks[1], (L, NO, H), jnp.bfloat16)
    wgu = scale * jax.random.normal(ks[2], (L, H, 2 * NI), jnp.bfloat16)
    wdn = scale * jax.random.normal(ks[3], (L, NI, H), jnp.bfloat16)
    x0 = jax.random.normal(ks[4], (M, H), jnp.bfloat16)
    ws = (wqkv, wo, wgu, wdn)

    import sys
    variants = ((1024, 3), (1024, 4), (2048, 3)) if "--nbuf" in sys.argv \
        else ((1024, 2), (2048, 2))
    if "--xla" in sys.argv:
        bench(make_xla(ws), x0, label="a. XLA 4-matmul chain",
              nbytes=BYTES_PER_LAYER)
    for cn, nbuf in variants:
        bench(make_fused(ws, cn, nbuf), x0,
              label=f"b. fused manual-DMA cn={cn} nbuf={nbuf}",
              nbytes=BYTES_PER_LAYER)


if __name__ == "__main__":
    main()
