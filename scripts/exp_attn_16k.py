"""Deep-cache decode attention: block_k sweep at 16k, bf16 vs q8.

VERDICT r4 item 4: int8 KV at 16k is 1.28x where 64k reaches 1.61x.  Part
of that is Amdahl (the backbone does not shrink), but the q8 kernel also
pays a per-block int8->bf16 whole-tile cast that is VPU-bound at small
blocks: at block_k=512 the cast is ~1.1 us/block against ~0.7 us of DMA.
Bigger blocks amortize both the cast ramp and the grid-step sequencer.

Measures one full 28-layer attention pass at a 16384-row cache, ~16k live,
for block_k in {256, 512, 1024, 2048}, bf16 and q8 kernels.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_attn_16k.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

L, B, S, HQ, HKV, D = 28, 1, 16384, 16, 8, 128
STEPS = 8
DISPATCH = 4
POS = S - 2


def _force(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def bench(fn, args, label=""):
    @jax.jit
    def run(q, *rest):
        def body(c, _):
            o = fn(c, *rest)
            return c + 1e-6 * o.reshape(c.shape), None

        c, _ = jax.lax.scan(body, q, None, length=STEPS)
        return c

    try:
        q = run(*args)
        _force(q)
        t0 = time.perf_counter()
        x = args[0]
        for _ in range(DISPATCH):
            x = run(x, *args[1:])
        _force(x)
        dt = (time.perf_counter() - t0) / (DISPATCH * STEPS)
        # bytes actually read per pass (live rows, K+V)
        nbytes = L * POS * HKV * D * 2
        print(f"{label:<40}{dt * 1e6:9.1f} us/pass "
              f"({dt * 1e6 / L:6.2f} us/layer)", flush=True)
        return dt
    except Exception as e:
        print(f"{label:<40}FAILED {type(e).__name__}: {e}", flush=True)
        return None


def main() -> None:
    print(f"# platform={jax.devices()[0].platform} S={S} pos={POS}",
          flush=True)
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, 1, HQ, D), jnp.bfloat16)
    pos = jnp.asarray(POS, jnp.int32)

    from aha_tpu.ops.flash_attention import (flash_decode_at_layer_flat,
                                             flash_decode_at_layer_q8)

    k_stack = jax.random.normal(kk, (L, B, S, HKV * D), jnp.bfloat16)
    v_stack = jax.random.normal(kv, (L, B, S, HKV * D), jnp.bfloat16)

    for bk in (256, 512, 1024, 2048):
        def bf16_pass(q, ks, vs, bk=bk):
            def layer(carry, li):
                o = flash_decode_at_layer_flat(
                    carry.reshape(B, 1, HQ, D), ks, vs, li, pos + 1,
                    block_k=bk)
                return carry + 1e-6 * o.reshape(carry.shape), None

            c, _ = jax.lax.scan(layer, q, jnp.arange(L))
            return c

        bench(lambda c, a, b, f=bf16_pass: f(c, a, b), (q, k_stack, v_stack),
              label=f"bf16 block_k={bk}")

    del k_stack, v_stack
    k8 = jax.random.randint(kk, (L, B, S, HKV * D), -127, 127, jnp.int8)
    v8 = jax.random.randint(kv, (L, B, S, HKV * D), -127, 127, jnp.int8)
    ksc = jnp.abs(jax.random.normal(kq, (L, B, HKV, S), jnp.float32)) + .01
    vsc = jnp.abs(jax.random.normal(kv, (L, B, HKV, S), jnp.float32)) + .01

    for bk in (256, 512, 1024, 2048):
        for mxu in (False, True):
            def q8_pass(q, ks, vs, kss, vss, bk=bk, mxu=mxu):
                def layer(carry, li):
                    o = flash_decode_at_layer_q8(
                        carry.reshape(B, 1, HQ, D), ks, vs, kss, vss, li,
                        pos + 1, block_k=bk, mxu=mxu)
                    return carry + 1e-6 * o.reshape(carry.shape), None

                c, _ = jax.lax.scan(layer, q, jnp.arange(L))
                return c

            bench(lambda c, a, b, cc, d, f=q8_pass: f(c, a, b, cc, d),
                  (q, k8, v8, ksc, vsc),
                  label=f"q8   block_k={bk} mxu={int(mxu)}")


if __name__ == "__main__":
    main()
