"""Short-window decode attention: Pallas kernel vs XLA slice+sdpa.

The r5 decode-step breakdown puts attention at 0.276 ms/step (bf16,
pos 64, live-window kernel) — ~10 us per layer where the window's DMA
bytes are ~1.4 us.  The fixed cost is the Pallas launch (grid setup +
semaphores), not the read.  At small static windows the cache slice a
plain XLA path needs is ~0.5 MB, so slice+sdpa may be cheaper until the
window is deep enough to amortize the kernel.

This measures one full 28-layer attention pass (scan over layers, chained
so XLA cannot elide steps), per window, for:
  a. flash_decode_at_layer_flat  (the current kernel path)
  b. XLA dynamic_slice + masked sdpa over the static window
  c. same, q8 cache (attention_decode_at_q8 vs XLA dequant slice+sdpa)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_attn_short.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

L, B, S, HQ, HKV, D = 28, 1, 4096, 16, 8, 128
STEPS = 16
DISPATCH = 6


def _force(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def bench(fn, *args, label=""):
    @jax.jit
    def run(q, *rest):
        def body(c, _):
            o = fn(c, *rest)
            # feed output back into q so steps chain
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
        print(f"{label:<52}{dt * 1e6:9.1f} us/pass "
              f"({dt * 1e6 / L:5.2f} us/layer)", flush=True)
        return dt
    except Exception as e:
        print(f"{label:<52}FAILED {type(e).__name__}: {e}", flush=True)
        return None


def main() -> None:
    print(f"# platform={jax.devices()[0].platform}", flush=True)
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, 1, HQ, D), jnp.bfloat16)
    k_stack = jax.random.normal(kk, (L, B, S, HKV * D), jnp.bfloat16)
    v_stack = jax.random.normal(kv, (L, B, S, HKV * D), jnp.bfloat16)
    pos = jnp.asarray(63, jnp.int32)

    from aha_tpu.ops.attention import sdpa
    from aha_tpu.ops.flash_attention import flash_decode_at_layer_flat

    for win in (256, 512, 1024, 2048):
        def pallas_pass(q, ks, vs):
            def layer(carry, li):
                o = flash_decode_at_layer_flat(
                    carry.reshape(B, 1, HQ, D), ks, vs, li, pos + 1,
                    block_k=256, static_max_len=win)
                return carry + 1e-6 * o.reshape(carry.shape), None

            c, _ = jax.lax.scan(layer, q, jnp.arange(L))
            return c

        def xla_pass(q, ks, vs):
            def layer(carry, li):
                kw = jax.lax.dynamic_slice(
                    ks, (li, 0, 0, 0), (1, B, win, HKV * D))
                vw = jax.lax.dynamic_slice(
                    vs, (li, 0, 0, 0), (1, B, win, HKV * D))
                kw = kw.reshape(B, win, HKV, D)
                vw = vw.reshape(B, win, HKV, D)
                mask = jnp.where(jnp.arange(win)[None, :] <= pos, 0.0,
                                 jnp.finfo(jnp.float32).min)[None, None]
                o = sdpa(carry.reshape(B, 1, HQ, D), kw, vw, mask)
                return carry + 1e-6 * o.reshape(carry.shape), None

            c, _ = jax.lax.scan(layer, q, jnp.arange(L))
            return c

        bench(lambda c, ks, vs, f=pallas_pass: f(c, ks, vs),
              q, k_stack, v_stack, label=f"a. pallas win={win}")
        bench(lambda c, ks, vs, f=xla_pass: f(c, ks, vs),
              q, k_stack, v_stack, label=f"b. xla slice+sdpa win={win}")

    # q8 cache variant
    from aha_tpu.ops.attention import attention_decode_at_q8
    k8 = jax.random.randint(kk, (L, B, S, HKV * D), -127, 127, jnp.int8)
    v8 = jax.random.randint(kv, (L, B, S, HKV * D), -127, 127, jnp.int8)
    ksc = jnp.abs(jax.random.normal(kq, (L, B, HKV, S), jnp.float32)) + 0.01
    vsc = jnp.abs(jax.random.normal(kv, (L, B, HKV, S), jnp.float32)) + 0.01

    for win in (256, 512, 1024):
        def q8_pallas(q, ks, vs, kscale, vscale):
            from aha_tpu.ops import attention as A
            with A.decode_window(win):
                def layer(carry, li):
                    o = attention_decode_at_q8(
                        carry.reshape(B, 1, HQ, D), ks, vs, kscale, vscale,
                        li, pos)
                    return carry + 1e-6 * o.reshape(carry.shape), None

                c, _ = jax.lax.scan(layer, q, jnp.arange(L))
                return c

        def q8_xla(q, ks, vs, kscale, vscale):
            def layer(carry, li):
                kw = jax.lax.dynamic_slice(
                    ks, (li, 0, 0, 0), (1, B, win, HKV * D)).astype(jnp.float32)
                vw = jax.lax.dynamic_slice(
                    vs, (li, 0, 0, 0), (1, B, win, HKV * D)).astype(jnp.float32)
                ksw = jax.lax.dynamic_slice(
                    kscale, (li, 0, 0, 0), (1, B, HKV, win))
                vsw = jax.lax.dynamic_slice(
                    vscale, (li, 0, 0, 0), (1, B, HKV, win))
                kw = (kw.reshape(B, win, HKV, D)
                      * ksw.reshape(B, HKV, win).transpose(0, 2, 1)[..., None])
                vw = (vw.reshape(B, win, HKV, D)
                      * vsw.reshape(B, HKV, win).transpose(0, 2, 1)[..., None])
                mask = jnp.where(jnp.arange(win)[None, :] <= pos, 0.0,
                                 jnp.finfo(jnp.float32).min)[None, None]
                o = sdpa(carry.reshape(B, 1, HQ, D),
                         kw.astype(jnp.bfloat16), vw.astype(jnp.bfloat16),
                         mask)
                return carry + 1e-6 * o.reshape(carry.shape), None

            c, _ = jax.lax.scan(layer, q, jnp.arange(L))
            return c

        bench(lambda c, a1, a2, a3, a4, f=q8_pallas: f(c, a1, a2, a3, a4),
              q, k8, v8, ksc, vsc, label=f"c. q8 pallas win={win}")
        bench(lambda c, a1, a2, a3, a4, f=q8_xla: f(c, a1, a2, a3, a4),
              q, k8, v8, ksc, vsc, label=f"d. q8 xla slice+sdpa win={win}")


if __name__ == "__main__":
    main()
