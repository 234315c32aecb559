"""Sweep flash_attention block sizes + variants at the prefill geometry.

The 4k-token Qwen3-0.6B prefill runs at ~29% MFU; the flash kernel is
~2.33 ms/layer at S=4096 (16 q-heads, D=128) where the VPU floor (exp +
elementwise passes over S^2/2 scores) is ~0.6 ms.  Sweep block sizes and
a folded-scale variant to find the knee.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_flash_prefill.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

S, Hq, Hkv, D = 4096, 16, 8, 128


def _force(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def bench(fn, args, n=8, label=""):
    try:
        out = fn(*args)
        _force(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _force(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{label:<40}{dt * 1e3:9.3f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{label:<40}FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None


def main():
    from aha_tpu.ops.flash_attention import flash_attention

    print(f"# platform={jax.devices()[0].platform} S={S} Hq={Hq} D={D}",
          flush=True)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, S, Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, S, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, S, Hkv, D)), jnp.bfloat16)

    for bq, bk in ((512, 512), (1024, 512), (512, 1024), (1024, 1024),
                   (2048, 512), (256, 512), (2048, 1024)):
        f = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention(
            q, k, v, causal=True, block_q=bq, block_k=bk))
        bench(f, (q, k, v), label=f"flash bq={bq} bk={bk}")

    # XLA sdpa reference at this geometry
    from aha_tpu.ops.attention import causal_mask, sdpa

    f_sdpa = jax.jit(lambda q, k, v: sdpa(q, k, v, causal_mask(S, S)))
    bench(f_sdpa, (q, k, v), label="XLA sdpa")


if __name__ == "__main__":
    main()
