"""Prefill MFU breakdown: where do the non-matmul milliseconds go?

r4 measured 29% MFU on a 4k-token Qwen3-0.6B prefill (metric counts
2*P*N flops over the 197 TFLOPs v5e peak).  The pure matmul chain at
~60% MXU efficiency would take ~31 ms; the measured step is ~90 ms.
This decomposes one 4096-token prefill:

  a. real prefill        model.backbone + cache writes (the engine path)
  b. no-attention        same layers, attention replaced by identity
  c. matmuls only        qkv/o/gateup/down chain, no norms/rope/cache
  d. attention only      28x flash_attention over the 4k block
  e. lm_head last-pos    the (1, H) @ (H, V) logits row

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_prefill_breakdown.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

P = 4096
DISPATCH = 4


def _force(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def bench(fn, args, label="", flops=None):
    run = jax.jit(fn)
    try:
        out = run(*args)
        _force(out)
        t0 = time.perf_counter()
        for _ in range(DISPATCH):
            out = run(*args)
        _force(out)
        dt = (time.perf_counter() - t0) / DISPATCH
        eff = f"{flops / dt / 197e12 * 100:5.1f}% MFU" if flops else ""
        print(f"{label:<28}{dt * 1e3:9.2f} ms  {eff}", flush=True)
        return dt
    except Exception as e:
        print(f"{label:<28}FAILED {type(e).__name__}: {e}", flush=True)
        return None


def main() -> None:
    from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model
    from aha_tpu.ops.attention import attention_prefill
    from aha_tpu.ops.norms import rms_norm

    print(f"# platform={jax.devices()[0].platform} P={P}", flush=True)
    cfg = Qwen3Config(vocab_size=151936, hidden_size=1024,
                      intermediate_size=3072, num_hidden_layers=28,
                      num_attention_heads=16, num_key_value_heads=8,
                      head_dim=128, tie_word_embeddings=True,
                      rope_theta=1000000.0)
    model = Qwen3Model(cfg, max_rope_len=8192)
    params = model.init_random(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    ids = jnp.asarray([[(i % 1000) + 1 for i in range(P)]], jnp.int32)
    L, H, NI = 28, 1024, 3072
    mm_flops = 2 * P * L * (H * 4096 + 2048 * H + H * 2 * NI + NI * H)
    attn_flops = 2 * 2 * P * P // 2 * 16 * 128 * L    # causal qk + pv
    head_flops = 2 * H * 151936

    # a. real prefill (backbone + advance + last-pos head)
    def full(params, ids):
        cache = model.init_cache(1, P, jnp.bfloat16)
        hidden, cache = model.backbone(params, ids, cache)
        return hidden[:, -1]

    bench(full, (params, ids), label="a. backbone(prefill)",
          flops=mm_flops + attn_flops)

    # b. layers without attention: replicate _layer math, attn = q-mean
    def no_attn(params, x):
        lyr = params["layers"]

        def body(c, xs):
            lp = xs
            h = rms_norm(c, lp["ln1"]["w"], cfg.rms_norm_eps)
            q = h @ lp["q"]["w"]
            k = h @ lp["k"]["w"]
            v = h @ lp["v"]["w"]
            attn = jnp.concatenate([q[..., :1024] * 0.5 + 0.5 * q[..., 1024:],
                                    k * 0.1 + v * 0.1], axis=-1)
            c = c + attn @ lp["o"]["w"]
            h = rms_norm(c, lp["ln2"]["w"], cfg.rms_norm_eps)
            g = h @ lp["mlp"]["gate"]["w"]
            u = h @ lp["mlp"]["up"]["w"]
            act = (g * jax.nn.sigmoid(g) * u).astype(jnp.bfloat16)
            c = c + act @ lp["mlp"]["down"]["w"]
            return c, None

        c, _ = jax.lax.scan(body, x, lyr)
        return c

    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, P, H), jnp.bfloat16)
    bench(no_attn, (params, x0), label="b. layers, no attention",
          flops=mm_flops)

    # c. matmuls only
    def mm_only(params, x):
        lyr = params["layers"]

        def body(c, lp):
            qkv = jnp.concatenate([c @ lp["q"]["w"], c @ lp["k"]["w"],
                                   c @ lp["v"]["w"]], -1)
            o = qkv[..., :2048] @ lp["o"]["w"]
            g = c @ lp["mlp"]["gate"]["w"]
            u = c @ lp["mlp"]["up"]["w"]
            d = (g * u).astype(jnp.bfloat16) @ lp["mlp"]["down"]["w"]
            return (o + d).astype(jnp.bfloat16), None

        c, _ = jax.lax.scan(body, x, lyr)
        return c

    bench(mm_only, (params, x0), label="c. matmuls only", flops=mm_flops)

    # d. attention only (flash prefill over the block)
    q = jax.random.normal(jax.random.PRNGKey(2), (1, P, 16, 128),
                          jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(3), (1, P, 8, 128),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(4), (1, P, 8, 128),
                          jnp.bfloat16)

    def attn_only(q, k, v):
        def body(c, _):
            o = attention_prefill(c, k, v, causal=True)
            return c + 1e-6 * o.astype(c.dtype), None

        c, _ = jax.lax.scan(body, q, None, length=28)
        return c

    bench(attn_only, (q, k, v), label="d. 28x flash attention",
          flops=attn_flops)

    # e. last-position lm_head
    h1 = jax.random.normal(jax.random.PRNGKey(5), (1, H), jnp.bfloat16)
    bench(lambda p, h: h @ p["lm_head"]["w"], (params, h1),
          label="e. lm_head (1 row)", flops=head_flops)


if __name__ == "__main__":
    main()
