"""Per-component breakdown of the Qwen3-0.6B batch-1 decode step.

The headline decode runs at ~2.3 ms/step against a ~1.47 ms weight-streaming
roofline; this script decomposes one step into its pieces, each timed the
same way the engine runs it (jitted lax.scan over N_STEPS iterations,
pipelined dispatches, device->host fetch to close the timing — a bare
block_until_ready does not wait for compute on the tunneled runtime):

  full        backbone + advance + lm_head + greedy sample (the real step)
  backbone    decoder stack + cache writes + advance (no head, no sample)
  attn        28x attention_decode_at kernel reads only
  matmuls     28x the fused projection/MLP matmuls only (qkv|o|gateup|down)
  lm_head     logits projection only (the 311 MB bf16 vocab head)
  sample      greedy argmax over 151936 logits only
  stream      tree-sum of every decode weight: achievable HBM read bandwidth

residual(backbone) = backbone - attn - matmuls ~= norms + rope + embed +
cache writes + scan plumbing.  Run with --q8 to profile the block-quantized
(GGUF Q8_0 grid) model through the same lens.

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_decode.py
  ... --q8      # quantized decoder + head
  ... --steps 32 --dispatches 8
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_LAYERS = 28


def _force(x) -> None:
    """Device->host fetch of one leaf — the only reliable completion fence
    through the tunneled runtime."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf if leaf.ndim == 0 else leaf.ravel()[0]))


def _time_chain(fn, carry, n_dispatch: int, label: str = "",
                per_step: int = 1) -> float:
    """Time fn called n_dispatch times, carry chained (donation-friendly).
    Returns seconds per call."""
    carry = fn(carry)           # compile + warm
    _force(carry)
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        carry = fn(carry)
    _force(carry)
    dt = (time.perf_counter() - t0) / n_dispatch
    if label:
        print(f"{label:<12}{dt / per_step * 1e3:9.3f} ms", flush=True)
    return dt


def build(q8: bool):
    from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model, \
        fuse_decode_params

    cfg = Qwen3Config(
        vocab_size=151936, hidden_size=1024, intermediate_size=3072,
        num_hidden_layers=N_LAYERS, num_attention_heads=16,
        num_key_value_heads=8, head_dim=128, tie_word_embeddings=True,
        rope_theta=1000000.0)
    model = Qwen3Model(cfg, max_rope_len=8192)
    params = model.init_random(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if q8:
        from aha_tpu.ops.quant_matmul import pack_q8_rows

        def quantize(tree):
            out = {}
            for name, p in tree.items():
                if isinstance(p, dict) and "w" in p and p["w"].ndim == 3:
                    ws = np.asarray(p["w"].astype(jnp.float32))
                    packed = [pack_q8_rows(w.T) for w in ws]
                    out[name] = {
                        "qt": jnp.stack([jnp.asarray(x["qt"])
                                         for x in packed]),
                        "st": jnp.stack([jnp.asarray(x["st"])
                                         for x in packed])}
                elif isinstance(p, dict):
                    out[name] = quantize(p)
                else:
                    out[name] = p
            return out

        params["layers"] = quantize(params["layers"])
        head_w = np.asarray(params["lm_head"]["w"].astype(jnp.float32)).T
        ph = pack_q8_rows(head_w)
        params["lm_head"] = {"qt": jnp.asarray(ph["qt"]),
                             "st": jnp.asarray(ph["st"])}
    params = fuse_decode_params(params)
    return model, params


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--q8", action="store_true")
    ap.add_argument("--steps", type=int, default=32,
                    help="scan length per dispatch")
    ap.add_argument("--dispatches", type=int, default=8)
    ap.add_argument("--bucket", type=int, default=4096)
    ap.add_argument("--pos", type=int, default=64,
                    help="live cache depth during the steps")
    ap.add_argument("--only", type=str, default="",
                    help="comma list of components to run (default all)")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    from aha_tpu.core import cache as kv
    from aha_tpu.core import nn
    from aha_tpu.ops.attention import attention_decode_at

    model, params = build(args.q8)
    N = args.steps
    D = args.dispatches
    print(f"# platform={jax.devices()[0].platform} q8={args.q8} "
          f"steps/dispatch={N} dispatches={D} bucket={args.bucket} "
          f"pos={args.pos}")

    def fresh_cache():
        c = model.init_cache(1, args.bucket, jnp.bfloat16)
        return kv.advance(c, args.pos)

    results: dict[str, float] = {}

    # -- full step (backbone + advance + head + greedy sample) -------------
    @partial(jax.jit, donate_argnums=(1,))
    def full(params, carry):
        token, cache = carry

        def body(c, _):
            token, cache = c
            hidden, cache = model.backbone(params,
                                           jnp.reshape(token, (1, 1)), cache)
            cache = kv.advance(cache, 1)
            logits = model.logits(params, hidden)[:, 0].astype(jnp.float32)
            tok = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
            return (tok, cache), None

        carry, _ = jax.lax.scan(body, (token, cache), None, length=N)
        return carry

    if want("full"):
        carry = (jnp.asarray(7, jnp.int32), fresh_cache())
        results["full"] = _time_chain(lambda c: full(params, c), carry, D,
                                      "full", N) / N

    # -- backbone only ------------------------------------------------------
    @partial(jax.jit, donate_argnums=(1,))
    def backbone(params, carry):
        acc, cache = carry

        def body(c, _):
            acc, cache = c
            tok = (acc.astype(jnp.int32) % 1000) + 1   # data-dependent token
            hidden, cache = model.backbone(params,
                                           jnp.reshape(tok, (1, 1)), cache)
            cache = kv.advance(cache, 1)
            return (jnp.sum(hidden).astype(jnp.float32), cache), None

        carry, _ = jax.lax.scan(body, (acc, cache), None, length=N)
        return carry

    if want("backbone"):
        carry = (jnp.asarray(0.0, jnp.float32), fresh_cache())
        results["backbone"] = _time_chain(lambda c: backbone(params, c),
                                          carry, D, "backbone", N) / N

    # -- attention kernels only ----------------------------------------------
    cache = fresh_cache()

    @jax.jit
    def attn(kc, vc, pos, q0):
        def step(q, _):
            def layer(q, li):
                return attention_decode_at(q, kc, vc, li, pos), None

            q, _ = jax.lax.scan(layer, q, jnp.arange(N_LAYERS))
            return q, None

        q, _ = jax.lax.scan(step, q0, None, length=N)
        return q

    if want("attn"):
        q0 = jnp.ones((1, 1, 16, 128), jnp.bfloat16) * 0.01
        results["attn"] = _time_chain(
            lambda q: attn(cache["k"], cache["v"], cache["pos"], q), q0, D,
            "attn", N) / N

    # -- projection/MLP matmuls only -----------------------------------------
    layers = params["layers"]

    @jax.jit
    def matmuls(layers, x0):
        def step(x, _):
            def layer(x, lp):
                if "qkv" in lp:
                    qkv = nn.linear(lp["qkv"], x)
                    o = nn.linear(lp["o"], qkv[..., :2048])
                    gu = nn.linear(lp["mlp"]["gateup"], x)
                    dn = nn.linear(lp["mlp"]["down"], gu[..., :3072])
                else:   # unfused fallback (AHA_FUSE_DECODE=0 layouts)
                    q = nn.linear(lp["q"], x)
                    k = nn.linear(lp["k"], x)
                    v = nn.linear(lp["v"], x)
                    o = nn.linear(lp["o"], q) + jnp.sum(k + v) * 0
                    g = nn.linear(lp["mlp"]["gate"], x)
                    u = nn.linear(lp["mlp"]["up"], x)
                    dn = nn.linear(lp["mlp"]["down"], g * u)
                return x + o + dn, None

            x, _ = jax.lax.scan(layer, x, layers)
            return x, None

        x, _ = jax.lax.scan(step, x0, None, length=N)
        return x

    if want("matmuls"):
        x0 = jnp.ones((1, 1, 1024), jnp.bfloat16) * 0.01
        results["matmuls"] = _time_chain(lambda x: matmuls(layers, x), x0, D,
                                         "matmuls", N) / N

    # -- lm_head only ---------------------------------------------------------
    @jax.jit
    def lm_head(params, h0):
        def body(h, _):
            lg = model.logits(params, h)
            return h + lg[..., :1024].astype(h.dtype) * 1e-9, None

        h, _ = jax.lax.scan(body, h0, None, length=N)
        return h

    if want("lm_head"):
        h0 = jnp.ones((1, 1, 1024), jnp.bfloat16) * 0.01
        results["lm_head"] = _time_chain(lambda h: lm_head(params, h), h0, D,
                                         "lm_head", N) / N

    # -- greedy sample only ---------------------------------------------------
    @jax.jit
    def sample(lg0):
        def body(lg, _):
            tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)
            return lg.at[tok % 1024].add(1e-6), None

        lg, _ = jax.lax.scan(body, lg0, None, length=N)
        return lg

    if want("sample"):
        lg0 = jnp.zeros((151936,), jnp.float32)
        results["sample"] = _time_chain(sample, lg0, D, "sample", N) / N

    # -- achievable weight-stream bandwidth -----------------------------------
    leaves = [x for x in jax.tree.leaves(params)
              if hasattr(x, "size") and x.size > 1024]
    n_bytes = sum(x.size * x.dtype.itemsize for x in leaves)

    @jax.jit
    def stream(seed, *leaves):
        acc = seed
        for leaf in leaves:
            acc = acc + jnp.sum(leaf).astype(jnp.float32)
        return acc

    if want("stream"):
        sec = _time_chain(lambda s: stream(s, *leaves),
                          jnp.asarray(0.0, jnp.float32), D, "stream", 1)
        results["stream"] = sec

    # -- report ---------------------------------------------------------------
    if only is not None:
        return
    full_ms = results["full"] * 1e3
    print(f"\n{'component':<12}{'ms/step':>9}{'% of full':>11}")
    for name in ("full", "backbone", "attn", "matmuls", "lm_head", "sample"):
        ms = results[name] * 1e3
        print(f"{name:<12}{ms:9.3f}{100 * ms / full_ms:10.1f}%")
    resid_bb = (results["backbone"] - results["attn"]
                - results["matmuls"]) * 1e3
    resid_full = (results["full"] - results["backbone"] - results["lm_head"]
                  - results["sample"]) * 1e3
    print(f"{'resid(bb)':<12}{resid_bb:9.3f}   norms/rope/embed/cache-writes")
    print(f"{'resid(full)':<12}{resid_full:9.3f}   scan/step plumbing")
    bw = n_bytes / results["stream"] / 1e9
    print(f"\nweights: {n_bytes / 1e6:.0f} MB; tree-sum stream "
          f"{results['stream'] * 1e3:.3f} ms -> {bw:.0f} GB/s achievable")
    print(f"roofline@stream-bw: {n_bytes / bw / 1e6:.3f} ms/step "
          f"({bw * 1e9 / n_bytes:.0f} tok/s)")
    print(f"measured full: {full_ms:.3f} ms/step "
          f"({1e3 / full_ms:.0f} tok/s)")


if __name__ == "__main__":
    main()
