"""Where does the engine lose time over the raw jitted step?

Back-to-back in ONE process (terminal drift makes cross-process numbers
incomparable):
  a. engine.generate_tokens        — the real streaming loop (block decode,
                                     depth-4 pipeline, host fetch per block)
  b. raw chained _decode_n         — same jitted fn the engine dispatches,
                                     called back-to-back with NO host
                                     streaming (fetch once at the end)
  c. profiler-style fused scan     — same math, no rng/ring plumbing

a/b gap = host pipeline loss; b/c gap = rng/ring/sampling plumbing cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_engine_gap.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _force(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[0]))


def main() -> None:
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig

    from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model

    cfg = Qwen3Config(
        vocab_size=151936, hidden_size=1024, intermediate_size=3072,
        num_hidden_layers=28, num_attention_heads=16, num_key_value_heads=8,
        head_dim=128, tie_word_embeddings=True, rope_theta=1000000.0)
    model = Qwen3Model(cfg, max_rope_len=8192)
    params = model.init_random(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    engine = TextEngine(model, params, eos_token_ids=[],
                        cache_dtype=jnp.bfloat16, max_seq_len=4096)
    s = SamplingConfig(temperature=None)
    prompt = [(i % 1000) + 1 for i in range(64)]
    n_tokens = 256
    print(f"# platform={jax.devices()[0].platform}", flush=True)

    # -- a. real engine loop -------------------------------------------------
    engine.generate_tokens(prompt, s, max_tokens=n_tokens)   # compile/warm
    for tag in ("a1", "a2"):
        engine.generate_tokens(prompt, s, max_tokens=n_tokens)
        t = engine.last_timing
        tps = (t.completion_tokens - 1) / t.completion_secs
        print(f"{tag}. engine.generate_tokens   {tps:8.1f} tok/s "
              f"({1e3 / tps:6.3f} ms/step)", flush=True)

    # -- b. raw chained _decode_n (same bucket the engine used: 512) ---------
    blk = engine.decode_block
    cache_len = 512
    win = TextEngine._live_window(64 + n_tokens, cache_len)
    fn = engine._get_decode_n(s, blk, win)
    n_disp = n_tokens // blk

    def run_raw():
        cache = engine.model.init_cache(1, cache_len, jnp.bfloat16)
        from aha_tpu.core import cache as kvmod
        cache = kvmod.advance(cache, 64)
        token = jnp.asarray(7, jnp.int32)
        key = jax.random.PRNGKey(0)
        ring = jnp.zeros((64,), jnp.int32)
        outs = []
        t0 = time.perf_counter()
        for i in range(n_disp):
            toks, cache, key, ring = fn(params, token, cache, key, ring,
                                        jnp.int32(1 + i * blk))
            token = toks[-1]
            outs.append(toks)
        _force(outs[-1])
        dt = time.perf_counter() - t0
        return n_disp * blk / dt

    run_raw()     # warm (window variant may need a compile)
    for tag in ("b1", "b2"):
        tps = run_raw()
        print(f"{tag}. raw chained _decode_n    {tps:8.1f} tok/s "
              f"({1e3 / tps:6.3f} ms/step)", flush=True)

    # -- c. fused scan without rng/ring plumbing ------------------------------
    from functools import partial

    from aha_tpu.core import cache as kvmod
    from aha_tpu.ops.attention import decode_window

    fused_params = engine.params    # engine applied fuse_decode_params

    @partial(jax.jit, donate_argnums=(1,))
    def plain_scan(p, carry):
        token, cache = carry

        def body(c, _):
            token, cache = c
            hidden, cache = model.backbone(p, jnp.reshape(token, (1, 1)),
                                           cache)
            cache = kvmod.advance(cache, 1)
            logits = model.logits(p, hidden)[:, 0].astype(jnp.float32)
            from aha_tpu.core.sampling import fast_argmax
            tok = fast_argmax(logits[0]).astype(jnp.int32)
            return (tok, cache), None

        carry, _ = jax.lax.scan(body, (token, cache), None, length=blk)
        return carry

    def run_scan():
        cache = kvmod.advance(model.init_cache(1, cache_len, jnp.bfloat16),
                              64)
        carry = (jnp.asarray(7, jnp.int32), cache)
        with decode_window(win) if win else _null():
            carry = plain_scan(fused_params, carry)
            _force(carry)
            t0 = time.perf_counter()
            for _ in range(n_disp):
                carry = plain_scan(fused_params, carry)
            _force(carry)
        dt = time.perf_counter() - t0
        return n_disp * blk / dt

    import contextlib

    def _null():
        return contextlib.nullcontext()

    run_scan()
    for tag in ("c1", "c2"):
        tps = run_scan()
        print(f"{tag}. fused scan (no plumbing) {tps:8.1f} tok/s "
              f"({1e3 / tps:6.3f} ms/step)", flush=True)

    # -- a again to bracket drift ---------------------------------------------
    engine.generate_tokens(prompt, s, max_tokens=n_tokens)
    t = engine.last_timing
    tps = (t.completion_tokens - 1) / t.completion_secs
    print(f"a3. engine.generate_tokens   {tps:8.1f} tok/s "
          f"({1e3 / tps:6.3f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
