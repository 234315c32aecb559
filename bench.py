"""Benchmark: Qwen3-0.6B-geometry batch-1 decode throughput on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published Qwen3-0.6B CPU decode speed, 40-50 tok/s
on an M1 Pro (docs/supported-models.md:147-156) — we use the 45 midpoint.
BASELINE.json target: ≥3× that on one v5e chip.

Weights are random-init at the exact Qwen3-0.6B geometry (decode throughput
is weight-value independent).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_TPS = 45.0


def main() -> None:
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model
    from aha_tpu.utils.device import get_dtype

    dtype = get_dtype()
    # real Qwen3-0.6B geometry (hf config.json)
    cfg = Qwen3Config(
        vocab_size=151936, hidden_size=1024, intermediate_size=3072,
        num_hidden_layers=28, num_attention_heads=16, num_key_value_heads=8,
        head_dim=128, tie_word_embeddings=True, rope_theta=1000000.0)
    model = Qwen3Model(cfg, max_rope_len=8192)
    params = jax.tree.map(lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
                          model.init_random(jax.random.PRNGKey(0), dtype=jnp.bfloat16))

    engine = TextEngine(model, params, eos_token_ids=[], cache_dtype=dtype,
                        max_seq_len=4096)
    cfg_s = SamplingConfig(temperature=None)  # greedy decode
    prompt = list(range(1, 65))

    n_tokens = 256
    # warmup: compile prefill + decode for the exact buckets measured below
    engine.generate_tokens(prompt, cfg_s, max_tokens=n_tokens)

    t0 = time.perf_counter()
    out = engine.generate_tokens(prompt, cfg_s, max_tokens=n_tokens)
    dt = time.perf_counter() - t0
    t = engine.last_timing
    tps = t.completion_tokens / (t.prompt_secs + t.completion_secs) if dt else 0.0
    decode_tps = ((t.completion_tokens - 1) / t.completion_secs
                  if t.completion_secs > 0 else tps)

    print(json.dumps({
        "metric": "qwen3_0.6b_decode_tokens_per_sec_per_chip",
        "value": round(decode_tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(decode_tps / BASELINE_TPS, 3),
    }))


if __name__ == "__main__":
    main()
