"""Benchmarks on one TPU chip, at real model geometries with random weights
(throughput/latency are weight-value independent).

Prints ONE JSON line.  Primary metric: Qwen3-0.6B batch-1 decode tokens/s
(baseline: the reference's published 40-50 tok/s on an M1 Pro,
docs/supported-models.md:147-156; midpoint 45; BASELINE.json target ≥3×).
The `extra` list carries the other BASELINE.json metrics:
  - aggregate decode tok/s with 8 concurrent requests (continuous batching;
    the reference serializes requests behind a write lock)
  - qwen3_asr RTFx on 30 s of audio (target ≥50)
  - Qwen2.5-VL-3B prefill p50 TTFT (tracked)
  - Qwen3-0.6B decode tok/s at a 16k cache (long-context; Pallas
    dynamic-length decode kernel vs the reference's full-bucket reads)
"""

from __future__ import annotations

import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_TPS = 45.0


def _qwen3_06b():
    from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model

    cfg = Qwen3Config(
        vocab_size=151936, hidden_size=1024, intermediate_size=3072,
        num_hidden_layers=28, num_attention_heads=16, num_key_value_heads=8,
        head_dim=128, tie_word_embeddings=True, rope_theta=1000000.0)
    return Qwen3Config, Qwen3Model, cfg


def bench_decode(long_context: bool = False, kv_int8: bool = False) -> float:
    """Batch-1 decode tokens/s; `long_context` measures at a ~15k-deep cache
    (16384 bucket) instead of a 64-token prompt; `kv_int8` stores the cache
    int8 with per-row scales (halved cache bandwidth)."""
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.utils.device import get_dtype

    _, Qwen3Model, cfg = _qwen3_06b()
    model = Qwen3Model(cfg, max_rope_len=32768 if long_context else 8192)
    params = model.init_random(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    engine = TextEngine(model, params, eos_token_ids=[],
                        cache_dtype=jnp.int8 if kv_int8 else get_dtype(),
                        max_seq_len=32768 if long_context else 4096)
    s = SamplingConfig(temperature=None)  # greedy
    plen = 15000 if long_context else 64
    prompt = [(i % 1000) + 1 for i in range(plen)]
    n_tokens = 256
    engine.generate_tokens(prompt, s, max_tokens=n_tokens)  # compile/warmup

    def once():
        engine.generate_tokens(prompt, s, max_tokens=n_tokens)
        t = engine.last_timing
        return (t.completion_tokens - 1) / t.completion_secs

    return max(once(), once())   # best-of-2: tunnel latency varies


def bench_batched_decode(slots: int = 8) -> float:
    """Aggregate decode tokens/s with `slots` concurrent requests on the
    continuous-batching engine (batch-1 decode is weight-bandwidth-bound, so
    stepping B slots together multiplies serving throughput ~B×; the
    reference serializes requests, api.rs:31)."""
    import threading

    from aha_tpu.core.batch_engine import BatchEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.utils.device import get_dtype

    _, Qwen3Model, cfg = _qwen3_06b()
    model = Qwen3Model(cfg, max_rope_len=8192)
    params = model.init_random(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    be = BatchEngine(model, params, eos_token_ids=[], slots=slots,
                     cache_dtype=get_dtype(), max_seq_len=2048)
    s = SamplingConfig(temperature=None)
    n_tokens = 256

    def run_all():
        done = [0] * slots

        def one(i):
            prompt = [(i * 131 + j) % 1000 + 1 for j in range(64)]
            done[i] = len(be.generate_tokens(prompt, s, max_tokens=n_tokens))

        ts = [threading.Thread(target=one, args=(i,)) for i in range(slots)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        return sum(done), time.perf_counter() - t0

    run_all()                               # compile/warmup
    best = 0.0
    for _ in range(2):                      # best-of-2: tunnel latency varies
        total, wall = run_all()
        best = max(best, total / wall)
    be.shutdown()
    return best


def bench_asr_rtfx(audio_secs: float = 30.0) -> float:
    """Qwen3-ASR-0.6B geometry: device-side mel + encoder + thinker decode.
    RTFx = seconds of audio per second of wall clock (target ≥50)."""
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.models.qwen3_asr import (Qwen3ASRAudioConfig, Qwen3ASRConfig,
                                          Qwen3ASRModel,
                                          get_feat_extract_output_lengths)
    from aha_tpu.ops.audio_feats import whisper_log_mel
    from aha_tpu.utils.device import get_dtype

    _, _, text_cfg = _qwen3_06b()
    cfg = Qwen3ASRConfig(audio=Qwen3ASRAudioConfig(), text=text_cfg)
    model = Qwen3ASRModel(cfg)
    params = model.init_random(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)

    sr = 16000
    wav = np.random.default_rng(0).standard_normal(
        int(sr * audio_secs)).astype(np.float32) * 0.05
    n_frames = int(audio_secs * 100)        # whisper hop 160 @ 16 kHz
    n_frames -= n_frames % 100              # encoder chunk = 100 frames
    n_out = int(get_feat_extract_output_lengths(n_frames))
    ids = [1, 2, 3] + [cfg.audio_token_id] * n_out + [4, 5]

    # transcription is consumed whole (non-streaming endpoint): block
    # decode (one dispatch per 16 tokens) beats per-token dispatch through
    # the host link, which otherwise dominates the sub-second wall clock
    engine = TextEngine(model, params, eos_token_ids=[],
                        cache_dtype=get_dtype(), max_seq_len=1024,
                        decode_block=16)
    s = SamplingConfig(temperature=None)
    max_new = 80                            # ~transcript length for 30 s

    def run():
        mel = whisper_log_mel(jnp.asarray(wav)[None])[:, :, :n_frames]
        mm = {"mel": mel.astype(jnp.bfloat16), "n_out": jnp.int32(n_out)}
        engine.generate_tokens(ids, s, max_tokens=max_new, mm=mm)

    run()                                   # compile/warmup

    def once():
        t0 = time.perf_counter()
        run()
        return audio_secs / (time.perf_counter() - t0)

    return max(once(), once())   # best-of-2: tunnel latency varies


def bench_vlm_ttft(runs: int = 5) -> float:
    """Qwen2.5-VL-3B geometry: p50 time-to-first-token for one 1036×1036
    image + short text prompt (vision encode + prefill + first sample)."""
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.models.llama import LlamaConfig
    from aha_tpu.models.qwen2_5vl import (Qwen2_5VLConfig, Qwen2_5VLModel,
                                          VisionConfig, get_rope_index,
                                          vision_geometry)
    from aha_tpu.utils.device import get_dtype

    cfg = Qwen2_5VLConfig(
        vision=VisionConfig(),              # defaults = 2.5-VL-3B tower
        text=LlamaConfig(
            vocab_size=151936, hidden_size=2048, intermediate_size=11008,
            num_hidden_layers=36, num_attention_heads=16,
            num_key_value_heads=2, head_dim=128, rope_theta=1000000.0,
            max_position_embeddings=32768, tie_word_embeddings=True,
            qkv_bias=True))
    model = Qwen2_5VLModel(cfg, max_rope_len=4096)
    params = model.init_random(jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    grid = (1, 74, 74)                      # 1036×1036 px
    n_units = grid[1] // 2 * (grid[2] // 2)
    ids = ([10, 11, cfg.vision_start_token_id]
           + [cfg.image_token_id] * n_units + [12, 13, 14])
    n_patches = grid[0] * grid[1] * grid[2]
    patches = np.random.default_rng(1).standard_normal(
        (n_patches, 3 * 2 * 14 * 14)).astype(np.float32)
    geo = vision_geometry([grid], cfg.vision)
    pos, delta = get_rope_index(ids, [grid], cfg)
    pos = np.asarray(pos)
    from aha_tpu.core.engine import bucket_for
    blen = bucket_for(len(ids))
    if blen > pos.shape[1]:     # engine pads the prompt to its bucket
        cont = pos.max() + 1 + np.arange(blen - pos.shape[1])
        pos = np.concatenate(
            [pos, np.broadcast_to(cont, (3, blen - pos.shape[1]))], axis=1)
    mm = {"patches": jnp.asarray(patches, jnp.bfloat16),
          **{k: jnp.asarray(v) for k, v in geo.items()},
          "position_ids": jnp.asarray(pos), "rope_delta": jnp.int32(delta)}

    engine = TextEngine(model, params, eos_token_ids=[],
                        cache_dtype=get_dtype(), max_seq_len=4096)
    s = SamplingConfig(temperature=None)

    engine.generate_tokens(ids, s, max_tokens=1, mm=mm)  # compile/warmup
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        engine.generate_tokens(ids, s, max_tokens=1, mm=mm)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    result = {}
    extra = []

    decode_tps = bench_decode()
    result = {
        "metric": "qwen3_0.6b_decode_tokens_per_sec_per_chip",
        "value": round(decode_tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(decode_tps / BASELINE_TPS, 3),
    }

    for name, unit, fn, target in (
            ("qwen3_0.6b_batched_decode_agg_tps_8slots", "tokens/s",
             bench_batched_decode, None),
            ("qwen3_0.6b_decode_tps_16k_cache", "tokens/s",
             lambda: bench_decode(long_context=True), None),
            ("qwen3_0.6b_decode_tps_16k_cache_kv_int8", "tokens/s",
             lambda: bench_decode(long_context=True, kv_int8=True), None),
            ("qwen3_asr_0.6b_rtfx_30s", "x_realtime", bench_asr_rtfx, 50.0),
            ("qwen2.5vl_3b_prefill_p50_ttft", "s", bench_vlm_ttft, None)):
        try:
            v = fn()
            entry = {"metric": name, "value": round(float(v), 4),
                     "unit": unit}
            if target is not None:
                entry["vs_target"] = round(float(v) / target, 3)
            extra.append(entry)
        except Exception:
            extra.append({"metric": name, "error":
                          traceback.format_exc(limit=1).splitlines()[-1]})
    result["extra"] = extra
    print(json.dumps(result))


if __name__ == "__main__":
    main()
