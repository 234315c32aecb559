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


def bench_decode(long_context=False, kv_int8: bool = False) -> float:
    """Batch-1 decode tokens/s; `long_context` measures at a ~15k-deep cache
    (16384 bucket, "64k" for a ~60k-deep 65536 bucket, or "128k" for a
    ~120k-deep 131072 bucket) instead of a 64-token prompt; `kv_int8`
    stores the cache int8 with per-row scales (halved cache bandwidth —
    and the only way the 128k bucket fits a 16 GB chip)."""
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.utils.device import get_dtype

    _, Qwen3Model, cfg = _qwen3_06b()
    max_len = {False: 4096, True: 32768, "64k": 65536,
               "128k": 131072}[long_context]
    model = Qwen3Model(cfg, max_rope_len=max(max_len, 8192))
    params = model.init_random(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    engine = TextEngine(model, params, eos_token_ids=[],
                        cache_dtype=jnp.int8 if kv_int8 else get_dtype(),
                        max_seq_len=max_len)
    s = SamplingConfig(temperature=None)  # greedy
    plen = {False: 64, True: 15000, "64k": 60000,
            "128k": 120000}[long_context]
    prompt = [(i % 1000) + 1 for i in range(plen)]
    n_tokens = 256
    engine.generate_tokens(prompt, s, max_tokens=n_tokens)  # compile/warmup

    def once():
        engine.generate_tokens(prompt, s, max_tokens=n_tokens)
        t = engine.last_timing
        return (t.completion_tokens - 1) / t.completion_secs

    return max(once(), once())   # best-of-2: tunnel latency varies


def bench_prefill(plen: int = 4096) -> dict:
    """Dense prefill device throughput: Qwen3-0.6B, `plen`-token prompts
    through the engine's jitted prefill fn → prompt tokens/s and MFU.

    Measurement: CHAINED slope timing (BENCH_NOTES r5 methodology) — each
    prefill call consumes the previous call's returned cache, so the device
    executes the chain serially; timing two chain lengths and taking the
    slope cancels the tunnel's dispatch/fetch round trip (~25 ms), which
    is latency (covered by the TTFT metrics), not prefill efficiency.

    MFU counts the model's real prefill flops — 2·P·(backbone matmul
    params) + causal attention 2·2·Hq·D·P²/2·L + the last-row lm_head —
    over the 197 TFLOPs bf16 peak, not the 2·N·P training approximation
    (which charges the 156M-param tied embedding/head as if every token
    paid it and ignores attention entirely)."""
    from aha_tpu.core.engine import TextEngine, bucket_for, CACHE_BUCKETS
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.utils.device import get_dtype

    _, Qwen3Model, cfg = _qwen3_06b()
    model = Qwen3Model(cfg, max_rope_len=8192)
    params = model.init_random(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    engine = TextEngine(model, params, eos_token_ids=[],
                        cache_dtype=get_dtype(), max_seq_len=8192)
    s = SamplingConfig(temperature=None)
    prompt = [(i % 1000) + 1 for i in range(plen)]
    engine.generate_tokens(prompt, s, max_tokens=1)   # compile/warmup

    cache_len = bucket_for(plen + 1, CACHE_BUCKETS)
    tokens = np.zeros((1, plen), np.int32)
    tokens[0, :] = prompt
    tok = jnp.asarray(tokens)
    n = jnp.int32(plen)

    def chain(iters: int) -> float:
        cache = engine._take_cache(cache_len)
        logits = None
        t0 = time.perf_counter()
        for _ in range(iters):
            # pos reset keeps cache writes in-bounds; k/v arrays still
            # carry the serializing data dependency between calls
            cache = {**cache, "pos": jnp.int32(0)}
            logits, cache = engine._prefill(engine.params, tok, cache, n)
        np.asarray(jax.device_get(logits[0, :8]))   # close the chain
        return time.perf_counter() - t0

    chain(1)                                        # warm the direct path
    best = None
    for _ in range(3):
        dt = (chain(6) - chain(2)) / 4
        best = dt if best is None else min(best, dt)

    c = cfg
    mm_params = c.num_hidden_layers * c.hidden_size * (
        (c.num_attention_heads + 2 * c.num_key_value_heads) * c.head_dim   # qkv
        + c.num_attention_heads * c.head_dim                                # o
        + 3 * c.intermediate_size)                                          # mlp
    attn_flops = (2 * 2 * c.num_attention_heads * c.head_dim
                  * plen * plen // 2 * c.num_hidden_layers)
    flops = 2 * plen * mm_params + attn_flops + 2 * c.hidden_size * c.vocab_size
    return {"tps": plen / best, "mfu_pct": 100.0 * flops / (best * 197e12)}


_PREFILL_CACHE: dict = {}


def _prefill_cached(key: str) -> float:
    if not _PREFILL_CACHE:
        _PREFILL_CACHE.update(bench_prefill())
    return _PREFILL_CACHE[key]


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


def bench_chunked_prefill_under_load(slots: int = 8,
                                     plen: int = 2048) -> float:
    """p50 TTFT for a `plen`-token prompt admitted by CHUNKED prefill
    (512-token chunks interleaved with live decode dispatches) while
    `slots`-1 other requests decode continuously — the serving story the
    single-request TTFT metrics don't cover: a long prompt must not stall
    the running streams, and the running streams must not starve the
    admission."""
    import threading

    from aha_tpu.core.batch_engine import BatchEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.utils.device import get_dtype

    _, Qwen3Model, cfg = _qwen3_06b()
    model = Qwen3Model(cfg, max_rope_len=8192)
    params = model.init_random(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    be = BatchEngine(model, params, eos_token_ids=[], slots=slots,
                     cache_dtype=get_dtype(), max_seq_len=4096,
                     prefill_chunk=512)
    s = SamplingConfig(temperature=None)
    long_prompt = [(j % 1000) + 1 for j in range(plen)]
    stop = threading.Event()

    def background(i):
        prompt = [(i * 131 + j) % 1000 + 1 for j in range(64)]
        while not stop.is_set():
            be.generate_tokens(prompt, s, max_tokens=128)

    def ttft_once():
        t0 = time.perf_counter()
        for _ in be.stream_tokens(long_prompt, s, max_tokens=2):
            return time.perf_counter() - t0

    try:
        ttft_once()                          # compile the prefill buckets
        threads = [threading.Thread(target=background, args=(i,),
                                    daemon=True)
                   for i in range(slots - 1)]
        for t in threads:
            t.start()
        time.sleep(1.0)                      # let the background load ramp
        vals = [ttft_once() for _ in range(3)]
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=60)
        be.shutdown()
    return float(np.median(vals))


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


def bench_gguf_decode(fmt: str = "q8") -> float:
    """Qwen3-0.6B with every decoder linear block-quantized: batch-1
    decode tok/s through the Pallas dequant-matmul kernels.

    fmt="q8": the int8-per-128 grid every 5-bit-plus GGUF format repacks
    into (ops/quant_matmul.py pack_q8_rows).  fmt="q4": the nibble-packed
    4-bit grid Q4_0/Q4_K/IQ4_NL repack into (pack_q4_rows) — half the HBM
    bytes per step, so it should beat q8 on a bandwidth-bound decode."""
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.ops.quant_matmul import pack_q4_rows, pack_q8_rows
    from aha_tpu.utils.device import get_dtype

    pack = pack_q8_rows if fmt == "q8" else pack_q4_rows

    _, Qwen3Model, cfg = _qwen3_06b()
    model = Qwen3Model(cfg, max_rope_len=8192)
    params = model.init_random(jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    def quantize(tree):
        # stacked layers: (L, in, out) weights → per-layer packed lists
        out = {}
        for name, p in tree.items():
            if isinstance(p, dict) and "w" in p and p["w"].ndim == 3:
                ws = np.asarray(p["w"].astype(jnp.float32))
                packed = [pack(w.T) for w in ws]
                out[name] = {k: jnp.stack([jnp.asarray(x[k]) for x in packed])
                             for k in packed[0]}
            elif isinstance(p, dict):
                out[name] = quantize(p)
            else:
                out[name] = p
        return out

    params["layers"] = quantize(params["layers"])
    # the loader keeps the output head quantized too (io/gguf_models.py) —
    # it is the single largest weight and every decode step reads it
    head_w = np.asarray(params["lm_head"]["w"].astype(jnp.float32)).T
    ph = pack(head_w)
    params["lm_head"] = {k: jnp.asarray(v) for k, v in ph.items()}
    engine = TextEngine(model, params, eos_token_ids=[],
                        cache_dtype=get_dtype(), max_seq_len=4096)
    s = SamplingConfig(temperature=None)
    prompt = [(i % 1000) + 1 for i in range(64)]
    engine.generate_tokens(prompt, s, max_tokens=256)

    def once():
        engine.generate_tokens(prompt, s, max_tokens=256)
        t = engine.last_timing
        return (t.completion_tokens - 1) / t.completion_secs

    return max(once(), once())


def bench_deepseek_ocr_ttft(runs: int = 3) -> float:
    """DeepSeek-OCR at real geometry (SAM ViTDet-B over 1024² + CLIP-L +
    3B MoE decoder, models/deepseek_ocr.py defaults): p50 time-to-first-
    token for a base-mode (global view, no crops) OCR prompt."""
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.models.deepseek_ocr import (DeepseekOCRConfig,
                                             DeepseekOCRModel,
                                             deepseek_vision_layout)
    from aha_tpu.utils.device import get_dtype

    cfg = DeepseekOCRConfig()
    model = DeepseekOCRModel(cfg, max_rope_len=4096)
    params = model.init_random(jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    s = cfg.sam.img_size
    nb = s // cfg.sam.patch_size // 4        # 16 merged units per side
    rng = np.random.default_rng(1)
    layout = [{"nq": nb, "nb": nb, "wr": 1, "hr": 1}]
    gather = deepseek_vision_layout(layout, cfg.version)
    mm = {"global": jnp.asarray(
        rng.standard_normal((1, 3, s, s)), jnp.bfloat16),
        "gather_idx": jnp.asarray(gather)}
    ids = [3, 5, 7] + [cfg.image_token_id] * len(gather) + [11, 13]

    engine = TextEngine(model, params, eos_token_ids=[],
                        cache_dtype=get_dtype(), max_seq_len=1024)
    g = SamplingConfig(temperature=None)
    engine.generate_tokens(ids, g, max_tokens=1, mm=mm)   # compile/warmup
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        engine.generate_tokens(ids, g, max_tokens=1, mm=mm)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_voxcpm_rtf(n_patches: int = 25) -> float:
    """VoxCPM-0.5B geometry (MiniCPM4-0.5B backbone: 24×1024/3072, LocEnc
    512×4, LocDiT 768×6, feat 64×patch 2; 25 latent frames/s at 16 kHz so
    one patch = 80 ms of audio): latent-generation RTF = audio seconds per
    wall second through the LM+CFM(×2 CFG)×10-timestep per-patch loop.
    The reference claims 'real-time' on an M1 CPU
    (docs/supported-models.md:154) i.e. RTF ≥ 1."""
    from aha_tpu.models.voxcpm import (VoxCPMConfig, VoxCPMModel,
                                       VoxLMConfig)
    import dataclasses as dc

    lm = VoxLMConfig(vocab_size=73448, hidden_size=1024,
                     intermediate_size=3072, num_hidden_layers=24,
                     num_attention_heads=16, num_key_value_heads=2)

    def sub(h, ffn, heads, layers):
        return dc.replace(lm, hidden_size=h, intermediate_size=ffn,
                          num_attention_heads=heads, num_hidden_layers=layers,
                          num_key_value_heads=heads, vocab_size=0)

    cfg = VoxCPMConfig(
        architecture="voxcpm", lm=lm, patch_size=2, feat_dim=64,
        sq_latent_dim=64, sq_scale=9, residual_lm_num_layers=6,
        residual_lm_no_rope=False, encoder=sub(512, 2048, 8, 4),
        dit=sub(768, 3072, 12, 6), audio_vae=None, max_length=4096,
        dtype="bfloat16")
    model = VoxCPMModel(cfg, latent_dim=64)
    params = model.init_random(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    ids = [(i % 1000) + 2 for i in range(48)]
    tt, tm, af, am = model.build_context(ids, None)

    def run():
        lat = model.inference(params, tt, tm, af, am, min_len=n_patches,
                              max_len=n_patches, n_timesteps=10,
                              cfg_value=2.0)
        return lat

    run()                                    # compile/warmup
    secs_audio = n_patches * cfg.patch_size / 25.0   # 25 latent fps
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        best = max(best, secs_audio / (time.perf_counter() - t0))
    return best


def bench_spec_decode(spec_tokens: int = 15, repetitive: bool = True) -> float:
    """Greedy decode tok/s WITH prompt-lookup speculative decoding.

    `repetitive=True` is the feature's target workload (OCR/ASR
    transcripts, code, quotes — strong n-gram structure).  False uses a
    no-repeated-trigram PROMPT — but note what that measures on random
    weights: the model's greedy OUTPUT goes periodic within a few tokens,
    drafting reads emitted history, and acceptance rides high anyway.  It
    is a periodic-output acceptance number, NOT a worst case (the metric
    name says so).  The true draftless floor — what a user pays for
    leaving --spec-tokens on when NOTHING is ever accepted — is
    bench_spec_draftless below.  Output is bit-identical to plain greedy
    in every mode."""
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.utils.device import get_dtype

    _, Qwen3Model, cfg = _qwen3_06b()
    model = Qwen3Model(cfg, max_rope_len=8192)
    params = model.init_random(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    engine = TextEngine(model, params, eos_token_ids=[],
                        cache_dtype=get_dtype(), max_seq_len=4096,
                        spec_tokens=spec_tokens)
    s = SamplingConfig(temperature=None)
    if repetitive:
        para = [(i % 97) + 1 for i in range(64)]
        prompt = (para * 4)[:256]             # strong n-gram structure
    else:
        rng = np.random.default_rng(42)       # no repeated trigrams
        prompt = [int(t) for t in rng.choice(100000, size=256,
                                             replace=False)]
    # sustained throughput needs enough dispatches to swamp pipeline
    # ramp/drain: at ~5 accepted tokens/round × 8 rounds/dispatch, 256
    # tokens is ~6 dispatches — ramp-dominated, and it measured 1.05×
    # plain where the 1024-token steady state is 3.2× (v5e, back-to-back)
    n_tokens = 1024
    engine.generate_tokens(prompt, s, max_tokens=n_tokens)  # compile/warmup

    def once():
        engine.generate_tokens(prompt, s, max_tokens=n_tokens)
        t = engine.last_timing
        return (t.completion_tokens - 1) / t.completion_secs

    return max(once(), once())


def bench_spec_draftless() -> dict:
    """The draftless floor: AHA_SPEC_NO_DRAFTS=1 pins n_drafts = 0
    (core/engine.py spec_propose_device), so every speculation round is a
    1-token verify step — the cost a user pays for leaving --spec-tokens on
    when NO draft is ever accepted (truly novel text on a real model).
    The 'safe to leave on' claim in docs/model-card.md is tps_vs_plain
    >= 0.9, with plain decode measured BACK-TO-BACK in the same process
    (sequential bench entries are not comparable under terminal drift)."""
    import os

    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.utils.device import get_dtype

    _, Qwen3Model, cfg = _qwen3_06b()
    model = Qwen3Model(cfg, max_rope_len=8192)
    params = model.init_random(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    s = SamplingConfig(temperature=None)
    rng = np.random.default_rng(42)
    prompt = [int(t) for t in rng.choice(100000, size=256, replace=False)]
    n_tokens = 1024

    def measure(engine):
        engine.generate_tokens(prompt, s, max_tokens=n_tokens)  # warmup
        best = 0.0
        for _ in range(2):
            engine.generate_tokens(prompt, s, max_tokens=n_tokens)
            t = engine.last_timing
            best = max(best, (t.completion_tokens - 1) / t.completion_secs)
        return best

    os.environ["AHA_SPEC_NO_DRAFTS"] = "1"   # read at trace time
    try:
        spec_engine = TextEngine(model, params, eos_token_ids=[],
                                 cache_dtype=get_dtype(), max_seq_len=4096,
                                 spec_tokens=15)
        spec_tps = measure(spec_engine)
    finally:
        os.environ.pop("AHA_SPEC_NO_DRAFTS", None)
    plain_engine = TextEngine(model, params, eos_token_ids=[],
                              cache_dtype=get_dtype(), max_seq_len=4096)
    plain_tps = measure(plain_engine)
    return {"tps": spec_tps, "vs_plain": spec_tps / plain_tps}


def bench_rmbg_latency(runs: int = 3) -> float:
    """RMBG-2.0 (BiRefNet Swin-L, 1024×1024) matte forward latency."""
    from aha_tpu.io.weights import DictSource
    from aha_tpu.models.rmbg2_0 import BiRefNet, SwinConfig
    from tests.fixtures import rmbg_state_dict

    cfg = SwinConfig()   # Swin-L defaults (192, (2,2,18,2), (6,12,24,48))
    sd = rmbg_state_dict({"embed_dim": cfg.embed_dim,
                          "depths": list(cfg.depths),
                          "num_heads": list(cfg.num_heads),
                          "window_size": cfg.window_size,
                          "patch_size": cfg.patch_size})
    model = BiRefNet(cfg)
    params = model.load_params(DictSource(sd), dtype=jnp.bfloat16)
    pixels = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 3, 1024, 1024)), jnp.bfloat16)
    fwd = jax.jit(model.forward)

    def once():
        t0 = time.perf_counter()
        out = fwd(params, pixels)
        np.asarray(jax.device_get(out)).sum()   # force through the tunnel
        return time.perf_counter() - t0

    once()                                   # compile/warmup
    return float(np.median([once() for _ in range(runs)]))


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
    ttft = float(np.median(ts))

    # tower-only decomposition: the ViT forward (segment-flash window
    # attention + merger) isolated from the decoder prefill, so the TTFT
    # number above decomposes into tower + prefill + dispatch
    tower = jax.jit(lambda vp, mm: model.encode_vision(vp, mm))
    tower(params["visual"], mm).block_until_ready()
    tvals = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = tower(params["visual"], mm)
        np.asarray(jax.device_get(out.ravel()[0]))   # tunnel-safe fence
        tvals.append(time.perf_counter() - t0)
    _VLM_CACHE["tower_ms"] = float(np.median(tvals)) * 1e3
    return ttft


_VLM_CACHE: dict = {}


def main() -> None:
    result = {}
    extra = []

    import gc
    import os
    import threading

    # Watchdog: a sick tunneled runtime can BLOCK inside a jax RPC forever
    # (observed 2026-08-17: the relay died mid-day and jax.devices() never
    # returned).  jax calls aren't interruptible from Python, but a daemon
    # thread still runs — after the deadline it emits whatever metrics
    # completed (flagged) and force-exits, so the driver records a partial
    # line instead of hanging with nothing.
    deadline = float(os.environ.get("AHA_BENCH_DEADLINE_S", "4500"))
    state: dict = {"result": None}   # the watchdog reads `extra` directly

    def _watchdog():
        time.sleep(deadline)
        out = state["result"] or {
            "metric": "qwen3_0.6b_decode_tokens_per_sec_per_chip",
            "error": f"bench deadline {deadline:.0f}s exceeded "
                     "(device runtime unresponsive)"}
        out["extra"] = list(extra) + [{
            "metric": "bench_watchdog",
            "error": f"deadline {deadline:.0f}s exceeded; metrics after "
                     "this point never ran"}]
        print(json.dumps(out), flush=True)
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    decode_tps = bench_decode()
    gc.collect()
    jax.clear_caches()
    result = {
        "metric": "qwen3_0.6b_decode_tokens_per_sec_per_chip",
        "value": round(decode_tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(decode_tps / BASELINE_TPS, 3),
    }
    state["result"] = result

    # ordered by how much a partial line hurts: the ASR RTFx target (the
    # one vs_target metric in BASELINE.json) runs before the long-context
    # variants so a mid-bench terminal death still records it
    for name, unit, fn, target in (
            ("qwen3_0.6b_batched_decode_agg_tps_8slots", "tokens/s",
             bench_batched_decode, None),
            ("qwen3_0.6b_batched_decode_agg_tps_16slots", "tokens/s",
             lambda: bench_batched_decode(slots=16), None),
            ("qwen3_0.6b_chunked_prefill_ttft_under_load_8slots", "s",
             bench_chunked_prefill_under_load, None),
            ("qwen3_asr_0.6b_rtfx_30s", "x_realtime", bench_asr_rtfx, 50.0),
            ("qwen3_0.6b_decode_tps_16k_cache", "tokens/s",
             lambda: bench_decode(long_context=True), None),
            ("qwen3_0.6b_decode_tps_16k_cache_kv_int8", "tokens/s",
             lambda: bench_decode(long_context=True, kv_int8=True), None),
            ("qwen3_0.6b_decode_tps_64k_cache", "tokens/s",
             lambda: bench_decode(long_context="64k"), None),
            ("qwen3_0.6b_decode_tps_64k_cache_kv_int8", "tokens/s",
             lambda: bench_decode(long_context="64k", kv_int8=True), None),
            ("qwen3_0.6b_decode_tps_128k_cache_kv_int8", "tokens/s",
             lambda: bench_decode(long_context="128k", kv_int8=True), None),
            ("qwen3_0.6b_prefill_tokens_per_sec", "tokens/s",
             lambda: _prefill_cached("tps"), None),
            ("qwen3_0.6b_prefill_mfu_pct", "%",
             lambda: _prefill_cached("mfu_pct"), None),
            ("qwen2.5vl_3b_prefill_p50_ttft", "s", bench_vlm_ttft, None),
            # tower-only latency captured by the TTFT bench above (same
            # process, same weights) — decomposes TTFT into tower vs prefill
            ("qwen2.5vl_3b_vision_tower_ms", "ms",
             lambda: _VLM_CACHE["tower_ms"], None),
            ("qwen3_0.6b_spec_decode_tps_repetitive_text", "tokens/s",
             bench_spec_decode, None),
            # renamed from ..._random_text (r4): a random PROMPT on random
            # weights still yields periodic greedy OUTPUT, which drafting
            # exploits — this is a periodic-output acceptance number, not a
            # worst case.  The worst case is the draftless metric below.
            ("qwen3_0.6b_spec_decode_tps_periodic_output", "tokens/s",
             lambda: bench_spec_decode(repetitive=False), None),
            # draftless floor (AHA_SPEC_NO_DRAFTS): emits tps plus the
            # vs_plain ratio against a back-to-back plain-decode run —
            # the docs' "leaving --spec-tokens on is safe" claim is >= 0.9
            ("qwen3_0.6b_spec_decode_tps_draftless", "tokens/s",
             bench_spec_draftless, None),
            ("qwen3_0.6b_gguf_q8_decode_tps", "tokens/s",
             bench_gguf_decode, None),
            ("qwen3_0.6b_gguf_q4_decode_tps", "tokens/s",
             lambda: bench_gguf_decode(fmt="q4"), None),
            ("deepseek_ocr_3b_prefill_p50_ttft", "s",
             bench_deepseek_ocr_ttft, None),
            ("voxcpm_0.5b_tts_rtf", "x_realtime", bench_voxcpm_rtf, 1.0),
            ("rmbg2_0_1024px_latency", "s", bench_rmbg_latency, None)):
        try:
            v = fn()
            if isinstance(v, dict):   # {"tps": ..., "vs_plain": ...}
                entry = {"metric": name, "value": round(float(v["tps"]), 4),
                         "unit": unit,
                         "vs_plain": round(float(v["vs_plain"]), 3)}
            else:
                entry = {"metric": name, "value": round(float(v), 4),
                         "unit": unit}
            if target is not None:
                entry["vs_target"] = round(float(entry["value"]) / target, 3)
            extra.append(entry)
        except Exception:
            extra.append({"metric": name, "error":
                          traceback.format_exc(limit=1).splitlines()[-1]})
        finally:
            # each bench builds multi-GB engines (params + KV caches) whose
            # reference cycles (engine ↔ jitted closures) outlive the call
            # until a full GC; the 64k-cache bench then OOMs a 16 GB chip.
            # Collect cycles and drop cached executables' baked constants
            # before the next bench allocates.
            gc.collect()
            jax.clear_caches()
    result["extra"] = extra
    print(json.dumps(result))


if __name__ == "__main__":
    main()
