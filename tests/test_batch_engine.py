"""Continuous batching: batched decode must reproduce single-stream output.

The reference serializes requests (RwLock, src/server/api.rs:31);
BatchEngine steps several requests in one jitted decode.  Greedy decode on
CPU is deterministic, so every request's token stream must match what the
single-stream TextEngine produces for the same prompt.
"""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.core.batch_engine import BatchEngine
from aha_tpu.core.engine import TextEngine
from aha_tpu.core.sampling import SamplingConfig
from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model

CFG = Qwen3Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, head_dim=16)


@pytest.fixture(scope="module")
def model_and_params():
    model = Qwen3Model(CFG)
    params = model.init_random(jax.random.PRNGKey(0))
    return model, params


def _single_outputs(model, params, prompts, max_tokens=10):
    eng = TextEngine(model, params, eos_token_ids=[], cache_dtype=jnp.float32,
                     max_seq_len=256, runahead=4)
    return [eng.generate_tokens(p, SamplingConfig(temperature=None),
                                max_tokens=max_tokens) for p in prompts]


def test_batch_matches_single(model_and_params):
    model, params = model_and_params
    prompts = [[1, 2, 3], [9, 8, 7, 6, 5], list(range(1, 30))]
    expect = _single_outputs(model, params, prompts)

    be = BatchEngine(model, params, eos_token_ids=[], slots=3,
                     cache_dtype=jnp.float32, max_seq_len=256, runahead=4)
    try:
        results = [None] * len(prompts)

        def run(i):
            results[i] = be.generate_tokens(
                prompts[i], SamplingConfig(temperature=None), max_tokens=10)

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i, (got, want) in enumerate(zip(results, expect)):
            assert got == want, (i, got, want)
    finally:
        be.shutdown()


def test_slot_reuse_more_requests_than_slots(model_and_params):
    model, params = model_and_params
    prompts = [[i + 1, i + 2, i + 3] for i in range(5)]
    expect = _single_outputs(model, params, prompts, max_tokens=6)

    be = BatchEngine(model, params, eos_token_ids=[], slots=2,
                     cache_dtype=jnp.float32, max_seq_len=256, runahead=2)
    try:
        results = [None] * len(prompts)

        def run(i):
            results[i] = be.generate_tokens(
                prompts[i], SamplingConfig(temperature=None), max_tokens=6)

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert results == expect
    finally:
        be.shutdown()


def test_eos_stops_slot(model_and_params):
    model, params = model_and_params
    probe = _single_outputs(model, params, [[1, 2, 3]], max_tokens=8)[0]
    eos = probe[3]        # eos somewhere in the stream (may repeat earlier)
    # generate_tokens mirrors TextEngine: the final eos is stripped
    want = probe[:probe.index(eos)]
    be = BatchEngine(model, params, eos_token_ids=[eos], slots=2,
                     cache_dtype=jnp.float32, max_seq_len=256)
    try:
        got = be.generate_tokens([1, 2, 3], SamplingConfig(temperature=None),
                                 max_tokens=8)
        assert got == want
    finally:
        be.shutdown()


def test_cancellation_frees_slot(model_and_params):
    model, params = model_and_params
    be = BatchEngine(model, params, eos_token_ids=[], slots=1,
                     cache_dtype=jnp.float32, max_seq_len=256)
    try:
        it = be.stream_tokens([1, 2, 3], SamplingConfig(temperature=None),
                              max_tokens=200)
        next(it)
        it.close()        # client walks away mid-stream
        # the slot must free up for the next request
        got = be.generate_tokens([4, 5, 6], SamplingConfig(temperature=None),
                                 max_tokens=5)
        assert len(got) == 5
    finally:
        be.shutdown()


def test_mixed_sampling_configs_deterministic(model_and_params):
    model, params = model_and_params
    cfgs = [SamplingConfig(temperature=None),
            SamplingConfig(temperature=0.8, top_k=20, seed=11),
            SamplingConfig(temperature=1.2, top_p=0.9, repeat_penalty=1.3,
                           seed=7)]
    prompts = [[1, 2], [3, 4], [5, 6]]

    def run_all():
        be = BatchEngine(model, params, eos_token_ids=[], slots=3,
                         cache_dtype=jnp.float32, max_seq_len=256)
        try:
            out = [None] * 3

            def run(i):
                out[i] = be.generate_tokens(prompts[i], cfgs[i], max_tokens=6)

            ts = [threading.Thread(target=run, args=(i,)) for i in range(3)]
            for t in ts:
                t.start()
            for t in ts:
                t.join(timeout=300)
            return out
        finally:
            be.shutdown()

    a = run_all()
    assert all(len(x) == 6 for x in a)
    assert all(all(0 <= t < CFG.vocab_size for t in x) for x in a)


def test_vector_pos_decode_matches_scalar(model_and_params):
    """qwen3 per-slot positions: a (B,) pos decode step must equal B
    independent scalar-pos steps."""
    model, params = model_and_params
    B, S = 3, 64
    rng = np.random.default_rng(0)
    # build independent single caches, prefill different prompts
    lens = [5, 9, 17]
    caches = []
    toks = []
    for i, n in enumerate(lens):
        c = model.init_cache(1, S, jnp.float32)
        ids = jnp.asarray([[(j % 100) + 1 for j in range(n)]])
        h, c = model.backbone(params, ids, c)
        c = {**c, "pos": jnp.int32(n)}
        caches.append(c)
        toks.append(int(jnp.argmax(model.logits(params, h)[0, -1])))

    # scalar reference: one decode step each
    ref = []
    for i in range(B):
        h, c2 = model.backbone(params, jnp.asarray([[toks[i]]]), caches[i])
        ref.append(np.asarray(model.logits(params, h)[0, 0]))

    # batched: merge caches into (L, B, S, H, D) + vector pos
    big = model.init_cache(B, S, jnp.float32)
    k = jnp.concatenate([c["k"] for c in caches], axis=1)
    v = jnp.concatenate([c["v"] for c in caches], axis=1)
    big = {**big, "k": k, "v": v,
           "pos": jnp.asarray(lens, jnp.int32)}
    h, _ = model.backbone(params, jnp.asarray([[t] for t in toks]), big)
    got = np.asarray(model.logits(params, h)[:, 0])
    for i in range(B):
        np.testing.assert_allclose(got[i], ref[i], atol=2e-5)


# ---------------------------------------------------------------------------
# Other batchable families: llama (minicpm4/5) and lfm2 (conv+attention)
# ---------------------------------------------------------------------------


def _family_models():
    from aha_tpu.models.lfm2 import Lfm2Config, Lfm2Model
    from aha_tpu.models.llama import LlamaConfig, LlamaModel
    from aha_tpu.models.qwen3_5 import Qwen3_5Model, Qwen3_5TextConfig

    llama = LlamaModel(LlamaConfig(
        vocab_size=120, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256))
    lfm2 = Lfm2Model(Lfm2Config(
        vocab_size=120, hidden_size=48, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, block_ff_dim=96,
        block_auto_adjust_ff_dim=False,
        layer_types=("conv", "full_attention", "conv", "full_attention")))
    qwen3_5 = Qwen3_5Model(Qwen3_5TextConfig(
        vocab_size=120, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, rope_theta=10000000.0, partial_rotary_factor=0.25,
        max_position_embeddings=512, full_attention_interval=4,
        linear_num_value_heads=4, linear_num_key_heads=2,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4), max_rope_len=256)
    return {"llama": llama, "lfm2": lfm2, "qwen3_5": qwen3_5}


@pytest.mark.parametrize("family", ["llama", "lfm2", "qwen3_5"])
def test_batch_matches_single_other_families(family):
    model = _family_models()[family]
    params = model.init_random(jax.random.PRNGKey(1))
    prompts = [[1, 2, 3], [9, 8, 7, 6, 5], list(range(1, 20))]
    expect = _single_outputs(model, params, prompts, max_tokens=8)

    be = BatchEngine(model, params, eos_token_ids=[], slots=3,
                     cache_dtype=jnp.float32, max_seq_len=256, runahead=4)
    try:
        results = [None] * len(prompts)

        def run(i):
            results[i] = be.generate_tokens(
                prompts[i], SamplingConfig(temperature=None), max_tokens=8)

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert results == expect
    finally:
        be.shutdown()


def test_batch_prefix_cache_matches_cold(model_and_params):
    """Admission-time prefix caching: warmed admissions must reproduce the
    cold engine's greedy streams (exact repeats and extensions)."""
    model, params = model_and_params
    base = [(i * 13) % 100 + 1 for i in range(40)]
    ext = base + [5, 6, 7, 8]

    cold = BatchEngine(model, params, eos_token_ids=[], slots=2,
                       cache_dtype=jnp.float32, max_seq_len=256)
    warm = BatchEngine(model, params, eos_token_ids=[], slots=2,
                       cache_dtype=jnp.float32, max_seq_len=256,
                       prefix_cache_entries=4)
    g = SamplingConfig(temperature=None)
    try:
        want_base = cold.generate_tokens(base, g, max_tokens=6)
        want_ext = cold.generate_tokens(ext, g, max_tokens=6)
        first = warm.generate_tokens(base, g, max_tokens=6)
        assert len(warm._prefix_entries) == 1
        assert first == want_base
        assert warm.generate_tokens(base, g, max_tokens=6) == want_base
        assert warm.generate_tokens(ext, g, max_tokens=6) == want_ext
        assert len(warm._prefix_entries) == 2
    finally:
        cold.shutdown()
        warm.shutdown()


def test_repeat_window_parity_with_single(model_and_params):
    """repeat_last_n < ring size must clamp the penalty window identically
    on TextEngine and BatchEngine (ADVICE r2: single-stream paths ignored
    cfg.repeat_last_n)."""
    model, params = model_and_params
    cfg = SamplingConfig(temperature=None, repeat_penalty=1.3,
                         repeat_last_n=4)
    eng = TextEngine(model, params, eos_token_ids=[],
                     cache_dtype=jnp.float32, max_seq_len=256, runahead=4)
    single = eng.generate_tokens([1, 2, 3, 9, 27], cfg, max_tokens=12)
    be = BatchEngine(model, params, eos_token_ids=[], slots=2,
                     cache_dtype=jnp.float32, max_seq_len=256)
    try:
        assert be.generate_tokens([1, 2, 3, 9, 27], cfg,
                                  max_tokens=12) == single
    finally:
        be.shutdown()


def test_scheduler_crash_is_delivered(model_and_params):
    """A fatal error in the dispatch loop must surface to waiting clients
    instead of hanging them (ADVICE r2)."""
    model, params = model_and_params
    be = BatchEngine(model, params, eos_token_ids=[], slots=1,
                     cache_dtype=jnp.float32, max_seq_len=256)

    def boom(*a, **k):
        raise RuntimeError("injected device failure")

    be._decode_n = boom
    try:
        with pytest.raises(RuntimeError, match="injected device failure"):
            be.generate_tokens([1, 2, 3], SamplingConfig(temperature=None),
                               max_tokens=8)
    finally:
        be.shutdown()


def test_prefix_store_byte_budget():
    from aha_tpu.core.engine import PrefixStore

    def entry(n):
        return {"k": np.zeros((2, 1, n, 2, 16), np.float32),
                "v": np.zeros((2, 1, n, 2, 16), np.float32), "pos": 0}

    tiny = PrefixStore(max_entries=10, max_bytes=5000)
    tiny.store(list(range(40)), entry(40))       # 20480 B > budget
    assert len(tiny) == 0
    ps = PrefixStore(max_entries=10, max_bytes=50000)
    ps.store(list(range(40)), entry(40))
    ps.store(list(range(100, 140)), entry(40))
    ps.store(list(range(200, 240)), entry(40))   # 61440 B > 50000: evict LRU
    assert len(ps) == 2 and ps._bytes == 40960


def test_chunked_admission_matches_single(model_and_params):
    """A prompt longer than prefill_chunk is admitted chunk by chunk; the
    token stream must be identical to the single-stream engine's."""
    model, params = model_and_params
    prompt = [(i * 7) % 100 + 1 for i in range(50)]
    expect = _single_outputs(model, params, [prompt], max_tokens=8)[0]
    be = BatchEngine(model, params, eos_token_ids=[], slots=2,
                     cache_dtype=jnp.float32, max_seq_len=256,
                     prefill_chunk=8)
    try:
        got = be.generate_tokens(prompt, SamplingConfig(temperature=None),
                                 max_tokens=8)
        assert got == expect
    finally:
        be.shutdown()


def test_chunked_admission_interleaves_decode(model_and_params):
    """While a long admission prefills, decode steps for the already-active
    stream must be dispatched BETWEEN prefill chunks (no head-of-line
    blocking: the r2 _admit ran the whole prefill synchronously)."""
    model, params = model_and_params
    be = BatchEngine(model, params, eos_token_ids=[], slots=2,
                     cache_dtype=jnp.float32, max_seq_len=256,
                     prefill_chunk=8, runahead=4, decode_block=2)
    order = []
    real_decode, real_chunk = be._decode_n, be._prefill_from

    def spy_decode(*a, **k):
        order.append("d")
        return real_decode(*a, **k)

    def spy_chunk(*a, **k):
        order.append("c")
        return real_chunk(*a, **k)

    be._decode_n, be._prefill_from = spy_decode, spy_chunk
    try:
        it = be.stream_tokens([1, 2, 3], SamplingConfig(temperature=None),
                              max_tokens=200)
        next(it)                       # stream 1 is live and decoding
        order.clear()
        long_prompt = [(i * 11) % 100 + 1 for i in range(64)]  # 8 chunks
        got = be.generate_tokens(long_prompt,
                                 SamplingConfig(temperature=None),
                                 max_tokens=4)
        assert len(got) == 4
        it.close()
        chunk_idx = [i for i, x in enumerate(order) if x == "c"]
        assert len(chunk_idx) >= 8, order
        # decode dispatches appear between prefill chunks
        interleaved = sum(
            1 for a, b in zip(chunk_idx, chunk_idx[1:])
            if any(x == "d" for x in order[a + 1:b]))
        assert interleaved >= len(chunk_idx) // 2, order
    finally:
        be.shutdown()


def test_chunked_admission_int8_matches_single(model_and_params):
    """int8 cache + chunked prefill: chunks attend over previously written
    quantized rows (attention_prefill_at_q8); stream must equal the
    single-stream int8 engine's."""
    model, params = model_and_params
    prompt = [(i * 7) % 100 + 1 for i in range(50)]
    eng = TextEngine(model, params, eos_token_ids=[], cache_dtype=jnp.int8,
                     max_seq_len=256)
    expect = eng.generate_tokens(prompt, SamplingConfig(temperature=None),
                                 max_tokens=8)
    be = BatchEngine(model, params, eos_token_ids=[], slots=2,
                     cache_dtype=jnp.int8, max_seq_len=256,
                     prefill_chunk=8)
    try:
        assert be.prefill_chunk == 8          # int8 no longer disables it
        got = be.generate_tokens(prompt, SamplingConfig(temperature=None),
                                 max_tokens=8)
    finally:
        be.shutdown()
    # chunked prefill attends over quantized prefix rows where the
    # single-stream path saw the full-precision fresh block; int8 row
    # error can flip a greedy pick, so require near-identity
    same = sum(a == b for a, b in zip(got, expect))
    assert same >= len(expect) - 1, (got, expect)


def test_served_batch_engine_honors_kv_int8(tmp_path, monkeypatch):
    """--batch-slots serving picks up AHA_KV_INT8 like single-stream serving
    does (the slot cache stores int8 rows + scale stacks)."""
    from tests.fixtures import build_tiny_qwen3_repo
    from aha_tpu.models.loader import load_model

    d = str(tmp_path / "q3")
    build_tiny_qwen3_repo(d)
    monkeypatch.setenv("AHA_KV_INT8", "1")
    served = load_model("Qwen/Qwen3-0.6B", d, max_seq_len=256, batch_slots=2)
    cache = served.engine._cache
    assert cache["k"].dtype == jnp.int8
    assert "k_scale" in cache
    served.engine.shutdown()


def test_admission_does_not_starve_fetches_at_default_settings(
        model_and_params):
    """The mid-admission fetch gate counts pipeline depth in STEPS.  At the
    DEFAULT runahead/decode_block it once compared ENTRY count to a step
    threshold that could never be reached, so no token was fetched (or
    delivered) for the whole admission — live streams froze."""
    from unittest import mock

    model, params = model_and_params
    be = BatchEngine(model, params, eos_token_ids=[], slots=2,
                     cache_dtype=jnp.float32, max_seq_len=256,
                     prefill_chunk=8)          # default runahead/decode_block
    order = []
    real_chunk = be._prefill_from
    real_get = jax.device_get

    def spy_chunk(*a, **k):
        order.append("c")
        return real_chunk(*a, **k)

    def spy_get(x):
        order.append("f")
        return real_get(x)

    be._prefill_from = spy_chunk
    try:
        with mock.patch("jax.device_get", side_effect=spy_get):
            it = be.stream_tokens([1, 2, 3], SamplingConfig(temperature=None),
                                  max_tokens=220)
            next(it)
            order.clear()
            long_prompt = [(i * 7) % 100 + 1 for i in range(128)]  # 16 chunks
            got = be.generate_tokens(long_prompt,
                                     SamplingConfig(temperature=None),
                                     max_tokens=2)
            assert len(got) == 2
            it.close()
        chunks = [i for i, x in enumerate(order) if x == "c"]
        assert len(chunks) >= 16, order
        fetched_mid = any(x == "f"
                          for x in order[chunks[0]:chunks[-1]])
        assert fetched_mid, ("no fetch between admission chunks — live "
                             "streams starved", order)
    finally:
        be.shutdown()
