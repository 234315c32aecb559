"""Mesh/sharding layer: tensor-parallel execution on the virtual 8-device
CPU mesh must produce the same numbers as single-device execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.parallel.mesh import MeshConfig, make_mesh, shard_params, spec_for


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh(MeshConfig(dp=2, tp=4))
    assert mesh.shape == {"dp": 2, "tp": 4}
    mesh1 = make_mesh(MeshConfig())
    assert mesh1.shape == {"dp": 1, "tp": 1}


def test_spec_for_rules():
    from jax.sharding import PartitionSpec as P

    rules = ((r"attn\.q\.w", (None, "tp")), (r"norm", ()))
    assert spec_for("layers.0.attn.q.w", rules) == P(None, "tp")
    assert spec_for("final.norm.w", rules) == P()
    assert spec_for("something.else", rules) == P()


def test_tp_forward_matches_single_device():
    from aha_tpu.models.qwen3 import (
        QWEN3_PARTITION_RULES,
        Qwen3Config,
        Qwen3Model,
    )

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        head_dim=16)
    model = Qwen3Model(cfg, max_rope_len=128)
    params = model.init_random(jax.random.PRNGKey(0))
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]])

    cache = model.init_cache(1, 8, jnp.float32)
    ref, _ = model.backbone(params, ids, cache)
    ref = model.logits(params, ref)

    mesh = make_mesh(MeshConfig(dp=2, tp=4))
    sharded = shard_params(params, mesh, QWEN3_PARTITION_RULES)

    @jax.jit
    def fwd(params, ids):
        cache = model.init_cache(1, 8, jnp.float32)
        hidden, _ = model.backbone(params, ids, cache)
        return model.logits(params, hidden)

    with jax.sharding.set_mesh(mesh):
        got = fwd(sharded, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    tok, cache = jax.jit(fn)(*args)
    assert tok.shape == (1,)


def test_tp_llama_matches_single_device():
    from aha_tpu.models.llama import (
        LLAMA_CACHE_RULES,
        LLAMA_PARTITION_RULES,
        LlamaConfig,
        LlamaModel,
    )

    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=8,
                      num_key_value_heads=4, qkv_bias=True)
    model = LlamaModel(cfg, max_rope_len=128)
    params = model.init_random(jax.random.PRNGKey(1))
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]])
    cache = model.init_cache(1, 8, jnp.float32)
    ref, _ = model.backbone(params, ids, cache)
    ref = model.logits(params, ref)

    mesh = make_mesh(MeshConfig(tp=4))
    sharded = shard_params(params, mesh, LLAMA_PARTITION_RULES)
    scache = shard_params(model.init_cache(1, 8, jnp.float32), mesh,
                          LLAMA_CACHE_RULES)

    @jax.jit
    def fwd(params, ids, cache):
        hidden, _ = model.backbone(params, ids, cache)
        return model.logits(params, hidden)

    got = fwd(sharded, ids, scache)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_tp_qwen3_5_hybrid_matches_single_device():
    """TP parity for the hybrid GatedDeltaNet model: conv + recurrent state
    shard over value heads; prefill AND a decode step must match."""
    from aha_tpu.core import cache as kvmod
    from aha_tpu.models.qwen3_5 import (
        QWEN3_5_CACHE_RULES,
        QWEN3_5_PARTITION_RULES,
        Qwen3_5Model,
        Qwen3_5TextConfig,
    )

    cfg = Qwen3_5TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=4,
        head_dim=16, linear_num_value_heads=8, linear_num_key_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        layer_types=("linear_attention", "full_attention",
                     "linear_attention", "full_attention"))
    model = Qwen3_5Model(cfg, max_rope_len=128)
    params = model.init_random(jax.random.PRNGKey(2))
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]])

    def run(params, cache):
        hidden, cache = model.backbone(params, ids, cache,
                                       prompt_len=jnp.int32(8))
        cache = kvmod.advance(cache, 8)
        l1 = model.logits(params, hidden)[:, -1]
        hidden, cache = model.backbone(params, jnp.asarray([[7]]), cache)
        return l1, model.logits(params, hidden)[:, 0]

    ref1, ref2 = run(params, model.init_cache(1, 32, jnp.float32))

    mesh = make_mesh(MeshConfig(tp=4))
    sharded = shard_params(params, mesh, QWEN3_5_PARTITION_RULES)
    scache = shard_params(model.init_cache(1, 32, jnp.float32), mesh,
                          QWEN3_5_CACHE_RULES)
    got1, got2 = jax.jit(run)(sharded, scache)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-4, atol=1e-4)


def test_served_engine_with_tp(tmp_path):
    """load_model(..., tp=4) serves with sharded params + cache and streams
    the same tokens as tp=1."""
    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters
    from tests.fixtures import build_tiny_qwen3_repo

    repo = str(tmp_path / "q3")
    build_tiny_qwen3_repo(repo)
    mes = ChatCompletionParameters.model_validate({
        "model": "Qwen/Qwen3-0.6B",
        "messages": [{"role": "user", "content": "hello world"}],
        "max_tokens": 6, "temperature": 0.0})
    base = load_model("Qwen/Qwen3-0.6B", repo)
    want = base.generate(mes).choices[0].message.content
    served = load_model("Qwen/Qwen3-0.6B", repo, tp=4)
    got = served.generate(mes).choices[0].message.content
    assert got == want


def test_tp_prefix_cache_matches_cold():
    """Prefix caching under a TP mesh: stored slices keep the cache
    sharding; warmed streams must reproduce cold TP streams (r2 excluded
    TP meshes from the prefix cache entirely)."""
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.models.qwen3 import (QWEN3_CACHE_RULES,
                                      QWEN3_PARTITION_RULES, Qwen3Config,
                                      Qwen3Model)

    cfg = Qwen3Config(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=8,
                      num_key_value_heads=4, head_dim=16)
    model = Qwen3Model(cfg, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(3))
    mesh = make_mesh(MeshConfig(tp=4))
    sharded = shard_params(params, mesh, QWEN3_PARTITION_RULES)
    g = SamplingConfig(temperature=None)
    base = [(i * 7) % 100 + 1 for i in range(40)]
    ext = base + [9, 8, 7]

    cold = TextEngine(model, sharded, eos_token_ids=[],
                      cache_dtype=jnp.float32, max_seq_len=256, mesh=mesh,
                      cache_rules=QWEN3_CACHE_RULES)
    warm = TextEngine(model, sharded, eos_token_ids=[],
                      cache_dtype=jnp.float32, max_seq_len=256, mesh=mesh,
                      cache_rules=QWEN3_CACHE_RULES, prefix_cache_entries=4)
    assert warm.prefix_cache_entries == 4
    want_base = cold.generate_tokens(base, g, max_tokens=6)
    want_ext = cold.generate_tokens(ext, g, max_tokens=6)
    assert warm.generate_tokens(base, g, max_tokens=6) == want_base
    assert warm.generate_tokens(base, g, max_tokens=6) == want_base
    assert warm.generate_tokens(ext, g, max_tokens=6) == want_ext
    assert len(warm._prefix_entries) == 2


def test_tp_batch_engine_matches_single_device():
    """Continuous batching under a TP mesh: a 1x4-sharded BatchEngine
    streams the same greedy tokens as an unsharded one (params + slot cache
    sharded by the model's rules; scheduler untouched)."""
    import threading

    from aha_tpu.core.batch_engine import BatchEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.models.qwen3 import (QWEN3_CACHE_RULES,
                                      QWEN3_PARTITION_RULES, Qwen3Config,
                                      Qwen3Model)

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        head_dim=16)
    model = Qwen3Model(cfg, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(2))
    g = SamplingConfig(temperature=None)
    prompts = {i: [(i * 29 + j) % 100 + 1 for j in range(36 + i)]
               for i in range(3)}

    plain = BatchEngine(model, params, eos_token_ids=[], slots=2,
                        cache_dtype=jnp.float32, max_seq_len=256)
    want = {i: plain.generate_tokens(p, g, max_tokens=10)
            for i, p in prompts.items()}
    plain.shutdown()

    mesh = make_mesh(MeshConfig(tp=4))
    sharded = shard_params(params, mesh, QWEN3_PARTITION_RULES)
    be = BatchEngine(model, sharded, eos_token_ids=[], slots=2,
                     cache_dtype=jnp.float32, max_seq_len=256,
                     mesh=mesh, cache_rules=QWEN3_CACHE_RULES)
    got = {}

    def one(i):
        got[i] = be.generate_tokens(prompts[i], g, max_tokens=10)

    ts = [threading.Thread(target=one, args=(i,)) for i in prompts]
    [t.start() for t in ts]
    [t.join() for t in ts]
    be.shutdown()
    assert got == want


def test_tp_int8_kv_matches_single_device():
    """int8 KV under a TP mesh: quantized rows AND their lane-oriented
    scale stacks shard by kv-head; greedy output equals the unsharded
    engine's."""
    from aha_tpu.core.engine import TextEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.models.qwen3 import (QWEN3_CACHE_RULES,
                                      QWEN3_PARTITION_RULES, Qwen3Config,
                                      Qwen3Model)

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        head_dim=16)
    model = Qwen3Model(cfg, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(6))
    g = SamplingConfig(temperature=None)
    prompt = [(i * 19) % 100 + 1 for i in range(24)]

    plain = TextEngine(model, params, eos_token_ids=[],
                       cache_dtype=jnp.int8, max_seq_len=256)
    want = plain.generate_tokens(prompt, g, max_tokens=12)

    mesh = make_mesh(MeshConfig(tp=4))
    sharded = shard_params(params, mesh, QWEN3_PARTITION_RULES)
    eng = TextEngine(model, sharded, eos_token_ids=[],
                     cache_dtype=jnp.int8, max_seq_len=256,
                     mesh=mesh, cache_rules=QWEN3_CACHE_RULES)
    assert eng.generate_tokens(prompt, g, max_tokens=12) == want


def test_dp_batch_engine_matches_single_device():
    """Data-parallel continuous batching: slots sharded over the dp axis
    (params replicated) stream the same greedy tokens as an unsharded
    engine.  Covers dp-only (2×1) and dp×tp (2×2) meshes — the cache
    rules put "dp" on the slot axis and "tp" on kv-heads."""
    import threading

    from aha_tpu.core.batch_engine import BatchEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.models.qwen3 import (QWEN3_CACHE_RULES,
                                      QWEN3_PARTITION_RULES, Qwen3Config,
                                      Qwen3Model)

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        head_dim=16)
    model = Qwen3Model(cfg, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(3))
    g = SamplingConfig(temperature=None)
    prompts = {i: [(i * 31 + j) % 100 + 1 for j in range(30 + i)]
               for i in range(4)}

    plain = BatchEngine(model, params, eos_token_ids=[], slots=2,
                        cache_dtype=jnp.float32, max_seq_len=256)
    want = {i: plain.generate_tokens(p, g, max_tokens=8)
            for i, p in prompts.items()}
    plain.shutdown()

    for mcfg, slots in ((MeshConfig(dp=2, tp=1), 4),
                        (MeshConfig(dp=2, tp=2), 2)):
        mesh = make_mesh(mcfg)
        sharded = shard_params(params, mesh, QWEN3_PARTITION_RULES)
        be = BatchEngine(model, sharded, eos_token_ids=[], slots=slots,
                         cache_dtype=jnp.float32, max_seq_len=256,
                         mesh=mesh, cache_rules=QWEN3_CACHE_RULES)
        # the slot axis really is sharded over dp
        kspec = be._cache["k"].sharding.spec
        assert kspec[1] == "dp", kspec
        got = {}

        def one(i):
            got[i] = be.generate_tokens(prompts[i], g, max_tokens=8)

        ts = [threading.Thread(target=one, args=(i,)) for i in prompts]
        [t.start() for t in ts]
        [t.join() for t in ts]
        be.shutdown()
        assert got == want, mcfg


def test_dp_flag_validation():
    """--dp needs a batchable family, batch_slots > 1, slots % dp == 0."""
    from aha_tpu.models.loader import load_model

    with pytest.raises(ValueError, match="batch-slots"):
        load_model("Qwen/Qwen3-0.6B", "/nope", dp=2)
    with pytest.raises(ValueError, match="multiple"):
        load_model("Qwen/Qwen3-0.6B", "/nope", dp=2, batch_slots=3)
    with pytest.raises(ValueError, match="single-stream"):
        load_model("deepseek-ai/DeepSeek-OCR", "/nope", dp=2, batch_slots=2)


def test_tp_rejected_for_unsharded_families():
    """--tp on families with no sharded serving path fails before loading
    weights (silent no-op would defeat the flag's purpose)."""
    from aha_tpu.models.loader import load_model

    for mid in ("sentence-transformers/all-MiniLM-L6-v2",
                "OpenBMB/VoxCPM-0.5B", "AI-ModelScope/RMBG-2.0"):
        with pytest.raises(ValueError, match="--tp"):
            load_model(mid, "/nope", tp=2)


def test_tp_embedding_matches_single_device(tmp_path):
    """Qwen3-Embedding under --tp: sharded params, same vectors (the 4B/8B
    embedding checkpoints are the multi-chip case)."""
    from aha_tpu.models.qwen3_served import Qwen3EmbeddingServed
    from aha_tpu.registry import lookup
    from tests.fixtures import build_tiny_qwen3_repo

    d = str(tmp_path / "q3e")
    build_tiny_qwen3_repo(d)
    entry = lookup("Qwen/Qwen3-Embedding-0.6B")
    plain = Qwen3EmbeddingServed.load(entry, d)
    want = plain.embed_one_array("hello tensor world")
    tp = Qwen3EmbeddingServed.load(entry, d, tp=4)
    got = tp.embed_one_array("hello tensor world")
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_batched_embedding_matches_per_text(tmp_path):
    """Bucket-batched embedding returns the same vectors, in order, as
    one-text-at-a-time calls — including inputs that land in different
    length buckets; rerank scores ride the same batched forward."""
    from aha_tpu.models.qwen3_served import (Qwen3EmbeddingServed,
                                             Qwen3RerankerServed)
    from aha_tpu.registry import lookup
    from tests.fixtures import build_tiny_qwen3_repo

    d = str(tmp_path / "q3e")
    build_tiny_qwen3_repo(d)
    served = Qwen3EmbeddingServed.load(entry := lookup(
        "Qwen/Qwen3-Embedding-0.6B"), d)
    texts = ["a", "one two three four five six seven eight " * 8,
             "medium length input", "b"]
    got = served.embedding(texts)
    for t, v in zip(texts, got):
        one = served.embedding([t])[0]
        np.testing.assert_allclose(v, one, atol=1e-6)

    rr = Qwen3RerankerServed(entry, served)
    scores = rr.rerank(texts[2], [texts[0], texts[1]])
    q = np.asarray(served.embedding([texts[2]])[0])
    for s, doc in zip(scores, (texts[0], texts[1])):
        want = float(np.asarray(served.embedding([doc])[0]) @ q)
        assert abs(s - want) < 1e-5


def test_dp_int8_kv_batch_engine_matches_single_device():
    """int8 KV under a dp×tp mesh: quantized rows AND their lane-oriented
    scale stacks shard slots over dp (axis 1) and kv-heads over tp; greedy
    streams equal the unsharded int8 engine's."""
    import threading

    from aha_tpu.core.batch_engine import BatchEngine
    from aha_tpu.core.sampling import SamplingConfig
    from aha_tpu.models.qwen3 import (QWEN3_CACHE_RULES,
                                      QWEN3_PARTITION_RULES, Qwen3Config,
                                      Qwen3Model)

    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        head_dim=16)
    model = Qwen3Model(cfg, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(7))
    g = SamplingConfig(temperature=None)
    prompts = {i: [(i * 23 + j) % 100 + 1 for j in range(28 + i)]
               for i in range(2)}

    plain = BatchEngine(model, params, eos_token_ids=[], slots=2,
                        cache_dtype=jnp.int8, max_seq_len=256)
    want = {i: plain.generate_tokens(p, g, max_tokens=8)
            for i, p in prompts.items()}
    plain.shutdown()

    mesh = make_mesh(MeshConfig(dp=2, tp=2))
    sharded = shard_params(params, mesh, QWEN3_PARTITION_RULES)
    be = BatchEngine(model, sharded, eos_token_ids=[], slots=2,
                     cache_dtype=jnp.int8, max_seq_len=256,
                     mesh=mesh, cache_rules=QWEN3_CACHE_RULES)
    assert be._cache["k_scale"].sharding.spec[1] == "dp"
    got = {}

    def one(i):
        got[i] = be.generate_tokens(prompts[i], g, max_tokens=8)

    ts = [threading.Thread(target=one, args=(i,)) for i in prompts]
    [t.start() for t in ts]
    [t.join() for t in ts]
    be.shutdown()
    assert got == want
