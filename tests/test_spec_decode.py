"""Prompt-lookup speculative decoding: greedy-exact, rewind-safe.

Each speculation round verifies n-gram-drafted continuations in one
from_cache forward and rewinds the cache past rejected rows (pure-K/V
models only) — the emitted stream must be bit-identical to plain greedy
decoding (core/engine.py _get_spec_rounds)."""

import jax
import jax.numpy as jnp
import pytest

from aha_tpu.core.engine import TextEngine
from aha_tpu.core.sampling import SamplingConfig
from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model


@pytest.fixture(scope="module")
def qwen3():
    cfg = Qwen3Config(vocab_size=120, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=16,
                      max_position_embeddings=512)
    model = Qwen3Model(cfg, max_rope_len=512)
    return model, model.init_random(jax.random.PRNGKey(11))


def _engine(model, params, spec, **kw):
    return TextEngine(model, params, cache_dtype=jnp.float32,
                      max_seq_len=256, spec_tokens=spec, **kw)


@pytest.mark.parametrize("spec", [4, 8])
def test_spec_greedy_is_exact(qwen3, spec):
    model, params = qwen3
    plain = _engine(model, params, 0, eos_token_ids=[])
    fast = _engine(model, params, spec, eos_token_ids=[])
    g = SamplingConfig(temperature=None)
    for seed in (3, 7, 13):
        prompt = [(seed * i) % 100 + 1 for i in range(24)]
        want = plain.generate_tokens(prompt, g, max_tokens=48)
        got = fast.generate_tokens(prompt, g, max_tokens=48)
        assert got == want, (seed, got, want)


def test_spec_respects_max_tokens_and_eos(qwen3):
    model, params = qwen3
    plain = _engine(model, params, 0, eos_token_ids=[])
    g = SamplingConfig(temperature=None)
    prompt = [(5 * i) % 100 + 1 for i in range(16)]
    want = plain.generate_tokens(prompt, g, max_tokens=40)

    fast = _engine(model, params, 8, eos_token_ids=[])
    assert fast.generate_tokens(prompt, g, max_tokens=7) == want[:7]

    # random models repeat greedily, so some token recurs — use it as eos
    eos = want[len(want) // 2]
    stop = _engine(model, params, 8, eos_token_ids=[eos])
    got = list(stop.stream_tokens(prompt, g, max_tokens=40))
    assert got == want[:want.index(eos) + 1]


def test_spec_fills_the_cache_bucket_boundary(qwen3):
    """Rounds near the cache end must clamp drafts, not overrun the
    bucket."""
    model, params = qwen3
    g = SamplingConfig(temperature=None)
    prompt = [(3 * i) % 100 + 1 for i in range(10)]
    plain = _engine(model, params, 0, eos_token_ids=[])
    fast = _engine(model, params, 8, eos_token_ids=[])
    want = plain.generate_tokens(prompt, g, max_tokens=1024)
    got = fast.generate_tokens(prompt, g, max_tokens=1024)
    assert got == want


def test_spec_disabled_for_models_without_rewind():
    """Hybrids (rolling conv/rec state) cannot roll back rejected drafts;
    the engine must silently ignore spec_tokens for them."""
    from aha_tpu.models.lfm2 import Lfm2Config, Lfm2Model

    model = Lfm2Model(Lfm2Config(
        vocab_size=120, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, block_ff_dim=96,
        block_auto_adjust_ff_dim=False,
        layer_types=("conv", "full_attention")), max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(1))
    eng = TextEngine(model, params, eos_token_ids=[],
                     cache_dtype=jnp.float32, max_seq_len=256, spec_tokens=8)
    assert eng.spec_tokens == 0
    g = SamplingConfig(temperature=None)
    out = eng.generate_tokens([(7 * i) % 100 + 1 for i in range(12)], g,
                              max_tokens=8)
    assert len(out) == 8


def test_spec_sampled_requests_fall_back(qwen3):
    """Non-greedy (or penalized) requests bypass speculation entirely."""
    model, params = qwen3
    plain = _engine(model, params, 0, eos_token_ids=[])
    fast = _engine(model, params, 8, eos_token_ids=[])
    g = SamplingConfig(temperature=0.8, top_k=20, seed=5)
    prompt = [(11 * i) % 100 + 1 for i in range(20)]
    assert (fast.generate_tokens(prompt, g, max_tokens=16)
            == plain.generate_tokens(prompt, g, max_tokens=16))


def test_ngram_propose():
    prop = TextEngine._ngram_propose
    hist = [1, 2, 3, 9, 9, 1, 2, 3]
    assert prop(hist, 2) == [9, 9]          # trigram [1,2,3] continuation
    assert prop([5, 6, 5], 3) == [6, 5]     # unigram fallback
    assert prop([1, 2, 3], 4) == []         # no earlier occurrence


def test_device_propose_matches_host_scan():
    """The device-side vectorized proposer must draft exactly what the
    host reference scan drafts (same longest-k / longest-continuation /
    most-recent tie-breaks), for random histories at every length."""
    import random

    import numpy as np

    from aha_tpu.core.engine import spec_propose_device

    rng = random.Random(42)
    for trial in range(30):
        hist = [rng.randrange(6) + 1 for _ in range(rng.randrange(2, 60))]
        for g in (1, 3, 8):
            buf = np.zeros((len(hist) + g + 4,), np.int32)
            buf[:len(hist)] = hist
            drafts, n = spec_propose_device(
                jnp.asarray(buf), jnp.int32(len(hist)), g)
            got = [int(t) for t in np.asarray(drafts)[:int(n)]]
            assert got == TextEngine._ngram_propose(hist, g), \
                (trial, g, hist, got)


def test_served_spec_decode_exact(tmp_path):
    """--spec-tokens wires through serving and leaves greedy chat output
    unchanged."""
    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters
    from tests.fixtures import build_tiny_qwen3_repo

    d = str(tmp_path / "q3")
    build_tiny_qwen3_repo(d)
    req = ChatCompletionParameters.model_validate({
        "messages": [{"role": "user", "content": "write me a poem please"}],
        "model": "q", "max_tokens": 24, "temperature": 0.0})
    plain = load_model("Qwen/Qwen3-0.6B", d, max_seq_len=512)
    fast = load_model("Qwen/Qwen3-0.6B", d, max_seq_len=512, spec_tokens=8)
    assert fast.engine.spec_tokens == 8
    a = plain.generate(req).choices[0].message
    b = fast.generate(req).choices[0].message
    assert (a.content, getattr(a, "reasoning_content", None)) == \
        (b.content, getattr(b, "reasoning_content", None))


def test_spec_composes_with_prefix_cache(qwen3):
    """Prefix restore + speculative rounds on the suffix must still be
    greedy-exact (pos bookkeeping spans both features)."""
    model, params = qwen3
    g = SamplingConfig(temperature=None)
    base = [(i * 13) % 100 + 1 for i in range(40)]
    ext = base + [5, 6, 7, 8]
    plain = _engine(model, params, 0, eos_token_ids=[])
    both = _engine(model, params, 8, eos_token_ids=[],
                   prefix_cache_entries=4)
    both.generate_tokens(base, g, max_tokens=6)       # seed the prefix store
    assert len(both._prefix_entries) >= 1
    assert (both.generate_tokens(ext, g, max_tokens=24)
            == plain.generate_tokens(ext, g, max_tokens=24))


def test_spec_greedy_is_exact_llama_family():
    """MiniCPM/Llama family (mup scalings, own from_cache path) is also
    rewind-safe and greedy-exact under speculation."""
    from aha_tpu.models.llama import LlamaConfig, LlamaModel

    cfg = LlamaConfig(vocab_size=120, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512,
                      scale_emb=12.0, scale_depth=1.4, dim_model_base=32)
    model = LlamaModel(cfg, max_rope_len=512)
    assert model.supports_token_rewind
    params = model.init_random(jax.random.PRNGKey(4))
    g = SamplingConfig(temperature=None)
    plain = _engine(model, params, 0, eos_token_ids=[])
    fast = _engine(model, params, 8, eos_token_ids=[])
    for seed in (2, 9):
        prompt = [(seed * i) % 100 + 1 for i in range(20)]
        assert (fast.generate_tokens(prompt, g, max_tokens=40)
                == plain.generate_tokens(prompt, g, max_tokens=40))


def test_spec_rounds_skip_instead_of_overrunning_the_bucket(qwen3):
    """A verify round writes ALL G1 rows; one dispatched with
    pos + G1 > cache_len must be a device-side no-op reporting a = -1
    (dynamic_update_slice would clamp the write start and overwrite
    accepted-history K/V rows — silent divergence near the context end)."""
    import numpy as np

    model, params = qwen3
    eng = _engine(model, params, 8, eos_token_ids=[])
    G1 = 9
    rounds = eng._get_spec_rounds(G1, 4, 256)
    cache = eng._take_cache(256)
    # prefill a short prompt, then plant pos so the next round can't fit
    prompt = [(3 * i) % 100 + 1 for i in range(10)]
    toks = np.zeros((1, 32), np.int32)
    toks[0, :10] = prompt
    _, cache = eng._prefill(eng.params, jnp.asarray(toks), cache,
                            jnp.int32(10))
    cache = {**cache, "pos": jnp.int32(256 - G1 + 1)}
    hist = np.zeros((256 + G1 + 8,), np.int32)
    hist[:10] = prompt
    _, a_s, _, cache, _, _ = rounds(eng.params, jnp.int32(prompt[-1]),
                                    cache, jnp.asarray(hist), jnp.int32(10))
    assert [int(a) for a in np.asarray(a_s)] == [-1] * 4
    assert int(cache["pos"]) == 256 - G1 + 1   # untouched


def test_spec_draftless_prompt_stays_exact(qwen3):
    """A prompt with no repeated n-grams gives the device proposer nothing
    to draft; rounds degenerate to 1-token steps and must stay exact."""
    model, params = qwen3
    plain = _engine(model, params, 0, eos_token_ids=[])
    g = SamplingConfig(temperature=None)
    prompt = list(range(1, 19))   # strictly increasing: no earlier n-gram
    want = plain.generate_tokens(prompt, g, max_tokens=40)
    fast = _engine(model, params, 8, eos_token_ids=[])
    assert fast.generate_tokens(prompt, g, max_tokens=40) == want


def test_spec_tokens_rejected_with_batch_slots(tmp_path):
    from aha_tpu.models.loader import load_model

    # The conflict must be rejected BEFORE any weights are read: a
    # nonexistent path raising ValueError (not FileNotFoundError) proves
    # the check is pre-load (loader.load_model, not engine construction).
    with pytest.raises(ValueError, match="spec-tokens"):
        load_model("Qwen/Qwen3-0.6B", str(tmp_path / "missing"),
                   max_seq_len=256, batch_slots=2, spec_tokens=8)


def test_spec_handover_to_block_decode_path(qwen3):
    """The bucket-end handover must also be exact when the plain path is
    the BLOCK-decode pipeline (decode_block > 1 resumes emitted/dispatched
    from the speculative pre-stage's counters).  max_tokens > the bucket
    forces the handover tail through the block path."""
    model, params = qwen3
    g = SamplingConfig(temperature=None)
    prompt = [(9 * i) % 100 + 1 for i in range(14)]
    plain = TextEngine(model, params, eos_token_ids=[],
                       cache_dtype=jnp.float32, max_seq_len=256,
                       decode_block=4)
    want = plain.generate_tokens(prompt, g, max_tokens=1024)
    fast = TextEngine(model, params, eos_token_ids=[],
                      cache_dtype=jnp.float32, max_seq_len=256,
                      decode_block=4, spec_tokens=8)
    assert fast.generate_tokens(prompt, g, max_tokens=1024) == want


def test_spec_acceptance_saturates_on_cyclic_output(qwen3):
    """On cyclic output (what random-weight models greedily emit, and the
    analogue of OCR/quote repetition in real models) acceptance must reach
    the full draft budget g.  Regression: the proposer used to pick the
    MOST RECENT n-gram match, whose continuation ends one token past the
    history tail — acceptance was pinned at 1/round on perfectly
    predictable text, making --spec-tokens slower than plain decode."""
    import numpy as np

    model, params = qwen3
    eng = _engine(model, params, 15, eos_token_ids=[])

    acc = []
    orig_get = eng._get_spec_rounds

    def patched(G1, R, cache_len):
        fn = orig_get(G1, R, cache_len)

        def wrapper(p, cur, cache, hist, hl):
            out = fn(p, cur, cache, hist, hl)
            acc.append(np.asarray(out[1]))
            return out

        return wrapper

    eng._get_spec_rounds = patched
    prompt = [(i % 7) + 1 for i in range(64)]
    g = SamplingConfig(temperature=None)
    out = eng.generate_tokens(prompt, g, max_tokens=128)
    assert len(out) == 128
    a = np.concatenate(acc)
    live = a[a >= 0]
    # the tail of the run must saturate at g (cyclic output is fully
    # predictable once the cycle is in history)
    assert live.max() == 15, live.tolist()
    assert (live == 15).sum() >= len(live) // 2, live.tolist()
