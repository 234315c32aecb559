"""Autoregressive generation engine.

TPU-native redesign of the reference's generate loop
(src/models/common/generate.rs): instead of a mutable model object stepped
one token at a time with unbounded shapes, the engine drives **two jitted
pure functions** —

    prefill(params, tokens, cache, prompt_len, mm) → (last_logits, cache)
    decode (params, token, cache, key, ring, n)    → (next_token, cache, …)

with a preallocated, **donated** KV cache (XLA updates it in place in HBM)
and **bucketed** shapes so each (prompt-bucket, cache-bucket) pair compiles
exactly once (the reference's `bucketize`, src/utils/mod.rs:701, recast as
a compilation-bucket policy).  Sampling runs on device inside the decode
step — the only per-token host↔device traffic is the 4-byte sampled token
needed for streaming detokenization.

Timing fields (prompt_secs / completion_secs / tps) match the reference's
Usage accounting (generate.rs:126-146, :271-285).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Iterator, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core import cache as kv
from aha_tpu.core.sampling import SamplingConfig, apply_repeat_penalty, sample_token

PREFILL_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384,
                   32768, 65536, 131072)
# 64k KV for Qwen3-0.6B geometry is ~7.5 GB (28L × 64k × 8 × 128 × bf16 × 2)
# — fits a 16 GB v5e beside the weights; 128k needs int8 KV or a bigger
# chip.  The engine still clamps to the serving-time max_seq_len.
CACHE_BUCKETS = (256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536,
                 131072)
REPEAT_WINDOW = 64
PREFIX_MIN_TOKENS = 32
#: cache-pytree arrays a prefix snapshot captures and a restore writes back.
#: k/v (and the int8 layout's scale stacks) are sliced to the prompt length;
#: conv/rec are the hybrid models' rolling state (full-size, tiny) — their
#: presence also means the snapshot can only resume at EXACTLY the stored
#: length (rolling state can't rewind), see PrefixStore.match.
PREFIX_RESTORE_KEYS = ("k", "v", "k_scale", "v_scale", "conv", "rec")


def spec_propose_device(hist: jnp.ndarray, hl: jnp.ndarray, g: int,
                        max_ngram: int = 3
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Prompt-lookup drafting ON DEVICE (vectorized TextEngine._ngram_propose):
    find the most recent earlier occurrence of the longest tail k-gram of
    hist[:hl] (k = max_ngram..1) and return its continuation.

    hist: (S,) int32 token history (prompt + emitted); hl: int32 valid
    length.  Returns (drafts (g,) int32, n_drafts int32) — entries past
    n_drafts are garbage.  Three O(S) VPU compare passes — microseconds even
    at S = 131k, vs the milliseconds a host-side scan costs per round, and
    (the real win) no host↔device round trip, so speculation rounds chain
    device-side like plain decode steps."""
    S = hist.shape[0]
    idx = jnp.arange(S, dtype=jnp.int32)
    p = jnp.int32(-1)
    for k in range(max_ngram, 0, -1):
        m = jnp.ones((S,), bool)
        for d in range(k):
            # m[i] &= hist[i-d] == hist[hl-1-d]  (roll wraps i<d; those
            # positions are masked by valid below since d <= k-1)
            m = m & (jnp.roll(hist, d) == hist[hl - 1 - d])
        valid = (idx >= k - 1) & (idx <= hl - 2)
        # prefer the match with the LONGEST available continuation (capped
        # at g), most recent among ties.  Pure recency is a trap: on
        # perfectly periodic text the latest match ends at the history
        # tail with ONE continuation token, so drafting degenerated to 1
        # draft/round exactly where speculation should shine (cycling
        # output: a was pinned at 1 while the text was fully predictable).
        cap = jnp.clip(hl - 1 - idx, 0, g)
        score = jnp.where(m & valid, cap * (S + 1) + idx, -1)
        best = jnp.max(score)
        pk = jnp.where(best >= 0, best % (S + 1), -1)
        # longest k wins: only fall through to shorter k when unmatched
        p = jnp.where(p >= 0, p, pk)
    n_drafts = jnp.where(p >= 0, jnp.minimum(g, hl - 1 - p), 0)
    import os
    if os.environ.get("AHA_SPEC_NO_DRAFTS"):   # bench: the draftless floor
        n_drafts = jnp.int32(0)
    # p+1+g <= S always holds when the caller pads hist by >= g past the
    # cache bucket (p <= hl-2 <= cache_len), so the slice never clamps
    drafts = jax.lax.dynamic_slice(hist, (p + 1,), (g,))
    return drafts, n_drafts


class PrefixStore:
    """MRU-bounded store of prompt-prefix KV snapshots, shared by the
    single-stream and continuous-batching engines (no reference
    equivalent; the TTS prompt cache, voxcpm/generate.rs:120-160, is the
    closest idea).

    Entries pin full-prompt K/V on device (L·n·Hkv·D·2 dtypes ×2), so the
    store is bounded by BYTES as well as count: `max_bytes` (default
    512 MiB) evicts LRU entries until a new snapshot fits, and a single
    snapshot larger than the budget is not stored at all.
    """

    DEFAULT_MAX_BYTES = 512 << 20

    def __init__(self, max_entries: int, max_bytes: int | None = None):
        from collections import OrderedDict

        self.max_entries = max_entries
        self.max_bytes = (max_bytes if max_bytes is not None
                          else self.DEFAULT_MAX_BYTES)
        self._bytes = 0
        self._entries: "OrderedDict[tuple, dict]" = OrderedDict()

    @staticmethod
    def _entry_bytes(entry: dict) -> int:
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in entry.values())

    def __len__(self) -> int:
        return len(self._entries)

    def __contains__(self, key) -> bool:
        return key in self._entries

    def match(self, prompt_ids: list[int],
              mm_key: str | None = None) -> tuple[dict | None, int]:
        """Longest stored entry (under the same multimodal key) whose tokens
        prefix this prompt.

        Returns (entry, p): restore the entry's rows and prefill from p.
        For an exact prompt repeat p = n-1 (the last row is recomputed so
        the suffix prefill has ≥1 token to produce logits from) — except
        for entries carrying rolling state (hybrid conv/rec), which can
        only resume at exactly n tokens: their state can't rewind one
        token, so an exact repeat is not matched."""
        best_key, best_p = None, 0
        for ((toks, key_mm), entry) in self._entries.items():
            if key_mm != mm_key:
                continue
            n = len(toks)
            if n > len(prompt_ids):
                continue
            if n == len(prompt_ids) and ("conv" in entry or "rec" in entry):
                continue
            p = n - 1 if n == len(prompt_ids) else n
            if p <= best_p or p < PREFIX_MIN_TOKENS:
                continue
            if list(prompt_ids[:n]) == list(toks):
                best_key, best_p = (toks, key_mm), p
        if best_key is None:
            return None, 0
        self._entries.move_to_end(best_key)
        return self._entries[best_key], best_p

    def store(self, prompt_ids: list[int], cache: dict,
              mm_key: str | None = None) -> None:
        """Snapshot the prompt's KV rows [0, len) for future requests.
        Multimodal prompts key on (tokens, mm digest); the snapshot also
        captures rope_delta so M-RoPE decode positions survive the
        restore."""
        if self.max_entries <= 0 or len(prompt_ids) < PREFIX_MIN_TOKENS:
            return   # too short to ever match; don't evict useful entries
        key = (tuple(prompt_ids), mm_key)
        if key in self._entries:
            self._entries.move_to_end(key)
            return
        n = len(prompt_ids)
        # eager slices copy out of the (soon-donated) cache on device
        entry = {"k": cache["k"][:, :, :n], "v": cache["v"][:, :, :n]}
        if "k_scale" in cache:
            # int8 layout: lane-oriented (L, B, Hkv, S) scale stacks ride
            # along so the restored rows dequantize identically
            entry["k_scale"] = cache["k_scale"][..., :n]
            entry["v_scale"] = cache["v_scale"][..., :n]
        for name in ("conv", "rec"):
            if name in cache:
                # hybrid rolling state: tiny, full-size snapshot (+0
                # detaches from the soon-donated live cache).  Marks the
                # entry exact-length-only — see match().
                entry[name] = cache[name] + 0
        if "rope_delta" in cache:
            # +0 detaches from the live cache, which decode steps DONATE
            entry["rope_delta"] = cache["rope_delta"] + 0
        nbytes = self._entry_bytes(entry)
        if nbytes > self.max_bytes:
            return   # one snapshot would blow the whole HBM budget
        self._entries[key] = entry
        self._bytes += nbytes
        while len(self._entries) > self.max_entries or \
                self._bytes > self.max_bytes:
            _, old = self._entries.popitem(last=False)
            self._bytes -= self._entry_bytes(old)


class CausalLM(Protocol):
    """Contract every decoder-only model implements (the jit-able replacement
    for the reference's InferenceModel trait, common/mod.rs:25-45)."""

    def init_cache(self, batch: int, max_len: int, dtype) -> dict:
        """Cache pytree; must contain "pos" (int32 scalar). Hybrid models add
        their extra state (conv/recurrent) here."""
        ...

    def backbone(self, params, input_ids: jnp.ndarray, cache: dict,
                 mm: Any = None,
                 prompt_len: jnp.ndarray | None = None) -> tuple[jnp.ndarray, dict]:
        """(B, S) ids → ((B, S, D) hidden, cache with K/V written at pos).
        Must NOT advance cache["pos"]; positions derive from it.
        `prompt_len` (traced scalar) is passed during prefill so hybrid
        models can place rolling state (conv/recurrent) at the true prompt
        end under right-padding; plain-attention models may ignore it."""
        ...

    def logits(self, params, hidden: jnp.ndarray) -> jnp.ndarray:
        """(B, S, D) → (B, S, vocab)."""
        ...


def bucket_for(n: int, buckets=PREFILL_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"sequence length {n} exceeds largest bucket {buckets[-1]}")


@dataclasses.dataclass
class Timing:
    prompt_tokens: int = 0
    prompt_secs: float = 0.0
    completion_tokens: int = 0
    completion_secs: float = 0.0


class TextEngine:
    """Drives one CausalLM. Single-stream (batch 1), like the reference's
    write-lock-serialized server; continuous batching is a planned
    extension of this class, not a rewrite."""

    def __init__(self, model: CausalLM, params, eos_token_ids: list[int],
                 cache_dtype=jnp.bfloat16, max_seq_len: int = 8192,
                 donate_cache: bool = True, runahead: int = 32,
                 mesh=None, cache_rules=(), prefix_cache_entries: int = 0,
                 decode_block: int = 16, spec_tokens: int = 0):
        self.model = model
        # Single-device serving fuses each layer's q/k/v and gate/up weights
        # into one matmul each (models/qwen3.fuse_decode_params) — fewer,
        # larger HBM streams for the M=1 weight-bound decode step, with
        # bit-identical outputs.  Sharded (mesh) layouts keep the separate
        # weights their partition rules anchor on.  AHA_FUSE_DECODE=0 opts
        # out.
        import os as _os
        if (mesh is None and hasattr(model, "fuse_params")
                and _os.environ.get("AHA_FUSE_DECODE", "1") == "1"):
            params = model.fuse_params(params)
        self.params = params
        # tensor-parallel serving: params arrive pre-sharded; freshly created
        # KV caches are placed with cache_rules so the jitted step functions
        # see consistent shardings (donated outputs keep them)
        self.mesh = mesh
        self.cache_rules = cache_rules
        self.eos_token_ids = set(int(t) for t in eos_token_ids)
        self.cache_dtype = cache_dtype
        self.max_seq_len = max_seq_len
        # Decode-step dispatch runahead: the sampled token is chained on
        # device, so the host can enqueue future steps before reading earlier
        # tokens back.  Reading a token through the host link costs a full
        # round trip (~50 ms on a tunneled TPU vs ~2.6 ms of device compute
        # for a 0.6B step); consuming tokens `runahead` steps behind the
        # dispatch frontier overlaps that latency completely while keeping
        # per-token streaming.  Costs ≤ runahead-1 wasted steps after eos.
        self.runahead = max(1, runahead)
        # Multi-token decode blocks: one jitted lax.scan produces
        # `decode_block` tokens per dispatch.  Through a tunneled runtime a
        # single decode DISPATCH costs ~3-4 ms regardless of the ~2 ms of
        # compute, so batch-of-steps is the only way past the dispatch
        # ceiling.  Tokens still stream, in blocks; ≤ block-1 steps are
        # wasted past eos.  1 = classic per-token dispatch.  DEFAULT 16:
        # the blocked path is bit-identical in output (same per-step
        # sampling-key/ring sequence), amortizes the dispatch ceiling 16×,
        # and degraded least under r3's terminal decay — so it is the
        # default single-stream serving path, not an opt-in.
        self.decode_block = max(1, decode_block)
        # Prompt-lookup speculative decoding (no reference counterpart):
        # draft up to `spec_tokens` continuation tokens by n-gram lookup in
        # the prompt+generated history, verify them in ONE batched forward
        # (a from_cache suffix prefill — MXU-efficient, same weight reads
        # as a single decode step), emit the longest matching prefix plus
        # the first corrected token, and REWIND the cache past the rejects
        # (pure-K/V models only: stale rows beyond pos are never read, so
        # pos -= k is the whole rollback).  Greedy-exact: the output is
        # bit-identical to non-speculative greedy decoding.  Wins scale
        # with textual repetition (OCR/ASR transcripts, code, quotes);
        # drafting runs on device and `spec_rounds` rounds chain per
        # dispatch (see _get_spec_rounds), so even fully draftless text
        # decodes at ~block-decode speed rather than below plain decode.
        self.spec_tokens = (max(0, spec_tokens)
                            if getattr(model, "supports_token_rewind", False)
                            else 0)
        #: speculation rounds fused per dispatch / dispatches kept in flight.
        #: depth 4, same as block decode: one dispatch is ~R steps of
        #: compute, and ≥3 dispatches must stay in flight for that to hide
        #: the ~25-50 ms tunneled fetch round trip (depth 2 starved the
        #: device every other dispatch — measured 455 tok/s where the
        #: acceptance rate implied >1000)
        self.spec_rounds = 8
        self.spec_depth = 4
        self._spec_verify_fns: dict[tuple, Any] = {}
        self._cache_pool: dict[int, dict] = {}
        self.last_timing = Timing()

        donate = (2,) if donate_cache else ()

        @partial(jax.jit, donate_argnums=donate, static_argnames=("with_mm",))
        def _prefill(params, tokens, cache, prompt_len, mm=None, with_mm=False):
            hidden, cache = model.backbone(params, tokens, cache,
                                           mm=mm if with_mm else None,
                                           prompt_len=prompt_len)
            cache = kv.advance(cache, prompt_len)
            last_h = jax.vmap(
                lambda h: jax.lax.dynamic_slice_in_dim(h, prompt_len - 1, 1, axis=0)
            )(hidden)
            logits = model.logits(params, last_h)[:, 0]
            return logits.astype(jnp.float32), cache

        self._prefill = _prefill

        @partial(jax.jit, donate_argnums=donate)
        def _prefill_from(params, tokens, cache, suffix_len):
            """Suffix prefill over a restored prompt-prefix: the cache holds
            the prefix K/V rows [0, pos); the suffix attends to them plus
            causally within itself (from_cache=True)."""
            hidden, cache = model.backbone(params, tokens, cache,
                                           prompt_len=suffix_len,
                                           from_cache=True)
            cache = kv.advance(cache, suffix_len)
            last_h = jax.vmap(
                lambda h: jax.lax.dynamic_slice_in_dim(h, suffix_len - 1, 1,
                                                       axis=0))(hidden)
            logits = model.logits(params, last_h)[:, 0]
            return logits.astype(jnp.float32), cache

        self._prefill_from = _prefill_from

        @partial(jax.jit, donate_argnums=(0,))
        def _restore_prefix(cache, entry, pos):
            """Copy a stored prefix snapshot (L, 1, n, … arrays; int8
            layouts add lane-oriented scale stacks) into cache rows [0, n)
            and set pos (jit caches per stored length n)."""
            cache = dict(cache)
            for name in PREFIX_RESTORE_KEYS:
                if name in entry:
                    zeros = (jnp.int32(0),) * cache[name].ndim
                    cache[name] = jax.lax.dynamic_update_slice(
                        cache[name], entry[name], zeros)
            cache["pos"] = jnp.asarray(pos, jnp.int32)
            return cache

        self._restore_prefix = _restore_prefix

        # prompt-prefix KV cache (no reference equivalent; the TTS prompt
        # cache, voxcpm/generate.rs:120-160, is the closest idea): after a
        # text prefill the prompt's KV rows are stored under the token
        # tuple; a later prompt that starts with those tokens restores them
        # and prefills only the suffix.  MRU-ordered, bounded entries.
        # Works under a TP mesh too: stored slices inherit the cache
        # sharding and the donated restore keeps it.
        self.prefix_cache_entries = (
            prefix_cache_entries
            if getattr(model, "supports_prefix_cache", False)
            else 0)
        self._prefix_entries = PrefixStore(self.prefix_cache_entries)

        self._decode_fns: dict[SamplingConfig, Any] = {}
        self._decode_n_fns: dict[tuple, Any] = {}
        self._sample_fns: dict[SamplingConfig, Any] = {}

    # -- per-sampling-config jitted closures --------------------------------

    @staticmethod
    def _repeat_window(cfg: SamplingConfig, ring) -> int:
        """Static per-cfg clamp: the penalty window is
        min(tokens generated, cfg.repeat_last_n, ring size) — matching
        sample_tokens_batch and the reference's use_repeat_penalty window."""
        from aha_tpu.core.sampling import DEFAULT_REPEAT_LAST_N

        last_n = (cfg.repeat_last_n if cfg.repeat_last_n is not None
                  else DEFAULT_REPEAT_LAST_N)
        return min(int(last_n), ring.shape[0])

    @staticmethod
    def _windowed(jitted, window: int | None):
        """Wrap a jitted decode fn so tracing happens under a static
        attention live-window bound (ops/attention.decode_window).  The
        context is trace-time-only; entering it per call costs nothing
        once compiled.  Callers must key their fn caches on `window`."""
        if window is None:
            return jitted
        from aha_tpu.ops.attention import decode_window

        def fn(*args):
            with decode_window(window):
                return jitted(*args)

        return fn

    @staticmethod
    def _live_window(max_rows: int, cache_len: int) -> int | None:
        """Smallest cache-bucket window covering `max_rows` live rows; None
        once it reaches the stream's cache bucket (no bound — avoids
        tracing a redundant variant).  Each window value compiles its own
        decode fn (a handful per stream: 256, 512, … up to the bucket)."""
        for w in CACHE_BUCKETS:
            if w >= cache_len:
                return None
            if max_rows <= w:
                return w
        return None

    def _get_decode(self, cfg: SamplingConfig, window: int | None = None):
        key_ = (cfg, window)
        fn = self._decode_fns.get(key_)
        if fn is None:
            model = self.model
            repeat_window = TextEngine._repeat_window

            # plain greedy (no repeat penalty) needs neither the rng stream
            # nor the recent-token ring: skipping the split/ring/penalty ops
            # saves ~0.06 ms/step of serial VPU work (measured v5e, the c-vs-b
            # gap in scripts/profile_engine_gap.py).  Models exposing
            # greedy_token additionally fuse the head GEMV with the argmax
            # (ops/lm_head.py) so the logits never materialize.
            plain_greedy = cfg.greedy and cfg.repeat_penalty == 1.0
            greedy_fn = getattr(model, "greedy_token", None)

            @partial(jax.jit, donate_argnums=(2,))
            def _decode(params, token, cache, key, ring, n_gen):
                hidden, cache = model.backbone(params, jnp.reshape(token, (1, 1)),
                                               cache)
                cache = kv.advance(cache, 1)
                if plain_greedy and greedy_fn is not None:
                    return (greedy_fn(params, hidden), cache, key, ring)
                logits = model.logits(params, hidden)[:, 0].astype(jnp.float32)
                if plain_greedy:
                    from aha_tpu.core.sampling import fast_argmax

                    return (fast_argmax(logits[0]).astype(jnp.int32), cache,
                            key, ring)
                key, sub = jax.random.split(key)
                n_valid = jnp.minimum(n_gen, repeat_window(cfg, ring))
                next_token = sample_token(logits[0], sub, cfg, ring, n_valid)
                ring = ring.at[n_gen % ring.shape[0]].set(next_token)
                return next_token, cache, key, ring

            fn = self._windowed(_decode, window)
            self._decode_fns[key_] = fn
        return fn

    def _get_decode_n(self, cfg: SamplingConfig, n_steps: int,
                      window: int | None = None):
        """n_steps decode iterations in ONE jitted dispatch (lax.scan)."""
        key_ = (cfg, n_steps, window)
        fn = self._decode_n_fns.get(key_)
        if fn is None:
            model = self.model
            repeat_window = TextEngine._repeat_window
            # same fast path as _decode: plain greedy skips the rng
            # split / penalty window / ring update — serial VPU work that
            # costs ~0.06 ms on EVERY step of the default block-decode loop
            # — and rides the fused head+argmax kernel where the model
            # offers it (ops/lm_head.py)
            plain_greedy = cfg.greedy and cfg.repeat_penalty == 1.0
            greedy_fn = getattr(model, "greedy_token", None)

            @partial(jax.jit, donate_argnums=(2,))
            def _decode_n(params, token, cache, key, ring, n_gen0):
                def body(carry, _):
                    token, cache, key, ring, n_gen = carry
                    hidden, cache = model.backbone(
                        params, jnp.reshape(token, (1, 1)), cache)
                    cache = kv.advance(cache, 1)
                    if plain_greedy and greedy_fn is not None:
                        tok = greedy_fn(params, hidden)
                        return (tok, cache, key, ring, n_gen + 1), tok
                    logits = model.logits(params, hidden)[:, 0]
                    logits = logits.astype(jnp.float32)
                    if plain_greedy:
                        from aha_tpu.core.sampling import fast_argmax

                        tok = fast_argmax(logits[0]).astype(jnp.int32)
                        return (tok, cache, key, ring, n_gen + 1), tok
                    key, sub = jax.random.split(key)
                    n_valid = jnp.minimum(n_gen, repeat_window(cfg, ring))
                    tok = sample_token(logits[0], sub, cfg, ring, n_valid)
                    ring = ring.at[n_gen % ring.shape[0]].set(tok)
                    return (tok, cache, key, ring, n_gen + 1), tok

                (token, cache, key, ring, _), toks = jax.lax.scan(
                    body, (token, cache, key, ring, n_gen0), None,
                    length=n_steps)
                return toks, cache, key, ring

            fn = self._windowed(_decode_n, window)
            self._decode_n_fns[key_] = fn
        return fn

    def _get_sample(self, cfg: SamplingConfig):
        fn = self._sample_fns.get(cfg)
        if fn is None:
            repeat_window = TextEngine._repeat_window

            @jax.jit
            def _sample(logits, key, ring, n_gen):
                key, sub = jax.random.split(key)
                n_valid = jnp.minimum(n_gen, repeat_window(cfg, ring))
                token = sample_token(logits[0], sub, cfg, ring, n_valid)
                ring = ring.at[n_gen % ring.shape[0]].set(token)
                return token, key, ring

            self._sample_fns[cfg] = fn = _sample
        return fn

    def _get_spec_rounds(self, G1: int, R: int, cache_len: int):
        """R speculation rounds in ONE jitted dispatch (lax.scan), all state
        device-resident so dispatches chain without host syncs.

        Each round: draft up to G1-1 tokens by device-side prompt lookup
        (spec_propose_device), forward [cur, drafts] over the cache at pos,
        greedy-decode a target per position, count the accepted prefix, set
        pos past exactly the accepted rows (rewinding rejects), and append
        the a+1 emitted tokens (targets[0..a]) to the device history.  A
        round whose G1 rows would overrun the cache bucket is a no-op that
        reports a = -1 (dynamic_update_slice would CLAMP the write start
        and overwrite accepted history).

        Returns (targets (R, G1), a (R,), cur, cache, hist, hl): per round
        emit targets[r][:a_r+1]; targets[r][i] == draft i+1 for i < a_r by
        construction, targets[r][a_r] is the bonus/corrected token.  Host
        round trips happen only when FETCHING (targets, a), which the
        stream loop pipelines `depth` dispatches behind — the fix for the
        r3 artifact where one synchronous fetch per round made speculation
        5x slower than plain decode.  A draftless round degenerates to a
        1-token block-decode step (same weight reads), so non-repetitive
        text rides at ~block-decode speed instead of falling off a cliff."""
        key_ = (G1, R, cache_len)
        fn = self._spec_verify_fns.get(key_)
        if fn is None:
            model = self.model

            @partial(jax.jit, donate_argnums=(2, 3))
            def _rounds(params, cur, cache, hist, hl):
                def run(cur, cache, hist, hl):
                    S = hist.shape[0]
                    drafts, n_drafts = spec_propose_device(hist, hl, G1 - 1)
                    gmask = jnp.arange(G1 - 1) < n_drafts
                    drafts = jnp.where(gmask, drafts, -1)
                    tokens = jnp.concatenate(
                        [cur[None], jnp.where(gmask, drafts, 0)])[None]
                    n_in = n_drafts + 1
                    hidden, cache = model.backbone(params, tokens, cache,
                                                   prompt_len=n_in,
                                                   from_cache=True)
                    cache = kv.advance(cache, n_in)
                    logits = model.logits(
                        params, hidden)[0].astype(jnp.float32)
                    targets = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    ii = jnp.arange(G1 - 1)
                    mismatch = (ii < (n_in - 1)) & (drafts != targets[:-1])
                    a = jnp.minimum(jnp.min(jnp.where(mismatch, ii, G1)),
                                    n_in - 1)
                    cache = {**cache, "pos": cache["pos"] - n_in + a + 1}
                    wi = jnp.where(jnp.arange(G1) <= a,
                                   hl + jnp.arange(G1), S)
                    hist = hist.at[wi].set(targets, mode="drop")
                    return targets[a], cache, hist, hl + a + 1, targets, a

                def skip(cur, cache, hist, hl):
                    return (cur, cache, hist, hl,
                            jnp.zeros((G1,), jnp.int32), jnp.int32(-1))

                def body(carry, _):
                    cur, cache, hist, hl = carry
                    can_run = cache["pos"] + G1 <= cache_len
                    cur, cache, hist, hl, targets, a = jax.lax.cond(
                        can_run, run, skip, cur, cache, hist, hl)
                    return (cur, cache, hist, hl), (targets, a)

                (cur, cache, hist, hl), (targets_s, a_s) = jax.lax.scan(
                    body, (cur, cache, hist, hl), None, length=R)
                return targets_s, a_s, cur, cache, hist, hl

            self._spec_verify_fns[key_] = fn = _rounds
        return fn

    @staticmethod
    def _ngram_propose(hist: list[int], n: int, max_ngram: int = 3) -> list:
        """Prompt-lookup drafting: continuation of the most recent earlier
        occurrence of the longest matching tail n-gram.  Host reference
        implementation — the decode loop drafts ON DEVICE with
        spec_propose_device, which must agree with this scan."""
        L = len(hist)
        for k in range(max_ngram, 0, -1):
            if L <= k:
                continue
            key = hist[-k:]
            best: list[int] | None = None
            for i in range(L - k - 1, -1, -1):
                if hist[i:i + k] == key:
                    cont = hist[i + k:i + k + n]
                    # longest continuation wins, most recent among ties
                    # (mirrors spec_propose_device's cap/recency score)
                    if cont and (best is None or len(cont) > len(best)):
                        best = cont
                        if len(best) == n:
                            break
            if best:
                return best
        return []

    # -- prompt-prefix KV cache --------------------------------------------

    PREFIX_MIN_TOKENS = PREFIX_MIN_TOKENS

    def _prefix_match(self, prompt_ids: list[int],
                      mm_key: str | None = None) -> tuple[dict | None, int]:
        return self._prefix_entries.match(prompt_ids, mm_key)

    def _prefix_store(self, prompt_ids: list[int], cache: dict,
                      mm_key: str | None = None) -> None:
        self._prefix_entries.store(prompt_ids, cache, mm_key)

    # -- cache pool ---------------------------------------------------------

    def _take_cache(self, cache_len: int) -> dict:
        c = self._cache_pool.pop(cache_len, None)
        if c is None:
            c = self.model.init_cache(1, cache_len, self.cache_dtype)
            if self.mesh is not None:
                from aha_tpu.parallel.mesh import shard_params

                c = shard_params(c, self.mesh, self.cache_rules)
        return kv.reset(c)

    def _return_cache(self, cache: dict) -> None:
        self._cache_pool[kv.cache_max_len(cache)] = cache

    # -- main loop ----------------------------------------------------------

    def stream_tokens(self, prompt_ids: list[int], cfg: SamplingConfig,
                      max_tokens: int = 1024, mm: Any = None,
                      mm_pad: Any = None, mm_key: str | None = None,
                      mm_token_ids: tuple = ()) -> Iterator[int]:
        """Yields sampled token ids (including the final eos).

        Timing is recorded into self.last_timing as the reference records
        Usage.  `mm` is the model-specific multimodal pytree for prefill;
        `mm_pad` optionally overrides how prompt padding interacts with it.
        `mm_key` is a digest of the multimodal inputs: when set, multimodal
        prompts participate in the prefix cache (a later prompt with the
        SAME images that extends this one — multi-turn image chat — skips
        re-encoding the vision tower and the shared prefill).
        `mm_token_ids` are the placeholder ids; a match is only taken when
        the un-prefilled suffix contains none of them."""
        prompt_len = len(prompt_ids)
        if prompt_len == 0:
            raise ValueError("empty prompt")
        max_ctx = min(self.max_seq_len, CACHE_BUCKETS[-1])
        if prompt_len > max_ctx:
            raise ValueError(
                f"prompt is {prompt_len} tokens but the maximum context is "
                f"{max_ctx}; shorten the prompt or raise max_seq_len")
        total = prompt_len + max_tokens
        cache_len = bucket_for(min(total, self.max_seq_len), CACHE_BUCKETS)
        pf_bucket = min(bucket_for(prompt_len), cache_len)

        tokens = np.zeros((1, pf_bucket), np.int32)
        tokens[0, :prompt_len] = prompt_ids
        cache = self._take_cache(cache_len)
        timing = Timing(prompt_tokens=prompt_len)
        self.last_timing = timing

        cfg_key = cfg
        decode = self._get_decode(cfg_key)
        sample = self._get_sample(cfg_key)
        key = jax.random.PRNGKey(cfg.seed)
        ring = jnp.zeros((REPEAT_WINDOW,), jnp.int32)

        from aha_tpu.utils.profiling import annotate, step_annotation

        use_prefix = self.prefix_cache_entries and \
            (mm is None or mm_key is not None)
        prefix_entry, prefix_p = (None, 0)
        if use_prefix:
            prefix_entry, prefix_p = self._prefix_match(
                prompt_ids, mm_key if mm is not None else None)
            if prefix_entry is not None and \
                    prefix_p + bucket_for(prompt_len - prefix_p) > cache_len:
                prefix_entry, prefix_p = None, 0   # suffix bucket won't fit
            if prefix_entry is not None and mm_token_ids and any(
                    t in mm_token_ids for t in prompt_ids[prefix_p:]):
                prefix_entry, prefix_p = None, 0   # suffix needs mm features

        t0 = time.perf_counter()
        with annotate("prefill"):
            if prefix_entry is not None:
                suffix = prompt_ids[prefix_p:]
                stokens = np.zeros((1, bucket_for(len(suffix))), np.int32)
                stokens[0, :len(suffix)] = suffix
                cache = self._restore_prefix(
                    cache,
                    {k: v for k, v in prefix_entry.items()
                     if k in PREFIX_RESTORE_KEYS},
                    jnp.int32(prefix_p))
                if "rope_delta" in prefix_entry:
                    # +0 forces a fresh buffer: the cache pytree is DONATED
                    # by _prefill_from, which would delete the stored
                    # entry's array on real TPU (CPU ignores donation —
                    # this class of bug only fires on hardware)
                    cache = {**cache,
                             "rope_delta": prefix_entry["rope_delta"] + 0}
                logits, cache = self._prefill_from(
                    self.params, jnp.asarray(stokens), cache,
                    jnp.int32(len(suffix)))
            else:
                logits, cache = self._prefill(
                    self.params, jnp.asarray(tokens), cache,
                    jnp.int32(prompt_len), mm, with_mm=mm is not None)
            if use_prefix:
                self._prefix_store(prompt_ids, cache,
                                   mm_key if mm is not None else None)
            token, key, ring = sample(logits, key, ring, jnp.int32(0))
        token_host = int(token)
        timing.prompt_secs = time.perf_counter() - t0
        timing.completion_tokens = 1

        try:
            yield token_host
            if token_host in self.eos_token_ids:
                return
            t0 = time.perf_counter()
            max_decode = min(max_tokens, cache_len - prompt_len)

            # Counters the plain paths resume from.  Speculation (when
            # enabled) runs FIRST and hands over mid-stream near the
            # cache-bucket end (a verify round always writes G1 rows; the
            # device guard no-ops rounds that would overrun, and the plain
            # single-step tail finishes the bucket).
            n_start = 1
            use_spec = (self.spec_tokens > 0 and cfg.greedy
                        and cfg.repeat_penalty == 1.0 and mm is None)
            if use_spec:
                # speculative greedy loop (see __init__ and
                # _get_spec_rounds): drafting, verification, acceptance and
                # history all live ON DEVICE, so dispatches chain like plain
                # decode steps; the host only fetches (targets, a) blocks,
                # pipelined `depth` dispatches deep.  Bit-identical to plain
                # greedy decoding.
                from collections import deque

                g = self.spec_tokens
                G1 = g + 1
                R = self.spec_rounds
                rounds = self._get_spec_rounds(G1, R, cache_len)
                hist_np = np.zeros((cache_len + G1 + 8,), np.int32)
                hist_np[:prompt_len] = prompt_ids
                hist_np[prompt_len] = token_host
                hist = jnp.asarray(hist_np)
                hl = jnp.int32(prompt_len + 1)
                cur = token   # device scalar from the prefill sample
                emitted = 1
                dispatched_min = 1   # >= 1 token per non-skipped round
                pending: deque = deque()
                cache_full = False
                while emitted < max_decode:
                    while (len(pending) < self.spec_depth
                           and not cache_full
                           and dispatched_min < max_decode):
                        targets_s, a_s, cur, cache, hist, hl = rounds(
                            self.params, cur, cache, hist, hl)
                        try:
                            targets_s.copy_to_host_async()
                            a_s.copy_to_host_async()
                        except AttributeError:
                            pass
                        pending.append((targets_s, a_s))
                        dispatched_min += R
                    if not pending:
                        break
                    targets_h, a_h = jax.device_get(pending.popleft())
                    for r in range(R):
                        a_r = int(a_h[r])
                        if a_r < 0:
                            cache_full = True   # later rounds all no-op too
                            continue
                        for t in targets_h[r][:a_r + 1]:
                            token_host = int(t)
                            emitted += 1
                            timing.completion_tokens = emitted
                            timing.completion_secs = \
                                time.perf_counter() - t0
                            yield token_host
                            if token_host in self.eos_token_ids:
                                return
                            if emitted >= max_decode:
                                return
                if emitted >= max_decode:
                    return
                # hand over (cache bucket nearly full): the plain paths
                # below share the invariant "token = newest emitted, its
                # row not yet written, pos = prompt_len + emitted - 1" with
                # the prefill exit.  `cur` is the newest emitted token on
                # device — pending was fully drained, and skipped rounds
                # change nothing, so device state matches the host count.
                n_start = emitted
                token = cur

            if self.decode_block > 1:
                # block decode: one dispatch per `decode_block` tokens
                # (see __init__), pipelined two blocks deep so the next
                # block computes while the previous one's tokens stream
                # back; single-step tail so the cache never overruns its
                # bucket.
                from collections import deque

                blk = self.decode_block
                emitted = n_start
                dispatched = n_start
                token_dev = token
                # depth 4: one block's fetch round trip (~25-50 ms tunneled)
                # hides behind ≥3 blocks of in-flight compute.  The r4 fix:
                # fetching ALL pending blocks at once drained the pipeline
                # — the device idled a full round trip every `depth` blocks
                # (engine measured 309 tok/s while decode_n alone ran 412).
                depth = max(4, self.runahead // blk)
                pending: deque = deque()
                while emitted + blk <= max_decode:
                    while dispatched + blk <= max_decode and \
                            len(pending) < depth:
                        # live-window attention: this block touches at most
                        # prompt_len + dispatched + blk cache rows, so the
                        # decode fn's Pallas grids cover only that bucket
                        decode_n = self._get_decode_n(
                            cfg_key, blk,
                            self._live_window(prompt_len + dispatched + blk,
                                              cache_len))
                        toks, cache, key, ring = decode_n(
                            self.params, token_dev, cache, key, ring,
                            jnp.int32(dispatched))
                        try:
                            toks.copy_to_host_async()
                        except AttributeError:
                            pass
                        pending.append(toks)
                        token_dev = toks[-1]
                        dispatched += blk
                    if not pending:
                        break
                    # fetch ONLY the oldest block; the rest stay in flight
                    # so the device never starves behind the host link
                    for v in np.asarray(jax.device_get(pending.popleft())):
                        token_host = int(v)
                        emitted += 1
                        timing.completion_tokens = emitted
                        timing.completion_secs = \
                            time.perf_counter() - t0
                        yield token_host
                        if token_host in self.eos_token_ids:
                            return
                # tail: fewer than blk tokens remain.  If the cache bucket
                # has headroom, dispatch ONE overshooting block and discard
                # the extras — blk-1 wasted device steps are far cheaper
                # than blk-1 per-token host round trips.
                rem = max_decode - emitted
                if rem > 0 and prompt_len + dispatched + blk <= cache_len:
                    decode_n = self._get_decode_n(
                        cfg_key, blk,
                        self._live_window(prompt_len + dispatched + blk,
                                          cache_len))
                    toks, cache, key, ring = decode_n(
                        self.params, token_dev, cache, key, ring,
                        jnp.int32(dispatched))
                    for v in np.asarray(jax.device_get(toks))[:rem]:
                        token_host = int(v)
                        emitted += 1
                        timing.completion_tokens = emitted
                        timing.completion_secs = time.perf_counter() - t0
                        yield token_host
                        if token_host in self.eos_token_ids:
                            return
                    return
                decode = self._get_decode(cfg_key)
                token = token_dev
                while emitted < max_decode:
                    token, cache, key, ring = decode(
                        self.params, token, cache, key, ring,
                        jnp.int32(emitted))
                    token_host = int(token)
                    emitted += 1
                    timing.completion_tokens = emitted
                    timing.completion_secs = time.perf_counter() - t0
                    yield token_host
                    if token_host in self.eos_token_ids:
                        return
                return

            # runahead pipeline: dispatch up to `runahead` steps beyond the
            # last token read back, overlapping host-link latency with device
            # compute while still yielding token-by-token.
            from collections import deque

            pending: deque = deque()
            fetch_chunk = max(1, self.runahead // 2)
            # sampled tokens produced so far (prefill's first token, plus
            # anything a speculative pre-stage already emitted)
            dispatched = n_start
            emitted = n_start
            while emitted < max_decode:
                while len(pending) < self.runahead and dispatched < max_decode:
                    decode = self._get_decode(
                        cfg_key, self._live_window(prompt_len + dispatched + 1,
                                                   cache_len))
                    with step_annotation("decode", dispatched):
                        token, cache, key, ring = decode(
                            self.params, token, cache, key, ring,
                            jnp.int32(dispatched))
                    try:
                        token.copy_to_host_async()
                    except AttributeError:
                        pass
                    pending.append(token)
                    dispatched += 1
                if not pending:
                    break
                # one device_get for a chunk of ready tokens: a single host
                # round trip per `fetch_chunk` tokens instead of one each
                # (79 → 404 tok/s on a tunneled v5e for Qwen3-0.6B geometry)
                k = min(fetch_chunk, len(pending))
                vals = jax.device_get([pending.popleft() for _ in range(k)])
                for v in vals:
                    token_host = int(v)
                    emitted += 1
                    timing.completion_tokens = emitted
                    timing.completion_secs = time.perf_counter() - t0
                    yield token_host
                    if token_host in self.eos_token_ids:
                        return
        finally:
            self._return_cache(cache)

    def generate_tokens(self, prompt_ids: list[int], cfg: SamplingConfig,
                        max_tokens: int = 1024, mm: Any = None,
                        mm_key: str | None = None,
                        mm_token_ids: tuple = ()) -> list[int]:
        """Non-streaming: all sampled tokens, eos (if any) stripped."""
        out = list(self.stream_tokens(prompt_ids, cfg, max_tokens, mm=mm,
                                      mm_key=mm_key,
                                      mm_token_ids=mm_token_ids))
        if out and out[-1] in self.eos_token_ids:
            out = out[:-1]
        return out
