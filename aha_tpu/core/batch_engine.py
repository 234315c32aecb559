"""Continuous-batching decode engine.

The reference serializes requests behind a write lock — one generation at a
time (src/server/api.rs:31, RwLock).  On TPU, batch-1 decode is
HBM-bandwidth-bound on the *weights*, so stepping B requests together costs
nearly the same wall time as stepping one: the weights stream through the
MXU once per step regardless.  This engine keeps B "slots" live inside one
jitted decode step and multiplies aggregate serving throughput by ~B.

Design (TPU-first, no reference counterpart):
- One shared slot cache (L, B, S, Hkv, D) with a **per-slot position
  vector** cache["pos"] (B,) — models write each slot's new K/V row at its
  own position and the Pallas decode kernel masks each slot by its own
  valid length (flash_decode_at_layer already takes (B,) lengths).
- Prefill stays batch-1 on bucketed shapes (compiles once per bucket);
  the prompt's K/V rows are then copied into the slot row of the shared
  cache by a jitted insert (donated, in place).
- Per-slot sampling params ride as (B,) arrays (core.sampling.
  sample_tokens_batch), so mixed greedy/temperature/top-k requests share
  one compiled step.
- A scheduler thread owns all device dispatch: admissions (prefill+insert)
  between decode steps, runahead dispatch of future steps, chunked token
  fetches (the same host-latency hiding as TextEngine), per-request output
  queues.  Streams stay token-by-token per request.

Inactive slots keep stepping with frozen positions; their outputs are
discarded (cheaper than reshaping the batch, and XLA's step stays one
compiled shape).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from functools import partial
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core import cache as kv
from aha_tpu.core.engine import (CACHE_BUCKETS, PREFILL_BUCKETS,
                                 PREFIX_RESTORE_KEYS, REPEAT_WINDOW,
                                 Timing, bucket_for)
from aha_tpu.core.sampling import (SamplingConfig, fast_argmax,
                                   pack_sampling_params, sample_token,
                                   sample_tokens_batch)

# first-token sampling after prefill, compiled once per distinct config
# (eager jnp ops would each be a separate runtime dispatch)
_jit_sample_token = jax.jit(sample_token, static_argnames=("cfg",))


@dataclasses.dataclass
class _Request:
    prompt_ids: list[int]
    cfg: SamplingConfig
    max_tokens: int
    out: "queue.Queue[int | None | Exception]"
    cancelled: threading.Event = dataclasses.field(
        default_factory=threading.Event)
    timing: Timing = dataclasses.field(default_factory=Timing)
    t_start: float = 0.0


class BatchEngine:
    """Continuous batching over a CausalLM that supports per-slot positions
    (vector cache["pos"]) — currently the Qwen3 family."""

    def __init__(self, model, params, eos_token_ids, slots: int = 4,
                 cache_dtype=jnp.bfloat16, max_seq_len: int = 4096,
                 runahead: int = 32, prefix_cache_entries: int = 0,
                 prefill_chunk: int = 512, decode_block: int = 4,
                 mesh=None, cache_rules=()):
        self.model = model
        # single-device serving fuses q/k/v and gate/up projections into one
        # matmul each (models/qwen3.fuse_decode_params; bit-identical) —
        # same hook as TextEngine; sharded layouts keep the separate
        # weights their partition rules anchor on
        import os as _os
        if (mesh is None and hasattr(model, "fuse_params")
                and _os.environ.get("AHA_FUSE_DECODE", "1") == "1"):
            params = model.fuse_params(params)
        self.params = params
        # tensor-parallel batching: params arrive pre-sharded; slot and
        # prefill caches are placed with cache_rules so every jitted step
        # sees consistent shardings (donation keeps them) — same contract
        # as TextEngine
        self.mesh = mesh
        self.cache_rules = cache_rules
        self.eos_token_ids = set(int(t) for t in eos_token_ids)
        self.slots = slots
        self.cache_dtype = cache_dtype
        self.max_seq_len = min(max_seq_len, CACHE_BUCKETS[-1])
        self.runahead = max(1, runahead)
        # Chunked-prefill admissions: prompts longer than `prefill_chunk`
        # are prefilled chunk by chunk, with decode dispatches for the
        # already-active slots interleaved between chunks — an 8k-token
        # admission no longer stalls every live stream for the whole
        # prefill (the r2 head-of-line block).  Needs from_cache support
        # (attention over previously written cache rows); models without it
        # fall back to one-shot admission.  Chunking reorders float
        # reductions (logits differ by ~1e-7 from a one-shot prefill):
        # outputs are deterministic for a given chunking but not bitwise
        # chunking-invariant — a near-tie top-1 logit can flip under
        # greedy argmax, and TEMPERATURE samples of a chunked prompt can
        # legitimately differ from the single-stream engine's.
        self.prefill_chunk = max(0, prefill_chunk) if getattr(
            model, "supports_prefix_cache", False) else 0
        self._admission: dict | None = None
        # Blocked decode dispatch: one jitted lax.scan advances every slot
        # `decode_block` steps per host dispatch.  A dispatch through a
        # tunneled runtime costs ~1-3 ms of host time regardless of the
        # ~3 ms of device compute, so per-step dispatch caps aggregate
        # throughput; batching steps amortizes it at the cost of ≤
        # (block-1)·step_time extra per-token latency (~10 ms at 4).
        self.decode_block = max(1, decode_block)
        # engine-interface compat: each consumer thread sees ITS request's
        # timing (requests run concurrently, a single attribute would race)
        self._tls = threading.local()
        self._default_timing = Timing()

        B = slots
        cache = model.init_cache(B, self.max_seq_len, cache_dtype)
        cache["pos"] = jnp.zeros((B,), jnp.int32)
        cache = self._shard(cache)
        self._cache = cache
        self._rings = jnp.zeros((B, REPEAT_WINDOW), jnp.int32)
        self._keys = jax.vmap(jax.random.PRNGKey)(np.zeros(B, np.uint32))
        self._tokens = jnp.zeros((B,), jnp.int32)
        self._n_gen = jnp.zeros((B,), jnp.int32)

        # host-side slot bookkeeping
        self._slot_req: list[_Request | None] = [None] * B
        self._emitted = [0] * B
        self._budget = [0] * B
        # device-side step inputs are cached and refreshed only when the
        # slot set changes — per-step host→device uploads through a remote
        # runtime (axon tunnel) otherwise dominate the step time
        self._sp_dev = pack_sampling_params([SamplingConfig()] * B)
        self._active_dev = jnp.zeros((B,), bool)
        self._slots_dirty = True

        self._pending: "queue.Queue[_Request]" = queue.Queue()
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()

        def _step(params, tokens, cache, keys, rings, n_gen, active, sp,
                  mode):
            hidden, cache = model.backbone(params, tokens[:, None], cache)
            cache = {**cache,
                     "pos": cache["pos"] + active.astype(jnp.int32)}
            logits = model.logits(params, hidden)[:, 0].astype(jnp.float32)
            if mode == "greedy":
                # every slot greedy w/ penalty 1.0: pure argmax — matches the
                # single-stream engine, which never compiles the sort-based
                # top-k/top-p masks for greedy configs
                toks = fast_argmax(logits, axis=-1).astype(jnp.int32)
            else:
                splits = jax.vmap(jax.random.split)(keys)    # (B, 2, 2)
                keys, subs = splits[:, 0], splits[:, 1]
                toks = sample_tokens_batch(logits, subs, sp, rings, n_gen)
            toks = jnp.where(active, toks, 0)
            rings = jax.vmap(
                lambda r, n, t: r.at[n % REPEAT_WINDOW].set(t)
            )(rings, n_gen, toks)
            n_gen = n_gen + active.astype(jnp.int32)
            return toks, cache, keys, rings, n_gen

        @partial(jax.jit, donate_argnums=(2,),
                 static_argnames=("mode", "n_steps"))
        def _decode_n(params, tokens, cache, keys, rings, n_gen, active, sp,
                      *, mode, n_steps):
            """n_steps batched decode steps in ONE dispatch; returns the
            (n_steps, B) token matrix in step order."""
            def body(carry, _):
                tokens, cache, keys, rings, n_gen = carry
                toks, cache, keys, rings, n_gen = _step(
                    params, tokens, cache, keys, rings, n_gen, active, sp,
                    mode)
                return (toks, cache, keys, rings, n_gen), toks

            (tokens, cache, keys, rings, n_gen), seq = jax.lax.scan(
                body, (tokens, cache, keys, rings, n_gen), None,
                length=n_steps)
            return seq, cache, keys, rings, n_gen

        self._decode_n = _decode_n

        # NOTE: tokens is NOT donated — the same array object sits in
        # pending_steps awaiting device_get; donation would delete it under
        # a runtime with real buffer donation (TPU; CPU ignores donation,
        # which is why only hardware runs can catch this class of bug)
        @partial(jax.jit, donate_argnums=(1, 2, 3))
        def _seed_slot(tokens, keys, rings, n_gen, slot, tok, key):
            """One fused update seeding a freshly admitted slot's loop state
            (5 eager scatters = 5 runtime dispatches otherwise)."""
            tokens = tokens.at[slot].set(tok)
            keys = keys.at[slot].set(key)
            rings = rings.at[slot].set(
                jnp.zeros(REPEAT_WINDOW, jnp.int32).at[0].set(tok))
            n_gen = n_gen.at[slot].set(1)
            return tokens, keys, rings, n_gen

        self._seed_slot = _seed_slot

        @partial(jax.jit, donate_argnums=(0,))
        def _insert(cache, small, slot, prompt_len):
            """Copy a prefilled 1-slot cache into slot row `slot` of the
            shared cache (in place under donation).  Works for any extra
            state pytree whose batch axis is axis 1 (k/v/conv/...)."""
            zero = jnp.zeros((), jnp.int32)
            slot = jnp.asarray(slot, jnp.int32)
            new = {}
            for name in cache:
                if name == "pos":
                    continue
                big, little = cache[name], small[name]
                if isinstance(big, jnp.ndarray) and big.ndim >= 3 \
                        and little.ndim == big.ndim:
                    idx = (zero, slot) + (zero,) * (big.ndim - 2)
                    new[name] = jax.lax.dynamic_update_slice(big, little, idx)
                else:
                    new[name] = big
            new["pos"] = cache["pos"].at[slot].set(prompt_len)
            return new

        self._insert = _insert

        # batch-1 prefill reuses the exact TextEngine formulation; the small
        # cache is donated — chunked prefill would otherwise copy the whole
        # prefill cache buffer once per chunk
        @partial(jax.jit, donate_argnums=(2,))
        def _prefill(params, tokens, cache, prompt_len):
            hidden, cache = model.backbone(params, tokens, cache,
                                           prompt_len=prompt_len)
            cache = kv.advance(cache, prompt_len)
            last_h = jax.vmap(
                lambda h: jax.lax.dynamic_slice_in_dim(h, prompt_len - 1, 1,
                                                       axis=0))(hidden)
            logits = model.logits(params, last_h)[:, 0]
            return logits.astype(jnp.float32), cache

        self._prefill = _prefill
        self._pf_caches: dict[int, dict] = {}

        @partial(jax.jit, donate_argnums=(2,))
        def _prefill_from(params, tokens, cache, suffix_len):
            """Chunk/suffix prefill over previously written cache rows (the
            cache holds rows [0, pos) already; from_cache=True attends to
            them)."""
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

        @jax.jit
        def _restore_prefix(cache, entry, pos):
            cache = dict(cache)
            for name in PREFIX_RESTORE_KEYS:
                if name in entry:
                    zeros = (jnp.int32(0),) * cache[name].ndim
                    cache[name] = jax.lax.dynamic_update_slice(
                        cache[name], entry[name], zeros)
            cache["pos"] = jnp.asarray(pos, jnp.int32)
            return cache

        self._restore_prefix = _restore_prefix

        from aha_tpu.core.engine import PrefixStore

        self.prefix_cache_entries = (
            prefix_cache_entries
            if getattr(model, "supports_prefix_cache", False) else 0)
        self._prefix_entries = PrefixStore(self.prefix_cache_entries)

    def _shard(self, cache: dict) -> dict:
        if self.mesh is None:
            return cache
        from aha_tpu.parallel.mesh import shard_params

        return shard_params(cache, self.mesh, self.cache_rules)

    @property
    def last_timing(self) -> Timing:
        return getattr(self._tls, "timing", self._default_timing)

    # -- public API ---------------------------------------------------------

    def start(self) -> None:
        # guarded: concurrent stream_tokens callers must never spawn two
        # scheduler threads (they would admit requests into the same slot)
        with self._lock:
            if self._thread is None or not self._thread.is_alive():
                self._stop.clear()
                self._thread = threading.Thread(
                    target=self._run, daemon=True,
                    name="aha-batch-scheduler")
                self._thread.start()

    def shutdown(self) -> None:
        self._stop.set()
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=10)

    def stream_tokens(self, prompt_ids: list[int], cfg: SamplingConfig,
                      max_tokens: int = 1024, mm: Any = None,
                      mm_pad: Any = None, mm_key: str | None = None,
                      mm_token_ids: tuple = ()) -> Iterator[int]:
        """Engine-compatible streaming interface (mm unsupported;
        mm_key/mm_token_ids are accepted for signature parity and ignored
        because multimodal requests never reach the batch engine)."""
        if mm is not None:
            raise ValueError("BatchEngine does not take multimodal inputs")
        prompt_len = len(prompt_ids)
        if prompt_len == 0:
            raise ValueError("empty prompt")
        if prompt_len >= self.max_seq_len:
            raise ValueError(
                f"prompt is {prompt_len} tokens but the shared batch cache "
                f"holds {self.max_seq_len}; shorten the prompt or raise "
                f"max_seq_len")
        self.start()
        req = _Request(prompt_ids=list(prompt_ids), cfg=cfg,
                       max_tokens=max_tokens, out=queue.Queue())
        req.timing.prompt_tokens = prompt_len
        req.t_start = time.perf_counter()
        self._tls.timing = req.timing   # live object, updated by scheduler
        self._pending.put(req)
        self._wake.set()
        try:
            while True:
                try:
                    item = req.out.get(timeout=5.0)
                except queue.Empty:
                    # liveness check: if the scheduler thread died without
                    # delivering (it normally forwards its own exception),
                    # fail the request instead of blocking forever
                    t = self._thread
                    if t is None or not t.is_alive():
                        raise RuntimeError(
                            "batch scheduler thread is not running")
                    continue
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            req.cancelled.set()

    # engine-interface parity with TextEngine (incl. stripping the final eos)
    def generate_tokens(self, prompt_ids, cfg, max_tokens=1024, mm=None,
                        mm_key=None, mm_token_ids=()):
        out = list(self.stream_tokens(prompt_ids, cfg, max_tokens, mm=mm))
        if out and out[-1] in self.eos_token_ids:
            out = out[:-1]
        return out

    # -- scheduler ----------------------------------------------------------

    def _free_slots(self) -> list[int]:
        reserved = ({self._admission["slot"]} if self._admission is not None
                    else set())
        return [i for i, r in enumerate(self._slot_req)
                if r is None and i not in reserved]

    # -- chunked admission state machine ------------------------------------
    #
    # An admission reserves a slot, stages the prompt, and prefills it one
    # chunk per scheduler pass (decode dispatches for live slots interleave
    # between chunks).  The first token is sampled on device and delivered
    # through the same async fetch pipeline as decode steps — admission
    # never blocks the scheduler on a host round trip.

    def _begin_admission(self, req: _Request, slot: int) -> None:
        prompt_len = len(req.prompt_ids)
        pf_bucket = bucket_for(prompt_len, PREFILL_BUCKETS)
        pf_bucket = min(pf_bucket, self.max_seq_len)
        small = self._pf_caches.pop(pf_bucket, None)
        if small is None:
            small = self._shard(
                self.model.init_cache(1, pf_bucket, self.cache_dtype))
        small = kv.reset(small)
        t0 = time.perf_counter()
        prefix_entry, prefix_p = (None, 0)
        if self.prefix_cache_entries:
            prefix_entry, prefix_p = self._prefix_entries.match(
                req.prompt_ids)
            if prefix_entry is not None and \
                    prefix_p + bucket_for(prompt_len - prefix_p) > pf_bucket:
                prefix_entry, prefix_p = None, 0   # suffix bucket won't fit
        if prefix_entry is not None:
            small = self._restore_prefix(
                small,
                {k: v for k, v in prefix_entry.items()
                 if k in PREFIX_RESTORE_KEYS},
                jnp.int32(prefix_p))
        self._admission = {"req": req, "slot": slot, "small": small,
                           "pf_bucket": pf_bucket, "off": prefix_p,
                           "t0": t0, "fresh": prefix_p == 0}

    def _advance_admission(self) -> list | None:
        """Run ONE prefill chunk; on the final chunk, finalize the slot and
        return a pending fetch entry for the first token (None otherwise)."""
        st = self._admission
        req, slot = st["req"], st["slot"]
        try:
            if req.cancelled.is_set():
                self._admission = None
                self._pf_caches[st["pf_bucket"]] = st["small"]
                req.out.put(None)
                return None
            prompt = req.prompt_ids
            n = len(prompt)
            chunk_cap = self.prefill_chunk or n
            take = min(n - st["off"], max(chunk_cap, 1))
            chunk = prompt[st["off"]:st["off"] + take]
            cbucket = min(bucket_for(len(chunk), PREFILL_BUCKETS),
                          st["pf_bucket"])
            arr = np.zeros((1, cbucket), np.int32)
            arr[0, :len(chunk)] = chunk
            if st["fresh"] and take == n:
                # whole prompt in one go: fresh-block flash-attention prefill
                logits, small = self._prefill(
                    self.params, jnp.asarray(arr), st["small"], jnp.int32(n))
            else:
                logits, small = self._prefill_from(
                    self.params, jnp.asarray(arr), st["small"],
                    jnp.int32(len(chunk)))
            st["small"] = small
            st["off"] += take
            st["fresh"] = False
            if st["off"] < n:
                return None
            self._admission = None
            return self._finalize_admission(req, slot, st, logits)
        except Exception as e:  # surface as the request's error
            self._admission = None
            req.out.put(e)
            req.out.put(None)
            return None

    def _finalize_admission(self, req: _Request, slot: int, st: dict,
                            logits) -> list:
        """Insert the prefilled KV into the slot, seed loop state, and hand
        the (device-side) first token to the fetch pipeline."""
        prompt_len = len(req.prompt_ids)
        small = st["small"]
        if self.prefix_cache_entries:
            self._prefix_entries.store(req.prompt_ids, small)
        # first token sampled with the slot's own config (jitted per cfg)
        key = jax.random.PRNGKey(req.cfg.seed)
        key, sub = jax.random.split(key)
        tok = _jit_sample_token(logits[0], sub, req.cfg)

        self._cache = self._insert(self._cache, small, slot,
                                   jnp.int32(prompt_len))
        self._pf_caches[st["pf_bucket"]] = small
        self._slot_req[slot] = req
        self._emitted[slot] = 0          # counted when the token is fetched
        self._budget[slot] = min(req.max_tokens,
                                 self.max_seq_len - prompt_len)
        self._slots_dirty = True
        # seed the device-side loop state for this slot (one fused dispatch)
        self._tokens, self._keys, self._rings, self._n_gen = self._seed_slot(
            self._tokens, self._keys, self._rings, self._n_gen,
            jnp.int32(slot), tok, key)
        try:
            tok.copy_to_host_async()
        except AttributeError:
            pass
        return ["first", tok, slot, req, st["t0"]]

    @staticmethod
    def _stamp(req: _Request) -> None:
        """Set completion_secs BEFORE the final token is enqueued, so a
        consumer that builds its usage chunk on seeing eos reads it."""
        req.timing.completion_secs = (
            time.perf_counter() - req.t_start - req.timing.prompt_secs)

    def _finish(self, slot: int) -> None:
        req = self._slot_req[slot]
        if req is not None:
            if req.timing.completion_secs == 0.0:
                self._stamp(req)
            req.out.put(None)
        self._slot_req[slot] = None
        self._slots_dirty = True

    def _active_mask(self) -> np.ndarray:
        return np.asarray(
            [r is not None and not r.cancelled.is_set()
             for r in self._slot_req], bool)

    def _run(self) -> None:
        """Scheduler thread entry: a fatal error in the dispatch loop (device
        OOM, runtime/tunnel failure) is surfaced to every active and queued
        request instead of silently killing the thread and leaving clients
        blocked on req.out.get() forever."""
        try:
            self._run_inner()
        except BaseException as e:  # noqa: BLE001 — deliver, then re-raise
            for slot, r in enumerate(self._slot_req):
                if r is not None:
                    r.out.put(e)
                self._slot_req[slot] = None
            while True:
                try:
                    req = self._pending.get_nowait()
                except queue.Empty:
                    break
                req.out.put(e)
                req.out.put(None)
            for slot in range(self.slots):
                self._finish(slot)
            raise
        finally:
            # normal shutdown: drain whatever is left
            for slot in range(self.slots):
                self._finish(slot)

    def _run_inner(self) -> None:
        # pending fetch entries, in dispatch order:
        #   ["step", toks(B,), slot_reqs]          — one batched decode step
        #   ["first", tok, slot, req, t0]          — an admission's 1st token
        pending_steps: list = []
        while not self._stop.is_set():
            # free slots whose client walked away
            for slot, r in enumerate(self._slot_req):
                if r is not None and r.cancelled.is_set():
                    self._finish(slot)

            # admissions: advance the in-progress one by one chunk, else
            # start the next queued request (one admission at a time keeps
            # chunk/decode interleaving simple and bounded)
            admitted = False
            if self._admission is not None:
                first = self._advance_admission()
                if first is not None:
                    pending_steps.append(first)
                    admitted = True
            while self._admission is None and self._free_slots():
                try:
                    req = self._pending.get_nowait()
                except queue.Empty:
                    break
                if req.cancelled.is_set():
                    continue
                try:
                    self._begin_admission(req, self._free_slots()[0])
                    first = self._advance_admission()   # first chunk now
                    if first is not None:
                        pending_steps.append(first)
                        admitted = True
                except Exception as e:  # surface as the request's error
                    self._admission = None
                    req.out.put(e)
                    req.out.put(None)

            active = self._active_mask()
            if not active.any() and not pending_steps \
                    and self._admission is None:
                # idle: wait for work
                self._wake.clear()
                if self._pending.empty():
                    self._wake.wait(timeout=0.1)
                continue

            # refresh the cached device-side step inputs only on slot churn
            if self._slots_dirty:
                cfgs = [(r.cfg if r is not None else SamplingConfig())
                        for r in self._slot_req]
                self._sp_dev = pack_sampling_params(cfgs)
                self._active_dev = jnp.asarray(active)
                self._mode = "greedy" if all(
                    c.greedy and c.repeat_penalty == 1.0 for c in cfgs) \
                    else "general"
                self._slots_dirty = False

            # dispatch up to `runahead` STEPS ahead of the fetch frontier
            # (decode_block steps per dispatch); while an admission is
            # mid-prefill, cap new dispatches per pass so its next chunk
            # lands every few decode steps (live streams keep ticking)
            blk = self.decode_block
            in_flight = sum(e[3] for e in pending_steps if e[0] == "step")
            cap_steps = (max(blk, 4) if self._admission is not None
                         else self.runahead)
            n_new = 0
            while active.any() and in_flight < self.runahead \
                    and n_new < cap_steps:
                seq, self._cache, self._keys, self._rings, self._n_gen = \
                    self._decode_n(self.params, self._tokens, self._cache,
                                   self._keys, self._rings, self._n_gen,
                                   self._active_dev, self._sp_dev,
                                   mode=self._mode, n_steps=blk)
                self._tokens = seq[-1]
                try:
                    seq.copy_to_host_async()
                except AttributeError:
                    pass
                pending_steps.append(["step", seq, list(self._slot_req), blk])
                in_flight += blk
                n_new += blk
                if admitted or not self._pending.empty():
                    break  # admit new work promptly

            if not pending_steps:
                continue
            if self._admission is not None and len(pending_steps) > 1:
                # don't block on a fetch mid-admission unless the pipeline
                # is deep — keep the chunk cadence up.  Depth is counted in
                # STEPS (entries carry decode_block steps each): comparing
                # entry count to a step threshold left the gate closed at
                # default settings, starving live streams of every token
                # for the whole admission.
                steps_pending = sum(e[3] for e in pending_steps
                                    if e[0] == "step")
                if steps_pending < self.runahead // 2:
                    continue
            # fetch a chunk of ready entries in one host round trip
            n_fetch = max(1, len(pending_steps) // 2) \
                if len(pending_steps) > 1 else 1
            batch = [pending_steps.pop(0) for _ in range(n_fetch)]
            vals = jax.device_get([e[1] for e in batch])
            for fetched, entry in zip(vals, batch):
                if entry[0] == "first":
                    _, _, slot, req, t0 = entry
                    if self._slot_req[slot] is not req:
                        continue           # finished/cancelled meanwhile
                    if req.cancelled.is_set():
                        self._finish(slot)
                        continue
                    tok = int(fetched)
                    req.timing.prompt_secs = time.perf_counter() - t0
                    req.timing.completion_tokens = 1
                    self._emitted[slot] = 1
                    done = tok in self.eos_token_ids or \
                        self._budget[slot] <= 1
                    if done:
                        self._stamp(req)
                    req.out.put(tok)
                    if done:
                        self._finish(slot)
                    continue
                _, _, slot_reqs, n_steps = entry
                for row in np.asarray(fetched).reshape(n_steps, -1):
                    for slot, req in enumerate(slot_reqs):
                        if req is None or req is not self._slot_req[slot]:
                            continue
                        if req.cancelled.is_set():
                            self._finish(slot)
                            continue
                        if self._emitted[slot] == 0:
                            continue   # first token not yet delivered
                        tok = int(row[slot])
                        self._emitted[slot] += 1
                        req.timing.completion_tokens = self._emitted[slot]
                        done = tok in self.eos_token_ids or \
                            self._emitted[slot] >= self._budget[slot]
                        if done:
                            self._stamp(req)
                        req.out.put(tok)
                        if done:
                            self._finish(slot)
