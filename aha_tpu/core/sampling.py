"""Token sampling — pure jax, runs on device inside the decode step.

Semantics match the reference exactly (src/models/common/sample.rs):

- temperature < 1e-7 → greedy argmax (get_logit_processor:14).
- top_k absent: temperature-scaled softmax, optional nucleus top-p.
- top_k present: top-k filter, then optional top-p within the survivors
  (candle Sampling::TopK / TopKThenTopP).
- repeat penalty (apply_repeat_penalty): logits of context tokens are
  divided by the penalty when positive, multiplied when negative, over the
  last `repeat_last_n` tokens (use_repeat_penalty:40-60).

Defaults follow the reference generate loop: seed 299792458, repeat window
64 (common/generate.rs:408-409).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

DEFAULT_SEED = 299792458
DEFAULT_REPEAT_LAST_N = 64


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    temperature: float | None = None
    top_p: float | None = None
    top_k: int | None = None
    repeat_penalty: float = 1.0
    repeat_last_n: int | None = DEFAULT_REPEAT_LAST_N
    seed: int = DEFAULT_SEED

    @property
    def greedy(self) -> bool:
        return self.temperature is None or self.temperature < 1e-7


def fast_argmax(logits: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """jnp.argmax, exactly (first index of the maximum), as two cheap passes.

    XLA lowers argmax over the 151k-lane vocab axis to a variadic
    (value, index) reduce that costs ~0.8 ms at B=8 on a v5e — half a
    decode step.  max + first-index-equal-to-max are two PLAIN reduces the
    VPU does at bandwidth speed; float equality against the reduction's own
    output is exact, so the result matches argmax bit-for-bit (NaN-free
    logits, which sampling guarantees — penalties/masks produce -inf, not
    NaN)."""
    axis = axis % logits.ndim
    m = jnp.max(logits, axis=axis, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, axis)
    big = jnp.int32(logits.shape[axis])
    idx = jnp.min(jnp.where(logits == m, iota, big), axis=axis)
    # an all-NaN row has no element equal to its max; clamp the sentinel so
    # a numerically diverged model degrades to a valid id (like jnp.argmax)
    # instead of an out-of-range index crashing the tokenizer
    return jnp.minimum(idx, big - 1)


def apply_repeat_penalty(logits: jnp.ndarray, recent_tokens: jnp.ndarray,
                         n_valid: jnp.ndarray, penalty: float) -> jnp.ndarray:
    """Penalize tokens present in the recent window.

    recent_tokens: (W,) int32 ring of recent token ids, n_valid of them
    meaningful.  Invalid slots point at token 0 but are masked out.
    """
    W = recent_tokens.shape[0]
    valid = jnp.arange(W) < n_valid
    # scatter-max (boolean OR): masked slots write False at index 0 and can
    # never clobber a real occurrence of token 0 (duplicate-index .set order
    # is unspecified; .max is order-independent)
    present = jnp.zeros(logits.shape[-1], jnp.bool_).at[
        jnp.where(valid, recent_tokens, 0)
    ].max(valid, mode="drop")
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(present, penalized, logits)


def _mask_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1]
    return jnp.where(logits < kth, -jnp.inf, logits)


def _mask_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filter; always keeps the most probable token
    (sample.rs:121-124 guards against all--inf)."""
    sort_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cut = cum > p
    cut = cut.at[..., 0].set(False)
    sorted_logits = jnp.where(cut, -jnp.inf, sorted_logits)
    inv = jnp.argsort(sort_idx, axis=-1)
    return jnp.take_along_axis(sorted_logits, inv, axis=-1)


def sample_token(logits: jnp.ndarray, key: jax.Array, cfg: SamplingConfig,
                 recent_tokens: jnp.ndarray | None = None,
                 n_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """logits: (vocab,) float; returns scalar int32 token id."""
    logits = logits.astype(jnp.float32)
    if cfg.repeat_penalty != 1.0 and recent_tokens is not None:
        logits = apply_repeat_penalty(logits, recent_tokens, n_valid,
                                      cfg.repeat_penalty)
    if cfg.greedy:
        # fast_argmax, not jnp.argmax: the variadic (value, index) reduce
        # XLA emits for argmax costs ~0.12 ms/step over the 151k vocab —
        # 5% of a whole decode step — where two plain reduces are ~free
        return fast_argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / cfg.temperature
    if cfg.top_k is not None:
        logits = _mask_top_k(logits, cfg.top_k)
    if cfg.top_p is not None and 0.0 < cfg.top_p < 1.0:
        logits = _mask_top_p(logits, cfg.top_p)
    # categorical via the Gumbel trick + fast_argmax (same distribution as
    # jax.random.categorical, which lowers to the slow variadic reduce;
    # -inf-masked lanes get gumbel added but stay -inf, never winning)
    g = jax.random.gumbel(key, logits.shape, jnp.float32)
    return fast_argmax(logits + g, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Batched sampling (continuous batching): one jitted step samples every slot
# with its own (temperature, top_k, top_p, repeat_penalty) carried as (B,)
# arrays, so slot configs change without recompilation.
# ---------------------------------------------------------------------------


def pack_sampling_params(cfgs: "list[SamplingConfig]") -> dict:
    """List of per-slot configs → dict of (B,) device-ready arrays."""
    import numpy as np

    return {
        "temperature": jnp.asarray(
            [0.0 if c.greedy else float(c.temperature) for c in cfgs],
            jnp.float32),
        "top_k": jnp.asarray(
            [int(c.top_k) if c.top_k else 0 for c in cfgs], jnp.int32),
        "top_p": jnp.asarray(
            [float(c.top_p) if (c.top_p and 0.0 < c.top_p < 1.0) else 1.0
             for c in cfgs], jnp.float32),
        "repeat_penalty": jnp.asarray(
            [float(c.repeat_penalty) for c in cfgs], jnp.float32),
        "repeat_last_n": jnp.asarray(
            [int(c.repeat_last_n if c.repeat_last_n is not None
                 else DEFAULT_REPEAT_LAST_N) for c in cfgs], jnp.int32),
    }


def sample_tokens_batch(logits: jnp.ndarray, keys: jax.Array, sp: dict,
                        rings: jnp.ndarray, n_gen: jnp.ndarray) -> jnp.ndarray:
    """logits: (B, V); keys: (B, 2) uint32; sp: pack_sampling_params output;
    rings: (B, W) recent-token rings; n_gen: (B,) tokens generated so far.
    Returns (B,) int32.  Semantics per row match sample_token exactly."""
    logits = logits.astype(jnp.float32)
    B, V = logits.shape
    W = rings.shape[1]

    def one(lg, key, temp, k, p, pen, last_n, ring, n):
        n_valid = jnp.minimum(jnp.minimum(n, last_n), W)
        lg = _penalized(lg, ring, n_valid, pen)   # pen == 1.0 is identity
        greedy_tok = fast_argmax(lg, axis=-1).astype(jnp.int32)
        temp_safe = jnp.maximum(temp, 1e-7)
        sl = lg / temp_safe
        sl = _mask_top_k_dyn(sl, k)
        sl = _mask_top_p_dyn(sl, p)
        samp_tok = jax.random.categorical(key, sl, axis=-1).astype(jnp.int32)
        return jnp.where(temp < 1e-7, greedy_tok, samp_tok)

    return jax.vmap(one)(logits, keys, sp["temperature"], sp["top_k"],
                         sp["top_p"], sp["repeat_penalty"],
                         sp["repeat_last_n"], rings, n_gen)


def _penalized(logits, ring, n_valid, penalty):
    W = ring.shape[0]
    valid = jnp.arange(W) < n_valid
    present = jnp.zeros(logits.shape[-1], jnp.bool_).at[
        jnp.where(valid, ring, 0)].max(valid, mode="drop")
    pen = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(present, pen, logits)


def _mask_top_k_dyn(logits, k):
    """top-k with a traced k; k <= 0 disables."""
    V = logits.shape[-1]
    sorted_desc = -jnp.sort(-logits, axis=-1)
    idx = jnp.clip(k - 1, 0, V - 1)
    kth = sorted_desc[idx]
    keep = (k <= 0) | (logits >= kth)
    return jnp.where(keep, logits, -jnp.inf)


def _mask_top_p_dyn(logits, p):
    """nucleus with a traced p; p >= 1 disables."""
    sort_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cut = (cum > p) & (p < 1.0)
    cut = cut.at[..., 0].set(False)
    sorted_logits = jnp.where(cut, -jnp.inf, sorted_logits)
    inv = jnp.argsort(sort_idx, axis=-1)
    return jnp.take_along_axis(sorted_logits, inv, axis=-1)
