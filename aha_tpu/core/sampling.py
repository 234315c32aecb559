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


def apply_repeat_penalty(logits: jnp.ndarray, recent_tokens: jnp.ndarray,
                         n_valid: jnp.ndarray, penalty: float) -> jnp.ndarray:
    """Penalize tokens present in the recent window.

    recent_tokens: (W,) int32 ring of recent token ids, n_valid of them
    meaningful.  Invalid slots point at token 0 but are masked out.
    """
    W = recent_tokens.shape[0]
    valid = jnp.arange(W) < n_valid
    present = jnp.zeros(logits.shape[-1], jnp.bool_).at[
        jnp.where(valid, recent_tokens, 0)
    ].set(valid, mode="drop")
    # slot 0 may be polluted by masked writes only when some write was invalid
    # with token 0 — .set(valid) writes False there, so it's exact.
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
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / cfg.temperature
    if cfg.top_k is not None:
        logits = _mask_top_k(logits, cfg.top_k)
    if cfg.top_p is not None and 0.0 < cfg.top_p < 1.0:
        logits = _mask_top_p(logits, cfg.top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
