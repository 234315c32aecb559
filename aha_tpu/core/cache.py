"""KV cache as explicit functional state.

The reference mutates KV tensors inside attention objects via concat
(src/models/common/modules.rs QKNormAttention :447-583) — unbounded shapes,
a new allocation per token.  The TPU-native design preallocates a static
(B, max_len, Hkv, D) buffer per layer and writes with dynamic_update_slice;
under jit with donated cache arguments XLA performs the update in place in
HBM, so a decode step does zero cache allocation.

The cache pytree also carries `pos` (int32 scalar per batch-independent
stream) so prefill/decode are pure functions of (params, cache, tokens).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def init_kv_cache(n_layers: int, batch: int, max_len: int, n_kv_heads: int,
                  head_dim: int, dtype=jnp.bfloat16,
                  flat: bool = False) -> dict[str, Any]:
    """dtype=jnp.int8 selects the quantized cache layout: int8 K/V plus
    per-(row, kv-head) float32 scales (halves cache HBM traffic; decode
    dequantizes per block inside the Pallas kernel).  `flat` stores bf16
    K/V rows flattened (L, B, S, Hkv·D) like the int8 layout — per-head
    reads in the decode kernel become static lane slices on full tiles."""
    if dtype == jnp.int8:
        # int8 K/V are stored FLATTENED (L, B, S, Hkv·D): with (Hkv, D) =
        # e.g. (8, 128) as the minor dims, int8's (32, 128) tiling pads the
        # sublane axis 4× — flat rows are full tiles, and per-head reads in
        # the decode kernel become static lane slices.  Scales are
        # LANE-oriented (L, B, Hkv, S): the decode kernel reads a per-head
        # (block_k,) scale row as a lane vector directly — the
        # (L, B, S, Hkv) layout forced a sublane→lane relayout per head per
        # block that ate the entire int8 bandwidth win (r2: 115 vs 167 tok/s)
        cache = {
            "k": jnp.zeros((n_layers, batch, max_len,
                            n_kv_heads * head_dim), dtype),
            "v": jnp.zeros((n_layers, batch, max_len,
                            n_kv_heads * head_dim), dtype),
            "pos": jnp.zeros((), jnp.int32),
            "k_scale": jnp.zeros((n_layers, batch, n_kv_heads, max_len),
                                 jnp.float32),
            "v_scale": jnp.zeros((n_layers, batch, n_kv_heads, max_len),
                                 jnp.float32),
        }
        return cache
    shape = ((n_layers, batch, max_len, n_kv_heads * head_dim) if flat
             else (n_layers, batch, max_len, n_kv_heads, head_dim))
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "pos": jnp.zeros((), jnp.int32),
    }


def cache_max_len(cache: dict[str, Any]) -> int:
    return cache["k"].shape[2]


def update_layer(cache: dict[str, Any], layer: int, k_new: jnp.ndarray,
                 v_new: jnp.ndarray) -> tuple[dict[str, Any], jnp.ndarray, jnp.ndarray]:
    """Write k/v for `layer` at [pos : pos+S) and return full-length views.

    k_new/v_new: (B, S, Hkv, D).  Returns (cache, k_all, v_all) where
    k_all/v_all are the (B, max_len, Hkv, D) buffers after the write.
    """
    pos = cache["pos"]
    k = jax.lax.dynamic_update_slice(
        cache["k"], k_new[None], (layer, 0, pos, 0, 0))
    v = jax.lax.dynamic_update_slice(
        cache["v"], v_new[None], (layer, 0, pos, 0, 0))
    cache = {**cache, "k": k, "v": v}
    return cache, k[layer], v[layer]


def advance(cache: dict[str, Any], n: jnp.ndarray | int) -> dict[str, Any]:
    return {**cache, "pos": cache["pos"] + jnp.asarray(n, jnp.int32)}


def reset(cache: dict[str, Any]) -> dict[str, Any]:
    """clear_cache equivalent (common/mod.rs:25-45): rewind the write head.

    Stale K/V past pos are never read (length-masked), so zeroing them is
    unnecessary.  Rolling state (hybrid conv windows / recurrent state) IS
    read by every step regardless of pos, so a pooled cache must hand the
    next request zeroed state (the models also ignore stale state on fresh
    prefills — belt and braces).
    """
    out = {**cache, "pos": jnp.zeros((), jnp.int32)}
    for name in ("conv", "rec"):
        if name in cache:
            out[name] = jnp.zeros_like(cache[name])
    return out
