"""Attention ops — XLA reference paths.

Shape convention: q (B, Sq, Hq, D); k/v (B, Skv, Hkv, D); GQA via head
groups (no materialized repeat_kv — the einsum carries the group axis, so
XLA never broadcasts K/V through HBM the way the reference's repeat_kv
tensor op does, src/utils/tensor_utils.rs:108).

Softmax runs in float32 on the VPU; the two matmuls hit the MXU in the
input dtype.  The Pallas fused kernels (aha_tpu/ops/flash_attention.py)
override these on TPU for long sequences; these XLA forms are the numerics
reference and the CPU test path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         mask: jnp.ndarray | None = None,
         scale: float | None = None) -> jnp.ndarray:
    """Scaled dot-product attention with grouped query heads.

    mask: broadcastable to (B, Hq, Sq, Skv), additive (0 / -inf) or boolean.
    Returns (B, Sq, Hq, D).
    """
    B, Sq, Hq, D = q.shape
    Hkv = k.shape[2]
    assert Hq % Hkv == 0, (Hq, Hkv)
    G = Hq // Hkv
    scale = scale if scale is not None else D ** -0.5

    qg = q.reshape(B, Sq, Hkv, G, D)
    # scores: (B, Hkv, G, Sq, Skv)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        m = mask
        if m.dtype == jnp.bool_:
            m = jnp.where(m, 0.0, jnp.finfo(jnp.float32).min)
        if m.ndim == 4:  # (B|1, Hq|1, Sq, Skv) → insert group axis
            if m.shape[1] == Hq and Hq > 1:
                m = m.reshape(m.shape[0], Hkv, G, Sq, m.shape[-1])
            else:
                m = m[:, :, None]
        scores = scores + m.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, Sq, Hq, D).astype(q.dtype)


def _flash_eligible(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    from aha_tpu.utils.device import on_tpu

    S, D = q.shape[1], q.shape[3]
    return (on_tpu() and D % 128 == 0 and S >= 128
            and S % min(512, S) == 0 and k.shape[1] % min(512, k.shape[1]) == 0)


def attention_prefill(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      causal: bool = True,
                      scale: float | None = None) -> jnp.ndarray:
    """Prefill attention: Pallas flash kernel on TPU when shapes align
    (bucketed lengths always do), XLA sdpa otherwise (CPU tests, odd
    shapes)."""
    if _flash_eligible(q, k):
        from aha_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, causal=causal, scale=scale)
    if causal:
        mask = causal_mask(q.shape[1], k.shape[1])
    else:
        mask = None
    return sdpa(q, k, v, mask, scale=scale)


def causal_mask(q_len: int, kv_len: int, q_offset: jnp.ndarray | int = 0,
                kv_valid_len: jnp.ndarray | None = None) -> jnp.ndarray:
    """Additive mask (1, 1, q_len, kv_len): causal w.r.t. absolute positions,
    optionally also masking cache slots >= kv_valid_len (padded KV cache)."""
    q_pos = jnp.arange(q_len)[:, None] + q_offset
    k_pos = jnp.arange(kv_len)[None, :]
    ok = k_pos <= q_pos
    if kv_valid_len is not None:
        ok = ok & (k_pos < kv_valid_len)
    neg = jnp.float32(jnp.finfo(jnp.float32).min)
    return jnp.where(ok, 0.0, neg)[None, None]


def padding_mask(valid_len: jnp.ndarray, kv_len: int) -> jnp.ndarray:
    """Additive (B, 1, 1, kv_len) mask for right-padded sequences."""
    k_pos = jnp.arange(kv_len)[None, :]
    ok = k_pos < valid_len[:, None]
    neg = jnp.float32(jnp.finfo(jnp.float32).min)
    return jnp.where(ok, 0.0, neg)[:, None, None, :]
