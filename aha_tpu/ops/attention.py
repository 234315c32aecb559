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

import contextlib

import jax
import jax.numpy as jnp

# Trace-time live-window bound for the decode kernels (see decode_window).
_DECODE_WINDOW: list = [None]


@contextlib.contextmanager
def decode_window(n: int | None):
    """Statically bound the decode kernels' k-grid to `n` cache rows while
    tracing.

    The engine knows, per dispatched block of decode steps, the maximum
    cache depth those steps can reach (pos + block).  Entering this context
    around a jitted call makes every attention_decode* traced inside size
    its Pallas grid to a `n`-row window instead of the full cache bucket —
    at a 4096 bucket with ~100 live rows that removes ~15 skipped-but-
    sequenced grid steps per layer per step (~0.28 ms of a 2.2 ms step).
    Trace-time only: the jit cache key must distinguish window variants
    (the engine keys its compiled fns on the window).  `n` must be >= the
    true live length at every step of the call — a violation silently
    truncates attention.
    """
    _DECODE_WINDOW.append(None if n is None else int(n))
    try:
        yield
    finally:
        _DECODE_WINDOW.pop()


def _window() -> int | None:
    return _DECODE_WINDOW[-1]


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


def segment_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      seg: jnp.ndarray, scale: float | None = None
                      ) -> jnp.ndarray:
    """Self-attention where row i attends row j iff seg[i] == seg[j] —
    vision-tower window attention (Qwen2.5-VL/Qwen3-VL ViTs), NaViT image
    packing (PaddleOCR-VL SigLIP), and FSMN chunking all reduce to this.

    q/k/v: (B, S, H, D); seg: (S,) int32 (seg < 0 rows are padding — they
    attend only each other and produce garbage the caller never reads).

    On TPU this rides the Pallas segment-flash kernel: block-sparse over
    the (sorted) segment band, never materializing the (S, S) mask/score
    matrix the XLA form pays for (1.9 GB/layer at Qwen2.5-VL's 5476-patch
    geometry — the whole r3 VLM TTFT plateau).  Off-TPU: masked sdpa,
    identical numerics.
    """
    from aha_tpu.utils.device import on_tpu

    S = q.shape[1]
    if on_tpu() and S >= 256:
        from aha_tpu.ops.flash_attention import flash_attention_segmented

        return flash_attention_segmented(q, k, v, seg, scale=scale)
    seg = jnp.asarray(seg, jnp.int32)
    mask = jnp.where(seg[:, None] == seg[None, :], 0.0,
                     jnp.finfo(jnp.float32).min)[None, None]
    return sdpa(q, k, v, mask, scale=scale)


def _flash_eligible(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    # D=64 towers (GPT-2, several ViTs) measure 2.0x over sdpa at S=2048
    # on v5e despite lane padding; D%64 is the Mosaic-supported floor.
    from aha_tpu.utils.device import on_tpu

    S, D = q.shape[1], q.shape[3]
    return (on_tpu() and D % 64 == 0 and S >= 128
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


def attention_decode(q: jnp.ndarray, k_all: jnp.ndarray, v_all: jnp.ndarray,
                     pos: jnp.ndarray, scale: float | None = None
                     ) -> jnp.ndarray:
    """Single-token decode attention over a padded KV cache.

    q: (B, 1, Hq, D); k_all/v_all: (B, S_cache, Hkv, D); pos: scalar or (B,)
    int32 — the index the new K/V was just written at (rows 0..pos live).

    On TPU this runs the Pallas dynamic-length kernel (flash_decode), which
    only reads the live cache prefix; off-TPU (or for odd geometries) it
    falls back to masked XLA sdpa over the full bucket — identical numerics.
    """
    import os

    from aha_tpu.utils.device import on_tpu

    B, Sq, Hq, D = q.shape
    Skv = k_all.shape[1]
    bk = min(512 if Skv >= 8192 else 256, Skv)
    enabled = os.environ.get("AHA_DECODE_KERNEL", "1") != "0"
    if (enabled and on_tpu() and Sq == 1 and D % 64 == 0
            and Skv % bk == 0 and Skv >= 256):
        from aha_tpu.ops.flash_attention import flash_decode

        return flash_decode(q, k_all, v_all, pos + 1, scale=scale, block_k=bk,
                            static_max_len=_window())
    k_pos = jnp.arange(Skv)[None, :]
    if jnp.ndim(pos) == 0:
        mask = jnp.where(k_pos <= pos, 0.0,
                         jnp.finfo(jnp.float32).min)[None, None]
    else:
        mask = jnp.where(k_pos <= pos[:, None], 0.0,
                         jnp.finfo(jnp.float32).min)[:, None, None, :]
    return sdpa(q, k_all, v_all, mask, scale=scale)


def attention_decode_at(q: jnp.ndarray, k_stack: jnp.ndarray,
                        v_stack: jnp.ndarray, layer: jnp.ndarray,
                        pos: jnp.ndarray, scale: float | None = None
                        ) -> jnp.ndarray:
    """Decode attention reading layer `layer` straight from the stacked
    cache — (L, B, S, Hkv, D), or FLAT (L, B, S, Hkv·D) rows — with no
    per-layer slice copy (see flash_decode_at_layer).  Fallback slices +
    masked sdpa off-TPU."""
    import os

    from aha_tpu.utils.device import on_tpu

    B, Sq, Hq, D = q.shape
    Skv = k_stack.shape[2]
    flat = k_stack.ndim == 4
    # deeper caches amortize per-grid-step overhead over bigger DMA blocks
    bk = min(512 if Skv >= 8192 else 256, Skv)
    enabled = os.environ.get("AHA_DECODE_KERNEL", "1") != "0"
    if (enabled and on_tpu() and Sq == 1 and D % 64 == 0
            and Skv % bk == 0 and Skv >= 256):
        if flat:
            if B > 1:
                # continuous batching: fold the slots into one k/v block —
                # a (B, nk) grid burns ~38 us of sequencer per call at B=8
                # against ~10 us of useful DMA (see
                # _decode_stacked_flat_batched_kernel)
                from aha_tpu.ops.flash_attention import \
                    flash_decode_at_layer_flat_batched

                return flash_decode_at_layer_flat_batched(
                    q, k_stack, v_stack, layer, pos + 1, scale=scale,
                    static_max_len=_window())
            from aha_tpu.ops.flash_attention import flash_decode_at_layer_flat

            return flash_decode_at_layer_flat(q, k_stack, v_stack, layer,
                                              pos + 1, scale=scale,
                                              block_k=bk,
                                              static_max_len=_window())
        from aha_tpu.ops.flash_attention import flash_decode_at_layer

        return flash_decode_at_layer(q, k_stack, v_stack, layer, pos + 1,
                                     scale=scale, block_k=bk,
                                     static_max_len=_window())
    k_all = jax.lax.dynamic_index_in_dim(k_stack, layer, 0, keepdims=False)
    v_all = jax.lax.dynamic_index_in_dim(v_stack, layer, 0, keepdims=False)
    if flat:
        k_all = k_all.reshape(B, Skv, -1, D)
        v_all = v_all.reshape(B, Skv, -1, D)
    k_pos = jnp.arange(Skv)[None, :]
    if jnp.ndim(pos) == 0:
        mask = jnp.where(k_pos <= pos, 0.0,
                         jnp.finfo(jnp.float32).min)[None, None]
    else:
        mask = jnp.where(k_pos <= pos[:, None], 0.0,
                         jnp.finfo(jnp.float32).min)[:, None, None, :]
    return sdpa(q, k_all, v_all, mask, scale=scale)


def quantize_kv_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 row quantization over the head_dim axis.

    x: (..., D) float → (int8 (..., D), float32 scales (...)).  Per-row,
    per-kv-head absmax scales (the simple end of the low-bit-KV designs in
    PAPERS.md — BitDecoding/VecInfer)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
    qx = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return qx, s


def attention_decode_at_q8(q: jnp.ndarray, k_stack: jnp.ndarray,
                           v_stack: jnp.ndarray, k_scale: jnp.ndarray,
                           v_scale: jnp.ndarray, layer: jnp.ndarray,
                           pos: jnp.ndarray, scale: float | None = None
                           ) -> jnp.ndarray:
    """attention_decode_at over the int8 cache layout: k/v int8 flattened
    (L, B, S, Hkv·D) with per-(row, kv-head) f32 scales, lane-oriented
    (L, B, Hkv, S) — see core/cache.py for the tiling rationale."""
    import os

    from aha_tpu.utils.device import on_tpu

    B, Sq, Hq, D = q.shape
    Skv = k_stack.shape[2]
    Hkv = k_stack.shape[3] // D
    # int8 halves the bytes per row, so the block doubles vs bf16 at equal
    # VMEM footprint — fewer grid steps at long context.  r5 sweep at a
    # 16k cache (scripts/exp_attn_16k.py): 2048 beats 1024 beats 512
    # (79.5 vs 85.2 vs 90.4 us/layer-pass); bf16 cannot go past 512
    # (4 double-buffered 2048-row bf16 blocks blow the 16 MB VMEM)
    bk = min(2048 if Skv >= 16384 else
             (1024 if Skv >= 8192 else (512 if Skv >= 2048 else 256)), Skv)
    enabled = os.environ.get("AHA_DECODE_KERNEL", "1") != "0"
    if (enabled and on_tpu() and Sq == 1 and D % 64 == 0
            and Skv % bk == 0 and Skv >= 256):
        if B > 1:
            # continuous batching: B-folded grid (see the bf16 path above)
            from aha_tpu.ops.flash_attention import \
                flash_decode_at_layer_q8_batched

            return flash_decode_at_layer_q8_batched(
                q, k_stack, v_stack, k_scale, v_scale, layer, pos + 1,
                scale=scale, static_max_len=_window())
        from aha_tpu.ops.flash_attention import flash_decode_at_layer_q8

        return flash_decode_at_layer_q8(q, k_stack, v_stack, k_scale,
                                        v_scale, layer, pos + 1,
                                        scale=scale, block_k=bk,
                                        static_max_len=_window())
    k_all = jax.lax.dynamic_index_in_dim(
        k_stack, layer, 0, keepdims=False).reshape(B, Skv, Hkv, D)
    v_all = jax.lax.dynamic_index_in_dim(
        v_stack, layer, 0, keepdims=False).reshape(B, Skv, Hkv, D)
    # (B, Hkv, S) → (B, S, Hkv) to align with the (B, S, Hkv, D) cache rows
    ks = jax.lax.dynamic_index_in_dim(k_scale, layer, 0,
                                      keepdims=False).transpose(0, 2, 1)
    vs = jax.lax.dynamic_index_in_dim(v_scale, layer, 0,
                                      keepdims=False).transpose(0, 2, 1)
    k_deq = (k_all.astype(jnp.float32) * ks[..., None]).astype(q.dtype)
    v_deq = (v_all.astype(jnp.float32) * vs[..., None]).astype(q.dtype)
    k_pos = jnp.arange(Skv)[None, :]
    if jnp.ndim(pos) == 0:
        mask = jnp.where(k_pos <= pos, 0.0,
                         jnp.finfo(jnp.float32).min)[None, None]
    else:
        mask = jnp.where(k_pos <= pos[:, None], 0.0,
                         jnp.finfo(jnp.float32).min)[:, None, None, :]
    return sdpa(q, k_deq, v_deq, mask, scale=scale)


def attention_prefill_at(q: jnp.ndarray, k_stack: jnp.ndarray,
                         v_stack: jnp.ndarray, layer: jnp.ndarray,
                         start: jnp.ndarray, scale: float | None = None
                         ) -> jnp.ndarray:
    """Prefill attention for a chunk written at cache offset `start`:
    row i of q attends to cache rows [0, start + i] of layer `layer` in the
    stacked (L, B, S, Hkv, D) cache (the prefix rows [0, start) came from a
    prefix cache or an earlier chunk; the chunk's own K/V was just written
    at [start, start + Sq)).  Enables prefix-cached and chunked prefill."""
    D = q.shape[-1]
    k_all = jax.lax.dynamic_index_in_dim(k_stack, layer, 0, keepdims=False)
    v_all = jax.lax.dynamic_index_in_dim(v_stack, layer, 0, keepdims=False)
    if k_stack.ndim == 4:   # flat bf16 rows (see core/cache.py)
        k_all = k_all.reshape(k_all.shape[0], k_all.shape[1], -1, D)
        v_all = v_all.reshape(v_all.shape[0], v_all.shape[1], -1, D)
    mask = causal_mask(q.shape[1], k_all.shape[1], q_offset=start)
    return sdpa(q, k_all, v_all, mask, scale=scale)


def attention_prefill_at_q8(q: jnp.ndarray, k_stack: jnp.ndarray,
                            v_stack: jnp.ndarray, k_scale: jnp.ndarray,
                            v_scale: jnp.ndarray, layer: jnp.ndarray,
                            start: jnp.ndarray, scale: float | None = None
                            ) -> jnp.ndarray:
    """attention_prefill_at over the int8 cache layout (flat (L, B, S,
    Hkv·D) rows + lane-oriented (L, B, Hkv, S) scales): dequantize the
    addressed layer's rows and run the chunk-at-offset sdpa.  This is a
    prefill (one dispatch per chunk, not per token), so the XLA dequant
    fuses into the attention matmuls — no Pallas variant needed."""
    B, Sq, Hq, D = q.shape
    Skv = k_stack.shape[2]
    k_all = jax.lax.dynamic_index_in_dim(
        k_stack, layer, 0, keepdims=False).reshape(B, Skv, -1, D)
    v_all = jax.lax.dynamic_index_in_dim(
        v_stack, layer, 0, keepdims=False).reshape(B, Skv, -1, D)
    # (B, Hkv, S) → (B, S, Hkv, 1) to broadcast over the row dims
    ks = jax.lax.dynamic_index_in_dim(k_scale, layer, 0,
                                      keepdims=False).transpose(0, 2, 1)
    vs = jax.lax.dynamic_index_in_dim(v_scale, layer, 0,
                                      keepdims=False).transpose(0, 2, 1)
    k_deq = (k_all.astype(jnp.float32) * ks[..., None]).astype(q.dtype)
    v_deq = (v_all.astype(jnp.float32) * vs[..., None]).astype(q.dtype)
    mask = causal_mask(Sq, Skv, q_offset=start)
    return sdpa(q, k_deq, v_deq, mask, scale=scale)


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
