"""Rotary position embeddings.

Covers the reference's RoPE family (src/position_embed/rope.rs): the default
half-rotation form, the interleaved form, M-RoPE (multimodal 3-D sections,
rope.rs:40 and :358-581), and partial-rotary variants.  Tables are
precomputed once as jnp arrays and gathered by position — no recompute per
step, and gathers fuse into the attention prologue under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope_table(head_dim: int, max_len: int, theta: float = 10000.0,
               scaling: np.ndarray | float | None = None,
               dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables of shape (max_len, head_dim // 2).

    `scaling` supports LongRoPE-style per-frequency factors (minicpm4) or a
    scalar attention-scaling multiplier applied to both tables.
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, half, dtype=np.float64) / half))
    if isinstance(scaling, np.ndarray):
        inv_freq = inv_freq / scaling
    t = np.arange(max_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq)
    cos, sin = np.cos(freqs), np.sin(freqs)
    if isinstance(scaling, float):
        cos, sin = cos * scaling, sin * scaling
    return jnp.asarray(cos, dtype=dtype), jnp.asarray(sin, dtype=dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray,
               sin: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Half-rotation RoPE.

    q/k: (..., seq, heads, head_dim); cos/sin: (seq, head_dim//2) —
    broadcast over the heads axis.
    """
    cos2 = jnp.concatenate([cos, cos], axis=-1)[..., :, None, :]
    sin2 = jnp.concatenate([sin, sin], axis=-1)[..., :, None, :]
    cos2 = cos2.astype(q.dtype)
    sin2 = sin2.astype(q.dtype)
    q_out = q * cos2 + rotate_half(q) * sin2
    k_out = k * cos2 + rotate_half(k) * sin2
    return q_out, k_out


def apply_rope_interleaved(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray,
                           sin: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Interleaved (GPT-NeoX pairwise) rotation: pairs (x0,x1),(x2,x3)..."""

    def rot(x):
        x_pairs = x.reshape(*x.shape[:-1], -1, 2)
        x1, x2 = x_pairs[..., 0], x_pairs[..., 1]
        c = cos[..., :, None, :]
        s = sin[..., :, None, :]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        return jnp.stack([o1, o2], axis=-1).reshape(x.shape).astype(x.dtype)

    return rot(q), rot(k)


def apply_partial_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray,
                       sin: jnp.ndarray, rotary_dim: int
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate only the first `rotary_dim` channels (GLM-ASR/OCR variants,
    rope.rs:172/:245); the rest pass through."""
    q_rot, q_pass = q[..., :rotary_dim], q[..., rotary_dim:]
    k_rot, k_pass = k[..., :rotary_dim], k[..., rotary_dim:]
    q_rot, k_rot = apply_rope(q_rot, k_rot, cos, sin)
    return (jnp.concatenate([q_rot, q_pass], axis=-1),
            jnp.concatenate([k_rot, k_pass], axis=-1))


def gather_rope(cos: jnp.ndarray, sin: jnp.ndarray, positions: jnp.ndarray
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Select per-token cos/sin rows for arbitrary position ids."""
    return jnp.take(cos, positions, axis=0), jnp.take(sin, positions, axis=0)


# ---------------------------------------------------------------------------
# M-RoPE (multimodal 3-D rope, Qwen-VL family)
# ---------------------------------------------------------------------------


def mrope_cos_sin(cos: jnp.ndarray, sin: jnp.ndarray,
                  position_ids: jnp.ndarray,
                  mrope_section: tuple[int, ...],
                  interleaved: bool = False
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Merge 3-D (t/h/w) position ids into one cos/sin per token.

    position_ids: (3, seq).  mrope_section gives how many frequency channels
    (of head_dim//2) each of t/h/w owns (rope.rs:40 apply_multimodel_rotary_
    pos_emb).  `interleaved` selects Qwen3-VL's round-robin channel
    assignment (rope.rs:444-581) instead of contiguous chunks.
    """
    # (3, seq, half)
    cos3 = jnp.take(cos, position_ids, axis=0)
    sin3 = jnp.take(sin, position_ids, axis=0)
    half = cos.shape[-1]
    if interleaved:
        # channel c belongs to section c % 3 for c < 3*min_section, rest to t
        n = len(mrope_section)
        idx = np.arange(half)
        sec = np.where(idx < n * min(mrope_section), idx % n, 0)
    else:
        sec = np.zeros(half, dtype=np.int64)
        start = 0
        for i, width in enumerate(mrope_section):
            sec[start:start + width] = i
            start += width
        sec[start:] = 0
    sel = jnp.asarray(sec)
    # per-channel gather along the section axis: out[s, c] = table[sec[c], s, c]
    cos_m = jnp.take_along_axis(cos3, sel[None, None, :], axis=0)[0]
    sin_m = jnp.take_along_axis(sin3, sel[None, None, :], axis=0)[0]
    return cos_m, sin_m
