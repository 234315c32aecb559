"""2-D convolution helpers (NCHW/OIHW, torch semantics)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv2d(p: dict, x: jnp.ndarray, stride: int = 1, padding: int = 0,
           dilation: int = 1, groups: int = 1) -> jnp.ndarray:
    """x (B, C, H, W), p["w"] (O, I/g, kh, kw), optional p["b"] (O,)."""
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation), feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if "b" in p:
        out = out + p["b"].astype(x.dtype)[None, :, None, None]
    return out


def layer_norm_2d(p: dict, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Channel LayerNorm over NCHW (SAM neck / candle LayerNorm2d)."""
    u = x.mean(axis=1, keepdims=True)
    s = jnp.square(x - u).mean(axis=1, keepdims=True)
    x = (x - u) * jax.lax.rsqrt(s + eps)
    return x * p["w"][None, :, None, None] + p["b"][None, :, None, None]
