"""Normalization ops.

Functional equivalents of the reference's norm factories
(src/models/common/modules.rs:815-893).  All accumulate in float32 and cast
back to the input dtype — on TPU the cast-to-bf16 output feeds the MXU while
the reduction stays accurate on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (out * weight.astype(jnp.float32)).astype(dtype)


def gated_rms_norm(x: jnp.ndarray, gate: jnp.ndarray, weight: jnp.ndarray,
                   eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm(x) * silu(gate) — Qwen3.5 gated norm (qwen3_5/model.rs:58)."""
    import jax

    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jnp.reciprocal(jnp.sqrt(var + eps)) * weight.astype(jnp.float32)
    out = out * jax.nn.silu(gate.astype(jnp.float32))
    return out.astype(dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray | None,
               eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
