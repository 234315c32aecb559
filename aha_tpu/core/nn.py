"""Minimal functional layer library.

TPU-first replacement for the reference's shared module zoo
(src/models/common/modules.rs): parameters are plain pytrees (nested dicts
of jnp arrays), layers are pure functions — everything composes under jit,
vmap, and sharding with zero framework overhead.

Linear weights are stored **(in, out)** so the forward is `x @ w` (torch
checkpoints store (out, in); loaders transpose once at load time).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.ops.norms import layer_norm, rms_norm

Params = dict


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "qt" in p or "q4" in p:  # GGUF block-quantized → quant-matmul kernel
        from aha_tpu.ops.quant_matmul import quant_linear

        return quant_linear(p, x)
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def embedding(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["w"], ids, axis=0)


def swiglu_mlp(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """gate/up/down MLP with SiLU (modules.rs GateUpDownMLP, :48).

    Accepts either separate gate/up weights or a fused ``gateup`` matrix
    ([gate | up] on the output axis — see qwen3.fuse_decode_params): one
    matmul streams both weight blocks HBM→MXU in a single pass, which
    matters at M=1 decode where each extra op pays fixed overhead.

    Quantized gateup+down pairs at decode M additionally fuse the WHOLE
    MLP into one Pallas launch on TPU (ops/quant_matmul.quant_swiglu):
    the intermediate activations stay in VMEM and the layer pays one
    kernel fixed cost instead of two."""
    if "gateup" in p:
        gu, dn = p["gateup"], p["down"]
        if "w" not in gu and "w" not in dn:
            from aha_tpu.ops.quant_matmul import quant_swiglu, swiglu_fusable
            from aha_tpu.utils.device import on_tpu

            m = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
            if on_tpu() and swiglu_fusable(gu, dn, m):
                return quant_swiglu(gu, dn, x)
        g, u = jnp.split(linear(gu, x), 2, axis=-1)
        return linear(dn, jax.nn.silu(g) * u)
    return linear(p["down"], jax.nn.silu(linear(p["gate"], x)) * linear(p["up"], x))


def gelu_mlp(p: Params, x: jnp.ndarray, approximate: bool = True) -> jnp.ndarray:
    """two-linear MLP with GELU (modules.rs TwoLinearMLP, :89)."""
    return linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], x), approximate=approximate))


def rms(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    return rms_norm(x, p["w"], eps)


def ln(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    return layer_norm(x, p["w"], p.get("b"), eps)


# ---------------------------------------------------------------------------
# Loader helpers: checkpoint names → our layout
# ---------------------------------------------------------------------------


def take_linear(src, name: str, dtype, transpose: bool = True) -> Params:
    """Load `{name}.weight` (+ optional bias) from a WeightSource."""
    w = src.get(f"{name}.weight", dtype)
    p: Params = {"w": w.T if transpose else w}
    if f"{name}.bias" in src:
        p["b"] = src.get(f"{name}.bias", dtype)
    return p


def take_norm(src, name: str, dtype) -> Params:
    p: Params = {"w": src.get(f"{name}.weight", dtype)}
    if f"{name}.bias" in src:
        p["b"] = src.get(f"{name}.bias", dtype)
    return p


def take_embedding(src, name: str, dtype) -> Params:
    return {"w": src.get(f"{name}.weight", dtype)}


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))
