"""Device & dtype selection.

Equivalent of the reference's get_device/get_dtype (src/utils/mod.rs:30-115),
reframed for TPU: the accelerator is whatever jax exposes, and the compute
dtype defaults to bfloat16 (TPU-native) instead of the reference's
F16-on-CUDA / BF16-per-SM-arch dance.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_DTYPE_MAP = {
    "float32": jnp.float32,
    "f32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float16": jnp.float16,
    "f16": jnp.float16,
    "int8": jnp.int8,
}


def default_device() -> jax.Device:
    return jax.devices()[0]


def on_tpu() -> bool:
    return default_device().platform in ("tpu", "axon")


def get_cache_dtype(config_dtype: str | None = None) -> jnp.dtype:
    """KV-cache storage dtype.  AHA_KV_INT8=1 selects the int8 quantized
    cache layout (per-row-per-head scales; halves cache HBM traffic for
    long-context decode) on models whose decode path supports it."""
    if os.environ.get("AHA_KV_INT8") == "1":
        return jnp.int8
    return get_dtype(config_dtype)


def get_dtype(config_dtype: str | None = None) -> jnp.dtype:
    """Pick the compute dtype.

    TPU: bfloat16 always (the MXU's native low-precision type); f16 configs
    are mapped to bf16.  CPU (tests): float32 for determinism unless the
    config explicitly asks for bf16.
    """
    override = os.environ.get("AHA_DTYPE")
    if override:
        return _DTYPE_MAP[override.lower()]
    if config_dtype in ("float32", "f32"):
        return jnp.float32
    if on_tpu():
        return jnp.bfloat16
    return jnp.float32


def default_save_dir() -> str:
    """Model weight root — same layout as the reference (~/.aha,
    src/utils/mod.rs:488)."""
    return os.environ.get("AHA_HOME", os.path.expanduser("~/.aha"))


def model_weight_dir(model_id: str) -> str:
    return os.path.join(default_save_dir(), model_id)
