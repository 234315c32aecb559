"""aha-tpu: a TPU-native multimodal inference engine.

A from-scratch rebuild of the capabilities of the `jhqxxx/aha` Rust/Candle
engine (reference: /root/reference) designed idiomatically for TPU:

- JAX/XLA-compiled prefill/decode graphs with static shapes and bucketed
  sequence lengths.
- Pallas kernels for the hot ops (fused KV-cache attention, dequant-matmul).
- A `jax.sharding.Mesh`-based parallelism layer so tensor parallelism is a
  config change, not a rewrite (reference is strictly single-device,
  src/utils/mod.rs:30-48 — the mesh module is the TPU-native equivalent).
- Modality frontends (patchify, mel/STFT) as device ops.

Public surface mirrors the reference: `aha {list,download,delete,ps,run,serv,
cli}` CLI and an OpenAI-compatible HTTP server.
"""

__version__ = "0.1.0"


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (off with AHA_NO_COMPILE_CACHE=1).

    TPU compiles of the big decode/prefill graphs take minutes through a
    remote runtime; caching them on disk makes every later server start,
    bench run, and CLI invocation start hot."""
    import os

    if os.environ.get("AHA_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        path = os.environ.get(
            "AHA_COMPILE_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "aha_tpu_xla"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never block import


_enable_compile_cache()
