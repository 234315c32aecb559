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
