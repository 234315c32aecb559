"""Load GGUF checkpoints into runnable models.

Equivalent of the reference's load_gguf_model + per-module new_from_gguf
paths (src/models/mod.rs:194-212, qwen3_5/model.rs): llama.cpp tensor naming
(token_embd, blk.N.attn_q, …) mapped into our param trees, with linear
weights kept block-quantized for the dequant-matmul kernel and
embeddings/norms/lm_head dequantized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.io.gguf import GGUFFile
from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model
from aha_tpu.ops.quant_matmul import from_gguf_tensor


def _meta(gguf: GGUFFile, arch: str, key: str, default=None):
    return gguf.metadata.get(f"{arch}.{key}", default)


def qwen3_config_from_gguf(gguf: GGUFFile) -> Qwen3Config:
    arch = gguf.metadata.get("general.architecture", "qwen3")
    n_embd = int(_meta(gguf, arch, "embedding_length"))
    n_head = int(_meta(gguf, arch, "attention.head_count"))
    return Qwen3Config(
        vocab_size=int(gguf.tensors["token_embd.weight"].shape[0]),
        hidden_size=n_embd,
        intermediate_size=int(_meta(gguf, arch, "feed_forward_length")),
        num_hidden_layers=int(_meta(gguf, arch, "block_count")),
        num_attention_heads=n_head,
        num_key_value_heads=int(_meta(gguf, arch, "attention.head_count_kv",
                                      n_head)),
        head_dim=int(_meta(gguf, arch, "attention.key_length",
                           n_embd // n_head)),
        rms_norm_eps=float(_meta(gguf, arch,
                                 "attention.layer_norm_rms_epsilon", 1e-6)),
        rope_theta=float(_meta(gguf, arch, "rope.freq_base", 1000000.0)),
        max_position_embeddings=int(_meta(gguf, arch, "context_length",
                                          40960)),
        tie_word_embeddings="output.weight" not in gguf.tensors,
    )


def _norm(gguf: GGUFFile, name: str, dtype) -> dict:
    return {"w": jnp.asarray(gguf.dequantize(name), dtype)}


def _qlin(gguf: GGUFFile, name: str) -> dict:
    p = from_gguf_tensor(gguf, name)
    return {"qt": jnp.asarray(p["qt"]), "st": jnp.asarray(p["st"])}


def load_qwen3_gguf(path: str, dtype=jnp.bfloat16, max_rope_len: int = 8192
                    ) -> tuple[Qwen3Model, dict, GGUFFile]:
    """(model, params, gguf) from a qwen3-architecture .gguf file.

    Linear weights stay quantized (the scan stacks their int8/scale leaves);
    embeddings, norms, and lm_head are dequantized.
    """
    gguf = GGUFFile(path)
    config = qwen3_config_from_gguf(gguf)
    model = Qwen3Model(config, max_rope_len=max_rope_len)

    layers = []
    for i in range(config.num_hidden_layers):
        b = f"blk.{i}."
        layers.append({
            "ln1": _norm(gguf, b + "attn_norm.weight", dtype),
            "ln2": _norm(gguf, b + "ffn_norm.weight", dtype),
            "q": _qlin(gguf, b + "attn_q.weight"),
            "k": _qlin(gguf, b + "attn_k.weight"),
            "v": _qlin(gguf, b + "attn_v.weight"),
            "o": _qlin(gguf, b + "attn_output.weight"),
            "q_norm": _norm(gguf, b + "attn_q_norm.weight", dtype),
            "k_norm": _norm(gguf, b + "attn_k_norm.weight", dtype),
            "mlp": {
                "gate": _qlin(gguf, b + "ffn_gate.weight"),
                "up": _qlin(gguf, b + "ffn_up.weight"),
                "down": _qlin(gguf, b + "ffn_down.weight"),
            },
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    embed_w = jnp.asarray(gguf.dequantize("token_embd.weight"), dtype)
    if "output.weight" in gguf.tensors:
        lm_head = {"w": jnp.asarray(gguf.dequantize("output.weight"),
                                    dtype).T}
    else:
        lm_head = {"w": embed_w.T}
    params = {
        "embed": {"w": embed_w},
        "layers": stacked,
        "norm": _norm(gguf, "output_norm.weight", dtype),
        "lm_head": lm_head,
    }
    return model, params, gguf
