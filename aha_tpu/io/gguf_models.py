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
from aha_tpu.io.weights import to_device
from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model
from aha_tpu.ops.quant_matmul import from_gguf_tensor


def _h(arr, dtype=None) -> np.ndarray:
    """Host-side tensor staging: trees assemble in numpy and ship with one
    batched to_device per loader (a per-tensor jnp.asarray costs a device
    round trip each through a tunneled runtime — see io/weights.py)."""
    arr = np.asarray(arr)
    return arr.astype(np.dtype(dtype)) if dtype is not None else arr


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
    return {"w": _h(gguf.dequantize(name), dtype)}


def _qlin(gguf: GGUFFile, name: str) -> dict:
    p = from_gguf_tensor(gguf, name)
    return {k: p[k] for k in ("qt", "st", "q4", "s4", "b4") if k in p}


# float-stored GGML types (F32=0, F16=1, BF16=30): requantizing these
# through the int8 grid would LOSE precision the checkpoint ships
_FLOAT_GGML_TYPES = {0, 1, 30}


def _lm_head(gguf: GGUFFile, embed_w: np.ndarray, dtype) -> dict:
    """Output head params.  Quantized stored heads stay quantized (llama.cpp
    quantizes output.weight too — it is the single largest weight, 311 MB
    bf16 on a 0.6B vocab head, and batch-1 decode reads it every step; the
    bf16 head forfeited a quarter of the q8 bandwidth win).  But a head the
    checkpoint stores in f16/f32/bf16 keeps full precision as a dense `w`
    (requantizing would silently add error the file doesn't carry), and a
    tied model whose token_embd is float-stored likewise reuses the bf16
    embedding.  Note: quantized heads of any sub-f16 format (Q8_0 included)
    regroup through the int8-per-128 grid, which adds ≤0.5 ulp rounding on
    top of the original quantization (see from_gguf_tensor)."""
    if "output.weight" in gguf.tensors:
        if gguf.tensors["output.weight"].ggml_type in _FLOAT_GGML_TYPES:
            return {"w": _h(gguf.dequantize("output.weight"), dtype).T}
        return _qlin(gguf, "output.weight")
    if gguf.tensors["token_embd.weight"].ggml_type in _FLOAT_GGML_TYPES:
        return {"w": _h(embed_w, dtype).T}
    from aha_tpu.ops.quant_matmul import (_Q4_TYPES, pack_q4_rows,
                                          pack_q8_rows)

    et = gguf.tensors["token_embd.weight"].ggml_type
    w = np.asarray(embed_w, np.float32)
    p = pack_q4_rows(w) if et in _Q4_TYPES else pack_q8_rows(w)
    return {k: p[k] for k in ("qt", "st", "q4", "s4", "b4") if k in p}


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
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *layers)
    embed_w = _h(gguf.dequantize("token_embd.weight"), dtype)
    params = to_device({
        "embed": {"w": embed_w},
        "layers": stacked,
        "norm": _norm(gguf, "output_norm.weight", dtype),
        "lm_head": _lm_head(gguf, embed_w, dtype),
    })
    return model, params, gguf


def qwen3_5_config_from_gguf(gguf: GGUFFile):
    """Metadata mapping for the qwen35 gguf arch (qwen3_5/model.rs:937-975).
    ssm.group_count → linear key heads, ssm.time_step_rank → linear value
    heads, ssm.state_size → linear head dims, rope.dimension_count →
    partial rotary dim."""
    from aha_tpu.models.qwen3_5 import Qwen3_5TextConfig

    arch = gguf.metadata.get("general.architecture", "qwen35")
    n_embd = int(_meta(gguf, arch, "embedding_length"))
    n_head = int(_meta(gguf, arch, "attention.head_count"))
    head_dim = int(_meta(gguf, arch, "attention.key_length",
                         n_embd // n_head))
    return Qwen3_5TextConfig(
        vocab_size=int(gguf.tensors["token_embd.weight"].shape[0]),
        hidden_size=n_embd,
        intermediate_size=int(_meta(gguf, arch, "feed_forward_length")),
        num_hidden_layers=int(_meta(gguf, arch, "block_count")),
        num_attention_heads=n_head,
        num_key_value_heads=int(_meta(gguf, arch, "attention.head_count_kv",
                                      n_head)),
        head_dim=head_dim,
        rms_norm_eps=float(_meta(gguf, arch,
                                 "attention.layer_norm_rms_epsilon", 1e-6)),
        rope_theta=float(_meta(gguf, arch, "rope.freq_base", 10000000.0)),
        partial_rotary_factor=int(_meta(gguf, arch, "rope.dimension_count",
                                        head_dim // 4)) / head_dim,
        max_position_embeddings=int(_meta(gguf, arch, "context_length",
                                          262144)),
        full_attention_interval=int(_meta(gguf, arch,
                                          "full_attention_interval", 4)),
        linear_num_key_heads=int(_meta(gguf, arch, "ssm.group_count")),
        linear_num_value_heads=int(_meta(gguf, arch, "ssm.time_step_rank")),
        linear_key_head_dim=int(_meta(gguf, arch, "ssm.state_size")),
        linear_value_head_dim=int(_meta(gguf, arch, "ssm.state_size")),
        linear_conv_kernel_dim=int(_meta(gguf, arch, "ssm.conv_kernel", 4)),
        tie_word_embeddings="output.weight" not in gguf.tensors,
    )


def load_qwen3_5_gguf(path: str, dtype=jnp.bfloat16, max_rope_len: int = 8192):
    """(model, params, gguf) from a qwen35-architecture .gguf.

    GGUF norm weights are already un-centered (the converter folds the +1;
    the reference's from_weight path uses them as-is, model.rs:41-43), so
    unlike the HF loader nothing is shifted here.  Tensor names per
    qwen3_5/model.rs new_from_gguf: attn_q(+gate fused)/attn_k/attn_v/
    attn_output + attn_{q,k}_norm on full-attention layers; attn_qkv/
    attn_gate/ssm_{beta,alpha,out,conv1d,dt,a,norm} on linear layers;
    attn_norm/post_attention_norm everywhere.
    """
    from aha_tpu.models.qwen3_5 import Qwen3_5Model

    gguf = GGUFFile(path)
    config = qwen3_5_config_from_gguf(gguf)
    model = Qwen3_5Model(config, max_rope_len=max_rope_len)

    layers = []
    for i, kind in enumerate(config.layer_types):
        b = f"blk.{i}."
        lp = {
            "ln1": _norm(gguf, b + "attn_norm.weight", dtype),
            "ln2": _norm(gguf, b + "post_attention_norm.weight", dtype),
            "mlp": {
                "gate": _qlin(gguf, b + "ffn_gate.weight"),
                "up": _qlin(gguf, b + "ffn_up.weight"),
                "down": _qlin(gguf, b + "ffn_down.weight"),
            },
        }
        if kind == "full_attention":
            lp.update({
                "q": _qlin(gguf, b + "attn_q.weight"),
                "k": _qlin(gguf, b + "attn_k.weight"),
                "v": _qlin(gguf, b + "attn_v.weight"),
                "o": _qlin(gguf, b + "attn_output.weight"),
                "q_norm": _norm(gguf, b + "attn_q_norm.weight", dtype),
                "k_norm": _norm(gguf, b + "attn_k_norm.weight", dtype),
            })
        else:
            wconv = gguf.dequantize(b + "ssm_conv1d.weight")  # (D, 1, K)
            lp.update({
                "in_proj_qkv": _qlin(gguf, b + "attn_qkv.weight"),
                "in_proj_z": _qlin(gguf, b + "attn_gate.weight"),
                "in_proj_b": _qlin(gguf, b + "ssm_beta.weight"),
                "in_proj_a": _qlin(gguf, b + "ssm_alpha.weight"),
                "out_proj": _qlin(gguf, b + "ssm_out.weight"),
                "conv": {"w": _h(wconv[:, 0, :].T, jnp.float32)},
                "dt_bias": _h(gguf.dequantize(b + "ssm_dt.bias"),
                              jnp.float32),
                "a_log": _h(gguf.dequantize(b + "ssm_a"), jnp.float32),
                "norm": _norm(gguf, b + "ssm_norm.weight", dtype),
            })
        layers.append(lp)
    embed_w = _h(gguf.dequantize("token_embd.weight"), dtype)
    params = to_device({
        "embed": {"w": embed_w},
        "layers": layers,
        "norm": _norm(gguf, "output_norm.weight", dtype),
        "lm_head": _lm_head(gguf, embed_w, dtype),
    })
    return model, params, gguf


# ---------------------------------------------------------------------------
# mmproj (vision tower) GGUF — Qwen3-VL deepstack ViT for Qwen3.5-GGUF
# image chat (reference: qwen3vl/model.rs new_from_gguf :425-510, factory
# src/models/mod.rs:194-212 passing mmproj_path).
# ---------------------------------------------------------------------------


def qwen3vl_vision_config_from_mmproj(gguf: GGUFFile):
    """clip.vision.* metadata → Qwen3VLVisionConfig.  Deepstack tap layers
    come from the is_deepstack_layers bool array; out_hidden_size from the
    mm.2 projector's output dim."""
    from aha_tpu.models.qwen3vl import Qwen3VLVisionConfig

    m = gguf.metadata
    hidden = int(m["clip.vision.embedding_length"])
    patch = int(m["clip.vision.patch_size"])
    image = int(m["clip.vision.image_size"])
    is_ds = m.get("clip.vision.is_deepstack_layers") or []
    return Qwen3VLVisionConfig(
        depth=int(m["clip.vision.block_count"]),
        hidden_size=hidden,
        intermediate_size=int(m.get("clip.vision.feed_forward_length",
                                    4 * hidden)),
        num_heads=int(m["clip.vision.attention.head_count"]),
        out_hidden_size=int(gguf.tensors["mm.2.weight"].shape[0]),
        patch_size=patch,
        spatial_merge_size=int(m.get("clip.vision.spatial_merge_size", 2)),
        temporal_patch_size=2,
        num_position_embeddings=(image // patch) ** 2,
        deepstack_visual_indexes=tuple(
            i for i, b in enumerate(is_ds) if b))


def load_qwen3vl_tower_mmproj(path: str, dtype=jnp.bfloat16):
    """(vision_config, visual_params) from an mmproj .gguf.

    Tower weights are DEQUANTIZED to `dtype` at load: the ViT runs once per
    image inside prefill, where full-width MXU matmuls beat streaming
    dequant (unlike the per-token decode path, which keeps the decoder
    block-quantized for the dequant-matmul kernel)."""
    gguf = GGUFFile(path)
    vcfg = qwen3vl_vision_config_from_mmproj(gguf)

    def lin(name):
        p = {"w": _h(gguf.dequantize(name + ".weight"), dtype).T}
        if name + ".bias" in gguf:
            p["b"] = _h(gguf.dequantize(name + ".bias"), dtype)
        return p

    def lnorm(name):
        p = {"w": _h(gguf.dequantize(name + ".weight"), dtype)}
        if name + ".bias" in gguf:
            p["b"] = _h(gguf.dequantize(name + ".bias"), dtype)
        return p

    # conv3d patch embed ships as two temporal slices (hidden, 3, p, p):
    # "v.patch_embd.weight" (t=0) and ".weight.1" (t=1) — reassemble the
    # (hidden, 3, tps, p, p) kernel, flatten to our matmul layout
    w0 = np.asarray(gguf.dequantize("v.patch_embd.weight"))
    if "v.patch_embd.weight.1" in gguf:
        pe = np.stack([w0, np.asarray(
            gguf.dequantize("v.patch_embd.weight.1"))], axis=2)
    else:
        pe = w0[:, :, None]
    in_dim = int(np.prod(pe.shape[1:]))
    visual = {
        "patch_embed": {
            "w": _h(pe.reshape(vcfg.hidden_size, in_dim).T, dtype),
            "b": _h(gguf.dequantize("v.patch_embd.bias"), dtype),
        },
        "pos_embed": {"w": _h(
            gguf.dequantize("v.position_embd.weight"), dtype)},
        "blocks": [{
            "norm1": lnorm(f"v.blk.{i}.ln1"),
            "norm2": lnorm(f"v.blk.{i}.ln2"),
            "qkv": lin(f"v.blk.{i}.attn_qkv"),
            "proj": lin(f"v.blk.{i}.attn_out"),
            "fc1": lin(f"v.blk.{i}.ffn_up"),
            "fc2": lin(f"v.blk.{i}.ffn_down"),
        } for i in range(vcfg.depth)],
        "merger": {"norm": lnorm("v.post_ln"),
                   "fc1": lin("mm.0"), "fc2": lin("mm.2")},
        "ds_mergers": [{
            "norm": lnorm(f"v.deepstack.{i}.norm"),
            "fc1": lin(f"v.deepstack.{i}.fc1"),
            "fc2": lin(f"v.deepstack.{i}.fc2"),
        } for i in vcfg.deepstack_visual_indexes],
    }
    return vcfg, to_device(visual)


def _token_id(gguf: GGUFFile, token: str, default: int) -> int:
    toks = gguf.metadata.get("tokenizer.ggml.tokens") or []
    try:
        return toks.index(token)
    except ValueError:
        return default


def load_qwen3_5_gguf_vl(path: str, mmproj_path: str, dtype=jnp.bfloat16,
                         max_rope_len: int = 8192):
    """(model, params, gguf, vl_config): Qwen3.5 decoder from the model
    gguf + deepstack vision tower from the mmproj gguf
    (qwen3_5/generate.rs:107-140, model.rs:1114-1123)."""
    from aha_tpu.models.qwen3_5 import Qwen3_5Config, Qwen3_5Model

    # one header/tensor-table parse: reuse the decoder loader's GGUFFile and
    # derive the text config from the model it built
    _, params, gguf = load_qwen3_5_gguf(path, dtype=dtype,
                                        max_rope_len=max_rope_len)
    config = qwen3_5_config_from_gguf(gguf)
    vcfg, visual = load_qwen3vl_tower_mmproj(mmproj_path, dtype=dtype)
    sections = list(gguf.metadata.get("qwen35.rope.dimension_sections")
                    or [8, 4, 4, 0])[:-1]   # last entry unused (model.rs:959)
    vl_config = Qwen3_5Config(
        text=config, vision=vcfg, mrope_section=tuple(sections),
        image_token_id=_token_id(gguf, "<|image_pad|>", 151655),
        video_token_id=_token_id(gguf, "<|video_pad|>", 151656),
        vision_start_token_id=_token_id(gguf, "<|vision_start|>", 151652))
    model = Qwen3_5Model(config, max_rope_len=max_rope_len,
                         vl_config=vl_config)
    params["visual"] = visual
    return model, params, gguf, vl_config
