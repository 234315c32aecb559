"""Shared test fixtures: build a complete tiny Qwen3-style model repo on disk
(tokenizer.json, chat template, config, generation_config, safetensors) so
the full load_model → template → tokenize → engine path runs without
downloads."""

from __future__ import annotations

import json
import os

CHAT_TEMPLATE = (
    "{%- for message in messages -%}"
    "<|im_start|>{{ message.role }}\n{{ message.content }}<|im_end|>\n"
    "{%- endfor -%}"
    "{%- if add_generation_prompt -%}"
    "<|im_start|>assistant\n"
    "{%- if enable_thinking is defined and not enable_thinking -%}"
    "<think>\n\n</think>\n\n"
    "{%- endif -%}"
    "{%- endif -%}"
)

SPECIALS = ["<|im_start|>", "<|im_end|>", "<|endoftext|>"]
MARKERS = ["<think>", "</think>", "<tool_call>", "</tool_call>"]


def build_tokenizer(path: str):
    from tokenizers import Tokenizer, decoders, pre_tokenizers, trainers
    from tokenizers.models import BPE

    tok = Tokenizer(BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400,
        special_tokens=SPECIALS,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    corpus = [
        "hello world how are you today",
        "the quick brown fox jumps over the lazy dog",
        "assistant user system tool json name arguments",
        "what is the answer to life the universe and everything",
        "你好 世界 谢谢",
    ]
    tok.train_from_iterator(corpus, trainer)
    # markers are NON-special added tokens: they survive decode(skip_special)
    # exactly like Qwen's <think>/<tool_call> (reference behavior)
    from tokenizers import AddedToken

    tok.add_tokens([AddedToken(m, normalized=False) for m in MARKERS])
    tok.save(os.path.join(path, "tokenizer.json"))
    return tok


def build_tiny_qwen3_repo(path: str, seed: int = 0) -> dict:
    """Write a loadable tiny Qwen3 repo; returns the config dict."""
    import numpy as np
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    tok = build_tokenizer(path)
    vocab_size = tok.get_vocab_size()
    eos_id = tok.token_to_id("<|im_end|>")

    cfg = {
        "architectures": ["Qwen3ForCausalLM"],
        "vocab_size": vocab_size,
        "hidden_size": 64,
        "intermediate_size": 128,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 16,
        "rms_norm_eps": 1e-6,
        "rope_theta": 1000000.0,
        "max_position_embeddings": 4096,
        "tie_word_embeddings": True,
        "torch_dtype": "float32",
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump({"eos_token_id": [eos_id], "temperature": 0.7,
                   "top_p": 0.8, "top_k": 20}, f)
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"chat_template": CHAT_TEMPLATE}, f)

    rng = np.random.default_rng(seed)
    d, inter, hd, heads, kvh = 64, 128, 16, 4, 2

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    tensors = {"model.embed_tokens.weight": w(vocab_size, d),
               "model.norm.weight": np.ones(d, np.float32)}
    for i in range(2):
        p = f"model.layers.{i}."
        tensors.update({
            p + "input_layernorm.weight": np.ones(d, np.float32),
            p + "post_attention_layernorm.weight": np.ones(d, np.float32),
            p + "self_attn.q_proj.weight": w(heads * hd, d),
            p + "self_attn.k_proj.weight": w(kvh * hd, d),
            p + "self_attn.v_proj.weight": w(kvh * hd, d),
            p + "self_attn.o_proj.weight": w(d, heads * hd),
            p + "self_attn.q_norm.weight": np.ones(hd, np.float32),
            p + "self_attn.k_norm.weight": np.ones(hd, np.float32),
            p + "mlp.gate_proj.weight": w(inter, d),
            p + "mlp.up_proj.weight": w(inter, d),
            p + "mlp.down_proj.weight": w(d, inter),
        })
    save_file(tensors, os.path.join(path, "model.safetensors"))
    return cfg


def build_tiny_rmbg_repo(path: str, seed: int = 0) -> dict:
    """Write a loadable tiny RMBG-2.0 (BiRefNet) repo: 4-stage Swin with
    embed 8, full deformable decoder."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    cfg = {"patch_size": 4, "embed_dim": 8, "depths": [1, 1, 1, 1],
           "num_heads": [1, 2, 4, 8], "window_size": 4}
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    t = rmbg_state_dict(cfg, seed=seed)
    save_file(t, os.path.join(path, "model.safetensors"))
    return cfg


def rmbg_state_dict(cfg: dict, seed: int = 0) -> dict:
    """Random BiRefNet checkpoint tensors at any Swin geometry (the bench
    uses the real Swin-L numbers; build_tiny_rmbg_repo a toy one)."""
    import numpy as np

    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    def ones(*shape):
        return np.ones(shape, np.float32)

    def zeros(*shape):
        return np.zeros(shape, np.float32)

    t = {}

    def add_ln(name, d):
        t[name + ".weight"] = ones(d)
        t[name + ".bias"] = zeros(d)

    def add_lin(name, i, o, bias=True):
        t[name + ".weight"] = w(o, i)
        if bias:
            t[name + ".bias"] = zeros(o)

    def add_conv(name, i, o, k, bias=True):
        t[name + ".weight"] = w(o, i, k, k)
        if bias:
            t[name + ".bias"] = zeros(o)

    def add_bn(name, d):
        t[name + ".weight"] = ones(d)
        t[name + ".bias"] = zeros(d)
        t[name + ".running_mean"] = zeros(d)
        t[name + ".running_var"] = ones(d)

    E, depths = cfg["embed_dim"], cfg["depths"]
    heads, win = cfg["num_heads"], cfg["window_size"]
    add_conv("bb.patch_embed.proj", 3, E, cfg.get("patch_size", 4))
    add_ln("bb.patch_embed.norm", E)
    feats = [E * 2 ** i for i in range(4)]
    for i in range(4):
        d_i = feats[i]
        for j in range(depths[i]):
            b = f"bb.layers.{i}.blocks.{j}."
            add_ln(b + "norm1", d_i)
            add_ln(b + "norm2", d_i)
            add_lin(b + "attn.qkv", d_i, 3 * d_i)
            add_lin(b + "attn.proj", d_i, d_i)
            t[b + "attn.relative_position_bias_table"] = w(
                (2 * win - 1) ** 2, heads[i])
            add_lin(b + "mlp.fc1", d_i, 4 * d_i)
            add_lin(b + "mlp.fc2", 4 * d_i, d_i)
        if i < 3:
            add_ln(f"bb.layers.{i}.downsample.norm", 4 * d_i)
            add_lin(f"bb.layers.{i}.downsample.reduction", 4 * d_i, 2 * d_i,
                    bias=False)
        add_ln(f"bb.norm{i}", d_i)

    channels = [2 * f for f in reversed(feats)]  # (128, 64, 32, 16)
    ic = 64

    def add_deform(name, i, o, k):
        add_conv(name + ".offset_conv", i, 2 * k * k, k)
        add_conv(name + ".modulator_conv", i, k * k, k)
        add_conv(name + ".regular_conv", i, o, k, bias=False)

    def add_aspp(name, c):
        inter = 256
        for sub, k in (("aspp1", 1), ("aspp_deforms.0", 1),
                       ("aspp_deforms.1", 3), ("aspp_deforms.2", 7)):
            add_deform(f"{name}.{sub}.atrous_conv", c, inter, k)
            add_bn(f"{name}.{sub}.bn", inter)
        add_conv(name + ".global_avg_pool.1", c, inter, 1, bias=False)
        add_bn(name + ".global_avg_pool.2", inter)
        add_conv(name + ".conv1", inter * 5, c, 1, bias=False)
        add_bn(name + ".bn1", c)

    def add_dec_blk(name, i, o):
        add_conv(name + ".conv_in", i, ic, 3)
        add_bn(name + ".bn_in", ic)
        add_aspp(name + ".dec_att", ic)
        add_conv(name + ".conv_out", ic, o, 3)
        add_bn(name + ".bn_out", o)

    def add_simple(name, i, o):
        add_conv(name + ".conv1", i, ic, 3)
        add_conv(name + ".conv_out", ic, o, 3)

    add_dec_blk("squeeze_module.0", sum(channels), channels[0])
    add_simple("decoder.ipt_blk5", 3072, channels[0] // 8)
    add_simple("decoder.ipt_blk4", 768, channels[0] // 8)
    add_simple("decoder.ipt_blk3", 192, channels[1] // 8)
    add_simple("decoder.ipt_blk2", 48, channels[2] // 8)
    add_simple("decoder.ipt_blk1", 3, channels[3] // 8)
    add_dec_blk("decoder.decoder_block4", channels[0] + channels[0] // 8,
                channels[1])
    add_dec_blk("decoder.decoder_block3", channels[1] + channels[0] // 8,
                channels[2])
    add_dec_blk("decoder.decoder_block2", channels[2] + channels[1] // 8,
                channels[3])
    add_dec_blk("decoder.decoder_block1", channels[3] + channels[2] // 8,
                channels[3] // 2)
    add_conv("decoder.conv_out1.0", channels[3] // 2 + channels[3] // 8, 1, 1)
    add_conv("decoder.lateral_block4.conv", channels[1], channels[1], 1)
    add_conv("decoder.lateral_block3.conv", channels[2], channels[2], 1)
    add_conv("decoder.lateral_block2.conv", channels[3], channels[3], 1)
    for n in (4, 3, 2):
        ch = channels[{4: 1, 3: 2, 2: 3}[n]]
        add_conv(f"decoder.gdt_convs_{n}.0", ch, 16, 3)
        add_bn(f"decoder.gdt_convs_{n}.1", 16)
        add_conv(f"decoder.gdt_convs_attn_{n}.0", 16, 1, 1)
    return t


def build_tiny_deepseek_ocr_repo(path: str, seed: int = 0) -> dict:
    """Write a loadable tiny DeepSeek-OCR repo (SAM + CLIP + MoE LM)."""
    import numpy as np
    from safetensors.numpy import save_file
    from tokenizers import AddedToken

    os.makedirs(path, exist_ok=True)
    tok = build_tokenizer(path)
    tok.add_tokens([AddedToken("<image>", normalized=False)])
    tok.save(os.path.join(path, "tokenizer.json"))
    image_token_id = tok.token_to_id("<image>")
    vocab = tok.get_vocab_size(with_added_tokens=True)
    eos_id = tok.token_to_id("<|im_end|>")

    d, inter, moe_f, heads, E, K = 64, 128, 32, 4, 8, 2
    sam_e, sam_depth, sam_heads, sam_out = 32, 3, 4, 16
    net2_c, net3_c = 24, 48
    clip_w, clip_layers, clip_heads = 48, 2, 4
    img_size, ws = 64, 2
    cfg = {
        "language_config": {
            "vocab_size": vocab, "hidden_size": d,
            "intermediate_size": inter, "moe_intermediate_size": moe_f,
            "num_hidden_layers": 3, "num_attention_heads": heads,
            "num_key_value_heads": heads, "n_routed_experts": E,
            "n_shared_experts": 2, "num_experts_per_tok": K,
            "first_k_dense_replace": 1, "norm_topk_prob": True,
            "rms_norm_eps": 1e-6, "max_position_embeddings": 512,
            "bos_token_id": 0, "eos_token_id": eos_id,
        },
        "vision_config": {
            "image_size": img_size, "mlp_ratio": 4.0,
            "width": {
                "sam_vit_b": {"width": sam_e, "layers": sam_depth,
                              "heads": sam_heads, "out_chans": sam_out,
                              "window_size": ws,
                              "downsample_channels": [net2_c, net3_c],
                              "global_attn_indexes": [1]},
                "clip-l-14-224": {"width": clip_w, "layers": clip_layers,
                                  "heads": clip_heads, "image_size": 28,
                                  "patch_size": 14},
            },
        },
        "projector_config": {"input_dim": net3_c + clip_w, "n_embed": d},
        "image_token_id": image_token_id,
        "eos_token_id": eos_id, "bos_token_id": 0,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump({"eos_token_id": [eos_id]}, f)

    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    def ones(*shape):
        return np.ones(shape, np.float32)

    def zeros(*shape):
        return np.zeros(shape, np.float32)

    g = img_size // 16
    t = {"model.sam_model.patch_embed.proj.weight": w(sam_e, 3, 16, 16),
         "model.sam_model.patch_embed.proj.bias": zeros(sam_e),
         "model.sam_model.pos_embed": w(1, g, g, sam_e),
         "model.sam_model.neck.0.weight": w(sam_out, sam_e, 1, 1),
         "model.sam_model.neck.1.weight": ones(sam_out),
         "model.sam_model.neck.1.bias": zeros(sam_out),
         "model.sam_model.neck.2.weight": w(sam_out, sam_out, 3, 3),
         "model.sam_model.neck.3.weight": ones(sam_out),
         "model.sam_model.neck.3.bias": zeros(sam_out),
         "model.sam_model.net_2.weight": w(net2_c, sam_out, 3, 3),
         "model.sam_model.net_3.weight": w(net3_c, net2_c, 3, 3)}
    hd = sam_e // sam_heads
    for i in range(sam_depth):
        b = f"model.sam_model.blocks.{i}."
        size = g if i == 1 else ws
        t.update({
            b + "norm1.weight": ones(sam_e), b + "norm1.bias": zeros(sam_e),
            b + "norm2.weight": ones(sam_e), b + "norm2.bias": zeros(sam_e),
            b + "attn.qkv.weight": w(3 * sam_e, sam_e),
            b + "attn.qkv.bias": zeros(3 * sam_e),
            b + "attn.proj.weight": w(sam_e, sam_e),
            b + "attn.proj.bias": zeros(sam_e),
            b + "attn.rel_pos_h": w(2 * size - 1, hd),
            b + "attn.rel_pos_w": w(2 * size - 1, hd),
            b + "mlp.lin1.weight": w(4 * sam_e, sam_e),
            b + "mlp.lin1.bias": zeros(4 * sam_e),
            b + "mlp.lin2.weight": w(sam_e, 4 * sam_e),
            b + "mlp.lin2.bias": zeros(sam_e),
        })
    cl = "model.vision_model."
    t.update({
        cl + "embeddings.class_embedding": w(clip_w),
        cl + "embeddings.patch_embedding.weight": w(clip_w, 3, 14, 14),
        cl + "embeddings.position_embedding.weight": w(5, clip_w),
        cl + "pre_layrnorm.weight": ones(clip_w),
        cl + "pre_layrnorm.bias": zeros(clip_w),
    })
    for i in range(clip_layers):
        b = f"{cl}transformer.layers.{i}."
        t.update({
            b + "layer_norm1.weight": ones(clip_w),
            b + "layer_norm1.bias": zeros(clip_w),
            b + "layer_norm2.weight": ones(clip_w),
            b + "layer_norm2.bias": zeros(clip_w),
            b + "self_attn.qkv_proj.weight": w(3 * clip_w, clip_w),
            b + "self_attn.qkv_proj.bias": zeros(3 * clip_w),
            b + "self_attn.out_proj.weight": w(clip_w, clip_w),
            b + "self_attn.out_proj.bias": zeros(clip_w),
            b + "mlp.fc1.weight": w(4 * clip_w, clip_w),
            b + "mlp.fc1.bias": zeros(4 * clip_w),
            b + "mlp.fc2.weight": w(clip_w, 4 * clip_w),
            b + "mlp.fc2.bias": zeros(clip_w),
        })
    t.update({
        "model.projector.layers.weight": w(d, net3_c + clip_w),
        "model.projector.layers.bias": zeros(d),
        "model.image_newline": w(d),
        "model.view_seperator": w(d),
        "model.embed_tokens.weight": w(vocab, d),
        "model.norm.weight": ones(d),
        "lm_head.weight": w(vocab, d),
    })
    for i in range(3):
        p = f"model.layers.{i}."
        t.update({
            p + "input_layernorm.weight": ones(d),
            p + "post_attention_layernorm.weight": ones(d),
            p + "self_attn.q_proj.weight": w(d, d),
            p + "self_attn.k_proj.weight": w(d, d),
            p + "self_attn.v_proj.weight": w(d, d),
            p + "self_attn.o_proj.weight": w(d, d),
        })
        if i == 0:
            t.update({p + "mlp.gate_proj.weight": w(inter, d),
                      p + "mlp.up_proj.weight": w(inter, d),
                      p + "mlp.down_proj.weight": w(d, inter)})
        else:
            t[p + "mlp.gate.weight"] = w(E, d)
            for e in range(E):
                q = f"{p}mlp.experts.{e}."
                t.update({q + "gate_proj.weight": w(moe_f, d),
                          q + "up_proj.weight": w(moe_f, d),
                          q + "down_proj.weight": w(d, moe_f)})
            t.update({p + "mlp.shared_experts.gate_proj.weight": w(2 * moe_f, d),
                      p + "mlp.shared_experts.up_proj.weight": w(2 * moe_f, d),
                      p + "mlp.shared_experts.down_proj.weight": w(d, 2 * moe_f)})
    save_file(t, os.path.join(path, "model.safetensors"))
    return cfg


def build_tiny_glm_ocr_repo(path: str, seed: int = 0) -> dict:
    """Tiny GLM-OCR repo. The prompt frame uses fixed special ids
    (59248..59280), so the vocab spans them."""
    import numpy as np
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    build_tokenizer(path)
    vocab = 59300
    d, inter, heads, kvh = 64, 96, 4, 2
    vd, vheads, vdepth = 32, 4, 2
    cfg = {
        "model_type": "glm_ocr",
        "vision_config": {"depth": vdepth, "hidden_size": vd,
                          "num_heads": vheads, "image_size": 28,
                          "patch_size": 14, "spatial_merge_size": 2,
                          "temporal_patch_size": 2, "out_hidden_size": d,
                          "intermediate_size": 48, "attention_bias": False,
                          "rms_norm_eps": 1e-5},
        "text_config": {"vocab_size": vocab, "hidden_size": d,
                        "intermediate_size": inter, "num_hidden_layers": 2,
                        "num_attention_heads": heads,
                        "num_key_value_heads": kvh, "rms_norm_eps": 1e-5,
                        "max_position_embeddings": 1024,
                        "rope_parameters": {"rope_type": "default",
                                            "mrope_section": [2, 1, 1],
                                            "partial_rotary_factor": 0.5,
                                            "rope_theta": 10000.0}},
        "image_token_id": 59280, "image_start_token_id": 59256,
        "image_end_token_id": 59257, "video_token_id": 59281,
        "video_start_token_id": 59258, "video_end_token_id": 59259,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump({"eos_token_id": [59253]}, f)
    with open(os.path.join(path, "preprocessor_config.json"), "w") as f:
        json.dump({"size": {"shortest_edge": 784, "longest_edge": 3136},
                   "patch_size": 14, "merge_size": 2,
                   "temporal_patch_size": 2, "do_rescale": True,
                   "image_mean": [0.5, 0.5, 0.5],
                   "image_std": [0.5, 0.5, 0.5]}, f)

    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    hd = d // heads
    t = {}
    vs = "model.visual."
    t[vs + "patch_embed.proj.weight"] = w(vd, 3, 2, 14, 14)
    t[vs + "patch_embed.proj.bias"] = w(vd)
    t[vs + "post_conv_layernorm.weight"] = np.ones(vd, np.float32)
    t[vs + "embeddings.position_embedding.weight"] = w(4, vd)
    t[vs + "post_layernorm.weight"] = np.ones(vd, np.float32)
    t[vs + "downsample.weight"] = w(d, vd, 2, 2)
    t[vs + "downsample.bias"] = w(d)
    for n, (i, o) in (("proj", (d, d)), ("gate_proj", (d, 48)),
                      ("up_proj", (d, 48)), ("down_proj", (48, d))):
        t[vs + f"merger.{n}.weight"] = w(o, i)
    t[vs + "merger.post_projection_norm.weight"] = np.ones(d, np.float32)
    t[vs + "merger.post_projection_norm.bias"] = np.zeros(d, np.float32)
    for i in range(vdepth):
        b = f"{vs}blocks.{i}."
        t.update({
            b + "norm1.weight": np.ones(vd, np.float32),
            b + "norm2.weight": np.ones(vd, np.float32),
            b + "attn.qkv.weight": w(3 * vd, vd),
            b + "attn.proj.weight": w(vd, vd),
            b + "attn.q_norm.weight": np.ones(vd // vheads, np.float32),
            b + "attn.k_norm.weight": np.ones(vd // vheads, np.float32),
            b + "mlp.gate_proj.weight": w(48, vd),
            b + "mlp.up_proj.weight": w(48, vd),
            b + "mlp.down_proj.weight": w(vd, 48),
        })
    ts = "model.language_model."
    t[ts + "embed_tokens.weight"] = w(vocab, d)
    t[ts + "norm.weight"] = np.ones(d, np.float32)
    t["lm_head.weight"] = w(vocab, d)
    for i in range(2):
        p = f"{ts}layers.{i}."
        t.update({
            p + "input_layernorm.weight": np.ones(d, np.float32),
            p + "post_attention_layernorm.weight": np.ones(d, np.float32),
            p + "post_self_attn_layernorm.weight": np.ones(d, np.float32),
            p + "post_mlp_layernorm.weight": np.ones(d, np.float32),
            p + "self_attn.q_proj.weight": w(heads * hd, d),
            p + "self_attn.q_proj.bias": w(heads * hd),
            p + "self_attn.k_proj.weight": w(kvh * hd, d),
            p + "self_attn.k_proj.bias": w(kvh * hd),
            p + "self_attn.v_proj.weight": w(kvh * hd, d),
            p + "self_attn.v_proj.bias": w(kvh * hd),
            p + "self_attn.o_proj.weight": w(d, heads * hd),
            p + "mlp.gate_up_proj.weight": w(2 * inter, d),
            p + "mlp.down_proj.weight": w(d, inter),
        })
    save_file(t, os.path.join(path, "model.safetensors"))
    return cfg


HY_CHAT_TEMPLATE = (
    "{%- for message in messages -%}"
    "{%- if message.content is string -%}{{ message.content }}"
    "{%- else -%}{%- for part in message.content -%}"
    "{%- if part.type == 'text' -%}{{ part.text }}{%- endif -%}"
    "{%- endfor -%}{%- endif -%}"
    "{%- endfor -%}"
)


def build_tiny_hunyuan_ocr_repo(path: str, seed: int = 0) -> dict:
    import numpy as np
    from safetensors.numpy import save_file
    from tokenizers import AddedToken

    os.makedirs(path, exist_ok=True)
    tok = build_tokenizer(path)
    tok.add_tokens([AddedToken("<｜hy_place▁holder▁no▁102｜>",
                               normalized=False),
                    AddedToken("<｜hy_place▁holder▁no▁799｜>",
                               normalized=False)])
    tok.save(os.path.join(path, "tokenizer.json"))
    image_token_id = tok.token_to_id("<｜hy_place▁holder▁no▁102｜>")
    vocab = tok.get_vocab_size(with_added_tokens=True)
    eos_id = tok.token_to_id("<|im_end|>")

    d, inter, heads, kvh, hd = 64, 96, 4, 2, 16
    vd, vdepth = 32, 2
    cfg = {
        "vocab_size": vocab, "hidden_size": d, "intermediate_size": inter,
        "num_hidden_layers": 2, "num_attention_heads": heads,
        "num_key_value_heads": kvh, "head_dim": hd, "attention_bias": False,
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 1024, "image_token_id": image_token_id,
        "rope_scaling": {"alpha": 1.0, "xdrope_section": [2, 2, 2, 2]},
        "vision_config": {"hidden_size": vd, "intermediate_size": 64,
                          "num_hidden_layers": vdepth,
                          "num_attention_heads": 4, "patch_size": 16,
                          "max_image_size": 64, "spatial_merge_size": 2,
                          "out_hidden_size": d, "rms_norm_eps": 1e-5},
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump({"eos_token_id": [eos_id], "temperature": 0.0,
                   "top_p": 1.0, "top_k": 1}, f)
    with open(os.path.join(path, "preprocessor_config.json"), "w") as f:
        json.dump({"min_pixels": 1024, "max_pixels": 16384, "patch_size": 16,
                   "resample": 3, "temporal_patch_size": 1, "merge_size": 2,
                   "image_mean": [0.5, 0.5, 0.5],
                   "image_std": [0.5, 0.5, 0.5]}, f)
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"chat_template": HY_CHAT_TEMPLATE}, f)

    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    g = 64 // 16
    t = {
        "vit.embeddings.patch_embedding.weight": w(vd, 3, 16, 16),
        "vit.embeddings.patch_embedding.bias": w(vd),
        "vit.embeddings.position_embedding.weight": w(g * g + 1, vd),
        "vit.perceive.before_rms.weight": np.ones(vd, np.float32),
        "vit.perceive.after_rms.weight": np.ones(d, np.float32),
        "vit.perceive.proj.0.weight": w(2 * vd, vd, 2, 2),
        "vit.perceive.proj.0.bias": w(2 * vd),
        "vit.perceive.proj.2.weight": w(4 * vd, 2 * vd, 1, 1),
        "vit.perceive.proj.2.bias": w(4 * vd),
        "vit.perceive.mlp.weight": w(d, 4 * vd),
        "vit.perceive.mlp.bias": w(d),
        "vit.perceive.image_newline": w(4 * vd),
        "vit.perceive.image_begin": w(d),
        "vit.perceive.image_end": w(d),
        "model.embed_tokens.weight": w(vocab, d),
        "model.norm.weight": np.ones(d, np.float32),
    }
    for i in range(vdepth):
        b = f"vit.layers.{i}."
        t.update({
            b + "input_layernorm.weight": np.ones(vd, np.float32),
            b + "input_layernorm.bias": np.zeros(vd, np.float32),
            b + "post_attention_layernorm.weight": np.ones(vd, np.float32),
            b + "post_attention_layernorm.bias": np.zeros(vd, np.float32),
            b + "self_attn.q_proj.weight": w(vd, vd),
            b + "self_attn.q_proj.bias": w(vd),
            b + "self_attn.k_proj.weight": w(vd, vd),
            b + "self_attn.k_proj.bias": w(vd),
            b + "self_attn.v_proj.weight": w(vd, vd),
            b + "self_attn.v_proj.bias": w(vd),
            b + "self_attn.o_proj.weight": w(vd, vd),
            b + "self_attn.o_proj.bias": w(vd),
            b + "mlp.dense_h_to_4h.weight": w(64, vd),
            b + "mlp.dense_h_to_4h.bias": w(64),
            b + "mlp.dense_4h_to_h.weight": w(vd, 64),
            b + "mlp.dense_4h_to_h.bias": w(vd),
        })
    for i in range(2):
        p = f"model.layers.{i}."
        t.update({
            p + "input_layernorm.weight": np.ones(d, np.float32),
            p + "post_attention_layernorm.weight": np.ones(d, np.float32),
            p + "self_attn.q_proj.weight": w(heads * hd, d),
            p + "self_attn.k_proj.weight": w(kvh * hd, d),
            p + "self_attn.v_proj.weight": w(kvh * hd, d),
            p + "self_attn.o_proj.weight": w(d, heads * hd),
            p + "self_attn.query_layernorm.weight": np.ones(hd, np.float32),
            p + "self_attn.key_layernorm.weight": np.ones(hd, np.float32),
            p + "mlp.gate_proj.weight": w(inter, d),
            p + "mlp.up_proj.weight": w(inter, d),
            p + "mlp.down_proj.weight": w(d, inter),
        })
    save_file(t, os.path.join(path, "model.safetensors"))
    return cfg
