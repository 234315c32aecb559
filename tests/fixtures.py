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
