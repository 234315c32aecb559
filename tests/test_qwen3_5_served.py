"""Qwen3.5-VL end-to-end: hand-built tiny HF-style repo on disk →
load_model → image chat through the hybrid (GatedDeltaNet) decoder."""

import json
import os

import numpy as np
import pytest

HID, VHID, DEPTH, LAYERS = 48, 32, 3, 4
VOCAB_EXTRA = ("<|vision_start|>", "<|image_pad|>", "<|vision_end|>",
               "<|video_pad|>")


def _lin(rng, i, o, bias=True):
    out = {"weight": rng.standard_normal((o, i)).astype(np.float32) * 0.02}
    if bias:
        out["bias"] = np.zeros(o, np.float32)
    return out


@pytest.fixture(scope="module")
def vl35_repo(tmp_path_factory):
    pytest.importorskip("safetensors")
    return build_vl35_repo(str(tmp_path_factory.mktemp("vl35-tiny")))


def build_vl35_repo(path: str) -> str:
    from safetensors.numpy import save_file

    from tests.fixtures import CHAT_TEMPLATE, build_tokenizer
    from tokenizers import AddedToken

    tok = build_tokenizer(path)
    tok.add_special_tokens([AddedToken(t, special=True) for t in VOCAB_EXTRA])
    tok.save(os.path.join(path, "tokenizer.json"))
    vocab = tok.get_vocab_size()

    cfg = {
        "architectures": ["Qwen3_5ForConditionalGeneration"],
        "image_token_id": tok.token_to_id("<|image_pad|>"),
        "video_token_id": tok.token_to_id("<|video_pad|>"),
        "vision_start_token_id": tok.token_to_id("<|vision_start|>"),
        "text_config": {
            "vocab_size": vocab, "hidden_size": HID,
            "intermediate_size": 96, "num_hidden_layers": LAYERS,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "head_dim": 16, "tie_word_embeddings": True,
            "max_position_embeddings": 4096, "full_attention_interval": 4,
            "linear_num_value_heads": 4, "linear_num_key_heads": 2,
            "linear_key_head_dim": 16, "linear_value_head_dim": 16,
            "linear_conv_kernel_dim": 4,
            "rope_parameters": {"rope_theta": 10000000.0,
                                "partial_rotary_factor": 0.5,
                                "mrope_section": [2, 1, 1],
                                "mrope_interleaved": True},
        },
        "vision_config": {
            "depth": DEPTH, "hidden_size": VHID, "intermediate_size": 64,
            "num_heads": 2, "in_channels": 3, "out_hidden_size": HID,
            "patch_size": 16, "spatial_merge_size": 2,
            "temporal_patch_size": 2, "num_position_embeddings": 16,
            "deepstack_visual_indexes": [0, 1],
        },
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)

    rng = np.random.default_rng(0)
    sd = {"model.embed_tokens.weight":
          rng.standard_normal((vocab, HID)).astype(np.float32) * 0.02,
          "model.norm.weight": np.zeros(HID, np.float32)}
    conv_dim = 2 * 2 * 16 + 4 * 16
    for i in range(LAYERS):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.zeros(HID, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.zeros(HID, np.float32)
        for n, o in (("gate_proj", 96), ("up_proj", 96)):
            sd.update({f"{p}mlp.{n}.weight": _lin(rng, HID, o, 0)["weight"]})
        sd[p + "mlp.down_proj.weight"] = _lin(rng, 96, HID, 0)["weight"]
        if (i + 1) % 4 == 0:  # full attention
            a = p + "self_attn."
            sd[a + "q_proj.weight"] = _lin(rng, HID, 4 * 16 * 2, 0)["weight"]
            sd[a + "k_proj.weight"] = _lin(rng, HID, 2 * 16, 0)["weight"]
            sd[a + "v_proj.weight"] = _lin(rng, HID, 2 * 16, 0)["weight"]
            sd[a + "o_proj.weight"] = _lin(rng, 4 * 16, HID, 0)["weight"]
            sd[a + "q_norm.weight"] = np.zeros(16, np.float32)
            sd[a + "k_norm.weight"] = np.zeros(16, np.float32)
        else:
            la = p + "linear_attn."
            sd[la + "in_proj_qkv.weight"] = _lin(rng, HID, conv_dim, 0)["weight"]
            sd[la + "in_proj_z.weight"] = _lin(rng, HID, 4 * 16, 0)["weight"]
            sd[la + "in_proj_b.weight"] = _lin(rng, HID, 4, 0)["weight"]
            sd[la + "in_proj_a.weight"] = _lin(rng, HID, 4, 0)["weight"]
            sd[la + "out_proj.weight"] = _lin(rng, 4 * 16, HID, 0)["weight"]
            sd[la + "conv1d.weight"] = rng.standard_normal(
                (conv_dim, 1, 4)).astype(np.float32) * 0.1
            sd[la + "dt_bias"] = np.zeros(4, np.float32)
            sd[la + "A_log"] = np.zeros(4, np.float32)
            sd[la + "norm.weight"] = np.ones(16, np.float32)
    in_dim = 3 * 2 * 16 * 16
    unit = 4
    sd["visual.patch_embed.proj.weight"] = rng.standard_normal(
        (VHID, in_dim)).astype(np.float32) * 0.02
    sd["visual.patch_embed.proj.bias"] = np.zeros(VHID, np.float32)
    sd["visual.pos_embed.weight"] = rng.standard_normal(
        (16, VHID)).astype(np.float32) * 0.02
    for name in ["merger."] + [f"deepstack_merger_list.{j}." for j in (0, 1)]:
        m = "visual." + name
        d = unit * VHID
        sd[m + "norm.weight"] = np.ones(d if "deepstack" in name else VHID,
                                        np.float32)
        sd[m + "norm.bias"] = np.zeros(d if "deepstack" in name else VHID,
                                       np.float32)
        sd.update({m + "linear_fc1.weight": _lin(rng, d, d)["weight"],
                   m + "linear_fc1.bias": np.zeros(d, np.float32),
                   m + "linear_fc2.weight": _lin(rng, d, HID)["weight"],
                   m + "linear_fc2.bias": np.zeros(HID, np.float32)})
    for i in range(DEPTH):
        b = f"visual.blocks.{i}."
        sd[b + "norm1.weight"] = np.ones(VHID, np.float32)
        sd[b + "norm1.bias"] = np.zeros(VHID, np.float32)
        sd[b + "norm2.weight"] = np.ones(VHID, np.float32)
        sd[b + "norm2.bias"] = np.zeros(VHID, np.float32)
        for n, (di, do) in (("attn.qkv", (VHID, 3 * VHID)),
                            ("attn.proj", (VHID, VHID)),
                            ("mlp.linear_fc1", (VHID, 64)),
                            ("mlp.linear_fc2", (64, VHID))):
            sd[b + n + ".weight"] = _lin(rng, di, do)["weight"]
            sd[b + n + ".bias"] = np.zeros(do, np.float32)
    save_file(sd, os.path.join(path, "model.safetensors"))

    tpl = CHAT_TEMPLATE.replace(
        "{{ message.content }}",
        "{% if message.content is string %}{{ message.content }}"
        "{% else %}{% for part in message.content %}"
        "{% if part.type == 'text' %}{{ part.text }}"
        "{% elif part.type == 'image_url' %}"
        "<|vision_start|><|image_pad|><|vision_end|>{% endif %}"
        "{% endfor %}{% endif %}")
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"chat_template": tpl}, f)
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump({"eos_token_id": [tok.token_to_id("<|im_end|>")]}, f)
    return path


def _png_data_url(w=64, h=64, seed=0) -> str:
    import base64
    import io

    from PIL import Image

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


def test_qwen3_5_vl_chat_with_image(vl35_repo):
    from aha_tpu.models.loader import load_model
    from aha_tpu.models.qwen3_5_served import Qwen3_5VLChat
    from aha_tpu.params import ChatCompletionParameters

    model = load_model("Qwen/Qwen3.5-2B", vl35_repo, max_seq_len=512)
    assert isinstance(model, Qwen3_5VLChat)
    mes = ChatCompletionParameters.model_validate({
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "describe "},
            {"type": "image_url", "image_url": {"url": _png_data_url()}},
        ]}],
        "model": "m", "max_tokens": 8, "temperature": 0.0})
    resp = model.generate(mes)
    assert resp.choices[0].message.role == "assistant"
    resp2 = model.generate(mes)
    assert resp.choices[0].message.content == resp2.choices[0].message.content

    # text-only request through the same VL model
    mes_t = ChatCompletionParameters.model_validate({
        "messages": [{"role": "user", "content": "hello"}],
        "model": "m", "max_tokens": 4, "temperature": 0.0})
    assert model.generate(mes_t).choices[0].message.content is not None


def test_qwen3_5_text_only_repo(vl35_repo, tmp_path_factory):
    """A config.json without vision_config loads the text-only wrapper."""
    import shutil

    from aha_tpu.models.loader import load_model
    from aha_tpu.models.qwen3_5_served import Qwen3_5Chat

    path = str(tmp_path_factory.mktemp("t35-tiny"))
    for f in os.listdir(vl35_repo):
        shutil.copy(os.path.join(vl35_repo, f), path)
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    del cfg["vision_config"]
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)
    model = load_model("Qwen/Qwen3.5-0.8B", path, max_seq_len=256)
    assert isinstance(model, Qwen3_5Chat)
    from aha_tpu.params import ChatCompletionParameters

    mes = ChatCompletionParameters.model_validate({
        "messages": [{"role": "user", "content": "hi"}],
        "model": "m", "max_tokens": 4, "temperature": 0.0})
    assert model.generate(mes).choices[0].message.content is not None
