"""Qwen3-VL end-to-end: tiny repo on disk → load_model → image chat."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def vl3_repo(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Qwen3VLConfig as HFConfig
    from transformers.models.qwen3_vl import Qwen3VLForConditionalGeneration

    from tests.fixtures import CHAT_TEMPLATE, build_tokenizer

    path = str(tmp_path_factory.mktemp("vl3-tiny"))
    from tokenizers import AddedToken

    tok = build_tokenizer(path)
    tok.add_special_tokens([AddedToken(t, special=True) for t in
                            ("<|vision_start|>", "<|image_pad|>",
                             "<|vision_end|>", "<|video_pad|>")])
    tok.save(os.path.join(path, "tokenizer.json"))

    cfg = HFConfig(
        vision_config=dict(
            depth=3, hidden_size=32, intermediate_size=64, num_heads=2,
            in_channels=3, out_hidden_size=48, patch_size=16,
            spatial_merge_size=2, temporal_patch_size=2,
            num_position_embeddings=16, deepstack_visual_indexes=[0, 1],
            hidden_act="gelu"),
        text_config=dict(
            vocab_size=tok.get_vocab_size(), hidden_size=48,
            intermediate_size=96, num_hidden_layers=3,
            num_attention_heads=4, num_key_value_heads=2, head_dim=12,
            rope_theta=1000000.0, max_position_embeddings=4096,
            tie_word_embeddings=True,
            rope_scaling={"rope_type": "default",
                          "mrope_section": [2, 2, 2],
                          "mrope_interleaved": True},
            attention_dropout=0.0),
        image_token_id=tok.token_to_id("<|image_pad|>"),
        video_token_id=tok.token_to_id("<|video_pad|>"),
        vision_start_token_id=tok.token_to_id("<|vision_start|>"),
        vision_end_token_id=tok.token_to_id("<|vision_end|>"))
    torch.manual_seed(0)
    Qwen3VLForConditionalGeneration(cfg).save_pretrained(path)

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


def _png_data_url(w=64, h=64) -> str:
    import base64
    import io

    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


def test_qwen3vl_chat_with_image(vl3_repo):
    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters

    model = load_model("Qwen/Qwen3-VL-2B-Instruct", vl3_repo, max_seq_len=512)
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

    # text-only through the same model
    mes_t = ChatCompletionParameters.model_validate({
        "messages": [{"role": "user", "content": "hello"}],
        "model": "m", "max_tokens": 4, "temperature": 0.0})
    assert model.generate(mes_t).choices[0].message.content is not None


def test_qwen3vl_served_tp_matches_single_device(vl3_repo):
    """--tp through the SERVED wrapper (not just the bare model): the
    sharded load produces the same greedy image-chat output as tp=1.
    Guards the 32B-on-a-16GB-chip deployment: --tp must never be a silent
    no-op in a serving path."""
    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters

    mes = ChatCompletionParameters.model_validate({
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "read "},
            {"type": "image_url", "image_url": {"url": _png_data_url()}},
        ]}],
        "model": "m", "max_tokens": 6, "temperature": 0.0})

    plain = load_model("Qwen/Qwen3-VL-2B-Instruct", vl3_repo, max_seq_len=512)
    want = plain.generate(mes).choices[0].message.content

    tp = load_model("Qwen/Qwen3-VL-2B-Instruct", vl3_repo, max_seq_len=512,
                    tp=2)
    assert tp.engine.mesh is not None
    assert tp.generate(mes).choices[0].message.content == want
