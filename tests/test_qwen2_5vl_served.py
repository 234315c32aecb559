"""Qwen2.5-VL end-to-end: tiny repo on disk → load_model → image chat."""

import json
import os

import numpy as np
import pytest

TINY_VL_KW = dict(
    vision_config=dict(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
        in_chans=3, out_hidden_size=48, patch_size=14, spatial_merge_size=2,
        temporal_patch_size=2, window_size=56, fullatt_block_indexes=[1],
        hidden_act="silu"),
    hidden_size=48, intermediate_size=96, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, rope_theta=1000000.0,
    max_position_embeddings=4096, tie_word_embeddings=True,
    rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
    attention_dropout=0.0)


@pytest.fixture(scope="module")
def vl_repo(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2_5_VLConfig as HFConfig
    from transformers.models.qwen2_5_vl import Qwen2_5_VLForConditionalGeneration

    from tests.fixtures import CHAT_TEMPLATE, build_tokenizer

    path = str(tmp_path_factory.mktemp("vl-tiny"))
    from tokenizers import AddedToken

    tok = build_tokenizer(path)
    tok.add_special_tokens([AddedToken(t, special=True) for t in
                            ("<|vision_start|>", "<|image_pad|>",
                             "<|vision_end|>", "<|video_pad|>")])
    tok.save(os.path.join(path, "tokenizer.json"))

    cfg = HFConfig(
        vocab_size=tok.get_vocab_size(),
        image_token_id=tok.token_to_id("<|image_pad|>"),
        video_token_id=tok.token_to_id("<|video_pad|>"),
        vision_start_token_id=tok.token_to_id("<|vision_start|>"),
        vision_end_token_id=tok.token_to_id("<|vision_end|>"),
        **TINY_VL_KW)
    torch.manual_seed(0)
    m = Qwen2_5_VLForConditionalGeneration(cfg)
    m.save_pretrained(path)

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


def _png_data_url(w=64, h=48) -> str:
    import base64
    import io

    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


def test_vl_chat_with_image(vl_repo):
    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters

    model = load_model("Qwen/Qwen2.5-VL-3B-Instruct", vl_repo,
                       max_seq_len=512)
    mes = ChatCompletionParameters.model_validate({
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "describe "},
            {"type": "image_url", "image_url": {"url": _png_data_url()}},
        ]}],
        "model": "m", "max_tokens": 8, "temperature": 0.0})
    resp = model.generate(mes)
    assert resp.choices[0].message.role == "assistant"
    assert resp.usage.prompt_tokens > 6  # expanded image tokens present
    # deterministic across runs (cache pool + donation)
    resp2 = model.generate(mes)
    assert resp.choices[0].message.content == resp2.choices[0].message.content

    # text-only request through the same model
    mes_t = ChatCompletionParameters.model_validate({
        "messages": [{"role": "user", "content": "hello"}],
        "model": "m", "max_tokens": 4, "temperature": 0.0})
    resp_t = model.generate(mes_t)
    assert resp_t.choices[0].message.content is not None


def test_vl_different_image_sizes_share_bucket(vl_repo):
    """Two image sizes in the same patch bucket reuse compiled graphs."""
    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters

    model = load_model("Qwen/Qwen2.5-VL-3B-Instruct", vl_repo,
                       max_seq_len=512)
    for size in ((64, 48), (88, 60)):
        mes = ChatCompletionParameters.model_validate({
            "messages": [{"role": "user", "content": [
                {"type": "image_url",
                 "image_url": {"url": _png_data_url(*size)}}]}],
            "model": "m", "max_tokens": 4, "temperature": 0.0})
        resp = model.generate(mes)
        assert resp.choices[0].message.content is not None
