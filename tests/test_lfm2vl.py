"""LFM2-VL: HF full-model parity (SigLIP2-NaViT tower + pixel-unshuffle
projector + hybrid decoder) and decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.core import cache as kvmod
from aha_tpu.io.weights import DictSource
from aha_tpu.models.lfm2 import Lfm2Config
from aha_tpu.models.lfm2vl import (
    Lfm2VLConfig,
    Lfm2VLModel,
    Lfm2VLVisionConfig,
    resize_pos_embeddings,
    unshuffle_gather,
)

IMG_TOK = 90

TINY = Lfm2VLConfig(
    text=Lfm2Config(
        vocab_size=128, hidden_size=48, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2,
        block_ff_dim=96, conv_L_cache=3, block_multiple_of=16,
        layer_types=("conv", "full_attention", "conv", "full_attention"),
        max_position_embeddings=256, norm_eps=1e-5, rope_theta=1000000.0),
    vision=Lfm2VLVisionConfig(
        hidden_size=32, intermediate_size=64, num_attention_heads=2,
        num_hidden_layers=2, num_patches=16, patch_size=4),
    image_token_id=IMG_TOK, downsample_factor=2,
    projector_hidden_size=64, projector_use_layernorm=True)


def _mm(shapes, n_padded, seed=0):
    rng = np.random.default_rng(seed)
    B = len(shapes)
    in_dim = 3 * TINY.vision.patch_size ** 2
    pixels = np.zeros((B, n_padded, in_dim), np.float32)
    mask = np.zeros((B, n_padded), bool)
    for i, (h, w) in enumerate(shapes):
        pixels[i, :h * w] = rng.standard_normal((h * w, in_dim)) * 0.5
        mask[i, :h * w] = True
    return pixels, mask


def _build_mm(model, params, shapes, pixels, mask):
    n_padded = pixels.shape[1]
    table = np.asarray(params["visual"]["pos_table"])
    pos = np.stack([resize_pos_embeddings(table, h, w, n_padded)
                    for h, w in shapes])
    gather = unshuffle_gather(shapes, n_padded, TINY.downsample_factor)
    return {"pixels": jnp.asarray(pixels), "pixel_mask": jnp.asarray(mask),
            "pos_embeds": jnp.asarray(pos), "gather": jnp.asarray(gather)}


def _hf_tiny(torch):
    from transformers import Lfm2VlConfig
    from transformers.models.lfm2_vl import Lfm2VlForConditionalGeneration

    cfg = Lfm2VlConfig(
        text_config=dict(
            vocab_size=128, hidden_size=48, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2,
            block_ff_dim=96, conv_L_cache=3, block_multiple_of=16,
            block_auto_adjust_ff_dim=False,
            layer_types=["conv", "full_attention", "conv",
                         "full_attention"],
            max_position_embeddings=256, norm_eps=1e-5,
            rope_theta=1000000.0),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_attention_heads=2,
            num_hidden_layers=2, num_patches=16, patch_size=4,
            hidden_act="gelu_pytorch_tanh", attention_dropout=0.0),
        image_token_id=IMG_TOK, downsample_factor=2,
        projector_hidden_size=64, projector_use_layernorm=True,
        projector_bias=True)
    torch.manual_seed(0)
    return Lfm2VlForConditionalGeneration(cfg).eval()


def test_full_model_parity_with_hf():
    torch = pytest.importorskip("torch")
    hf = _hf_tiny(torch)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    model = Lfm2VLModel(TINY, max_rope_len=128)
    params = model.load_params(DictSource(sd), dtype=jnp.float32)

    shapes = [(4, 4)]  # 16 patches → 4 units after 2x2 unshuffle
    pixels, mask = _mm(shapes, 16)
    ids = [1, 2] + [IMG_TOK] * 4 + [3, 4, 5]
    mm = _build_mm(model, params, shapes, pixels, mask)

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.tensor(pixels),
                 pixel_attention_mask=torch.tensor(mask),
                 spatial_shapes=torch.tensor(shapes)).logits.numpy()[0]
    cache = model.init_cache(1, len(ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([ids]), cache, mm=mm)
    got = np.asarray(model.logits(params, hidden)[0])
    np.testing.assert_allclose(got[-1], ref[-1], atol=2e-2)
    assert (np.argmax(got, -1) == np.argmax(ref, -1)).mean() > 0.9


def test_incremental_decode_with_image():
    model = Lfm2VLModel(TINY, max_rope_len=128)
    params = model.init_random(jax.random.PRNGKey(3))
    shapes = [(4, 4)]
    pixels, mask = _mm(shapes, 16, seed=1)
    ids = [1, 2] + [IMG_TOK] * 4 + [3, 4, 5]
    full_ids = ids + [7]
    mm = _build_mm(model, params, shapes, pixels, mask)

    cache = model.init_cache(1, len(full_ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([full_ids]), cache,
                               mm=mm, prompt_len=jnp.int32(len(full_ids)))
    ref = model.logits(params, hidden)[0]

    cache = model.init_cache(1, 16, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([ids]), cache, mm=mm,
                                   prompt_len=jnp.int32(len(ids)))
    cache = kvmod.advance(cache, len(ids))
    out0 = model.logits(params, hidden)[0, -1]
    hidden, cache = model.backbone(params, jnp.asarray([[7]]), cache)
    out1 = model.logits(params, hidden)[0, 0]
    np.testing.assert_allclose(np.asarray(out0),
                               np.asarray(ref[len(ids) - 1]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref[len(ids)]),
                               atol=5e-3)


def test_image_changes_output():
    model = Lfm2VLModel(TINY, max_rope_len=128)
    params = model.init_random(jax.random.PRNGKey(5))
    shapes = [(4, 4)]
    ids = [1, 2] + [IMG_TOK] * 4 + [3, 4]
    p1, m1 = _mm(shapes, 16, seed=2)
    p2, _ = _mm(shapes, 16, seed=3)
    mm1 = _build_mm(model, params, shapes, p1, m1)
    mm2 = _build_mm(model, params, shapes, p2, m1)
    cache = model.init_cache(1, len(ids), jnp.float32)
    h1, _ = model.backbone(params, jnp.asarray([ids]), cache, mm=mm1)
    cache = model.init_cache(1, len(ids), jnp.float32)
    h2, _ = model.backbone(params, jnp.asarray([ids]), cache, mm=mm2)
    assert not np.allclose(np.asarray(h1[0, -1]), np.asarray(h2[0, -1]))


@pytest.fixture(scope="module")
def lfm2vl_repo(tmp_path_factory):
    torch = pytest.importorskip("torch")
    import json as _json
    import os as _os

    from tests.fixtures import CHAT_TEMPLATE, build_tokenizer
    from tokenizers import AddedToken
    from transformers import Lfm2VlConfig
    from transformers.models.lfm2_vl import Lfm2VlForConditionalGeneration

    path = str(tmp_path_factory.mktemp("lfm2vl-tiny"))
    tok = build_tokenizer(path)
    tok.add_special_tokens([AddedToken("<image>", special=True)])
    tok.save(_os.path.join(path, "tokenizer.json"))

    cfg = Lfm2VlConfig(
        text_config=dict(
            vocab_size=tok.get_vocab_size(), hidden_size=48,
            num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, block_ff_dim=96, conv_L_cache=3,
            block_multiple_of=16, block_auto_adjust_ff_dim=False,
            layer_types=["conv", "full_attention", "conv",
                         "full_attention"],
            max_position_embeddings=256, norm_eps=1e-5,
            rope_theta=1000000.0),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_attention_heads=2,
            num_hidden_layers=2, num_patches=16, patch_size=4,
            hidden_act="gelu_pytorch_tanh", attention_dropout=0.0),
        image_token_id=tok.token_to_id("<image>"), downsample_factor=2,
        projector_hidden_size=64, projector_use_layernorm=True,
        projector_bias=True)
    torch.manual_seed(0)
    Lfm2VlForConditionalGeneration(cfg).save_pretrained(path)
    # our config reader wants min/max image tokens at top level
    with open(_os.path.join(path, "config.json")) as f:
        d = _json.load(f)
    d.setdefault("min_image_tokens", 1)
    d.setdefault("max_image_tokens", 16)
    with open(_os.path.join(path, "config.json"), "w") as f:
        _json.dump(d, f)

    tpl = CHAT_TEMPLATE.replace(
        "{{ message.content }}",
        "{% if message.content is string %}{{ message.content }}"
        "{% else %}{% for part in message.content %}"
        "{% if part.type == 'text' %}{{ part.text }}"
        "{% elif part.type == 'image_url' %}<image>{% endif %}"
        "{% endfor %}{% endif %}")
    with open(_os.path.join(path, "tokenizer_config.json"), "w") as f:
        _json.dump({"chat_template": tpl}, f)
    with open(_os.path.join(path, "generation_config.json"), "w") as f:
        _json.dump({"eos_token_id": [tok.token_to_id("<|im_end|>")]}, f)
    return path


def test_lfm2vl_served_image_chat(lfm2vl_repo):
    import base64
    import io

    from PIL import Image

    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()

    model = load_model("LiquidAI/LFM2-VL-1.6B", lfm2vl_repo, max_seq_len=256)
    mes = ChatCompletionParameters.model_validate({
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "describe "},
            {"type": "image_url", "image_url": {"url": url}}]}],
        "model": "m", "max_tokens": 6, "temperature": 0.0})
    resp = model.generate(mes)
    assert resp.choices[0].message.role == "assistant"
    resp2 = model.generate(mes)
    assert resp.choices[0].message.content == resp2.choices[0].message.content
    # text-only request still works
    mes_t = ChatCompletionParameters.model_validate({
        "messages": [{"role": "user", "content": "hello"}],
        "model": "m", "max_tokens": 4, "temperature": 0.0})
    assert model.generate(mes_t).choices[0].message.content is not None
