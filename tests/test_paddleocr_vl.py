"""PaddleOCR-VL: decode consistency with image, geometry, padding
invariance, end-to-end chat."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.core import cache as kvmod
from aha_tpu.models.llama import LlamaConfig
from aha_tpu.models.paddleocr_vl import (
    PaddleOCRVLConfig,
    PaddleOCRVLModel,
    PaddleVisionConfig,
    get_rope_index,
    paddle_vision_geometry,
)

IMG_TOK, VID_TOK, VSTART = 90, 91, 92

TINY = PaddleOCRVLConfig(
    vision=PaddleVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=56, patch_size=14,
        spatial_merge_size=2),
    text=LlamaConfig(
        vocab_size=100, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, rope_theta=500000.0, max_position_embeddings=512,
        tie_word_embeddings=True, qkv_bias=True, o_bias=True, mlp_bias=True),
    mrope_section=(2, 2, 2),
    image_token_id=IMG_TOK, video_token_id=VID_TOK,
    vision_start_token_id=VSTART)


def _grid_prompt(grid=(1, 4, 6)):
    t, h, w = grid
    n_units = t * (h // 2) * (w // 2)
    return [1, 2, VSTART] + [IMG_TOK] * n_units + [3, 4, 5], n_units


def _mm(grid, ids, seed=0, bucket=None):
    n_patches = grid[0] * grid[1] * grid[2]
    rng = np.random.default_rng(seed)
    patches = rng.standard_normal((n_patches, 3 * 14 * 14)).astype(np.float32)
    geo = paddle_vision_geometry([grid], TINY.vision)
    pos, delta = get_rope_index(ids, [grid], TINY)
    if bucket:
        pat = np.zeros((bucket, patches.shape[1]), np.float32)
        pat[:n_patches] = patches

        def pad2(a, fill, size):
            out = np.full((size,) + a.shape[1:], fill, a.dtype)
            out[:len(a)] = a
            return out

        mm = {"patches": jnp.asarray(pat),
              "seg": jnp.asarray(pad2(geo["seg"], -1, bucket)),
              "pos_hw": jnp.asarray(pad2(geo["pos_hw"], 0, bucket)),
              "pos_idx": jnp.asarray(pad2(geo["pos_idx"], 0, bucket)),
              "pos_w": jnp.asarray(pad2(geo["pos_w"], 0.0, bucket)),
              "merge_gather": jnp.asarray(
                  pad2(geo["merge_gather"], 0, bucket))}
    else:
        mm = {"patches": jnp.asarray(patches),
              **{k: jnp.asarray(v) for k, v in geo.items()}}
    mm["position_ids"] = jnp.asarray(pos)
    mm["rope_delta"] = jnp.int32(delta)
    return mm


def test_merge_gather_row_major():
    geo = paddle_vision_geometry([(1, 4, 4)], TINY.vision)
    g = geo["merge_gather"].reshape(4, 4)
    # first merge unit pulls the 2x2 top-left block in row-major order
    np.testing.assert_array_equal(g[0], [0, 1, 4, 5])
    np.testing.assert_array_equal(g[1], [2, 3, 6, 7])


def test_pos_interp_weights_sum_to_one():
    geo = paddle_vision_geometry([(1, 6, 8)], TINY.vision)
    np.testing.assert_allclose(geo["pos_w"].sum(-1), 1.0, atol=1e-6)


def test_incremental_decode_with_image():
    model = PaddleOCRVLModel(TINY, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(3))
    grid = (1, 4, 6)
    ids, _ = _grid_prompt(grid)
    full_ids = ids + [7, 8]
    mm = _mm(grid, ids, seed=1)
    pos_full, _ = get_rope_index(full_ids, [grid], TINY)
    mm_full = dict(mm, position_ids=jnp.asarray(pos_full))

    cache = model.init_cache(1, len(full_ids), jnp.float32)
    hidden, _ = model.backbone(params, jnp.asarray([full_ids]), cache,
                               mm=mm_full)
    ref = model.logits(params, hidden)[0]

    cache = model.init_cache(1, 32, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([ids]), cache, mm=mm)
    cache = kvmod.advance(cache, len(ids))
    outs = [model.logits(params, hidden)[0, -1]]
    hidden, cache = model.backbone(params, jnp.asarray([[7]]), cache)
    cache = kvmod.advance(cache, 1)
    outs.append(model.logits(params, hidden)[0, 0])
    got = jnp.stack(outs)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref[len(ids) - 1:len(ids) + 1]),
                               atol=5e-3)


def test_vision_padding_invariance():
    model = PaddleOCRVLModel(TINY, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(3))
    grid = (1, 4, 6)
    ids, n_units = _grid_prompt(grid)
    mm_exact = _mm(grid, ids, seed=2)
    mm_pad = _mm(grid, ids, seed=2, bucket=64)
    f1 = model.encode_vision(params["visual"], mm_exact)
    f2 = model.encode_vision(params["visual"], mm_pad)
    np.testing.assert_allclose(np.asarray(f1[:n_units]),
                               np.asarray(f2[:n_units]), rtol=1e-4, atol=1e-4)


def test_served_end_to_end(tmp_path):
    """Tiny on-disk repo through the loader with a real PNG."""
    from safetensors.numpy import save_file
    from tokenizers import AddedToken

    from tests.fixtures import CHAT_TEMPLATE, build_tokenizer

    path = str(tmp_path / "paddle-tiny")
    os.makedirs(path)
    tok = build_tokenizer(path)
    tok.add_special_tokens([AddedToken(t, special=True) for t in
                            ("<|IMAGE_START|>", "<|IMAGE_PLACEHOLDER|>",
                             "<|IMAGE_END|>")])
    tok.save(os.path.join(path, "tokenizer.json"))
    img_tok = tok.token_to_id("<|IMAGE_PLACEHOLDER|>")
    vstart = tok.token_to_id("<|IMAGE_START|>")

    cfg_d = {
        "vision_config": {"hidden_size": 32, "intermediate_size": 64,
                          "num_hidden_layers": 2, "num_attention_heads": 2,
                          "image_size": 56, "patch_size": 14,
                          "spatial_merge_size": 2},
        "vocab_size": tok.get_vocab_size(), "hidden_size": 48,
        "intermediate_size": 96, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 12,
        "rope_theta": 500000.0, "max_position_embeddings": 4096,
        "tie_word_embeddings": True, "use_bias": True,
        "rms_norm_eps": 1e-6,
        "rope_scaling": {"mrope_section": [2, 2, 2], "rope_type": "default"},
        "image_token_id": img_tok, "video_token_id": img_tok,
        "vision_start_token_id": vstart,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg_d, f)
    with open(os.path.join(path, "generation_config.json"), "w") as f:
        json.dump({"eos_token_id": [tok.token_to_id("<|im_end|>")]}, f)
    tpl = CHAT_TEMPLATE.replace(
        "{{ message.content }}",
        "{% if message.content is string %}{{ message.content }}"
        "{% else %}{% for part in message.content %}"
        "{% if part.type == 'text' %}{{ part.text }}"
        "{% elif part.type == 'image_url' %}"
        "<|IMAGE_START|><|IMAGE_PLACEHOLDER|><|IMAGE_END|>{% endif %}"
        "{% endfor %}{% endif %}")
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"chat_template": tpl}, f)

    cfg = PaddleOCRVLConfig(
        vision=PaddleVisionConfig(**cfg_d["vision_config"]),
        text=LlamaConfig.from_dict({**cfg_d, "qkv_bias": True,
                                    "o_bias": True, "mlp_bias": True}),
        mrope_section=(2, 2, 2), image_token_id=img_tok,
        video_token_id=img_tok, vision_start_token_id=vstart)
    model = PaddleOCRVLModel(cfg, max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(0))

    tensors = {}

    def emit(prefix, tree):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                emit(name, v)
            elif isinstance(v, list):
                for i, item in enumerate(v):
                    emit(f"{name}.{i}", item)
            else:
                tensors[name] = np.asarray(v)

    vp = params["visual"]
    vm = "visual.vision_model"
    tensors[f"{vm}.embeddings.patch_embedding.weight"] = \
        np.asarray(vp["patch_embed"]["w"]).T.reshape(32, 3, 14, 14)
    tensors[f"{vm}.embeddings.patch_embedding.bias"] = \
        np.asarray(vp["patch_embed"]["b"])
    tensors[f"{vm}.embeddings.position_embedding.weight"] = \
        np.asarray(vp["pos_embed"]["w"])
    tensors[f"{vm}.post_layernorm.weight"] = np.asarray(vp["post_ln"]["w"])
    tensors[f"{vm}.post_layernorm.bias"] = np.asarray(vp["post_ln"]["b"])
    for i, lp in enumerate(vp["layers"]):
        base = f"{vm}.encoder.layers.{i}"
        for ours, theirs in (("ln1", "layer_norm1"), ("ln2", "layer_norm2")):
            tensors[f"{base}.{theirs}.weight"] = np.asarray(lp[ours]["w"])
            tensors[f"{base}.{theirs}.bias"] = np.asarray(lp[ours]["b"])
        for ours, theirs in (("q", "self_attn.q_proj"),
                             ("k", "self_attn.k_proj"),
                             ("v", "self_attn.v_proj"),
                             ("o", "self_attn.out_proj"),
                             ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2")):
            tensors[f"{base}.{theirs}.weight"] = np.asarray(lp[ours]["w"]).T
            tensors[f"{base}.{theirs}.bias"] = np.asarray(lp[ours]["b"])
    for ours, theirs in (("fc1", "linear_1"), ("fc2", "linear_2")):
        tensors[f"mlp_AR.{theirs}.weight"] = \
            np.asarray(vp["proj"][ours]["w"]).T
        tensors[f"mlp_AR.{theirs}.bias"] = np.asarray(vp["proj"][ours]["b"])
    tensors["mlp_AR.pre_norm.weight"] = np.asarray(vp["proj"]["pre_norm"]["w"])
    tensors["mlp_AR.pre_norm.bias"] = np.asarray(vp["proj"]["pre_norm"]["b"])

    tp = params["text"]
    tensors["model.embed_tokens.weight"] = np.asarray(tp["embed"]["w"])
    tensors["model.norm.weight"] = np.asarray(tp["norm"]["w"])
    for i in range(2):
        lp = jax.tree.map(lambda x: np.asarray(x[i]), tp["layers"])
        base = f"model.layers.{i}"
        tensors[f"{base}.input_layernorm.weight"] = lp["ln1"]["w"]
        tensors[f"{base}.post_attention_layernorm.weight"] = lp["ln2"]["w"]
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                             ("v", "v_proj"), ("o", "o_proj")):
            tensors[f"{base}.self_attn.{theirs}.weight"] = lp[ours]["w"].T
            tensors[f"{base}.self_attn.{theirs}.bias"] = lp[ours]["b"]
        for n in ("gate", "up", "down"):
            tensors[f"{base}.mlp.{n}_proj.weight"] = lp["mlp"][n]["w"].T
            tensors[f"{base}.mlp.{n}_proj.bias"] = lp["mlp"][n]["b"]
    save_file(tensors, os.path.join(path, "model.safetensors"))

    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters
    import base64
    import io

    from PIL import Image

    model_served = load_model("PaddlePaddle/PaddleOCR-VL", path,
                              max_seq_len=512)
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (56, 84, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    mes = ChatCompletionParameters.model_validate({
        "messages": [{"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": url}},
            {"type": "text", "text": "OCR:"}]}],
        "model": "m", "max_tokens": 6, "temperature": 0.0})
    resp = model_served.generate(mes)
    assert resp.choices[0].message.content is not None
    assert resp.usage.prompt_tokens > 6
