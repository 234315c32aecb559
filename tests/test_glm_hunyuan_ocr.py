"""GLM-OCR full-logits parity vs transformers Glm4vForConditionalGeneration
(vision + text + M-RoPE in one shot), Hunyuan-OCR consistency tests, and
served end-to-end generates on synthetic checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aha_tpu.io.weights import DictSource
from aha_tpu.models.glm_ocr import (
    GlmOcrConfig,
    GlmOcrModel,
    GlmOcrTextConfig,
    GlmOcrVisionConfig,
    glm_pos_resample_matrix,
    glm_rope_index,
    glm_vision_geometry,
    glm_vision_rope,
)

ATOL = 2e-2


def tiny_glm_config():
    return GlmOcrConfig(
        vision=GlmOcrVisionConfig(
            depth=2, hidden_size=32, num_heads=4, image_size=28,
            patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
            out_hidden_size=64, intermediate_size=48, attention_bias=False),
        text=GlmOcrTextConfig(
            vocab_size=128, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, partial_rotary_factor=0.5,
            mrope_section=(2, 1, 1)),
        image_token_id=120, image_start_token_id=121,
        image_end_token_id=122)


def _glm_mm(cfg, grids, ids, n_bucket=None):
    v = cfg.vision
    geom = glm_vision_geometry(grids, v)
    cos, sin = glm_vision_rope(geom["h"], geom["w"], v)
    g = v.image_size // v.patch_size
    resample = glm_pos_resample_matrix(geom, grids, g)
    n = len(geom["h"])
    nb = n_bucket or n
    rng = np.random.default_rng(0)
    patch_dim = v.in_channels * v.temporal_patch_size * v.patch_size ** 2
    patches = rng.standard_normal((n, patch_dim)).astype(np.float32)

    def pad(a):
        out = np.zeros((nb,) + a.shape[1:], a.dtype)
        out[:len(a)] = a
        return out

    neg = np.float32(np.finfo(np.float32).min)
    pmask = np.zeros((1, 1, 1, nb), np.float32)
    pmask[..., n:] = neg
    pos_ids, delta = glm_rope_index(ids, grids, cfg)
    mm = {"patches": jnp.asarray(pad(patches)),
          "vis_cos": jnp.asarray(pad(cos)),
          "vis_sin": jnp.asarray(pad(sin)),
          "pos_resample": jnp.asarray(pad(resample)),
          "patch_mask": jnp.asarray(pmask),
          "position_ids": jnp.asarray(pos_ids),
          "rope_delta": jnp.int32(delta)}
    return mm, patches


def test_glm_ocr_full_logits_match_hf():
    import torch
    from transformers import Glm4vConfig, Glm4vForConditionalGeneration

    torch.manual_seed(0)
    cfg = tiny_glm_config()
    hf_cfg = Glm4vConfig(
        vision_config=dict(
            depth=2, hidden_size=32, num_heads=4, image_size=28,
            patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
            out_hidden_size=64, intermediate_size=48, attention_bias=False,
            hidden_act="silu", rms_norm_eps=1e-5, in_channels=3),
        text_config=dict(
            vocab_size=128, hidden_size=64, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, partial_rotary_factor=0.5,
            rope_scaling={"rope_type": "default",
                          "mrope_section": [2, 1, 1]},
            max_position_embeddings=512, rms_norm_eps=1e-5,
            hidden_act="silu", attention_bias=True),
        image_token_id=120, image_start_token_id=121,
        image_end_token_id=122, video_token_id=123,
        video_start_token_id=124, video_end_token_id=125)
    hf = Glm4vForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    model = GlmOcrModel(cfg, max_rope_len=512)
    params = model.load_params(DictSource(sd), dtype=jnp.float32)

    grids = [(1, 4, 4)]  # 16 patches → 4 merged tokens
    n_img = 4
    ids = [1, 5, 121] + [120] * n_img + [122, 9, 11, 3]
    mm, patches = _glm_mm(cfg, grids, ids)

    with torch.no_grad():
        out = hf(input_ids=torch.tensor([ids]),
                 pixel_values=torch.from_numpy(patches),
                 image_grid_thw=torch.tensor(grids))
    want = out.logits[0].numpy()

    from aha_tpu.core import cache as kvmod

    cache = model.init_cache(1, 64, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([ids], jnp.int32),
                                   cache, mm=mm,
                                   prompt_len=jnp.int32(len(ids)))
    got = np.asarray(model.logits(params, hidden)[0])
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)


def test_glm_ocr_decode_matches_hf_generate_step():
    """Prefill + one decode step tracks HF's cached forward (rope_delta)."""
    import torch
    from transformers import Glm4vConfig, Glm4vForConditionalGeneration

    torch.manual_seed(1)
    cfg = tiny_glm_config()
    hf_cfg = Glm4vConfig(
        vision_config=dict(depth=2, hidden_size=32, num_heads=4,
                           image_size=28, patch_size=14,
                           spatial_merge_size=2, temporal_patch_size=2,
                           out_hidden_size=64, intermediate_size=48,
                           attention_bias=False, hidden_act="silu",
                           rms_norm_eps=1e-5, in_channels=3),
        text_config=dict(vocab_size=128, hidden_size=64,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         partial_rotary_factor=0.5,
                         rope_scaling={"rope_type": "default",
                                       "mrope_section": [2, 1, 1]},
                         max_position_embeddings=512, rms_norm_eps=1e-5,
                         hidden_act="silu", attention_bias=True),
        image_token_id=120, image_start_token_id=121,
        image_end_token_id=122, video_token_id=123,
        video_start_token_id=124, video_end_token_id=125)
    hf = Glm4vForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    model = GlmOcrModel(cfg, max_rope_len=512)
    params = model.load_params(DictSource(sd), dtype=jnp.float32)

    grids = [(1, 4, 4)]
    ids = [1, 121] + [120] * 4 + [122, 9]
    mm, patches = _glm_mm(cfg, grids, ids)
    next_tok = 7

    with torch.no_grad():
        full = hf(input_ids=torch.tensor([ids + [next_tok]]),
                  pixel_values=torch.from_numpy(patches),
                  image_grid_thw=torch.tensor(grids))
    want = full.logits[0, -1].numpy()

    from aha_tpu.core import cache as kvmod

    cache = model.init_cache(1, 64, jnp.float32)
    _, cache = model.backbone(params, jnp.asarray([ids], jnp.int32), cache,
                              mm=mm, prompt_len=jnp.int32(len(ids)))
    cache = kvmod.advance(cache, len(ids))
    hidden, cache = model.backbone(params,
                                   jnp.asarray([[next_tok]], jnp.int32),
                                   cache)
    got = np.asarray(model.logits(params, hidden)[0, 0])
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)


def test_glm_padded_patch_bucket_invariance():
    """Bucket-padded patches + key mask must not change the features."""
    import torch
    from transformers import Glm4vConfig, Glm4vForConditionalGeneration

    cfg = tiny_glm_config()
    model = GlmOcrModel(cfg, max_rope_len=512)
    params_rng = jax.random.PRNGKey(0)
    # random params via HF init for convenience
    torch.manual_seed(2)
    hf_cfg = Glm4vConfig(
        vision_config=dict(depth=2, hidden_size=32, num_heads=4,
                           image_size=28, patch_size=14,
                           spatial_merge_size=2, temporal_patch_size=2,
                           out_hidden_size=64, intermediate_size=48,
                           attention_bias=False, hidden_act="silu",
                           rms_norm_eps=1e-5, in_channels=3),
        text_config=dict(vocab_size=128, hidden_size=64,
                         intermediate_size=96, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         partial_rotary_factor=0.5,
                         rope_scaling={"rope_type": "default",
                                       "mrope_section": [2, 1, 1]},
                         max_position_embeddings=512, rms_norm_eps=1e-5,
                         hidden_act="silu", attention_bias=True),
        image_token_id=120, image_start_token_id=121, image_end_token_id=122,
        video_token_id=123, video_start_token_id=124,
        video_end_token_id=125)
    hf = Glm4vForConditionalGeneration(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = model.load_params(DictSource(sd), dtype=jnp.float32)

    grids = [(1, 4, 4)]
    ids = [1, 121] + [120] * 4 + [122]
    mm_exact, _ = _glm_mm(cfg, grids, ids)
    mm_padded, _ = _glm_mm(cfg, grids, ids, n_bucket=64)
    f1 = model.tower.encode(params["visual"], mm_exact)[:4]
    f2 = model.tower.encode(params["visual"], mm_padded)[:4]
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-4)


# ---------------------------------------------------------------------------
# Hunyuan-OCR
# ---------------------------------------------------------------------------


def tiny_hunyuan_config():
    from aha_tpu.models.hunyuan_ocr import (
        HunyuanOCRConfig,
        HunyuanVisionConfig,
    )

    return HunyuanOCRConfig(
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, xdrope_section=(2, 2, 2, 2), image_token_id=250,
        vision=HunyuanVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, patch_size=16, max_image_size=64,
            spatial_merge_size=2, out_hidden_size=64))


def _hy_params(model):
    """Random params with the checkpoint layout via a synthetic DictSource."""
    rng = np.random.default_rng(0)
    c = model.config
    v = c.vision

    def w(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    g = v.max_image_size // v.patch_size
    sd = {
        "vit.embeddings.patch_embedding.weight":
            w(v.hidden_size, 3, v.patch_size, v.patch_size),
        "vit.embeddings.patch_embedding.bias": w(v.hidden_size),
        "vit.embeddings.position_embedding.weight": w(g * g + 1,
                                                      v.hidden_size),
        "vit.perceive.before_rms.weight": np.ones(v.hidden_size, np.float32),
        "vit.perceive.after_rms.weight": np.ones(v.out_hidden_size,
                                                 np.float32),
        "vit.perceive.proj.0.weight": w(2 * v.hidden_size, v.hidden_size,
                                        2, 2),
        "vit.perceive.proj.0.bias": w(2 * v.hidden_size),
        "vit.perceive.proj.2.weight": w(4 * v.hidden_size,
                                        2 * v.hidden_size, 1, 1),
        "vit.perceive.proj.2.bias": w(4 * v.hidden_size),
        "vit.perceive.mlp.weight": w(v.out_hidden_size, 4 * v.hidden_size),
        "vit.perceive.mlp.bias": w(v.out_hidden_size),
        "vit.perceive.image_newline": w(4 * v.hidden_size),
        "vit.perceive.image_begin": w(v.out_hidden_size),
        "vit.perceive.image_end": w(v.out_hidden_size),
        "model.embed_tokens.weight": w(c.vocab_size, c.hidden_size),
        "model.norm.weight": np.ones(c.hidden_size, np.float32),
    }
    for i in range(v.num_hidden_layers):
        b = f"vit.layers.{i}."
        sd.update({
            b + "input_layernorm.weight": np.ones(v.hidden_size, np.float32),
            b + "input_layernorm.bias": np.zeros(v.hidden_size, np.float32),
            b + "post_attention_layernorm.weight": np.ones(v.hidden_size,
                                                           np.float32),
            b + "post_attention_layernorm.bias": np.zeros(v.hidden_size,
                                                          np.float32),
            b + "self_attn.q_proj.weight": w(v.hidden_size, v.hidden_size),
            b + "self_attn.q_proj.bias": w(v.hidden_size),
            b + "self_attn.k_proj.weight": w(v.hidden_size, v.hidden_size),
            b + "self_attn.k_proj.bias": w(v.hidden_size),
            b + "self_attn.v_proj.weight": w(v.hidden_size, v.hidden_size),
            b + "self_attn.v_proj.bias": w(v.hidden_size),
            b + "self_attn.o_proj.weight": w(v.hidden_size, v.hidden_size),
            b + "self_attn.o_proj.bias": w(v.hidden_size),
            b + "mlp.dense_h_to_4h.weight": w(v.intermediate_size,
                                              v.hidden_size),
            b + "mlp.dense_h_to_4h.bias": w(v.intermediate_size),
            b + "mlp.dense_4h_to_h.weight": w(v.hidden_size,
                                              v.intermediate_size),
            b + "mlp.dense_4h_to_h.bias": w(v.hidden_size),
        })
    for i in range(c.num_hidden_layers):
        p = f"model.layers.{i}."
        sd.update({
            p + "input_layernorm.weight": np.ones(c.hidden_size, np.float32),
            p + "post_attention_layernorm.weight": np.ones(c.hidden_size,
                                                           np.float32),
            p + "self_attn.q_proj.weight": w(c.num_attention_heads
                                             * c.head_dim, c.hidden_size),
            p + "self_attn.k_proj.weight": w(c.num_key_value_heads
                                             * c.head_dim, c.hidden_size),
            p + "self_attn.v_proj.weight": w(c.num_key_value_heads
                                             * c.head_dim, c.hidden_size),
            p + "self_attn.o_proj.weight": w(c.hidden_size,
                                             c.num_attention_heads
                                             * c.head_dim),
            p + "self_attn.query_layernorm.weight": np.ones(c.head_dim,
                                                            np.float32),
            p + "self_attn.key_layernorm.weight": np.ones(c.head_dim,
                                                          np.float32),
            p + "mlp.gate_proj.weight": w(c.intermediate_size, c.hidden_size),
            p + "mlp.up_proj.weight": w(c.intermediate_size, c.hidden_size),
            p + "mlp.down_proj.weight": w(c.hidden_size, c.intermediate_size),
        })
    return model.load_params(DictSource(sd), dtype=jnp.float32), sd


def _hy_mm(model, grids, ids, n_bucket=None):
    from aha_tpu.models.hunyuan_ocr import (
        hunyuan_pos_resample_matrix,
        hunyuan_position_ids,
        hunyuan_vision_geometry,
    )

    c = model.config
    v = c.vision
    m = v.spatial_merge_size
    n = sum(gh * gw for _, gh, gw in grids)
    nb = n_bucket or n
    rng = np.random.default_rng(1)
    patches = rng.standard_normal((n, 3 * v.patch_size ** 2)).astype(
        np.float32)
    resample = hunyuan_pos_resample_matrix(grids,
                                           v.max_image_size // v.patch_size)

    def pad(a):
        out = np.zeros((nb,) + a.shape[1:], a.dtype)
        out[:len(a)] = a
        return out

    neg = np.float32(np.finfo(np.float32).min)
    pmask = np.zeros((1, 1, 1, nb), np.float32)
    pmask[..., n:] = neg
    n_units = sum((gh // m) * (gw // m) for _, gh, gw in grids)
    ug, tg = hunyuan_vision_geometry(grids, m, max(nb // (m * m), n_units))
    mm = {"patches": jnp.asarray(pad(patches)),
          "pos_resample": jnp.asarray(pad(resample)),
          "patch_mask": jnp.asarray(pmask),
          "unit_gather": jnp.asarray(ug),
          "token_gather": jnp.asarray(tg),
          "position_ids": jnp.asarray(
              hunyuan_position_ids(ids, grids, m, c.image_token_id))}
    return mm


def test_hunyuan_token_accounting():
    from aha_tpu.models.hunyuan_ocr import hunyuan_vision_geometry

    # grid 4x8 patches, merge 2 → ph=2, pw=4 → 2*(4+1)+2 = 12 tokens
    ug, tg = hunyuan_vision_geometry([(1, 4, 8)], 2)
    assert len(tg) == 2 * (4 + 1) + 2
    assert ug.shape == (8, 2, 2)
    # begin first, end last, newline at each row end
    assert tg[0] == 8 + 1 and tg[-1] == 8 + 2
    assert tg[5] == 8 and tg[10] == 8  # newline rows


def test_hunyuan_prefill_decode_consistency():
    from aha_tpu.core import cache as kvmod
    from aha_tpu.models.hunyuan_ocr import HunyuanOCRModel

    cfg = tiny_hunyuan_config()
    model = HunyuanOCRModel(cfg, max_rope_len=256)
    params, _ = _hy_params(model)
    grids = [(1, 4, 4)]
    n_tok = 2 * (2 + 1) + 2
    ids = [3, 5] + [cfg.image_token_id] * n_tok + [9, 11]
    mm = _hy_mm(model, grids, ids)
    S = len(ids)

    cache = model.init_cache(1, 64, jnp.float32)
    hidden, cache = model.backbone(params, jnp.asarray([ids], jnp.int32),
                                   cache, mm=mm, prompt_len=jnp.int32(S))
    cache = kvmod.advance(cache, S)
    full_last = np.asarray(model.logits(params, hidden)[0, -1])

    cache2 = model.init_cache(1, 64, jnp.float32)
    mm2 = _hy_mm(model, grids, ids[:-1])
    _, cache2 = model.backbone(params, jnp.asarray([ids[:-1]], jnp.int32),
                               cache2, mm=mm2, prompt_len=jnp.int32(S - 1))
    cache2 = kvmod.advance(cache2, S - 1)
    h2, cache2 = model.backbone(params, jnp.asarray([[ids[-1]]], jnp.int32),
                                cache2)
    step_last = np.asarray(model.logits(params, h2)[0, 0])
    np.testing.assert_allclose(step_last, full_last, atol=ATOL, rtol=1e-3)


def test_hunyuan_padded_patch_invariance():
    from aha_tpu.models.hunyuan_ocr import HunyuanOCRModel

    cfg = tiny_hunyuan_config()
    model = HunyuanOCRModel(cfg, max_rope_len=256)
    params, _ = _hy_params(model)
    grids = [(1, 4, 4)]
    ids = [3] + [cfg.image_token_id] * 8 + [9]
    f1 = model.encode_vision(params["visual"], _hy_mm(model, grids, ids))
    f2 = model.encode_vision(params["visual"],
                             _hy_mm(model, grids, ids, n_bucket=64))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-4)


def test_hunyuan_xdrope_matches_reference_semantics():
    """xdrope selection vs a literal transcription of get_xd_cos_sin."""
    from aha_tpu.models.hunyuan_ocr import HunyuanOCRModel

    cfg = tiny_hunyuan_config()
    model = HunyuanOCRModel(cfg, max_rope_len=256)
    rng = np.random.default_rng(2)
    S = 6
    pos4 = rng.integers(0, 50, size=(4, S))
    got_c, got_s = model._xd_cos_sin(jnp.asarray(pos4))

    cos_t = np.asarray(model.cos)
    sin_t = np.asarray(model.sin)
    full_c = np.concatenate([cos_t, cos_t], axis=-1)
    full_s = np.concatenate([sin_t, sin_t], axis=-1)
    # reference: index rows per channel, split by sections*2, cycle channels
    c4 = full_c[pos4]    # (4, S, hd)
    s4 = full_s[pos4]
    secs = [s * 2 for s in cfg.xdrope_section]
    parts_c, parts_s, off = [], [], 0
    for i, s in enumerate(secs):
        ch = i % len(cfg.xdrope_section)
        parts_c.append(c4[ch, :, off:off + s])
        parts_s.append(s4[ch, :, off:off + s])
        off += s
    np.testing.assert_allclose(np.asarray(got_c),
                               np.concatenate(parts_c, -1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_s),
                               np.concatenate(parts_s, -1), atol=1e-6)


# ---------------------------------------------------------------------------
# Served end-to-end (synthetic checkpoints)
# ---------------------------------------------------------------------------


def _img_url(shape, seed):
    import base64
    import io

    from PIL import Image

    img = Image.fromarray((np.random.default_rng(seed).random(shape) * 255
                           ).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, "PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


def test_served_glm_ocr_generates(tmp_path):
    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters
    from tests.fixtures import build_tiny_glm_ocr_repo

    repo = str(tmp_path / "glm")
    build_tiny_glm_ocr_repo(repo)
    served = load_model("ZhipuAI/GLM-OCR", repo)
    mes = ChatCompletionParameters.model_validate({
        "model": "ZhipuAI/GLM-OCR",
        "messages": [{"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": _img_url((60, 90, 3),
                                                                0)}},
            {"type": "text", "text": "Read the text."}]}],
        "max_tokens": 5, "temperature": 0.0})
    resp = served.generate(mes)
    assert resp.choices[0].message.role == "assistant"
    assert resp.usage.prompt_tokens > 6
    resp2 = served.generate(mes)
    assert resp.choices[0].message.content == resp2.choices[0].message.content


def test_served_hunyuan_ocr_generates(tmp_path):
    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters
    from tests.fixtures import build_tiny_hunyuan_ocr_repo

    repo = str(tmp_path / "hy")
    build_tiny_hunyuan_ocr_repo(repo)
    served = load_model("Tencent-Hunyuan/HunyuanOCR", repo)
    mes = ChatCompletionParameters.model_validate({
        "model": "Tencent-Hunyuan/HunyuanOCR",
        "messages": [{"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": _img_url((80, 120, 3),
                                                                1)}},
            {"type": "text",
             "text": "<｜hy_place▁holder▁no▁102｜>Detect text."}]}],
        "max_tokens": 5, "temperature": 0.0})
    resp = served.generate(mes)
    assert resp.choices[0].message.role == "assistant"
    assert resp.usage.prompt_tokens > 10
    resp2 = served.generate(mes)
    assert resp.choices[0].message.content == resp2.choices[0].message.content
