"""DeepSeek-OCR: SAM ViTDet parity vs HF SamVisionModel, CLIP tower parity
vs HF CLIPVisionModel, MoE FFN vs a literal transcription of the reference's
gate/moe_infer semantics, tiling layout goldens, and engine consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aha_tpu.models.deepseek_ocr import (
    ClipViTConfig,
    DeepseekOCRConfig,
    DeepseekOCRModel,
    DeepseekV2Config,
    SamViTConfig,
    clip_encode,
    deepseek_vision_layout,
    sam_encode,
)

ATOL = 2e-2  # fp32 tiny-random-weight parity tolerance (LN roundoff amplification)


def tiny_config(version=1):
    return DeepseekOCRConfig(
        language=DeepseekV2Config(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            moe_intermediate_size=32, num_hidden_layers=3,
            num_attention_heads=4, num_key_value_heads=4,
            n_routed_experts=8, n_shared_experts=2, num_experts_per_tok=2,
            first_k_dense_replace=1, norm_topk_prob=True,
            max_position_embeddings=512),
        sam=SamViTConfig(img_size=64, patch_size=16, embed_dim=32, depth=3,
                         num_heads=4, out_chans=16, window_size=2,
                         global_attn_indexes=(1,), net2_chans=24,
                         net3_chans=48),
        clip=ClipViTConfig(image_size=28, patch_size=14, num_layers=2,
                           hidden_size=48, num_heads=4, ffn_hidden_size=96),
        projector_input_dim=96, projector_n_embed=64,
        image_token_id=250, version=version)


# ---------------------------------------------------------------------------
# SAM ViTDet vs HF transformers SamVisionModel
# ---------------------------------------------------------------------------


def test_sam_encoder_matches_hf_through_neck():
    import torch
    from transformers import SamVisionConfig
    from transformers.models.sam.modeling_sam import SamVisionEncoder

    torch.manual_seed(0)
    hf_cfg = SamVisionConfig(
        image_size=64, patch_size=16, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, output_channels=16, window_size=2,
        global_attn_indexes=[1], use_abs_pos=True, use_rel_pos=True,
        mlp_ratio=4.0, layer_norm_eps=1e-6, num_channels=3, qkv_bias=True,
        hidden_act="gelu")
    hf = SamVisionEncoder(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = SamViTConfig(img_size=64, patch_size=16, embed_dim=32, depth=3,
                       num_heads=4, out_chans=16, window_size=2,
                       global_attn_indexes=(1,))
    p = {"patch": {"w": jnp.asarray(sd["patch_embed.projection.weight"]),
                   "b": jnp.asarray(sd["patch_embed.projection.bias"])},
         "pos": jnp.asarray(sd["pos_embed"]),
         "blocks": []}
    for i in range(3):
        b = f"layers.{i}."
        p["blocks"].append({
            "norm1": {"w": jnp.asarray(sd[b + "layer_norm1.weight"]),
                      "b": jnp.asarray(sd[b + "layer_norm1.bias"])},
            "norm2": {"w": jnp.asarray(sd[b + "layer_norm2.weight"]),
                      "b": jnp.asarray(sd[b + "layer_norm2.bias"])},
            "attn": {"qkv": {"w": jnp.asarray(sd[b + "attn.qkv.weight"]).T,
                             "b": jnp.asarray(sd[b + "attn.qkv.bias"])},
                     "proj": {"w": jnp.asarray(sd[b + "attn.proj.weight"]).T,
                              "b": jnp.asarray(sd[b + "attn.proj.bias"])},
                     "rel_pos_h": jnp.asarray(sd[b + "attn.rel_pos_h"]),
                     "rel_pos_w": jnp.asarray(sd[b + "attn.rel_pos_w"])},
            "lin1": {"w": jnp.asarray(sd[b + "mlp.lin1.weight"]).T,
                     "b": jnp.asarray(sd[b + "mlp.lin1.bias"])},
            "lin2": {"w": jnp.asarray(sd[b + "mlp.lin2.weight"]).T,
                     "b": jnp.asarray(sd[b + "mlp.lin2.bias"])},
        })
    p["neck0"] = {"w": jnp.asarray(sd["neck.conv1.weight"])}
    p["neck1"] = {"w": jnp.asarray(sd["neck.layer_norm1.weight"]),
                  "b": jnp.asarray(sd["neck.layer_norm1.bias"])}
    p["neck2"] = {"w": jnp.asarray(sd["neck.conv2.weight"])}
    p["neck3"] = {"w": jnp.asarray(sd["neck.layer_norm2.weight"]),
                  "b": jnp.asarray(sd["neck.layer_norm2.bias"])}
    # identity net_2/net_3 (not in HF SAM): 3x3 delta kernels, stride 2
    eye2 = np.zeros((16, 16, 3, 3), np.float32)
    eye2[np.arange(16), np.arange(16), 1, 1] = 1.0
    p["net2"] = {"w": jnp.asarray(eye2)}
    p["net3"] = {"w": jnp.asarray(eye2)}

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(x)).last_hidden_state.numpy()  # (B,16,4,4)
    # compare through the neck: strip our net_2/net_3 by re-running manually
    from aha_tpu.models import deepseek_ocr as M
    from aha_tpu.ops.conv import conv2d, layer_norm_2d

    xx = conv2d(p["patch"], jnp.asarray(x), stride=16).transpose(0, 2, 3, 1)
    xx = xx + p["pos"]
    for i, bp in enumerate(p["blocks"]):
        shortcut = xx
        from aha_tpu.core import nn as N
        xn = N.ln(bp["norm1"], xx, eps=1e-6)
        if i in cfg.global_attn_indexes:
            attn = M._sam_attention(bp["attn"], xn, cfg.num_heads)
        else:
            win, pad_hw = M._window_partition(xn, cfg.window_size)
            win = M._sam_attention(bp["attn"], win, cfg.num_heads)
            attn = M._window_unpartition(win, cfg.window_size, pad_hw,
                                         (xx.shape[1], xx.shape[2]))
        xx = shortcut + attn
        xn = N.ln(bp["norm2"], xx, eps=1e-6)
        xx = xx + N.linear(bp["lin2"], jax.nn.gelu(
            N.linear(bp["lin1"], xn), approximate=False))
    xx = xx.transpose(0, 3, 1, 2)
    xx = conv2d(p["neck0"], xx)
    xx = layer_norm_2d(p["neck1"], xx)
    xx = conv2d(p["neck2"], xx, padding=1)
    got = np.asarray(layer_norm_2d(p["neck3"], xx))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)


def test_sam_pos_and_relpos_resize_path():
    """Pos-embed + rel-pos resizing: run a 96px image through a model built
    for 64px (abs pos 4x4 → 6x6 bicubic-antialias; rel tables linear-1d)."""
    model = DeepseekOCRModel(tiny_config())
    p = model.init_random(jax.random.PRNGKey(0))["sam"]
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 3, 96, 96)), jnp.float32)
    out = sam_encode(p, x, model.config.sam)
    # 96/16 = 6 patches → neck 6x6 → net2 3x3 → net3 2x2
    assert out.shape == (1, 48, 2, 2)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# CLIP tower vs HF CLIPVisionModel
# ---------------------------------------------------------------------------


def test_clip_tower_matches_hf():
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(1)
    hf_cfg = CLIPVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="quick_gelu", layer_norm_eps=1e-5)
    hf = CLIPVisionModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = ClipViTConfig(image_size=28, patch_size=14, num_layers=2,
                        hidden_size=48, num_heads=4, ffn_hidden_size=96)
    pre = "vision_model."
    layers = []
    for i in range(2):
        b = f"{pre}encoder.layers.{i}."
        qkv_w = np.concatenate([sd[b + "self_attn.q_proj.weight"],
                                sd[b + "self_attn.k_proj.weight"],
                                sd[b + "self_attn.v_proj.weight"]], axis=0)
        qkv_b = np.concatenate([sd[b + "self_attn.q_proj.bias"],
                                sd[b + "self_attn.k_proj.bias"],
                                sd[b + "self_attn.v_proj.bias"]], axis=0)
        layers.append({
            "ln1": {"w": jnp.asarray(sd[b + "layer_norm1.weight"]),
                    "b": jnp.asarray(sd[b + "layer_norm1.bias"])},
            "ln2": {"w": jnp.asarray(sd[b + "layer_norm2.weight"]),
                    "b": jnp.asarray(sd[b + "layer_norm2.bias"])},
            "qkv": {"w": jnp.asarray(qkv_w).T, "b": jnp.asarray(qkv_b)},
            "out": {"w": jnp.asarray(sd[b + "self_attn.out_proj.weight"]).T,
                    "b": jnp.asarray(sd[b + "self_attn.out_proj.bias"])},
            "fc1": {"w": jnp.asarray(sd[b + "mlp.fc1.weight"]).T,
                    "b": jnp.asarray(sd[b + "mlp.fc1.bias"])},
            "fc2": {"w": jnp.asarray(sd[b + "mlp.fc2.weight"]).T,
                    "b": jnp.asarray(sd[b + "mlp.fc2.bias"])},
        })
    p = {"cls": jnp.asarray(sd[pre + "embeddings.class_embedding"]),
         "patch": {"w": jnp.asarray(
             sd[pre + "embeddings.patch_embedding.weight"])},
         "pos": jnp.asarray(
             sd[pre + "embeddings.position_embedding.weight"]),
         "pre_ln": {"w": jnp.asarray(sd[pre + "pre_layrnorm.weight"]),
                    "b": jnp.asarray(sd[pre + "pre_layrnorm.bias"])},
         "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers)}

    rng = np.random.default_rng(2)
    pixels = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(pixels),
                  output_hidden_states=False).last_hidden_state.numpy()
    # HF applies a post layernorm only to pooled output; last_hidden_state
    # is the raw encoder output — same contract as the reference's VitModel.
    from aha_tpu.ops.conv import conv2d

    patch_embeds = conv2d(p["patch"], jnp.asarray(pixels), stride=14)
    got = np.asarray(clip_encode(p, patch_embeds, cfg))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=1e-3)


# ---------------------------------------------------------------------------
# MoE vs literal reference semantics
# ---------------------------------------------------------------------------


def test_moe_ffn_matches_reference_semantics():
    from aha_tpu.ops.moe import moe_ffn

    rng = np.random.default_rng(0)
    S, D, F, E, K = 17, 32, 24, 8, 3

    def mk(shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.3

    p = {"gate": {"w": jnp.asarray(mk((D, E)))},
         "experts": {"gate": {"w": jnp.asarray(mk((E, D, F)))},
                     "up": {"w": jnp.asarray(mk((E, D, F)))},
                     "down": {"w": jnp.asarray(mk((E, F, D)))}},
         "shared": {"gate": {"w": jnp.asarray(mk((D, 2 * F)))},
                    "up": {"w": jnp.asarray(mk((D, 2 * F)))},
                    "down": {"w": jnp.asarray(mk((2 * F, D)))}}}
    x = mk((S, D))

    def silu(v):
        return v / (1 + np.exp(-v))

    logits = x @ np.asarray(p["gate"]["w"])
    sc = np.exp(logits - logits.max(-1, keepdims=True))
    sc /= sc.sum(-1, keepdims=True)
    topi = np.argsort(-sc, axis=-1, kind="stable")[:, :K]
    topw = np.take_along_axis(sc, topi, axis=-1)
    topw = topw / (topw.sum(-1, keepdims=True) + 1e-20) * 1.5
    want = np.zeros_like(x)
    for s in range(S):
        for k in range(K):
            e = topi[s, k]
            ge, ue, de = (np.asarray(p["experts"][n]["w"])[e]
                          for n in ("gate", "up", "down"))
            want[s] += topw[s, k] * ((silu(x[s] @ ge) * (x[s] @ ue)) @ de)
    shg, shu, shd = (np.asarray(p["shared"][n]["w"])
                     for n in ("gate", "up", "down"))
    want += (silu(x @ shg) * (x @ shu)) @ shd

    for cap in [S * K, None]:
        got = np.asarray(moe_ffn(p, jnp.asarray(x), K, norm_topk_prob=True,
                                 routed_scaling_factor=1.5, capacity=cap))
        np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------------------
# Gundam layout goldens
# ---------------------------------------------------------------------------


def test_vision_layout_no_crops_v1():
    # one image, nb=2, no crops: rows = [g0 g1 NL] [g2 g3 NL] SEP
    idx = deepseek_vision_layout([{"nq": 2, "nb": 2, "wr": 1, "hr": 1}], 1)
    # global rows at 0..3, newline row = 4, sep = 5
    np.testing.assert_array_equal(idx, [0, 1, 4, 2, 3, 4, 5])


def test_vision_layout_with_crops_v1():
    # 2x1 crop grid (wr=2, hr=1), nq=1, nb=1
    idx = deepseek_vision_layout([{"nq": 1, "nb": 1, "wr": 2, "hr": 1}], 1)
    # crop rows 0..1 (2 crops × 1 token), global row 2, newline 3, sep 4
    # local: one row of [c0 c1 NL]; global: [g NL]; sep
    np.testing.assert_array_equal(idx, [0, 1, 3, 2, 3, 4])
    # token count matches processor.rs v1 accounting
    nq, nb, wr, hr = 1, 1, 2, 1
    expect = nb * nb + nb + 1 + (nq * wr + 1) * (nq * hr)
    assert len(idx) == expect


def test_vision_layout_v2_no_newline():
    idx = deepseek_vision_layout([{"nq": 2, "nb": 2, "wr": 1, "hr": 1}], 2)
    np.testing.assert_array_equal(idx, [0, 1, 2, 3, 4])
    assert len(idx) == 2 * 2 + 1


def test_vision_layout_padded_crop_rows():
    idx = deepseek_vision_layout([{"nq": 1, "nb": 1, "wr": 2, "hr": 1}], 1,
                                 crop_rows_total=4)
    np.testing.assert_array_equal(idx, [0, 1, 5, 4, 5, 6])


# ---------------------------------------------------------------------------
# Full model: engine consistency
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_config()
    model = DeepseekOCRModel(cfg, max_rope_len=512)
    params = model.init_random(jax.random.PRNGKey(0))
    return model, params


def _mm_for(model, n_img=1):
    cfg = model.config
    s = cfg.sam.img_size
    nb = s // cfg.sam.patch_size // 4
    rng = np.random.default_rng(3)
    mm = {"global": jnp.asarray(
        rng.standard_normal((n_img, 3, s, s)), jnp.float32)}
    layout = [{"nq": nb, "nb": nb, "wr": 1, "hr": 1}] * n_img
    gather = deepseek_vision_layout(layout, cfg.version)
    mm["gather_idx"] = jnp.asarray(gather)
    return mm, len(gather)


def test_prefill_decode_consistency(tiny_model):
    model, params = tiny_model
    cfg = model.config
    mm, n_vis = _mm_for(model)
    prompt = [0, 5, 7] + [cfg.image_token_id] * n_vis + [9, 11]
    S = len(prompt)
    ids = jnp.asarray([prompt], jnp.int32)

    from aha_tpu.core import cache as kvmod

    cache = model.init_cache(1, 64, jnp.float32)
    hidden, cache = model.backbone(params, ids, cache, mm=mm,
                                   prompt_len=jnp.int32(S))
    cache = kvmod.advance(cache, S)
    full_logits = model.logits(params, hidden)[0]

    # stepwise: prefill S-1 then decode the last token
    cache2 = model.init_cache(1, 64, jnp.float32)
    h2, cache2 = model.backbone(params, ids[:, :-1], cache2, mm=mm,
                                prompt_len=jnp.int32(S - 1))
    cache2 = kvmod.advance(cache2, S - 1)
    h3, cache2 = model.backbone(params, ids[:, -1:], cache2)
    step_logits = model.logits(params, h3)[0, 0]
    np.testing.assert_allclose(np.asarray(step_logits),
                               np.asarray(full_logits[-1]), atol=ATOL,
                               rtol=1e-3)


def test_padded_prefill_invariance(tiny_model):
    model, params = tiny_model
    cfg = model.config
    mm, n_vis = _mm_for(model)
    prompt = [0, 5] + [cfg.image_token_id] * n_vis + [9]
    S = len(prompt)
    from aha_tpu.core import cache as kvmod

    def last_logits(pad):
        ids = jnp.asarray([prompt + [0] * pad], jnp.int32)
        cache = model.init_cache(1, 64, jnp.float32)
        hidden, cache = model.backbone(params, ids, cache, mm=mm,
                                       prompt_len=jnp.int32(S))
        return np.asarray(model.logits(params, hidden)[0, S - 1])

    np.testing.assert_allclose(last_logits(0), last_logits(5), atol=ATOL,
                               rtol=1e-3)


def test_crops_path_runs(tiny_model):
    model, params = tiny_model
    cfg = model.config
    s = cfg.sam.img_size
    nb = s // 64
    rng = np.random.default_rng(4)
    layout = [{"nq": nb, "nb": nb, "wr": 2, "hr": 1}]
    gather = deepseek_vision_layout(layout, 1, crop_rows_total=2 * nb * nb)
    mm = {"global": jnp.asarray(rng.standard_normal((1, 3, s, s)),
                                jnp.float32),
          "crops": jnp.asarray(rng.standard_normal((2, 3, s, s)),
                               jnp.float32),
          "gather_idx": jnp.asarray(gather)}
    prompt = [0] + [cfg.image_token_id] * len(gather) + [9]
    ids = jnp.asarray([prompt], jnp.int32)
    cache = model.init_cache(1, 64, jnp.float32)
    hidden, _ = model.backbone(params, ids, cache, mm=mm,
                               prompt_len=jnp.int32(len(prompt)))
    assert np.isfinite(np.asarray(hidden)).all()


def test_v2_qwen2_encoder_path():
    cfg = tiny_config(version=2)
    # v2 uses the qwen2 query encoder; shrink it for the test
    model = DeepseekOCRModel(cfg, max_rope_len=256)
    from aha_tpu.models.llama import LlamaConfig, LlamaModel

    model.qwen2_model = LlamaModel(
        LlamaConfig(vocab_size=64, hidden_size=48, intermediate_size=96,
                    num_hidden_layers=2, num_attention_heads=4,
                    num_key_value_heads=2, qkv_bias=True), max_rope_len=256)
    params = model.init_random(jax.random.PRNGKey(1))
    qp = model.qwen2_model.init_random(jax.random.PRNGKey(2))
    # project SAM net3 output (48) into qwen2 hidden (48): identity-compatible
    n = (cfg.sam.img_size // 64) ** 2
    params["qwen2enc"] = {
        "params": qp,
        "query_768": jax.random.normal(jax.random.PRNGKey(3), (144, 48)) * .02,
        "query_1024": jax.random.normal(jax.random.PRNGKey(4), (n, 48)) * .02,
    }
    # v2 projector input = qwen2 hidden
    params["projector"] = {"w": jax.random.normal(
        jax.random.PRNGKey(5), (48, cfg.projector_n_embed)) * 0.02,
        "b": jnp.zeros(cfg.projector_n_embed)}
    s = cfg.sam.img_size
    mm, n_vis = _mm_for(model)
    prompt = [0, 3] + [cfg.image_token_id] * n_vis + [7]
    ids = jnp.asarray([prompt], jnp.int32)
    cache = model.init_cache(1, 64, jnp.float32)
    hidden, _ = model.backbone(params, ids, cache, mm=mm,
                               prompt_len=jnp.int32(len(prompt)))
    assert np.isfinite(np.asarray(hidden)).all()


# ---------------------------------------------------------------------------
# Served model end-to-end (synthetic checkpoint, no downloads)
# ---------------------------------------------------------------------------


def test_served_deepseek_ocr_generates(tmp_path):
    import base64
    import io

    from PIL import Image

    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters
    from tests.fixtures import build_tiny_deepseek_ocr_repo

    repo = str(tmp_path / "dsocr")
    build_tiny_deepseek_ocr_repo(repo)
    served = load_model("deepseek-ai/DeepSeek-OCR", repo)

    img = Image.fromarray(
        (np.random.default_rng(0).random((80, 120, 3)) * 255
         ).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, "PNG")
    url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()

    mes = ChatCompletionParameters.model_validate({
        "model": "deepseek-ai/DeepSeek-OCR",
        "messages": [{"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": url}},
            {"type": "text", "text": "<image>\nFree OCR."},
        ]}],
        "max_tokens": 6, "temperature": 0.0,
    })
    resp = served.generate(mes)
    assert resp.choices[0].message.role == "assistant"
    assert resp.usage.prompt_tokens > 4  # image expanded to layout tokens
    # deterministic (greedy) repeat
    resp2 = served.generate(mes)
    assert resp.choices[0].message.content == resp2.choices[0].message.content


def test_served_deepseek_ocr_crop_mode(tmp_path):
    import base64
    import io

    from PIL import Image

    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters
    from tests.fixtures import build_tiny_deepseek_ocr_repo

    repo = str(tmp_path / "dsocr")
    build_tiny_deepseek_ocr_repo(repo)
    served = load_model("deepseek-ai/DeepSeek-OCR", repo)
    # large, wide image → tiling path (crops at 640 min size)
    img = Image.fromarray((np.random.default_rng(1).random(
        (700, 1400, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG")
    url = "data:image/jpeg;base64," + base64.b64encode(buf.getvalue()).decode()
    mes = ChatCompletionParameters.model_validate({
        "model": "deepseek-ai/DeepSeek-OCR",
        "messages": [{"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": url}},
            {"type": "text", "text": "<image>\nFree OCR."},
        ]}],
        "max_tokens": 2, "temperature": 0.0,
        "metadata": {"crop_mode": "true"},
    })
    data = served.get_data(mes)
    assert "crops" in data.mm
    n_img_tok = data.input_ids.count(served.ocr_model.config.image_token_id)
    # v1 crop-mode accounting: base tokens + local tokens
    nq = nb = 640 // 64
    import aha_tpu.models.deepseek_ocr as M
    # grid for 1400x700 at 640: closest ratio 2x1
    assert n_img_tok == nb * nb + nb + 1 + (nq * 2 + 1) * (nq * 1)
