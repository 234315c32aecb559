"""RMBG-2.0 / BiRefNet: deformable conv vs a scalar transcription of the
reference kernel, Swin backbone parity vs HF SwinBackbone, and the served
remove-background path end-to-end on a synthetic checkpoint."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aha_tpu.models.rmbg2_0 import (
    BiRefNet,
    SwinConfig,
    deform_conv2d,
    swin_forward,
)

ATOL = 2e-2


# ---------------------------------------------------------------------------
# Deformable conv vs reference kernel (common/modules.rs:894-974)
# ---------------------------------------------------------------------------


def _deform_ref(x, weight, bias, offset, mask, stride, padding):
    """Literal scalar transcription of deform_conv2d_kernel."""
    _, C, H, W = x.shape
    O, _, kh, kw = weight.shape
    Ho = (H + 2 * padding - kh) // stride + 1
    Wo = (W + 2 * padding - kw) // stride + 1
    cols = np.zeros((C * kh * kw, Ho * Wo), np.float32)
    xv, ov, mv = x[0], offset[0], mask[0]
    for c in range(C):
        for oy in range(Ho):
            for ox in range(Wo):
                for i in range(kh):
                    for j in range(kw):
                        kidx = i * kw + j
                        m = mv[kidx, oy, ox]
                        dy = ov[2 * kidx, oy, ox]
                        dx = ov[2 * kidx + 1, oy, ox]
                        y = oy * stride - padding + i + dy
                        xx = ox * stride - padding + j + dx
                        if y <= -1.0 or y >= H or xx <= -1.0 or xx >= W:
                            val = 0.0
                        else:
                            y0, x0 = np.floor(y), np.floor(xx)
                            ly, lx = y - y0, xx - x0
                            val = 0.0
                            for (cy, cx, wgt) in (
                                    (y0, x0, (1 - ly) * (1 - lx)),
                                    (y0, x0 + 1, (1 - ly) * lx),
                                    (y0 + 1, x0, ly * (1 - lx)),
                                    (y0 + 1, x0 + 1, ly * lx)):
                                if 0 <= cy <= H - 1 and 0 <= cx <= W - 1:
                                    val += wgt * xv[c, int(cy), int(cx)]
                        cols[c * kh * kw + kidx, oy * Wo + ox] = m * val
    out = weight.reshape(O, -1) @ cols
    out = out.reshape(1, O, Ho, Wo)
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


@pytest.mark.parametrize("ks,pad,stride", [(3, 1, 1), (1, 0, 1), (3, 1, 2)])
def test_deform_conv_matches_reference(ks, pad, stride):
    rng = np.random.default_rng(0)
    C, O, H, W = 4, 5, 7, 8
    Ho = (H + 2 * pad - ks) // stride + 1
    Wo = (W + 2 * pad - ks) // stride + 1
    x = rng.standard_normal((1, C, H, W)).astype(np.float32)
    weight = rng.standard_normal((O, C, ks, ks)).astype(np.float32) * 0.2
    bias = rng.standard_normal(O).astype(np.float32)
    offset = rng.standard_normal((1, 2 * ks * ks, Ho, Wo)).astype(
        np.float32) * 2.0
    mask = rng.random((1, ks * ks, Ho, Wo)).astype(np.float32)

    want = _deform_ref(x, weight, bias, offset, mask, stride, pad)
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(weight),
                                   jnp.asarray(bias), jnp.asarray(offset),
                                   jnp.asarray(mask), stride, pad))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_deform_conv_batched():
    """The reference is limited to batch 1 (generate.rs:131); ours must give
    identical per-sample results in a batch."""
    rng = np.random.default_rng(1)
    ks, pad = 3, 1
    x = rng.standard_normal((2, 3, 6, 6)).astype(np.float32)
    weight = rng.standard_normal((4, 3, ks, ks)).astype(np.float32) * 0.2
    offset = rng.standard_normal((2, 2 * ks * ks, 6, 6)).astype(np.float32)
    mask = rng.random((2, ks * ks, 6, 6)).astype(np.float32)
    full = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(weight), None,
                                    jnp.asarray(offset), jnp.asarray(mask),
                                    1, pad))
    for b in range(2):
        single = np.asarray(deform_conv2d(
            jnp.asarray(x[b:b + 1]), jnp.asarray(weight), None,
            jnp.asarray(offset[b:b + 1]), jnp.asarray(mask[b:b + 1]), 1, pad))
        np.testing.assert_allclose(full[b:b + 1], single, atol=1e-5)


# ---------------------------------------------------------------------------
# Swin backbone vs HF SwinBackbone
# ---------------------------------------------------------------------------


def test_swin_backbone_matches_hf():
    import torch
    from transformers import SwinConfig as HFSwinConfig
    from transformers.models.swin.modeling_swin import SwinBackbone

    torch.manual_seed(0)
    hf_cfg = HFSwinConfig(
        image_size=32, patch_size=4, embed_dim=16, depths=[2, 2],
        num_heads=[2, 4], window_size=4, mlp_ratio=4.0, qkv_bias=True,
        hidden_act="gelu", layer_norm_eps=1e-5,
        out_features=["stage1", "stage2"])
    hf = SwinBackbone(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = SwinConfig(patch_size=4, embed_dim=16, depths=(2, 2),
                     num_heads=(2, 4), window_size=4)
    p = {"patch": {"w": jnp.asarray(
        sd["embeddings.patch_embeddings.projection.weight"]),
        "b": jnp.asarray(sd["embeddings.patch_embeddings.projection.bias"])},
        "patch_norm": {"w": jnp.asarray(sd["embeddings.norm.weight"]),
                       "b": jnp.asarray(sd["embeddings.norm.bias"])},
        "layers": [], "norms": []}
    for i, depth in enumerate((2, 2)):
        lp = {"blocks": []}
        for j in range(depth):
            b = f"encoder.layers.{i}.blocks.{j}."
            qkv_w = np.concatenate([sd[b + "attention.self.query.weight"],
                                    sd[b + "attention.self.key.weight"],
                                    sd[b + "attention.self.value.weight"]], 0)
            qkv_b = np.concatenate([sd[b + "attention.self.query.bias"],
                                    sd[b + "attention.self.key.bias"],
                                    sd[b + "attention.self.value.bias"]], 0)
            lp["blocks"].append({
                "norm1": {"w": jnp.asarray(sd[b + "layernorm_before.weight"]),
                          "b": jnp.asarray(sd[b + "layernorm_before.bias"])},
                "norm2": {"w": jnp.asarray(sd[b + "layernorm_after.weight"]),
                          "b": jnp.asarray(sd[b + "layernorm_after.bias"])},
                "attn": {
                    "qkv": {"w": jnp.asarray(qkv_w).T,
                            "b": jnp.asarray(qkv_b)},
                    "proj": {"w": jnp.asarray(
                        sd[b + "attention.output.dense.weight"]).T,
                        "b": jnp.asarray(sd[b + "attention.output.dense.bias"])},
                    "rel_bias_table": jnp.asarray(sd[
                        b + "attention.self.relative_position_bias_table"]),
                },
                "fc1": {"w": jnp.asarray(
                    sd[b + "intermediate.dense.weight"]).T,
                    "b": jnp.asarray(sd[b + "intermediate.dense.bias"])},
                "fc2": {"w": jnp.asarray(sd[b + "output.dense.weight"]).T,
                        "b": jnp.asarray(sd[b + "output.dense.bias"])},
            })
        if i < 1:
            lp["downsample"] = {
                "norm": {"w": jnp.asarray(
                    sd[f"encoder.layers.{i}.downsample.norm.weight"]),
                    "b": jnp.asarray(
                        sd[f"encoder.layers.{i}.downsample.norm.bias"])},
                "reduction": {"w": jnp.asarray(
                    sd[f"encoder.layers.{i}.downsample.reduction.weight"]).T},
            }
        p["layers"].append(lp)
        p["norms"].append({
            "w": jnp.asarray(sd[f"hidden_states_norms.stage{i + 1}.weight"]),
            "b": jnp.asarray(sd[f"hidden_states_norms.stage{i + 1}.bias"])})

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = [f.numpy() for f in hf(torch.from_numpy(x)).feature_maps]
    got = swin_forward(p, jnp.asarray(x), cfg)
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), wnt, atol=ATOL, rtol=1e-3)


# ---------------------------------------------------------------------------
# Served end-to-end
# ---------------------------------------------------------------------------


def test_served_rmbg_removes_background(tmp_path):
    import base64
    import io

    from PIL import Image

    from aha_tpu.models.loader import load_model
    from aha_tpu.params import ChatCompletionParameters
    from tests.fixtures import build_tiny_rmbg_repo

    repo = str(tmp_path / "rmbg")
    build_tiny_rmbg_repo(repo)
    served = load_model("AI-ModelScope/RMBG-2.0", repo, size=64)

    img = Image.fromarray((np.random.default_rng(0).random(
        (50, 70, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, "PNG")
    url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    mes = ChatCompletionParameters.model_validate({
        "model": "AI-ModelScope/RMBG-2.0",
        "messages": [{"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": url}}]}]})
    resp = served.generate(mes)
    parts = resp.choices[0].message.content
    assert len(parts) == 1
    out_url = parts[0]["image_url"]["url"] if isinstance(parts[0], dict) \
        else parts[0].image_url.url
    assert out_url.startswith("data:image/png;base64,")
    png = base64.b64decode(out_url.split(",", 1)[1])
    out = Image.open(io.BytesIO(png))
    assert out.mode == "RGBA"
    assert out.size == (70, 50)  # original geometry restored
    # alpha is the matte, not constant
    alpha = np.asarray(out)[:, :, 3]
    assert alpha.min() >= 0 and alpha.max() <= 255
    # RGB channels preserved from the source
    np.testing.assert_array_equal(np.asarray(out)[:, :, :3], np.asarray(img))
