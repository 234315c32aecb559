"""CAM++ speaker embeddings: pooling semantics vs torch, FCM stride
equivalence with the reference's select trick, end-to-end shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.models.campplus import (
    CAMPPlus,
    conv2d,
    seg_pooling,
    statistics_pooling,
)


def test_seg_pooling_matches_torch_ceil_avgpool():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 230)).astype(np.float32)
    got = np.asarray(seg_pooling(jnp.asarray(x), 100))
    # reference pads by replicating the last frame, then mean per segment
    xp = np.concatenate([x, np.repeat(x[..., -1:], 70, -1)], -1)
    ref_seg = torch.tensor(xp).reshape(2, 3, 3, 100).mean(-1).numpy()
    ref = np.repeat(ref_seg, 100, axis=-1)[..., :230]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_statistics_pooling_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5, 40)).astype(np.float32)
    got = np.asarray(statistics_pooling(jnp.asarray(x)))
    t = torch.tensor(x)
    ref = torch.cat([t.mean(-1), t.var(-1, unbiased=True).sqrt()], -1)
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_freq_stride_equals_select_trick():
    """A real (2,1)-strided conv == the reference's stride-1 conv +
    even-row select (mod.rs:93-101)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4, 16, 10)).astype(np.float32)
    w = rng.standard_normal((4, 4, 3, 3)).astype(np.float32)
    got = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride=(2, 1)))
    full = torch.nn.functional.conv2d(torch.tensor(x), torch.tensor(w),
                                      padding=1)
    ref = full[:, :, ::2, :].numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def tiny():
    model = CAMPPlus(feat_dim=16, embedding_size=24, growth_rate=4,
                     bn_size=2, init_channels=8, m_channels=4)
    params = model.init_random(jax.random.PRNGKey(3))
    return model, params


def test_embedding_shapes(tiny):
    model, params = tiny
    feats = jnp.asarray(np.random.default_rng(4).standard_normal(
        (2, 120, 16)).astype(np.float32))
    emb = model.forward(params, feats)
    assert emb.shape == (2, 24)
    assert np.isfinite(np.asarray(emb)).all()
    # batch rows are independent
    one = model.forward(params, feats[:1])
    np.testing.assert_allclose(np.asarray(one[0]), np.asarray(emb[0]),
                               rtol=1e-4, atol=1e-5)


def test_embedding_discriminates(tiny):
    model, params = tiny
    rng = np.random.default_rng(5)
    a = model.forward(params, jnp.asarray(
        rng.standard_normal((1, 100, 16)).astype(np.float32)))
    b = model.forward(params, jnp.asarray(
        rng.standard_normal((1, 100, 16)).astype(np.float32)))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_load_params_roundtrip(tiny):
    """Save init params as a torch-style state dict (incl. batchnorm
    running stats) and verify folded loading reproduces the forward."""
    from aha_tpu.io.weights import DictSource

    model, params = tiny
    sd = {}

    def put_bn(name, c, scale, shift):
        # choose running stats so folded scale/shift match: g=scale,
        # b=shift, mean=0, var=1-eps
        sd[name + ".weight"] = np.asarray(scale, np.float32)
        sd[name + ".bias"] = np.asarray(shift, np.float32)
        sd[name + ".running_mean"] = np.zeros(c, np.float32)
        sd[name + ".running_var"] = np.ones(c, np.float32) - 1e-5

    def put_conv(name, p):
        sd[name + ".weight"] = np.asarray(p["w"], np.float32)
        if "b" in p:
            sd[name + ".bias"] = np.asarray(p["b"], np.float32)

    h = params["head"]
    put_conv("head.conv1", h["conv1"])
    put_bn("head.bn1", 4, h["bn1"]["scale"], h["bn1"]["shift"])
    for li, layer in enumerate(("layer1", "layer2")):
        for i, bp in enumerate(h[layer]):
            n = f"head.{layer}.{i}"
            put_conv(n + ".conv1", bp["conv1"])
            put_bn(n + ".bn1", 4, bp["bn1"]["scale"], bp["bn1"]["shift"])
            put_conv(n + ".conv2", bp["conv2"])
            put_bn(n + ".bn2", 4, bp["bn2"]["scale"], bp["bn2"]["shift"])
            if "shortcut" in bp:
                put_conv(n + ".shortcut.0", bp["shortcut"]["conv"])
                put_bn(n + ".shortcut.1", 4, bp["shortcut"]["bn"]["scale"],
                       bp["shortcut"]["bn"]["shift"])
    put_conv("head.conv2", h["conv2"])
    put_bn("head.bn2", 4, h["bn2"]["scale"], h["bn2"]["shift"])
    xv = params["xvector"]
    put_conv("xvector.tdnn.linear", xv["tdnn"])
    put_bn("xvector.tdnn.nonlinear.batchnorm", 8, xv["tdnn_bn"]["scale"],
           xv["tdnn_bn"]["shift"])
    for bi, block in enumerate(xv["blocks"]):
        for j, lp in enumerate(block):
            n = f"xvector.block{bi + 1}.tdnnd{j + 1}"
            put_bn(n + ".nonlinear1.batchnorm", len(lp["bn1"]["scale"]),
                   lp["bn1"]["scale"], lp["bn1"]["shift"])
            put_conv(n + ".linear1", lp["linear1"])
            put_bn(n + ".nonlinear2.batchnorm", len(lp["bn2"]["scale"]),
                   lp["bn2"]["scale"], lp["bn2"]["shift"])
            put_conv(n + ".cam_layer.linear_local", lp["cam"]["local"])
            put_conv(n + ".cam_layer.linear1", lp["cam"]["l1"])
            put_conv(n + ".cam_layer.linear2", lp["cam"]["l2"])
    for bi, tp in enumerate(xv["transits"]):
        n = f"xvector.transit{bi + 1}"
        put_bn(n + ".nonlinear.batchnorm", len(tp["bn"]["scale"]),
               tp["bn"]["scale"], tp["bn"]["shift"])
        put_conv(n + ".linear", tp["linear"])
    put_bn("xvector.out_nonlinear.batchnorm", len(xv["out_bn"]["scale"]),
           xv["out_bn"]["scale"], xv["out_bn"]["shift"])
    put_conv("xvector.dense.linear", xv["dense"])
    sd["xvector.dense.nonlinear.batchnorm.running_mean"] = np.zeros(
        24, np.float32)
    sd["xvector.dense.nonlinear.batchnorm.running_var"] = np.ones(
        24, np.float32) - 1e-5

    loaded = model.load_params(DictSource(sd))
    feats = jnp.asarray(np.random.default_rng(6).standard_normal(
        (1, 80, 16)).astype(np.float32))
    a = model.forward(params, feats)
    b = model.forward(loaded, feats)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)
