"""CAM++ speaker-embedding model (D-TDNN with context-aware masking).

Parity with src/models/campplus/mod.rs:
- FCM head (:117-191): 2-D conv stem over (1, F, T), two stages of residual
  blocks with frequency-only stride 2 (the reference emulates stride (2,1)
  with a stride-1 conv + even-row select, :93-101 — an actual (2,1)-strided
  conv computes the same windows), final conv + freq-stride, channels
  folded into features (C·F/8, T).
- XVector (:448-517): TDNN stem (k=5, stride 2) → three CAM-dense blocks
  (12/24/16 layers, dilations 1/2/2, growth 32, dense concatenation) each
  followed by a half-channel transit layer → BN+relu → statistics pooling
  (mean ‖ unbiased std over time) → dense embedding.
- CAMLayer (:231-309): local conv masked by sigmoid gates from
  global-mean + 100-frame segment pooling (ceil mode replicates the last
  frame, modules.rs:1305-1342).

BatchNorm (inference) is folded to scale/shift at load; all convs are
lax.conv_general_dilated with real (2,1)/2 strides.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from aha_tpu.io.weights import batched_load


def _bn(p, x, axis=1):
    shape = [1] * x.ndim
    shape[axis] = -1
    return x * p["scale"].reshape(shape) + p["shift"].reshape(shape)


def conv2d(x, w, stride=(1, 1), padding=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=[(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def conv1d(x, w, b=None, stride=1, dilation=1, padding=0):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"))
    if b is not None:
        y = y + b[None, :, None]
    return y


def seg_pooling(x, seg_len: int = 100, stype: str = "avg"):
    """(B, C, T) → per-segment stat broadcast back to T; ceil mode
    replicates the last frame (modules.rs:289-299, 1305-1329)."""
    B, C, T = x.shape
    pad = (-T) % seg_len
    if pad:
        x_p = jnp.concatenate([x, jnp.repeat(x[..., -1:], pad, -1)], -1)
    else:
        x_p = x
    seg = x_p.reshape(B, C, -1, seg_len)
    seg = seg.mean(-1) if stype == "avg" else seg.max(-1)
    return jnp.repeat(seg, seg_len, axis=-1)[..., :T]


def statistics_pooling(x):
    """(B, C, T) → (B, 2C): mean ‖ unbiased std (modules.rs:1344-1352)."""
    mean = x.mean(-1)
    std = jnp.sqrt(x.var(-1, ddof=1))
    return jnp.concatenate([mean, std], -1)


class CAMPPlus:
    BLOCK_PARAMS = ((12, 3, 1), (24, 3, 2), (16, 3, 2))

    def __init__(self, feat_dim: int = 80, embedding_size: int = 192,
                 growth_rate: int = 32, bn_size: int = 4,
                 init_channels: int = 128, m_channels: int = 32):
        self.feat_dim = feat_dim
        self.embedding_size = embedding_size
        self.growth_rate = growth_rate
        self.bn_size = bn_size
        self.init_channels = init_channels
        self.m_channels = m_channels
        self.head_out_channels = m_channels * (feat_dim // 8)

    # -- FCM head ---------------------------------------------------------------

    def _res_block(self, p, x, stride: int):
        y = conv2d(x, p["conv1"]["w"], stride=(stride, 1))
        y = jax.nn.relu(_bn(p["bn1"], y))
        y = conv2d(y, p["conv2"]["w"])
        y = _bn(p["bn2"], y)
        if "shortcut" in p:
            s = conv2d(x, p["shortcut"]["conv"]["w"], stride=(stride, 1),
                       padding=0)
            y = y + _bn(p["shortcut"]["bn"], s)
        else:
            y = y + x
        return jax.nn.relu(y)

    def _head(self, p, x):
        """x (B, F, T) → (B, C·F/8, T)."""
        x = x[:, None]                                   # (B, 1, F, T)
        x = jax.nn.relu(_bn(p["bn1"], conv2d(x, p["conv1"]["w"])))
        for i, bp in enumerate(p["layer1"]):
            x = self._res_block(bp, x, 2 if i == 0 else 1)
        for i, bp in enumerate(p["layer2"]):
            x = self._res_block(bp, x, 2 if i == 0 else 1)
        x = conv2d(x, p["conv2"]["w"], stride=(2, 1))
        x = jax.nn.relu(_bn(p["bn2"], x))
        B, C, H, T = x.shape
        return x.reshape(B, C * H, T)

    # -- XVector ------------------------------------------------------------------

    def _cam_layer(self, p, x, ks: int, dilation: int):
        pad = (ks - 1) // 2 * dilation
        y = conv1d(x, p["local"]["w"], p["local"].get("b"),
                   dilation=dilation, padding=pad)
        ctx = x.mean(-1, keepdims=True) + seg_pooling(x)
        ctx = jax.nn.relu(conv1d(ctx, p["l1"]["w"], p["l1"]["b"]))
        m = jax.nn.sigmoid(conv1d(ctx, p["l2"]["w"], p["l2"]["b"]))
        return y * m

    def _dense_layer(self, p, x, ks: int, dilation: int):
        h = jax.nn.relu(_bn(p["bn1"], x))
        h = conv1d(h, p["linear1"]["w"])
        h = jax.nn.relu(_bn(p["bn2"], h))
        return self._cam_layer(p["cam"], h, ks, dilation)

    def forward(self, params, feats):
        """feats (B, T, feat_dim) → embeddings (B, embedding_size)."""
        x = jnp.swapaxes(feats, 1, 2)                    # (B, F, T)
        x = self._head(params["head"], x)
        xp = params["xvector"]
        x = conv1d(x, xp["tdnn"]["w"], stride=2, padding=2)
        x = jax.nn.relu(_bn(xp["tdnn_bn"], x))
        for bi, (n_layers, ks, dil) in enumerate(self.BLOCK_PARAMS):
            for lp in xp["blocks"][bi]:
                out = self._dense_layer(lp, x, ks, dil)
                x = jnp.concatenate([x, out], axis=1)    # dense growth
            tp = xp["transits"][bi]
            x = jax.nn.relu(_bn(tp["bn"], x))
            x = conv1d(x, tp["linear"]["w"])
        x = jax.nn.relu(_bn(xp["out_bn"], x))
        x = statistics_pooling(x)
        x = conv1d(x[..., None], xp["dense"]["w"])[..., 0]
        return _bn(xp["dense_bn"], x)

    # -- loading --------------------------------------------------------------------

    @staticmethod
    def _fold_bn(src, name, dtype, affine=True, eps=1e-5):
        mean = np.asarray(src.get(name + ".running_mean", jnp.float32))
        var = np.asarray(src.get(name + ".running_var", jnp.float32))
        inv = 1.0 / np.sqrt(var + eps)
        if affine and name + ".weight" in src:
            g = np.asarray(src.get(name + ".weight", jnp.float32))
            b = np.asarray(src.get(name + ".bias", jnp.float32))
        else:
            g, b = 1.0, 0.0
        return {"scale": jnp.asarray(g * inv, dtype),
                "shift": jnp.asarray(b - mean * g * inv, dtype)}

    @batched_load
    def load_params(self, src, dtype=jnp.float32, prefix: str = "") -> dict:
        bn = lambda n, affine=True: self._fold_bn(src, prefix + n, dtype,
                                                  affine)
        cw = lambda n: {"w": src.get(prefix + n + ".weight", dtype),
                        **({"b": src.get(prefix + n + ".bias", dtype)}
                           if prefix + n + ".bias" in src else {})}

        def res_block(name):
            p = {"conv1": cw(name + ".conv1"), "bn1": bn(name + ".bn1"),
                 "conv2": cw(name + ".conv2"), "bn2": bn(name + ".bn2")}
            if prefix + name + ".shortcut.0.weight" in src:
                p["shortcut"] = {"conv": cw(name + ".shortcut.0"),
                                 "bn": bn(name + ".shortcut.1")}
            return p

        head = {
            "conv1": cw("head.conv1"), "bn1": bn("head.bn1"),
            "layer1": [res_block(f"head.layer1.{i}") for i in range(2)],
            "layer2": [res_block(f"head.layer2.{i}") for i in range(2)],
            "conv2": cw("head.conv2"), "bn2": bn("head.bn2"),
        }

        def dense_layer(name):
            return {
                "bn1": bn(name + ".nonlinear1.batchnorm"),
                "linear1": cw(name + ".linear1"),
                "bn2": bn(name + ".nonlinear2.batchnorm"),
                "cam": {"local": cw(name + ".cam_layer.linear_local"),
                        "l1": cw(name + ".cam_layer.linear1"),
                        "l2": cw(name + ".cam_layer.linear2")},
            }

        blocks, transits = [], []
        for bi, (n_layers, _, _) in enumerate(self.BLOCK_PARAMS):
            blocks.append([dense_layer(f"xvector.block{bi + 1}.tdnnd{j + 1}")
                           for j in range(n_layers)])
            transits.append({
                "bn": bn(f"xvector.transit{bi + 1}.nonlinear.batchnorm"),
                "linear": cw(f"xvector.transit{bi + 1}.linear")})
        xvector = {
            "tdnn": cw("xvector.tdnn.linear"),
            "tdnn_bn": bn("xvector.tdnn.nonlinear.batchnorm"),
            "blocks": blocks,
            "transits": transits,
            "out_bn": bn("xvector.out_nonlinear.batchnorm"),
            "dense": cw("xvector.dense.linear"),
            "dense_bn": bn("xvector.dense.nonlinear.batchnorm",
                           affine=False),
        }
        return {"head": head, "xvector": xvector}

    def init_random(self, key, scale: float = 0.1) -> dict:
        ks = iter(jax.random.split(key, 512))

        def w(shape):
            return jax.random.normal(next(ks), shape, jnp.float32) * scale

        def bn(c):
            return {"scale": jnp.ones(c), "shift": jnp.zeros(c)}

        m = self.m_channels

        def res_block(cin, cout, stride):
            p = {"conv1": {"w": w((cout, cin, 3, 3))}, "bn1": bn(cout),
                 "conv2": {"w": w((cout, cout, 3, 3))}, "bn2": bn(cout)}
            if stride != 1 or cin != cout:
                p["shortcut"] = {"conv": {"w": w((cout, cin, 1, 1))},
                                 "bn": bn(cout)}
            return p

        head = {
            "conv1": {"w": w((m, 1, 3, 3))}, "bn1": bn(m),
            "layer1": [res_block(m, m, 2), res_block(m, m, 1)],
            "layer2": [res_block(m, m, 2), res_block(m, m, 1)],
            "conv2": {"w": w((m, m, 3, 3))}, "bn2": bn(m),
        }
        g, bnsz = self.growth_rate, self.bn_size
        c = self.init_channels

        def dense_layer(cin, ks_):
            bnc = bnsz * g
            return {"bn1": bn(cin), "linear1": {"w": w((bnc, cin, 1))},
                    "bn2": bn(bnc),
                    "cam": {"local": {"w": w((g, bnc, ks_))},
                            "l1": {"w": w((bnc // 2, bnc, 1)),
                                   "b": jnp.zeros(bnc // 2)},
                            "l2": {"w": w((g, bnc // 2, 1)),
                                   "b": jnp.zeros(g)}}}

        blocks, transits = [], []
        for n_layers, ks_, _ in self.BLOCK_PARAMS:
            blocks.append([dense_layer(c + j * g, ks_)
                           for j in range(n_layers)])
            c += n_layers * g
            transits.append({"bn": bn(c), "linear": {"w": w((c // 2, c, 1))}})
            c //= 2
        return {
            "head": head,
            "xvector": {
                "tdnn": {"w": w((self.init_channels,
                                 self.head_out_channels, 5))},
                "tdnn_bn": bn(self.init_channels),
                "blocks": blocks, "transits": transits,
                "out_bn": bn(c),
                "dense": {"w": w((self.embedding_size, 2 * c, 1))},
                "dense_bn": bn(self.embedding_size),
            },
        }
