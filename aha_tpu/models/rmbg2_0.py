"""RMBG-2.0 (BiRefNet): Swin-L backbone + deformable-conv ASPP decoder →
foreground matte.

Reference: src/models/rmbg2_0/model.rs (SwinTransformer :17-558,
DeformableConv2d :561-870 / deform_conv2d_kernel common/modules.rs:894,
ASPPDeformable :905-1007, Decoder :1079-1312, BiRefNet :1314-1382) and
generate.rs (1024px ImageNet-normalised input, matte → RGBA :93-176).

TPU-first notes:
- Input is fixed 1024×1024, so every window partition, shift mask, and
  relative-position gather is a static numpy computation feeding static
  reshapes; nothing data-dependent crosses into XLA control flow.
- The deformable conv is vectorised: sampling coordinates for all kernel
  taps come from one offset conv, the bilinear 4-corner gather runs as a
  lax.scan over kernel taps (bounding peak memory), and the accumulation is
  an MXU einsum against the (O, C, k) weight slice — no per-pixel host loop
  (the reference runs the whole kernel on CPU per image, forcing
  batch_size=1; this implementation is batched).
- All decoder resizes use torch-parity align_corners=True bilinear weights
  (aha_tpu.utils.interpolate) applied as matmuls.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core import nn
from aha_tpu.ops.conv import conv2d
from aha_tpu.utils.interpolate import interpolate
from aha_tpu.io.weights import batched_load


# ---------------------------------------------------------------------------
# Swin transformer backbone
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    embed_dim: int = 192
    depths: tuple = (2, 2, 18, 2)
    num_heads: tuple = (6, 12, 24, 48)
    window_size: int = 12
    mlp_ratio: float = 4.0
    eps: float = 1e-5

    @property
    def num_features(self) -> tuple:
        return tuple(self.embed_dim * 2 ** i for i in range(len(self.depths)))


def _rel_bias_index(window: int) -> np.ndarray:
    """(N, N) relative-position index into the (2w-1)^2 bias table
    (model.rs:103-126)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + window - 1
    return rel[..., 0] * (2 * window - 1) + rel[..., 1]


def _shift_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask for shifted windows (model.rs:408-447)."""
    img = np.zeros((hp, wp))
    cnt = 0
    for hs in ((0, hp - window), (hp - window, hp - shift), (hp - shift, hp)):
        for ws in ((0, wp - window), (wp - window, wp - shift),
                   (wp - shift, wp)):
            img[hs[0]:hs[1], ws[0]:ws[1]] = cnt
            cnt += 1
    win = img.reshape(hp // window, window, wp // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask == 0, 0.0, -100.0).astype(np.float32)


def _window_partition(x, window):
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, C)


def _window_reverse(win, window, hp, wp):
    C = win.shape[-1]
    B = win.shape[0] // (hp * wp // window // window)
    x = win.reshape(B, hp // window, wp // window, window, window, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, hp, wp, C)


def _swin_attention(p, x, num_heads, mask=None):
    """Windowed MSA with relative position bias (model.rs:138-184).
    x: (nWB, N, C); mask: (nW, N, N) additive or None."""
    nWB, N, C = x.shape
    hd = C // num_heads
    qkv = nn.linear(p["qkv"], x).reshape(nWB, N, 3, num_heads, hd)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3) * (hd ** -0.5)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    scores = jnp.einsum("bnqd,bnkd->bnqk", q, k,
                        preferred_element_type=jnp.float32)
    idx = _rel_bias_index(int(round(N ** 0.5)))
    bias = jnp.take(p["rel_bias_table"], jnp.asarray(idx.reshape(-1)), axis=0)
    bias = bias.reshape(N, N, num_heads).transpose(2, 0, 1)
    scores = scores + bias[None].astype(jnp.float32)
    if mask is not None:
        nW = mask.shape[0]
        scores = scores.reshape(nWB // nW, nW, num_heads, N, N)
        scores = scores + jnp.asarray(mask)[None, :, None]
        scores = scores.reshape(nWB, num_heads, N, N)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bnqk,bnkd->bnqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(nWB, N, C)
    return nn.linear(p["proj"], out)


def _swin_block(p, x, H, W, window, shift, num_heads, eps):
    B, L, C = x.shape
    shortcut = x
    x = nn.ln(p["norm1"], x, eps=eps).reshape(B, H, W, C)
    pad_h = (window - H % window) % window
    pad_w = (window - W % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = H + pad_h, W + pad_w
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = _shift_mask(hp, wp, window, shift)
    else:
        mask = None
    win = _window_partition(x, window)
    win = _swin_attention(p["attn"], win, num_heads, mask)
    x = _window_reverse(win, window, hp, wp)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = x[:, :H, :W].reshape(B, L, C)
    x = shortcut + x
    h = nn.ln(p["norm2"], x, eps=eps)
    x = x + nn.linear(p["fc2"], jax.nn.gelu(nn.linear(p["fc1"], h),
                                            approximate=False))
    return x


def _patch_merging(p, x, H, W, eps):
    B, L, C = x.shape
    x = x.reshape(B, H, W, C)
    if H % 2 or W % 2:
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    x = x.reshape(B, -1, 4 * C)
    x = nn.ln(p["norm"], x, eps=eps)
    return nn.linear(p["reduction"], x)


def swin_forward(p: dict, pixels: jnp.ndarray, cfg: SwinConfig) -> list:
    """(B, 3, H, W) → 4 normalised NCHW feature maps (model.rs:533-557)."""
    ps = cfg.patch_size
    B, _, H, W = pixels.shape
    if H % ps or W % ps:
        pixels = jnp.pad(pixels, ((0, 0), (0, 0), (0, (ps - H % ps) % ps),
                                  (0, (ps - W % ps) % ps)))
    x = conv2d(p["patch"], pixels, stride=ps)
    _, E, wh, ww = x.shape
    x = x.reshape(B, E, wh * ww).transpose(0, 2, 1)
    x = nn.ln(p["patch_norm"], x, eps=cfg.eps)
    outs = []
    for i, depth in enumerate(cfg.depths):
        lp = p["layers"][i]
        x_out = x
        for j in range(depth):
            shift = 0 if j % 2 == 0 else cfg.window_size // 2
            x_out = _swin_block(lp["blocks"][j], x_out, wh, ww,
                                cfg.window_size, shift, cfg.num_heads[i],
                                cfg.eps)
        normed = nn.ln(p["norms"][i], x_out, eps=cfg.eps)
        outs.append(normed.reshape(B, wh, ww, cfg.num_features[i])
                    .transpose(0, 3, 1, 2))
        if "downsample" in lp:
            x = _patch_merging(lp["downsample"], x_out, wh, ww, cfg.eps)
            wh, ww = (wh + 1) // 2, (ww + 1) // 2
        else:
            x = x_out
    return outs


# ---------------------------------------------------------------------------
# Deformable convolution (torchvision deform_conv2d semantics)
# ---------------------------------------------------------------------------


def deform_conv2d(x, weight, bias, offset, mask, stride: int = 1,
                  padding: int = 0):
    """x (B,C,H,W), weight (O,C,kh,kw), offset (B,2K,Ho,Wo) interleaved
    (Δy,Δx) per tap, mask (B,K,Ho,Wo).  Bilinear sampling with zeros outside
    (modules.rs:894-974), batched; taps scanned to bound peak memory."""
    B, C, H, W = x.shape
    O, _, kh, kw = weight.shape
    K = kh * kw
    Ho = (H + 2 * padding - kh) // stride + 1
    Wo = (W + 2 * padding - kw) // stride + 1

    off = offset.reshape(B, K, 2, Ho, Wo)
    base_y = (np.arange(Ho) * stride - padding)[None, :, None]
    base_x = (np.arange(Wo) * stride - padding)[None, None, :]
    ki = np.repeat(np.arange(kh), kw)[:, None, None]
    kj = np.tile(np.arange(kw), kh)[:, None, None]
    ys = jnp.asarray(base_y + ki, jnp.float32)[None] + off[:, :, 0]
    xs = jnp.asarray(base_x + kj, jnp.float32)[None] + off[:, :, 1]

    # channels-LAST rows: each bilinear corner is then a row gather whose
    # slice keeps all C channels in lanes (embedding-lookup shape, fast on
    # TPU).  The previous (B, C, H·W) element gather ran one scalar element
    # per index — ~seconds per deform block at 256².
    xr = x.transpose(0, 2, 3, 1).reshape(B, H * W, C)
    w_k = weight.reshape(O, C, K)

    def tap(carry, inputs):
        y, xx, m, wk = inputs  # (B,Ho,Wo), (B,Ho,Wo), (B,Ho,Wo), (C,O)
        inside = (y > -1.0) & (y < H) & (xx > -1.0) & (xx < W)
        y0 = jnp.floor(y)
        x0 = jnp.floor(xx)
        ly, lx = y - y0, xx - x0
        acc = None
        for dy, dx, wgt in ((0, 0, (1 - ly) * (1 - lx)),
                            (0, 1, (1 - ly) * lx),
                            (1, 0, ly * (1 - lx)),
                            (1, 1, ly * lx)):
            cy = y0 + dy
            cx = x0 + dx
            ok = inside & (cy >= 0) & (cy <= H - 1) & (cx >= 0) & (cx <= W - 1)
            idx = (jnp.clip(cy, 0, H - 1) * W
                   + jnp.clip(cx, 0, W - 1)).astype(jnp.int32)
            v = jnp.take_along_axis(                       # (B, Ho·Wo, C)
                xr, idx.reshape(B, Ho * Wo, 1), axis=1)
            v = v * jnp.where(ok, wgt, 0.0).reshape(B, Ho * Wo, 1)
            acc = v if acc is None else acc + v
        sampled = acc * m.reshape(B, Ho * Wo, 1)
        contrib = jnp.einsum("bnc,co->bno", sampled, wk,   # MXU tap matmul
                             preferred_element_type=jnp.float32)
        return carry + contrib, None

    out0 = jnp.zeros((B, Ho * Wo, O), jnp.float32)
    out, _ = jax.lax.scan(
        tap, out0,
        (ys.transpose(1, 0, 2, 3), xs.transpose(1, 0, 2, 3),
         mask.transpose(1, 0, 2, 3), w_k.transpose(2, 1, 0)))
    out = out.transpose(0, 2, 1).reshape(B, O, Ho, Wo)
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out.astype(x.dtype)


def _batch_norm(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return ((x - p["mean"][None, :, None, None]) * inv[None, :, None, None]
            * p["w"][None, :, None, None] + p["b"][None, :, None, None])


def _deform_block(p, x, ks: int, padding: int):
    """DeformableConv2d (model.rs:571-650): offset conv + sigmoid·2
    modulator + deformable regular conv."""
    offset = conv2d(p["offset"], x, padding=padding)
    mask = 2.0 * jax.nn.sigmoid(conv2d(p["modulator"], x, padding=padding))
    return deform_conv2d(x, p["conv"]["w"], p["conv"].get("b"), offset, mask,
                         stride=1, padding=padding)


def _aspp_module(p, x, ks: int, padding: int):
    x = _deform_block(p, x, ks, padding)
    return jax.nn.relu(_batch_norm(p["bn"], x))


def _aspp_deformable(p, x):
    """ASPPDeformable (model.rs:918-1006): 1/1/3/7 deformable branches +
    global pool branch, fused 1x1."""
    branches = [_aspp_module(p["aspp1"], x, 1, 0)]
    for i, ks in enumerate((1, 3, 7)):
        branches.append(_aspp_module(p[f"deform{i}"], x, ks, ks // 2))
    g = x.mean(axis=(2, 3), keepdims=True)
    g = conv2d(p["pool_conv"], g)
    g = jax.nn.relu(_batch_norm(p["pool_bn"], g))
    h, w = branches[0].shape[2:]
    g = interpolate(g, (h, w), "bilinear", align_corners=True)
    x = jnp.concatenate(branches + [g], axis=1)
    x = conv2d(p["conv1"], x)
    return jax.nn.relu(_batch_norm(p["bn1"], x))


def _basic_dec_blk(p, x):
    """BasicDecBlk (model.rs:1017-1056)."""
    x = jax.nn.relu(_batch_norm(p["bn_in"], conv2d(p["conv_in"], x,
                                                   padding=1)))
    x = _aspp_deformable(p["dec_att"], x)
    return _batch_norm(p["bn_out"], conv2d(p["conv_out"], x, padding=1))


def _simple_convs(p, x):
    return conv2d(p["conv_out"], conv2d(p["conv1"], x, padding=1), padding=1)


def _gdt(p, x):
    """gdt conv + sigmoid attention gate (model.rs:1257-1259)."""
    g = jax.nn.relu(_batch_norm(p["bn"], conv2d(p["conv"], x, padding=1)))
    return x * jax.nn.sigmoid(conv2d(p["attn"], g))


def _patches_to_channels(x, ph: int, pw: int):
    """get_patches_batch (model.rs:1224-1240): split the source image into
    patches of SIZE (ph, pw) and stack them along channels, column-major
    (columns split first along W, then each column along H)."""
    B, C, H, W = x.shape
    gh, gw = H // ph, W // pw
    x = x.reshape(B, C, gh, ph, gw, pw)
    x = x.transpose(0, 4, 2, 1, 3, 5)  # (B, gw, gh, C, ph, pw)
    return x.reshape(B, gw * gh * C, ph, pw)


def _resize(x, hw):
    return interpolate(x, hw, "bilinear", align_corners=True)


# ---------------------------------------------------------------------------
# BiRefNet
# ---------------------------------------------------------------------------


class BiRefNet:
    def __init__(self, swin: SwinConfig | None = None):
        self.swin = swin or SwinConfig()
        nf = self.swin.num_features
        # dual-scale concat doubles each stage, reversed order
        self.channels = tuple(2 * f for f in reversed(nf))

    def forward(self, params, pixels: jnp.ndarray) -> jnp.ndarray:
        """(B, 3, H, W) normalised → (B, 1, H, W) sigmoid matte
        (model.rs:1345-1381)."""
        cfg = self.swin
        ch = self.channels
        f_full = swin_forward(params["bb"], pixels, cfg)
        B, _, H, W = pixels.shape
        half = _resize(pixels, (H // 2, W // 2))
        f_half = swin_forward(params["bb"], half, cfg)
        feats = []
        for a, b in zip(f_full, f_half):
            b = _resize(b, a.shape[2:])
            feats.append(jnp.concatenate([a, b], axis=1))
        x1, x2, x3, x4 = feats
        hw4 = x4.shape[2:]
        x4 = jnp.concatenate([_resize(x1, hw4), _resize(x2, hw4),
                              _resize(x3, hw4), x4], axis=1)
        x4 = _basic_dec_blk(params["squeeze"], x4)

        d = params["decoder"]
        src = pixels
        pb = _resize(_patches_to_channels(src, hw4[0], hw4[1]), hw4)
        x4 = jnp.concatenate([x4, _simple_convs(d["ipt_blk5"], pb)], axis=1)
        p4 = _gdt(d["gdt4"], _basic_dec_blk(d["block4"], x4))

        hw3 = x3.shape[2:]
        p3_ = _resize(p4, hw3) + conv2d(d["lateral4"], x3)
        pb = _resize(_patches_to_channels(src, hw3[0], hw3[1]), hw3)
        p3_ = jnp.concatenate([p3_, _simple_convs(d["ipt_blk4"], pb)], axis=1)
        p3 = _gdt(d["gdt3"], _basic_dec_blk(d["block3"], p3_))

        hw2 = x2.shape[2:]
        p2_ = _resize(p3, hw2) + conv2d(d["lateral3"], x2)
        pb = _resize(_patches_to_channels(src, hw2[0], hw2[1]), hw2)
        p2_ = jnp.concatenate([p2_, _simple_convs(d["ipt_blk3"], pb)], axis=1)
        p2 = _gdt(d["gdt2"], _basic_dec_blk(d["block2"], p2_))

        hw1 = x1.shape[2:]
        p1_ = _resize(p2, hw1) + conv2d(d["lateral2"], x1)
        pb = _resize(_patches_to_channels(src, hw1[0], hw1[1]), hw1)
        p1_ = jnp.concatenate([p1_, _simple_convs(d["ipt_blk2"], pb)], axis=1)
        p1 = _basic_dec_blk(d["block1"], p1_)

        p1 = _resize(p1, (H, W))
        p1 = jnp.concatenate([p1, _simple_convs(d["ipt_blk1"], src)], axis=1)
        return jax.nn.sigmoid(conv2d(d["conv_out1"], p1))

    # -- loading --------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.float32) -> dict:
        cfg = self.swin

        def lin(name):
            return nn.take_linear(src, name, dtype)

        def norm(name):
            return nn.take_norm(src, name, dtype)

        def convp(name, bias=True):
            p = {"w": jnp.asarray(src.get(name + ".weight"), dtype)}
            if bias and name + ".bias" in src:
                p["b"] = jnp.asarray(src.get(name + ".bias"), dtype)
            return p

        def bn(name):
            return {"w": jnp.asarray(src.get(name + ".weight"), dtype),
                    "b": jnp.asarray(src.get(name + ".bias"), dtype),
                    "mean": jnp.asarray(src.get(name + ".running_mean"),
                                        dtype),
                    "var": jnp.asarray(src.get(name + ".running_var"), dtype)}

        bb = {"patch": convp("bb.patch_embed.proj"),
              "patch_norm": norm("bb.patch_embed.norm"),
              "layers": [], "norms": []}
        for i, depth in enumerate(cfg.depths):
            lp = {"blocks": []}
            for j in range(depth):
                b = f"bb.layers.{i}.blocks.{j}."
                lp["blocks"].append({
                    "norm1": norm(b + "norm1"),
                    "norm2": norm(b + "norm2"),
                    "attn": {
                        "qkv": lin(b + "attn.qkv"),
                        "proj": lin(b + "attn.proj"),
                        "rel_bias_table": jnp.asarray(src.get(
                            b + "attn.relative_position_bias_table"), dtype),
                    },
                    "fc1": lin(b + "mlp.fc1"),
                    "fc2": lin(b + "mlp.fc2"),
                })
            if i < len(cfg.depths) - 1:
                lp["downsample"] = {
                    "norm": norm(f"bb.layers.{i}.downsample.norm"),
                    "reduction": lin(f"bb.layers.{i}.downsample.reduction"),
                }
            bb["layers"].append(lp)
            bb["norms"].append(norm(f"bb.norm{i}"))

        def aspp_mod(name):
            return {"offset": convp(name + ".atrous_conv.offset_conv"),
                    "modulator": convp(name + ".atrous_conv.modulator_conv"),
                    "conv": convp(name + ".atrous_conv.regular_conv"),
                    "bn": bn(name + ".bn")}

        def aspp(name):
            p = {"aspp1": aspp_mod(name + ".aspp1")}
            for i in range(3):
                p[f"deform{i}"] = aspp_mod(name + f".aspp_deforms.{i}")
            p["pool_conv"] = convp(name + ".global_avg_pool.1", bias=False)
            p["pool_bn"] = bn(name + ".global_avg_pool.2")
            p["conv1"] = convp(name + ".conv1", bias=False)
            p["bn1"] = bn(name + ".bn1")
            return p

        def dec_blk(name):
            return {"conv_in": convp(name + ".conv_in"),
                    "bn_in": bn(name + ".bn_in"),
                    "dec_att": aspp(name + ".dec_att"),
                    "conv_out": convp(name + ".conv_out"),
                    "bn_out": bn(name + ".bn_out")}

        def simple(name):
            return {"conv1": convp(name + ".conv1"),
                    "conv_out": convp(name + ".conv_out")}

        def gdt(n):
            return {"conv": convp(f"decoder.gdt_convs_{n}.0"),
                    "bn": bn(f"decoder.gdt_convs_{n}.1"),
                    "attn": convp(f"decoder.gdt_convs_attn_{n}.0")}

        decoder = {
            "ipt_blk5": simple("decoder.ipt_blk5"),
            "ipt_blk4": simple("decoder.ipt_blk4"),
            "ipt_blk3": simple("decoder.ipt_blk3"),
            "ipt_blk2": simple("decoder.ipt_blk2"),
            "ipt_blk1": simple("decoder.ipt_blk1"),
            "block4": dec_blk("decoder.decoder_block4"),
            "block3": dec_blk("decoder.decoder_block3"),
            "block2": dec_blk("decoder.decoder_block2"),
            "block1": dec_blk("decoder.decoder_block1"),
            "conv_out1": convp("decoder.conv_out1.0"),
            "lateral4": convp("decoder.lateral_block4.conv"),
            "lateral3": convp("decoder.lateral_block3.conv"),
            "lateral2": convp("decoder.lateral_block2.conv"),
            "gdt4": gdt(4), "gdt3": gdt(3), "gdt2": gdt(2),
        }
        return {"bb": bb, "squeeze": dec_blk("squeeze_module.0"),
                "decoder": decoder}
