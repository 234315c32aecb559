"""BigVGAN neural vocoder (src/models/bigvgan/mod.rs).

Anti-aliased generator: weight-normed conv_pre, transposed-conv upsampling
stacks, AMP residual blocks with SnakeBeta activations wrapped in 2×
up/downsampling (the anti-aliasing trick), snake post-activation, conv_post
→ waveform.  Weight norm is folded into plain conv weights at load
(inference-only).  mel (B, n_mels, T) → waveform (B, 1, T·∏upsample_rates).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from aha_tpu.io.weights import batched_load

Params = dict


@dataclasses.dataclass(frozen=True)
class BigVGANConfig:
    num_mels: int = 100
    upsample_initial_channel: int = 1536
    upsample_rates: tuple[int, ...] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: tuple[int, ...] = (8, 8, 4, 4, 4, 4)
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    use_tanh_at_final: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "BigVGANConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        d = {k: tuple(tuple(x) if isinstance(x, list) else x for x in v)
             if isinstance(v, list) else v for k, v in d.items() if k in names}
        return cls(**d)


def _pad_replicate(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (0, 0), (left, right)), mode="edge")


def _conv1d(x, w, b=None, stride=1, padding=0, dilation=1, groups=1):
    """x (B, C, T), w (O, I/g, K)."""
    out = jax.lax.conv_general_dilated(
        x, w, (stride,), ((padding, padding),), rhs_dilation=(dilation,),
        feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"))
    if b is not None:
        out = out + b[None, :, None]
    return out


def _conv_transpose1d(x, w, b=None, stride=1, padding=0, groups=1):
    """Transposed conv via lhs dilation; w in torch convT layout
    (I, O/g, K)."""
    I, Og, K = w.shape
    # → conv weight (O, I/g, K), kernel flipped
    wc = jnp.flip(w, axis=-1)
    wc = wc.reshape(groups, I // groups, Og, K).transpose(0, 2, 1, 3)
    wc = wc.reshape(groups * Og, I // groups, K)
    out = jax.lax.conv_general_dilated(
        x, wc, (1,), ((K - 1 - padding, K - 1 - padding),),
        lhs_dilation=(stride,), feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"))
    if b is not None:
        out = out + b[None, :, None]
    return out


def snake_beta(x, alpha_log, beta_log):
    """x + sin²(αx)/β with α, β stored as logs (mod.rs:88-126)."""
    alpha = jnp.exp(alpha_log)[None, :, None]
    beta = jnp.exp(beta_log)[None, :, None]
    return x + jnp.sin(alpha * x) ** 2 / (beta + 1e-9)


def _upsample2(x, filt):
    """Anti-aliased 2× upsample (UpSample1d, ratio 2, kernel 12)."""
    C = x.shape[1]
    K = filt.shape[-1]
    stride = 2
    pad = K // stride - 1
    pad_left = pad * stride + (K - stride) // 2
    pad_right = pad * stride + (K - stride + 1) // 2
    x = _pad_replicate(x, pad, pad)
    w = jnp.broadcast_to(filt, (C, 1, K))  # torch convT (I=C, O/g=1, K)
    out = _conv_transpose1d(x, w, stride=stride, padding=0, groups=C)
    return out[:, :, pad_left:out.shape[-1] - pad_right]


def _downsample2(x, filt):
    """Anti-aliased 2× downsample (DownSample1d)."""
    C = x.shape[1]
    K = filt.shape[-1]
    even = 1 if K % 2 == 0 else 0
    x = _pad_replicate(x, K // 2 - even, K // 2)
    w = jnp.broadcast_to(filt.reshape(1, 1, K), (C, 1, K))
    return _conv1d(x, w, stride=2, padding=0, groups=C)


def _act1d(ap, x):
    """TorchActivation1d: up2 → snake → down2."""
    x = _upsample2(x, ap["up_filter"])
    x = snake_beta(x, ap["alpha"], ap["beta"])
    return _downsample2(x, ap["down_filter"])


class BigVGAN:
    def __init__(self, config: BigVGANConfig):
        self.config = config

    def __call__(self, params, mel: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        nk = len(c.resblock_kernel_sizes)
        x = _conv1d(mel, params["conv_pre"]["w"], params["conv_pre"]["b"],
                    padding=3)
        for i, (u, k) in enumerate(zip(c.upsample_rates,
                                       c.upsample_kernel_sizes)):
            up = params["ups"][i]
            x = _conv_transpose1d(x, up["w"], up["b"], stride=u,
                                  padding=(k - u) // 2)
            acc = 0.0
            for j in range(nk):
                acc = acc + self._resblock(params["resblocks"][i * nk + j], x,
                                           c.resblock_kernel_sizes[j],
                                           c.resblock_dilation_sizes[j])
            x = acc / nk
        x = _act1d(params["act_post"], x)
        x = _conv1d(x, params["conv_post"]["w"], padding=3)
        return jnp.tanh(x) if c.use_tanh_at_final else jnp.clip(x, -1.0, 1.0)

    def _resblock(self, rp, x, kernel, dilations):
        for i, d in enumerate(dilations):
            pad1 = round((kernel * d - d) / 2)
            h = _act1d(rp["acts"][2 * i], x)
            h = _conv1d(h, rp["convs1"][i]["w"], rp["convs1"][i]["b"],
                        padding=pad1, dilation=d)
            h = _act1d(rp["acts"][2 * i + 1], h)
            h = _conv1d(h, rp["convs2"][i]["w"], rp["convs2"][i]["b"],
                        padding=(kernel - 1) // 2)
            x = x + h
        return x

    # -- loading ------------------------------------------------------------

    @staticmethod
    def _fold_wn(src, name, dtype, transpose_io=False):
        """weight_g · v/‖v‖ folded to a plain conv weight."""
        v = np.asarray(src.get(name + ".weight_v", jnp.float32))
        g = np.asarray(src.get(name + ".weight_g", jnp.float32))
        norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
        w = jnp.asarray(g * v / np.maximum(norm, 1e-12), dtype)
        p = {"w": w}
        if name + ".bias" in src:
            p["b"] = src.get(name + ".bias", dtype)
        return p

    def _act_params(self, src, name, dtype):
        return {
            "alpha": src.get(name + ".act.alpha", jnp.float32),
            "beta": src.get(name + ".act.beta", jnp.float32),
            "up_filter": src.get(name + ".upsample.filter", jnp.float32),
            "down_filter": src.get(name + ".downsample.lowpass.filter",
                                   jnp.float32),
        }

    @batched_load
    def load_params(self, src, dtype=jnp.float32, prefix: str = "") -> dict:
        c = self.config
        nk = len(c.resblock_kernel_sizes)
        params = {
            "conv_pre": self._fold_wn(src, prefix + "conv_pre", dtype),
            "conv_post": self._fold_wn(src, prefix + "conv_post", dtype),
            "act_post": self._act_params(src, prefix + "activation_post",
                                         dtype),
            "ups": [], "resblocks": [],
        }
        for i in range(len(c.upsample_rates)):
            params["ups"].append(
                self._fold_wn(src, f"{prefix}ups.{i}.0", dtype))
        for i in range(len(c.upsample_rates)):
            for j in range(nk):
                rb = f"{prefix}resblocks.{i * nk + j}"
                dil = c.resblock_dilation_sizes[j]
                params["resblocks"].append({
                    "convs1": [self._fold_wn(src, f"{rb}.convs1.{m}", dtype)
                               for m in range(len(dil))],
                    "convs2": [self._fold_wn(src, f"{rb}.convs2.{m}", dtype)
                               for m in range(len(dil))],
                    "acts": [self._act_params(src, f"{rb}.activations.{m}",
                                              dtype)
                             for m in range(2 * len(dil))],
                })
        return params

    def init_random(self, key, dtype=jnp.float32, scale: float = 0.02) -> dict:
        c = self.config
        nk = len(c.resblock_kernel_sizes)
        ks = iter(jax.random.split(key, 512))

        def w(shape):
            return jax.random.normal(next(ks), shape, dtype) * scale

        def sinc12():
            # kaiser-windowed sinc lowpass, cutoff 0.25 (ratio 2), kernel 12
            n = np.arange(12) - 5.5
            f = np.sinc(0.5 * n) * np.kaiser(12, 6.0) * 0.5
            return jnp.asarray(f.reshape(1, 1, 12), jnp.float32)

        def act(ch):
            return {"alpha": jnp.zeros(ch, jnp.float32),
                    "beta": jnp.zeros(ch, jnp.float32),
                    "up_filter": sinc12() * 2.0,
                    "down_filter": sinc12()}

        ch0 = c.upsample_initial_channel
        params = {
            "conv_pre": {"w": w((ch0, c.num_mels, 7)),
                         "b": jnp.zeros(ch0, dtype)},
            "ups": [], "resblocks": [],
        }
        ch = ch0
        for i, (u, k) in enumerate(zip(c.upsample_rates,
                                       c.upsample_kernel_sizes)):
            out_c = ch0 // (2 ** (i + 1))
            params["ups"].append({"w": w((ch, out_c, k)),
                                  "b": jnp.zeros(out_c, dtype)})
            ch = out_c
            for j, kernel in enumerate(c.resblock_kernel_sizes):
                dil = c.resblock_dilation_sizes[j]
                params["resblocks"].append({
                    "convs1": [{"w": w((ch, ch, kernel)),
                                "b": jnp.zeros(ch, dtype)}
                               for _ in dil],
                    "convs2": [{"w": w((ch, ch, kernel)),
                                "b": jnp.zeros(ch, dtype)}
                               for _ in dil],
                    "acts": [act(ch) for _ in range(2 * len(dil))],
                })
        params["act_post"] = {"alpha": jnp.zeros(ch, jnp.float32),
                              "beta": jnp.zeros(ch, jnp.float32),
                              "up_filter": params["resblocks"][0]["acts"][0]["up_filter"],
                              "down_filter": params["resblocks"][0]["acts"][0]["down_filter"]}
        params["conv_post"] = {"w": w((1, ch, 7))}
        return params
