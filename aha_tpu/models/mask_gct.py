"""MaskGCT semantic codec (RepCodec): Vocos ConvNeXt encoder/decoder around
a factorized residual VQ.

Reference: src/models/mask_gct/model.rs (ConvNeXtBlock :15-59, VocosBackbone
:61-103, FactorizedVectorQuantize :105-201, ResidualVQ :203-267, RepCodec
:269-384).  Library class (no server route in the reference either).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core import nn
from aha_tpu.models.audio_vae import fold_weight_norm
from aha_tpu.utils.interpolate import interpolate
from aha_tpu.io.weights import batched_load


@dataclasses.dataclass(frozen=True)
class SemanticCodecConfig:
    codebook_size: int = 8192
    hidden_size: int = 1024
    codebook_dim: int = 8
    vocos_dim: int = 384
    vocos_intermediate_dim: int = 2048
    vocos_num_layers: int = 12
    num_quantizers: int = 1
    downsample_scale: int = 1


def _conv1d(p, x, stride=1, padding=0, groups=1):
    """x (B, C, T), w (O, I/g, k)."""
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride,), [(padding, padding)],
        feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"))
    if "b" in p:
        out = out + p["b"].astype(x.dtype)[None, :, None]
    return out


def _convnext_block(p, x):
    """(B, D, T) ConvNeXt (model.rs:43-59)."""
    D = x.shape[1]
    res = x
    x = _conv1d(p["dwconv"], x, padding=3, groups=D)
    x = nn.ln(p["norm"], x.transpose(0, 2, 1), eps=1e-6)
    x = nn.linear(p["pw2"], jax.nn.gelu(nn.linear(p["pw1"], x),
                                        approximate=False))
    x = x * p["gamma"][None, None]
    return res + x.transpose(0, 2, 1)


def _vocos(p, x):
    """(B, C, T) → (B, T, D) (model.rs:94-102)."""
    x = _conv1d(p["embed"], x, padding=3)
    x = nn.ln(p["norm"], x.transpose(0, 2, 1), eps=1e-6).transpose(0, 2, 1)
    for bp in p["blocks"]:
        x = _convnext_block(bp, x)
    return nn.ln(p["final"], x.transpose(0, 2, 1), eps=1e-6)


def _fvq_nearest(p, z):
    """(z_q (B, D, T), idx (B, T)) with l2-normalised lookup
    (model.rs:160-179)."""
    B, D, T = z.shape
    enc = z.transpose(0, 2, 1).reshape(B * T, D)
    enc = enc / (jnp.linalg.norm(enc, axis=1, keepdims=True) + 1e-12)
    cb = p["codebook_l2"]
    dist = (jnp.sum(enc ** 2, 1, keepdims=True)
            - 2.0 * enc @ cb.T + jnp.sum(cb ** 2, 1)[None])
    idx = jnp.argmax(-dist, axis=1).reshape(B, T)
    z_q = jnp.take(p["codebook"], idx, axis=0).transpose(0, 2, 1)
    return z_q, idx


def _fvq_forward(p, z):
    if "in_proj" in p:
        z = nn.linear(p["in_proj"], z.transpose(0, 2, 1)).transpose(0, 2, 1)
    z_q, idx = _fvq_nearest(p, z)
    if "out_proj" in p:
        z_q = nn.linear(p["out_proj"],
                        z_q.transpose(0, 2, 1)).transpose(0, 2, 1)
    return z_q, idx


def _fvq_vq2emb(p, idx):
    z_q = jnp.take(p["codebook"], idx, axis=0).transpose(0, 2, 1)
    if "out_proj" in p:
        z_q = nn.linear(p["out_proj"],
                        z_q.transpose(0, 2, 1)).transpose(0, 2, 1)
    return z_q


class RepCodec:
    def __init__(self, config: SemanticCodecConfig):
        self.config = config

    def _encode_latents(self, p, x):
        """(B, T, hidden) → (B, hidden, T') pre-quantizer latents."""
        if self.config.downsample_scale > 1:
            x = jax.nn.gelu(_conv1d(p["down"], x.transpose(0, 2, 1),
                                    stride=2, padding=1),
                            approximate=False).transpose(0, 2, 1)
        x = _vocos(p["enc0"], x.transpose(0, 2, 1))
        x = nn.linear(p["enc1"], x)
        return x.transpose(0, 2, 1)

    def _rvq(self, p, z):
        residual = z
        out = 0.0
        all_idx = []
        for qp in p["quantizers"]:
            z_q, idx = _fvq_forward(qp, residual)
            out = out + z_q
            residual = residual - z_q
            all_idx.append(idx)
        return out, jnp.stack(all_idx)

    def quantize(self, p, x):
        """(B, T, hidden) reps → (codes, quantized (B, T', hidden))
        (model.rs:368-383)."""
        z = self._encode_latents(p, x)
        out, codes = self._rvq(p["quantizer"], z)
        if codes.shape[0] == 1:
            codes = codes[0]
        return codes, out.transpose(0, 2, 1)

    def forward(self, p, x):
        """Full encode→quantize→decode (model.rs:345-366): (B, T, hidden) →
        (reconstruction (B, T, hidden), codes)."""
        z = self._encode_latents(p, x)
        out, codes = self._rvq(p["quantizer"], z)
        x = _vocos(p["dec0"], out)
        x = nn.linear(p["dec1"], x)
        if self.config.downsample_scale > 1:
            x = x.transpose(0, 2, 1)
            x = interpolate(x, x.shape[-1] * 2, "nearest-exact")
            x = _conv1d(p["up"], x, padding=1).transpose(0, 2, 1)
        return x, codes

    def vq2emb(self, p, codes):
        """codes (num_q, B, T) → summed embeddings (B, hidden, T).  (The
        reference's loop overwrites instead of accumulating, model.rs:260-266
        — a bug for num_quantizers > 1; the sum is the RVQ semantics.)"""
        emb = None
        for i, qp in enumerate(p["quantizer"]["quantizers"]):
            e = _fvq_vq2emb(qp, codes[i])
            emb = e if emb is None else emb + e
        return emb

    # -- loading --------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.float32) -> dict:
        c = self.config

        def convp(name):
            p = {"w": jnp.asarray(src.get(name + ".weight"), dtype)}
            if name + ".bias" in src:
                p["b"] = jnp.asarray(src.get(name + ".bias"), dtype)
            return p

        def wn_linear(name):
            if name + ".parametrizations.weight.original0" in src:
                g = np.asarray(src.get(
                    name + ".parametrizations.weight.original0"))
                v = np.asarray(src.get(
                    name + ".parametrizations.weight.original1"))
                w = fold_weight_norm(v, g)[:, :, 0]
            elif name + ".weight_g" in src:
                g = np.asarray(src.get(name + ".weight_g"))
                v = np.asarray(src.get(name + ".weight_v"))
                w = fold_weight_norm(v, g)[:, :, 0]
            else:
                w = np.asarray(src.get(name + ".weight"))[:, :, 0]
            p = {"w": jnp.asarray(w.T, dtype)}
            if name + ".bias" in src:
                p["b"] = jnp.asarray(src.get(name + ".bias"), dtype)
            return p

        def vocos(prefix):
            p = {"embed": convp(prefix + ".embed"),
                 "norm": nn.take_norm(src, prefix + ".norm", dtype),
                 "final": nn.take_norm(src, prefix + ".final_layer_norm",
                                       dtype),
                 "blocks": []}
            for i in range(c.vocos_num_layers):
                b = f"{prefix}.convnext.{i}."
                p["blocks"].append({
                    "dwconv": convp(b + "dwconv"),
                    "norm": nn.take_norm(src, b + "norm", dtype),
                    "pw1": nn.take_linear(src, b + "pwconv1", dtype),
                    "pw2": nn.take_linear(src, b + "pwconv2", dtype),
                    "gamma": jnp.asarray(src.get(b + "gamma"), dtype),
                })
            return p

        params = {"enc0": vocos("encoder.0"),
                  "enc1": nn.take_linear(src, "encoder.1", dtype),
                  "dec0": vocos("decoder.0"),
                  "dec1": nn.take_linear(src, "decoder.1", dtype),
                  "quantizer": {"quantizers": []}}
        if c.downsample_scale > 1:
            params["down"] = convp("down")
            params["up"] = convp("up")
        for i in range(c.num_quantizers):
            b = f"quantizer.quantizers.{i}"
            lp = {"codebook": jnp.asarray(src.get(b + ".codebook.weight"),
                                          dtype)}
            lp["codebook_l2"] = lp["codebook"] / (jnp.linalg.norm(
                lp["codebook"], axis=1, keepdims=True) + 1e-12)
            if c.hidden_size != c.codebook_dim:
                lp["in_proj"] = wn_linear(b + ".in_project")
                lp["out_proj"] = wn_linear(b + ".out_project")
            params["quantizer"]["quantizers"].append(lp)
        return params
