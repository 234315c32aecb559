"""Moss audio tokenizer (Residual-LFQ codec): patched pretransform +
windowed-causal roformer transformers + L2-normalised LFQ quantizer stack.

Reference: src/models/moss_audio_tokenizer_nano/mod.rs —
PatchedPretransform (:19-63), roformer attention with per-query length
masking (:65-128), layer-scaled transformer layers with a [0, context)
windowed causal additive mask (:130-254), LFQ (:321-411), Residual LFQ
(:413-515), encode/decode drivers (:517-719).

This unblocks Moss-TTS waveform output (moss_tts.py produces the audio
token frames; decode_frames here turns them into audio).

TPU notes: every module is a pure function over (B, C, T) arrays with
static shapes; the windowed mask is built from a traced length but static
T; kernel-1 weight-norm convs fold to plain linears at load.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core import nn
from aha_tpu.models.audio_vae import fold_weight_norm
from aha_tpu.ops.rope import rope_table
from aha_tpu.io.weights import batched_load


@dataclasses.dataclass(frozen=True)
class MossModuleConfig:
    module_type: str
    patch_size: int | None = None
    d_model: int | None = None
    dim_feedforward: int | None = None
    num_heads: int | None = None
    num_layers: int | None = None
    input_dimension: int | None = None
    output_dimension: int | None = None
    context_duration: float | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "MossModuleConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


@dataclasses.dataclass(frozen=True)
class MossQuantizerConfig:
    codebook_dim: int = 16
    codebook_size: int = 1024
    input_dim: int = 512
    output_dim: int = 512
    rvq_dim: int = 512
    num_quantizers: int = 8


@dataclasses.dataclass(frozen=True)
class MossAudioTokenizerConfig:
    sampling_rate: int = 24000
    downsample_rate: int = 1920
    number_channels: int = 1
    enable_channel_interleave: bool = False
    causal_transformer_context_duration: float = 2.0
    encoder: tuple = ()
    decoder: tuple = ()
    quantizer: MossQuantizerConfig = MossQuantizerConfig()

    @classmethod
    def from_dict(cls, d: dict) -> "MossAudioTokenizerConfig":
        qf = {f.name for f in dataclasses.fields(MossQuantizerConfig)}
        q = {k: v for k, v in d.get("quantizer_kwargs", {}).items() if k in qf}
        return cls(
            sampling_rate=d.get("sampling_rate", 24000),
            downsample_rate=d.get("downsample_rate", 1920),
            number_channels=d.get("number_channels", 1),
            enable_channel_interleave=d.get("enable_channel_interleave",
                                            False),
            causal_transformer_context_duration=d.get(
                "causal_transformer_context_duration", 2.0),
            encoder=tuple(MossModuleConfig.from_dict(m)
                          for m in d.get("encoder_kwargs", [])),
            decoder=tuple(MossModuleConfig.from_dict(m)
                          for m in d.get("decoder_kwargs", [])),
            quantizer=MossQuantizerConfig(**q))

    @classmethod
    def from_file(cls, path: str) -> "MossAudioTokenizerConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


def patched_encode(x, lengths, patch: int):
    """(B, D, T) → (B, D·patch, T/patch) (mod.rs:32-42)."""
    B, D, T = x.shape
    x = x.reshape(B, D, T // patch, patch).transpose(0, 1, 3, 2)
    return x.reshape(B, D * patch, T // patch), jnp.floor(lengths / patch)


def patched_decode(x, lengths, patch: int):
    """(B, D·patch, T) → (B, D, T·patch) (mod.rs:44-54)."""
    B, DH, T = x.shape
    D = DH // patch
    x = x.reshape(B, D, patch, T).transpose(0, 1, 3, 2)
    return x.reshape(B, D, T * patch), lengths * patch


def _roformer_rot(x, cos, sin):
    """Interleaved pairwise rotation (rope.rs:315-355).
    x: (B, H, T, hd); cos/sin: (T, hd/2)."""
    pairs = x.reshape(*x.shape[:-1], -1, 2)
    xr, xi = pairs[..., 0], pairs[..., 1]
    c = cos[None, None]
    s = sin[None, None]
    out = jnp.stack([xr * c - xi * s, xr * s + xi * c], axis=-1)
    return out.reshape(x.shape)


def _window_mask(lengths, T: int, context: int):
    """Additive mask: attend iff 0 <= q-k < context and k < length
    (mod.rs:235-253).  (B, 1, T, T)."""
    posq = jnp.arange(T)[:, None]
    posk = jnp.arange(T)[None, :]
    ok = (posq - posk >= 0) & (posq - posk < context)
    ok = ok[None] & (posk[None] < lengths[:, None, None])
    return jnp.where(ok, 0.0, -jnp.inf)[:, None]


def transformer_forward(p: dict, x, lengths, cfg: MossModuleConfig,
                        context: int):
    """ProjectedTransformer (mod.rs:256-297): (B, D_in, T) → (B, D_out, T)."""
    B, _, T = x.shape
    x = nn.linear(p["input_proj"], x.transpose(0, 2, 1))    # (B, T, d_model)
    nh = cfg.num_heads
    hd = cfg.d_model // nh
    cos, sin = rope_table(hd, T)
    mask = _window_mask(lengths, T, context)
    qmask = (jnp.arange(T)[None, :] < lengths[:, None])[:, :, None]
    for lp in p["layers"]:
        h = nn.ln(lp["norm1"], x)
        qkv = nn.linear(lp["in_proj"], h).reshape(B, T, 3, nh, hd)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)
        q = _roformer_rot(q, cos, sin)
        k = _roformer_rot(k, cos, sin)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (hd ** -0.5) + mask
        probs = jax.nn.softmax(scores, axis=-1)
        # fully-masked rows (q beyond length) produce NaN via softmax(-inf);
        # the reference zeroes those query outputs afterwards (mod.rs:112-121)
        probs = jnp.nan_to_num(probs)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
        attn = attn.transpose(0, 2, 1, 3) * qmask[..., None]
        attn = nn.linear(lp["out_proj"], attn.reshape(B, T, -1))
        x = x + attn * lp["scale1"][None, None]
        h = nn.ln(lp["norm2"], x)
        h = nn.linear(lp["ffn2"], jax.nn.gelu(nn.linear(lp["ffn0"], h),
                                              approximate=False))
        x = x + h * lp["scale2"][None, None]
    return nn.linear(p["output_proj"], x).transpose(0, 2, 1), lengths


def lfq_encode(p: dict, z, mask):
    """(z_q (B, D, T), indices (B, T)) — LFQ::forward (mod.rs:376-402)."""
    if "in_proj" in p:
        z = nn.linear(p["in_proj"], z.transpose(0, 2, 1)).transpose(0, 2, 1)
    B, D, T = z.shape
    enc = z.transpose(0, 2, 1).reshape(B * T, D)
    enc = enc / (jnp.linalg.norm(enc, axis=1, keepdims=True) + 1e-12)
    cb = p["codebook_l2"]
    dist = (jnp.sum(enc ** 2, 1, keepdims=True)
            - 2.0 * enc @ cb.T + jnp.sum(cb ** 2, 1)[None])
    idx = jnp.argmax(-dist, axis=1).reshape(B, T)
    z_q = jnp.take(p["codebook"], idx, axis=0).transpose(0, 2, 1)
    if "out_proj" in p:
        z_q = nn.linear(p["out_proj"],
                        z_q.transpose(0, 2, 1)).transpose(0, 2, 1)
    return z_q, idx


def lfq_decode(p: dict, idx):
    z_q = jnp.take(p["codebook"], idx, axis=0).transpose(0, 2, 1)
    if "out_proj" in p:
        z_q = nn.linear(p["out_proj"],
                        z_q.transpose(0, 2, 1)).transpose(0, 2, 1)
    return z_q


def residual_lfq_encode(p: dict, z, lengths):
    """(num_q, B, T) indices — ResidualLFQ::forward (mod.rs:472-497)."""
    if "input_proj" in p:
        z = nn.linear(p["input_proj"], z.transpose(0, 2, 1)).transpose(
            0, 2, 1)
    T = z.shape[2]
    mask = (jnp.arange(T)[None] < lengths[:, None])[:, None]
    residual = z
    all_idx = []
    for qp in p["quantizers"]:
        z_q, idx = lfq_encode(qp, jnp.where(mask, residual, 0.0), None)
        all_idx.append(idx)
        residual = residual - jnp.where(mask, z_q, 0.0)
    return jnp.stack(all_idx)


def residual_lfq_decode(p: dict, codes):
    """codes (num_q, B, T) → (B, rvq_dim/output_dim, T)
    (mod.rs:499-514)."""
    emb = None
    for i, qp in enumerate(p["quantizers"]):
        e = lfq_decode(qp, codes[i])
        emb = e if emb is None else emb + e
    if "output_proj" in p:
        emb = nn.linear(p["output_proj"],
                        emb.transpose(0, 2, 1)).transpose(0, 2, 1)
    return emb


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------


class MossAudioTokenizer:
    def __init__(self, config: MossAudioTokenizerConfig):
        self.config = config

    def _context(self, m: MossModuleConfig) -> int:
        c = self.config
        factor = (c.number_channels
                  if c.enable_channel_interleave and c.number_channels > 1
                  else 1)
        dur = (m.context_duration
               if m.context_duration is not None
               else c.causal_transformer_context_duration)
        return int(round(c.sampling_rate * factor * dur))

    def _run_stack(self, params, modules, x, lengths, decode: bool):
        for m, p in zip(modules, params):
            if m.module_type == "PatchedPretransform":
                fn = patched_decode if decode else patched_encode
                x, lengths = fn(x, lengths, m.patch_size)
            else:
                x, lengths = transformer_forward(p, x, lengths, m,
                                                 self._context(m))
        return x, lengths

    def encode(self, params, wav: jnp.ndarray,
               lengths: jnp.ndarray) -> jnp.ndarray:
        """(B, C, T) waveform → (num_q, B, frames) codes (mod.rs:626-646)."""
        c = self.config
        B, _, T = wav.shape
        pad = (-T) % c.downsample_rate
        if pad:
            wav = jnp.pad(wav, ((0, 0), (0, 0), (0, pad)))
        if c.number_channels > 1 and c.enable_channel_interleave:
            wav = wav.transpose(0, 2, 1).reshape(B, 1, -1)
            lengths = lengths * c.number_channels
        x, lengths = self._run_stack(params["encoder"], c.encoder, wav,
                                     lengths, decode=False)
        return residual_lfq_encode(params["quantizer"], x, lengths)

    def decode_frames(self, params, frames: jnp.ndarray) -> jnp.ndarray:
        """(T, num_q) audio token frames → (B, C, samples) waveform
        (mod.rs:699-718)."""
        c = self.config
        codes = frames.T[:, None]                          # (num_q, 1, T)
        x = residual_lfq_decode(params["quantizer"], codes)
        lengths = jnp.asarray([x.shape[2]], jnp.float32)
        x, _ = self._run_stack(params["decoder"], c.decoder, x, lengths,
                               decode=True)
        if c.number_channels > 1 and c.enable_channel_interleave:
            B = x.shape[0]
            x = (x.reshape(B, -1)[:, :, None]
                 .reshape(B, -1, c.number_channels).transpose(0, 2, 1))
        return x

    # -- loading ----------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.float32) -> dict:
        c = self.config

        def wn_linear(name):
            """Kernel-1 weight-norm conv → linear (w stored (in, out))."""
            g = np.asarray(src.get(
                name + ".parametrizations.weight.original0"))
            v = np.asarray(src.get(
                name + ".parametrizations.weight.original1"))
            w = fold_weight_norm(v, g)[:, :, 0]            # (out, in)
            p = {"w": jnp.asarray(w.T, dtype)}
            if name + ".bias" in src:
                p["b"] = jnp.asarray(src.get(name + ".bias"), dtype)
            return p

        def stack(prefix, modules):
            out = []
            for i, m in enumerate(modules):
                if m.module_type != "Transformer":
                    out.append({})
                    continue
                mp = {"input_proj": nn.take_linear(
                    src, f"{prefix}.{i}.input_proj", dtype),
                    "output_proj": nn.take_linear(
                        src, f"{prefix}.{i}.output_proj", dtype),
                    "layers": []}
                for j in range(m.num_layers):
                    b = f"{prefix}.{i}.transformer.layers.{j}."
                    mp["layers"].append({
                        "norm1": nn.take_norm(src, b + "norm1", dtype),
                        "norm2": nn.take_norm(src, b + "norm2", dtype),
                        "in_proj": nn.take_linear(src, b + "self_attn.in_proj",
                                                  dtype),
                        "out_proj": nn.take_linear(
                            src, b + "self_attn.out_proj", dtype),
                        "ffn0": nn.take_linear(src, b + "ffn.0", dtype),
                        "ffn2": nn.take_linear(src, b + "ffn.2", dtype),
                        "scale1": jnp.asarray(
                            src.get(b + "layer_scale_1.scale"), dtype),
                        "scale2": jnp.asarray(
                            src.get(b + "layer_scale_2.scale"), dtype),
                    })
                out.append(mp)
            return out

        q = c.quantizer
        qp = {"quantizers": []}
        if q.input_dim != q.rvq_dim:
            qp["input_proj"] = wn_linear("quantizer.input_proj")
        if q.rvq_dim != q.output_dim:
            qp["output_proj"] = wn_linear("quantizer.output_proj")
        for i in range(q.num_quantizers):
            b = f"quantizer.quantizers.{i}"
            lp = {"codebook": jnp.asarray(
                src.get(b + ".codebook.weight"), dtype)}
            lp["codebook_l2"] = lp["codebook"] / (jnp.linalg.norm(
                lp["codebook"], axis=1, keepdims=True) + 1e-12)
            if q.rvq_dim != q.codebook_dim:
                lp["in_proj"] = wn_linear(b + ".in_proj")
                lp["out_proj"] = wn_linear(b + ".out_proj")
            qp["quantizers"].append(lp)
        return {"encoder": stack("encoder", c.encoder),
                "decoder": stack("decoder", c.decoder),
                "quantizer": qp}
