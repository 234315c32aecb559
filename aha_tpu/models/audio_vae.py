"""AudioVAE: DAC-like causal conv VAE for VoxCPM latents.

Parity with src/models/voxcpm/audio_vae.rs:
- CausalConv1d (:10-41): left-pad 2·p zeros then VALID conv (so a pad of
  (k−1)·d/2 becomes fully causal).
- CausalConvTranspose1d (:43-86): full transpose conv, keep the FIRST
  out_len − (2·p − output_padding) samples.
- weight norm (:88-156): w = g · v/‖v‖₍in,k₎ folded at load time.
- Snake1d (:158-181): x + sin(αx)²/(α+1e-9).
- CausalResidualUnit (:183-231): snake → depthwise k=7 dilated conv →
  snake → 1×1 conv, residual trimmed to match.
- Encoder (:233-333): stem k=7 → per-stride blocks (3 residual units with
  dilations 1/3/9, snake, strided k=2s conv, channels double per stage) →
  fc_mu / fc_logvar (encode returns mu).
- Decoder (:355-569): depthwise k=7 stem → 1×1 to channels → per-rate
  blocks (snake, transpose conv k=2s, 3 residual units, channels halve,
  optional per-stage sample-rate scale/bias embeddings) → snake → k=7 →
  tanh.

All convs run channel-first (B, C, T) through lax.conv_general_dilated —
XLA maps these onto the MXU as implicit GEMMs; weight-norm is folded once
at load so the runtime graph is plain convs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from aha_tpu.io.weights import batched_load


def causal_conv1d(x, w, b=None, stride=1, dilation=1, groups=1, padding=0):
    """x (B, Cin, T); w (Cout, Cin/groups, K); left-pad 2·padding then
    VALID conv (audio_vae.rs:36-40)."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(2 * padding, 0)],
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"))
    if b is not None:
        y = y + b[None, :, None]
    return y


def causal_conv_transpose1d(x, w, b=None, stride=1, padding=0,
                            output_padding=0):
    """x (B, Cin, T); w (Cin, Cout, K) torch ConvTranspose1d layout;
    full-length transpose conv then keep the first
    out−(2·padding−output_padding) samples (audio_vae.rs:79-85)."""
    K = w.shape[-1]
    # conv_transpose(x, W) == conv(dilate_lhs(x, s), flip(W) swapped)
    w_conv = jnp.flip(jnp.swapaxes(w, 0, 1), -1)   # (Cout, Cin, K)
    y = jax.lax.conv_general_dilated(
        x, w_conv, window_strides=(1,), padding=[(K - 1, K - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"))
    if b is not None:
        y = y + b[None, :, None]
    keep = y.shape[-1] - (2 * padding - output_padding)
    return y[..., :keep]


def fold_weight_norm(weight_v: np.ndarray, weight_g: np.ndarray) -> np.ndarray:
    """g · v/‖v‖ with the norm over all dims but 0 (audio_vae.rs:106-108)."""
    norm = np.sqrt((weight_v ** 2).sum(axis=(1, 2), keepdims=True))
    return weight_v / norm * weight_g


def snake(x, alpha):
    """x + sin(αx)²/(α+1e-9); alpha (1, C, 1) (audio_vae.rs:168-179)."""
    return x + jnp.sin(alpha * x) ** 2 / (alpha + 1e-9)


def _residual_unit(p, x, dilation: int, groups: int):
    pad = (7 - 1) * dilation // 2
    y = snake(x, p["a0"])
    y = causal_conv1d(y, p["w1"], p.get("b1"), dilation=dilation,
                      groups=groups, padding=pad)
    y = snake(y, p["a2"])
    y = causal_conv1d(y, p["w3"], p.get("b3"))
    trim = (x.shape[-1] - y.shape[-1]) // 2
    res = x[..., trim:trim + y.shape[-1]] if trim > 0 else x
    return y + res


class AudioVAE:
    def __init__(self, encoder_dim=128, encoder_rates=(2, 5, 8, 8),
                 latent_dim=64, decoder_dim=1536, decoder_rates=(8, 8, 5, 2),
                 sample_rate=16000, out_sample_rate=None,
                 sr_bin_boundaries=None):
        self.encoder_dim = encoder_dim
        self.encoder_rates = tuple(encoder_rates)
        self.latent_dim = latent_dim
        self.decoder_dim = decoder_dim
        self.decoder_rates = tuple(decoder_rates)
        self.hop_length = int(np.prod(encoder_rates))
        self.chunk_size = self.hop_length
        self.sample_rate = sample_rate
        self.out_sample_rate = out_sample_rate or sample_rate
        self.sr_bin_boundaries = sr_bin_boundaries

    @classmethod
    def from_config(cls, d: dict | None) -> "AudioVAE":
        d = d or {}
        return cls(encoder_dim=d.get("encoder_dim", 128),
                   encoder_rates=d.get("encoder_rates", (2, 5, 8, 8)),
                   latent_dim=d.get("latent_dim", 64),
                   decoder_dim=d.get("decoder_dim", 1536),
                   decoder_rates=d.get("decoder_rates", (8, 8, 5, 2)),
                   sample_rate=d.get("sample_rate", 16000),
                   out_sample_rate=d.get("out_sample_rate"),
                   sr_bin_boundaries=d.get("sr_bin_boundaries"))

    # -- forward ---------------------------------------------------------------

    def encode(self, params, audio) -> jnp.ndarray:
        """audio (B, 1, T) → mu (B, latent_dim, T/hop); pads T up to a
        multiple of hop_length (audio_vae.rs:642-673)."""
        T = audio.shape[-1]
        pad = (-T) % self.hop_length
        if pad:
            audio = jnp.pad(audio, ((0, 0), (0, 0), (0, pad)))
        ep = params["encoder"]
        x = causal_conv1d(audio, ep["stem"]["w"], ep["stem"].get("b"),
                          padding=3)
        d = self.encoder_dim
        for i, stride in enumerate(self.encoder_rates):
            bp = ep["blocks"][i]
            groups = d  # depthwise residual units (in_dim channels)
            for j, dil in enumerate((1, 3, 9)):
                x = _residual_unit(bp["units"][j], x, dil, groups)
            x = snake(x, bp["a"])
            x = causal_conv1d(x, bp["down"]["w"], bp["down"].get("b"),
                              stride=stride,
                              padding=math.ceil(stride / 2))
            d *= 2
        return causal_conv1d(x, ep["fc_mu"]["w"], ep["fc_mu"].get("b"),
                             padding=1)

    def decode(self, params, z, sr_cond: int | None = None) -> jnp.ndarray:
        """z (B, latent_dim, T') → waveform (B, 1, T'·hop)."""
        dp = params["decoder"]
        x = causal_conv1d(z, dp["stem"]["w"], dp["stem"].get("b"),
                          groups=self.latent_dim, padding=3)
        x = causal_conv1d(x, dp["in"]["w"], dp["in"].get("b"))
        sr_idx = None
        if self.sr_bin_boundaries is not None:
            sr = sr_cond if sr_cond is not None else self.out_sample_rate
            sr_idx = int(np.searchsorted(np.asarray(self.sr_bin_boundaries),
                                         sr, side="left"))
        out_dim = self.decoder_dim
        for i, stride in enumerate(self.decoder_rates):
            bp = dp["blocks"][i]
            out_dim = self.decoder_dim // (2 ** (i + 1))
            if sr_idx is not None and "sr_scale" in bp:
                x = (x * bp["sr_scale"][sr_idx][None, :, None]
                     + bp["sr_bias"][sr_idx][None, :, None])
            x = snake(x, bp["a"])
            x = causal_conv_transpose1d(
                x, bp["up"]["w"], bp["up"].get("b"), stride=stride,
                padding=math.ceil(stride / 2), output_padding=stride % 2)
            for j, dil in enumerate((1, 3, 9)):
                x = _residual_unit(bp["units"][j], x, dil, out_dim)
        x = snake(x, dp["a_out"])
        x = causal_conv1d(x, dp["out"]["w"], dp["out"].get("b"), padding=3)
        return jnp.tanh(x)

    # -- loading -----------------------------------------------------------------

    def _wn_conv(self, src, name, dtype):
        v = np.asarray(src.get(name + ".weight_v", jnp.float32))
        g = np.asarray(src.get(name + ".weight_g", jnp.float32))
        out = {"w": jnp.asarray(fold_weight_norm(v, g), dtype)}
        if name + ".bias" in src:
            out["b"] = src.get(name + ".bias", dtype)
        return out

    def _unit(self, src, name, dtype):
        return {
            "a0": src.get(name + ".block.0.alpha", dtype),
            "a2": src.get(name + ".block.2.alpha", dtype),
            "w1": self._wn_conv(src, name + ".block.1", dtype)["w"],
            **({"b1": src.get(name + ".block.1.bias", dtype)}
               if name + ".block.1.bias" in src else {}),
            "w3": self._wn_conv(src, name + ".block.3", dtype)["w"],
            **({"b3": src.get(name + ".block.3.bias", dtype)}
               if name + ".block.3.bias" in src else {}),
        }

    @batched_load
    def load_params(self, src, dtype=jnp.float32, prefix: str = "") -> dict:
        enc_blocks = []
        for i in range(len(self.encoder_rates)):
            base = f"{prefix}encoder.block.{i + 1}"
            enc_blocks.append({
                "units": [self._unit(src, f"{base}.block.{j}", dtype)
                          for j in range(3)],
                "a": src.get(f"{base}.block.3.alpha", dtype),
                "down": self._wn_conv(src, f"{base}.block.4", dtype),
            })
        dec_blocks = []
        for i in range(len(self.decoder_rates)):
            base = f"{prefix}decoder.model.{i + 2}"
            bp = {
                "a": src.get(f"{base}.block.0.alpha", dtype),
                "up": self._wn_conv(src, f"{base}.block.1", dtype),
                "units": [self._unit(src, f"{base}.block.{j + 2}", dtype)
                          for j in range(3)],
            }
            sr_name = f"{prefix}decoder.sr_cond_model.{i + 2}"
            if f"{sr_name}.scale_embed.weight" in src:
                bp["sr_scale"] = src.get(f"{sr_name}.scale_embed.weight",
                                         dtype)
                bp["sr_bias"] = src.get(f"{sr_name}.bias_embed.weight", dtype)
            dec_blocks.append(bp)
        n_up = len(self.decoder_rates)
        return {
            "encoder": {
                "stem": self._wn_conv(src, f"{prefix}encoder.block.0", dtype),
                "blocks": enc_blocks,
                "fc_mu": self._wn_conv(src, f"{prefix}encoder.fc_mu", dtype),
            },
            "decoder": {
                "stem": self._wn_conv(src, f"{prefix}decoder.model.0", dtype),
                "in": self._wn_conv(src, f"{prefix}decoder.model.1", dtype),
                "blocks": dec_blocks,
                "a_out": src.get(f"{prefix}decoder.model.{n_up + 2}.alpha",
                                 dtype),
                "out": self._wn_conv(src,
                                     f"{prefix}decoder.model.{n_up + 3}",
                                     dtype),
            },
        }

    def init_random(self, key, scale: float = 0.1) -> dict:
        ks = iter(jax.random.split(key, 256))

        def w(shape):
            return jax.random.normal(next(ks), shape, jnp.float32) * scale

        def unit(dim, groups):
            return {"a0": jnp.ones((1, dim, 1)), "a2": jnp.ones((1, dim, 1)),
                    "w1": w((dim, dim // groups, 7)), "b1": jnp.zeros(dim),
                    "w3": w((dim, dim, 1)), "b3": jnp.zeros(dim)}

        d = self.encoder_dim
        enc_blocks = []
        for stride in self.encoder_rates:
            enc_blocks.append({
                "units": [unit(d, d) for _ in range(3)],
                "a": jnp.ones((1, d, 1)),
                "down": {"w": w((2 * d, d, 2 * stride)),
                         "b": jnp.zeros(2 * d)},
            })
            d *= 2
        dec_blocks = []
        cin = self.decoder_dim
        for stride in self.decoder_rates:
            cout = cin // 2
            dec_blocks.append({
                "a": jnp.ones((1, cin, 1)),
                "up": {"w": w((cin, cout, 2 * stride)), "b": jnp.zeros(cout)},
                "units": [unit(cout, cout) for _ in range(3)],
            })
            cin = cout
        return {
            "encoder": {
                "stem": {"w": w((self.encoder_dim, 1, 7)),
                         "b": jnp.zeros(self.encoder_dim)},
                "blocks": enc_blocks,
                "fc_mu": {"w": w((self.latent_dim, d, 3)),
                          "b": jnp.zeros(self.latent_dim)},
            },
            "decoder": {
                "stem": {"w": w((self.latent_dim, 1, 7)),
                         "b": jnp.zeros(self.latent_dim)},
                "in": {"w": w((self.decoder_dim, self.latent_dim, 1)),
                       "b": jnp.zeros(self.decoder_dim)},
                "blocks": dec_blocks,
                "a_out": jnp.ones((1, cin, 1)),
                "out": {"w": w((1, cin, 7)), "b": jnp.zeros(1)},
            },
        }
