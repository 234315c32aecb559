"""VoxCPM TTS: hierarchical LM + local diffusion over AudioVAE latents.

Parity with src/models/voxcpm/{model,minicpm4,config,tokenizer}.rs:
- VoxMiniCPM (minicpm4.rs:235-368): MiniCPM4-style transformer over input
  EMBEDS (vocab_size=0 for the local blocks) with mup residual scaling
  (scale_depth/√L), LongRoPE tables, optional no_rope, optional kv_channels
  head-dim override, causal or bidirectional attention.
- VoxCPMLocEnc (model.rs:341-378): patch encoder — in_proj, learned CLS
  token prepended, bidirectional mini-transformer, CLS output per patch.
- VoxCPMLocDiT (model.rs:112-202): flow estimator — sinusoidal t/dt
  embeddings (×1000) through two MLPs; v1 concatenates [mu+t, cond, x] as
  tokens, v2 (kv_channels set) [mu tokens, t, cond, x]; bidirectional
  decoder; outputs the last patch_size tokens.
- UnifiedCFM (model.rs:204-339): cosine sway t-schedule, Euler solver with
  CFG-zero-star (first ⌈4%⌉ steps skipped, optimized scale
  st* = ⟨pos,neg⟩/‖neg‖²) and classifier-free guidance batch of 2.
- ScalarQuantizationLayer (model.rs:18-50): tanh → round(x·scale)/scale →
  out_proj.
- VoxCPMModel.generate/inference (model.rs:516-832): text+audio-feature
  interleaved context, base LM → FSQ → residual LM, per-patch loop
  [LM hidden → DiT CFM → LocEnc feedback → stop head], prompt cache
  (model.rs:839-947), retry-badcase max_len = text_len·ratio+10.
- SingleChineseTokenizer (tokenizer.rs): BPE encode then split multi-char
  pure-CJK tokens into single characters.

TPU-first notes: the per-patch decode step (LM step + 10×2 CFM estimator
calls + LocEnc) is compiled as ONE jitted function with fixed shapes —
the CFM Euler loop unrolls (n_timesteps static), CFG rides a batch axis of
2, and KV caches are donated fixed-size buffers advanced by
dynamic_update_slice.  Only the stop flag crosses to host each patch.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core import nn
from aha_tpu.ops.attention import attention_decode_at, causal_mask, sdpa
from aha_tpu.ops.norms import rms_norm
from aha_tpu.ops.rope import apply_rope
from aha_tpu.io.weights import batched_load


# ---------------------------------------------------------------------------
# Configs (config.rs)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class VoxLMConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_attention_heads: int = 16
    num_key_value_heads: int = 2
    num_hidden_layers: int = 24
    kv_channels: int | None = None
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    max_position_embeddings: int = 32768
    rope_scaling: Any = None
    vocab_size: int = 0
    scale_emb: float = 12.0
    dim_model_base: int = 256
    scale_depth: float = 1.4
    use_mup: bool = True
    no_rope: bool = False

    @property
    def head_dim(self) -> int:
        return self.kv_channels or self.hidden_size // self.num_attention_heads

    @classmethod
    def from_dict(cls, d: dict) -> "VoxLMConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in names}
        if d.get("no_rope") is None:
            d["no_rope"] = False
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class VoxCPMConfig:
    architecture: str
    lm: VoxLMConfig
    patch_size: int
    feat_dim: int
    sq_latent_dim: int
    sq_scale: int
    residual_lm_num_layers: int
    residual_lm_no_rope: bool
    encoder: VoxLMConfig   # derived mini-config for LocEnc
    dit: VoxLMConfig       # derived mini-config for LocDiT
    audio_vae: dict | None
    max_length: int
    dtype: str

    @classmethod
    def from_file(cls, model_dir: str) -> "VoxCPMConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            d = json.load(f)
        return cls.from_dict(d)

    @classmethod
    def from_dict(cls, d: dict) -> "VoxCPMConfig":
        lm = VoxLMConfig.from_dict(d["lm_config"])

        def sub(block):
            # model.rs:419-435: local blocks inherit the lm config with their
            # own dims and vocab_size=0
            return dataclasses.replace(
                lm, hidden_size=block["hidden_dim"],
                intermediate_size=block["ffn_dim"],
                num_attention_heads=block["num_heads"],
                num_hidden_layers=block["num_layers"],
                kv_channels=block.get("kv_channels"),
                num_key_value_heads=block["num_heads"], vocab_size=0)

        return cls(
            architecture=d.get("architecture", "voxcpm"),
            lm=lm,
            patch_size=d["patch_size"],
            feat_dim=d["feat_dim"],
            sq_latent_dim=d["scalar_quantization_latent_dim"],
            sq_scale=d["scalar_quantization_scale"],
            residual_lm_num_layers=d["residual_lm_num_layers"],
            residual_lm_no_rope=bool(d.get("residual_lm_no_rope")),
            encoder=sub(d["encoder_config"]),
            dit=sub(d["dit_config"]),
            audio_vae=d.get("audio_vae_config"),
            max_length=d.get("max_length", 4096),
            dtype=d.get("dtype", "bfloat16"),
        )

    @property
    def is_v2(self) -> bool:
        return self.architecture.lower() == "voxcpm2"


def vox_longrope_table(cfg: VoxLMConfig, max_len: int) -> tuple:
    """LongRoPE table (minicpm4.rs:14-103).  Note the reference copies
    short_factor into long_factor (:33) so both regimes use short; we follow
    the intended behavior (long beyond the original context)."""
    half = cfg.head_dim // 2
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(half) / half))
    rs = cfg.rope_scaling or {}
    original = rs.get("original_max_position_embeddings",
                      cfg.max_position_embeddings)
    factor = np.asarray(
        rs.get("long_factor") if max_len > original and rs.get("long_factor")
        else rs.get("short_factor", np.ones(half)), np.float64)
    if factor.shape[0] != half:
        # local blocks inherit lm rope_scaling but use their own head_dim;
        # mismatched ext factors degrade to plain RoPE
        factor = np.ones(half)
    scale = cfg.max_position_embeddings / original
    scaling = math.sqrt(1.0 + math.log(scale) / math.log(original)) \
        if scale > 1.0 else 1.0
    freqs = np.outer(np.arange(max_len, dtype=np.float64), inv_freq / factor)
    return (jnp.asarray(np.cos(freqs) * scaling, jnp.float32),
            jnp.asarray(np.sin(freqs) * scaling, jnp.float32))


# ---------------------------------------------------------------------------
# VoxMiniCPM: functional MiniCPM4 over embeds (minicpm4.rs:105-368)
# ---------------------------------------------------------------------------


class VoxMiniCPM:
    def __init__(self, cfg: VoxLMConfig, max_rope_len: int = 4096):
        self.cfg = cfg
        if cfg.no_rope:
            self.cos = self.sin = None
        else:
            self.cos, self.sin = vox_longrope_table(cfg, max_rope_len)
        self.res_scale = (cfg.scale_depth / math.sqrt(cfg.num_hidden_layers)
                          if cfg.use_mup else 1.0)

    def init_cache(self, batch: int, max_len: int, dtype=jnp.float32) -> dict:
        c = self.cfg
        shape = (c.num_hidden_layers, batch, max_len,
                 c.num_key_value_heads, c.head_dim)
        return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype),
                "pos": jnp.zeros((), jnp.int32)}

    def _layer(self, lp, x, cos, sin, mask, kc=None, vc=None, li=None,
               pos=None):
        """kc/vc: the whole stacked (L, B, S, Hkv, D) cache (row-write +
        attention_decode_at keep the scan-free loop copy-free, see qwen3)."""
        c = self.cfg
        B, S, _ = x.shape
        H, Hkv, hd = c.num_attention_heads, c.num_key_value_heads, c.head_dim
        h = rms_norm(x, lp["ln1"]["w"], c.rms_norm_eps)
        q = nn.linear(lp["q"], h).reshape(B, S, H, hd)
        k = nn.linear(lp["k"], h).reshape(B, S, Hkv, hd)
        v = nn.linear(lp["v"], h).reshape(B, S, Hkv, hd)
        if cos is not None:
            q, k = apply_rope(q, k, cos, sin)
        if kc is not None:
            zero = jnp.zeros((), pos.dtype)
            sl = jnp.asarray(li, pos.dtype)
            # activations can be f32 (f32 masks promote bf16 embeds); the
            # cache stores the weights' dtype — cast at the write site
            kc = jax.lax.dynamic_update_slice(kc, k[None].astype(kc.dtype),
                                              (sl, zero, pos, zero, zero))
            vc = jax.lax.dynamic_update_slice(vc, v[None].astype(vc.dtype),
                                              (sl, zero, pos, zero, zero))
            if S == 1:
                attn = attention_decode_at(q, kc, vc, sl, pos)
            else:
                k_all = jax.lax.dynamic_index_in_dim(kc, sl, 0,
                                                     keepdims=False)
                v_all = jax.lax.dynamic_index_in_dim(vc, sl, 0,
                                                     keepdims=False)
                attn = sdpa(q, k_all, v_all, mask)
        else:
            attn = sdpa(q, k, v, mask)
        x = x + nn.linear(lp["o"], attn.reshape(B, S, H * hd)) * self.res_scale
        h = rms_norm(x, lp["ln2"]["w"], c.rms_norm_eps)
        x = x + nn.swiglu_mlp(lp["mlp"], h) * self.res_scale
        return x, kc, vc

    def forward(self, params, x, pos: int = 0, causal: bool = False):
        """No-cache forward over embeds (minicpm4.rs:281-317)."""
        c = self.cfg
        S = x.shape[1]
        cos = sin = None
        if self.cos is not None:
            cos = jax.lax.dynamic_slice_in_dim(self.cos, pos, S)
            sin = jax.lax.dynamic_slice_in_dim(self.sin, pos, S)
            cos, sin = cos[:, : c.head_dim // 2], sin[:, : c.head_dim // 2]
        mask = causal_mask(S, S) if (causal and S > 1) else None
        for lp in params["layers"]:
            x, _, _ = self._layer(lp, x, cos, sin, mask)
        return rms_norm(x, params["norm"]["w"], c.rms_norm_eps)

    def forward_with_cache(self, params, x, cache: dict):
        """Causal forward appending to the KV cache at cache['pos']."""
        c = self.cfg
        S = x.shape[1]
        pos = cache["pos"]
        cos = sin = None
        if self.cos is not None:
            cos = jax.lax.dynamic_slice_in_dim(self.cos, pos, S)
            sin = jax.lax.dynamic_slice_in_dim(self.sin, pos, S)
            cos, sin = cos[:, : c.head_dim // 2], sin[:, : c.head_dim // 2]
        kv_len = cache["k"].shape[2]
        if S > 1:
            mask = causal_mask(S, kv_len, q_offset=pos)
        else:
            ok = jnp.arange(kv_len)[None, :] <= pos
            mask = jnp.where(ok, 0.0, jnp.finfo(jnp.float32).min)[None, None]
        kc, vc = cache["k"], cache["v"]
        for i, lp in enumerate(params["layers"]):
            x, kc, vc = self._layer(lp, x, cos, sin, mask, kc, vc, i, pos)
        x = rms_norm(x, params["norm"]["w"], c.rms_norm_eps)
        return x, {"k": kc, "v": vc, "pos": pos + S}

    # -- params ----------------------------------------------------------------

    @batched_load
    def load_params(self, src, prefix: str, dtype=jnp.float32) -> dict:
        c = self.cfg
        layers = []
        for i in range(c.num_hidden_layers):
            p = f"{prefix}layers.{i}."
            layers.append({
                "ln1": nn.take_norm(src, p + "input_layernorm", dtype),
                "ln2": nn.take_norm(src, p + "post_attention_layernorm",
                                    dtype),
                "q": nn.take_linear(src, p + "self_attn.q_proj", dtype),
                "k": nn.take_linear(src, p + "self_attn.k_proj", dtype),
                "v": nn.take_linear(src, p + "self_attn.v_proj", dtype),
                "o": nn.take_linear(src, p + "self_attn.o_proj", dtype),
                "mlp": {
                    "gate": nn.take_linear(src, p + "mlp.gate_proj", dtype),
                    "up": nn.take_linear(src, p + "mlp.up_proj", dtype),
                    "down": nn.take_linear(src, p + "mlp.down_proj", dtype),
                },
            })
        params = {"layers": layers,
                  "norm": nn.take_norm(src, prefix + "norm", dtype)}
        if c.vocab_size > 0:
            params["embed"] = nn.take_embedding(src, prefix + "embed_tokens",
                                                dtype)
        return params

    def init_random(self, key, scale: float = 0.02) -> dict:
        c = self.cfg
        ks = iter(jax.random.split(key, 8 * c.num_hidden_layers + 2))

        def w(shape):
            return jax.random.normal(next(ks), shape, jnp.float32) * scale

        d, hd = c.hidden_size, c.head_dim
        layers = [{
            "ln1": {"w": jnp.ones(d)}, "ln2": {"w": jnp.ones(d)},
            "q": {"w": w((d, c.num_attention_heads * hd))},
            "k": {"w": w((d, c.num_key_value_heads * hd))},
            "v": {"w": w((d, c.num_key_value_heads * hd))},
            "o": {"w": w((c.num_attention_heads * hd, d))},
            "mlp": {"gate": {"w": w((d, c.intermediate_size))},
                    "up": {"w": w((d, c.intermediate_size))},
                    "down": {"w": w((c.intermediate_size, d))}},
        } for _ in range(c.num_hidden_layers)]
        params = {"layers": layers, "norm": {"w": jnp.ones(d)}}
        if c.vocab_size > 0:
            params["embed"] = {"w": w((c.vocab_size, d))}
        return params


# ---------------------------------------------------------------------------
# Local blocks
# ---------------------------------------------------------------------------


def scalar_quantize(p, x, scale: int):
    """ScalarQuantizationLayer (model.rs:40-49)."""
    h = jnp.tanh(nn.linear(p["in_proj"], x))
    h = jnp.round(h * scale) / scale
    return nn.linear(p["out_proj"], h)


def sinusoidal_time_emb(t, dim: int, scale: float = 1000.0):
    """SinusoidalPosEmb (model.rs:52-81): t (B,) → (B, dim)."""
    half = dim // 2
    emb = jnp.exp(jnp.arange(half) * (-math.log(10000.0) / (half - 1)))
    ang = t[:, None] * scale * emb[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def timestep_mlp(p, x):
    return nn.linear(p["linear_2"], jax.nn.silu(nn.linear(p["linear_1"], x)))


class VoxCPMLocEnc:
    """Patch encoder (model.rs:341-378)."""

    def __init__(self, cfg: VoxLMConfig, feat_dim: int):
        self.encoder = VoxMiniCPM(cfg, max_rope_len=64)
        self.feat_dim = feat_dim
        self.hidden = cfg.hidden_size

    def forward(self, p, x):
        """x (B, T, P, feat_dim) → CLS outputs (B, T, hidden)."""
        B, T, P, _ = x.shape
        h = nn.linear(p["in_proj"], x)
        cls = jnp.broadcast_to(p["special_token"], (B, T, 1, self.hidden))
        h = jnp.concatenate([cls, h.astype(cls.dtype)], axis=2)
        h = h.reshape(B * T, P + 1, self.hidden)
        out = self.encoder.forward(p["encoder"], h, causal=False)
        return out[:, 0, :].reshape(B, T, self.hidden)

    @batched_load
    def load_params(self, src, prefix, dtype):
        return {
            "special_token": src.get(prefix + "special_token", dtype)[0, 0],
            "in_proj": nn.take_linear(src, prefix + "in_proj", dtype),
            "encoder": self.encoder.load_params(src, prefix + "encoder.",
                                                dtype),
        }

    def init_random(self, key, scale=0.02):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "special_token": jax.random.normal(
                k1, (1, 1, self.hidden), jnp.float32) * scale,
            "in_proj": {"w": jax.random.normal(
                k2, (self.feat_dim, self.hidden), jnp.float32) * scale,
                "b": jnp.zeros(self.hidden)},
            "encoder": self.encoder.init_random(k3, scale),
        }


class VoxCPMLocDiT:
    """Flow estimator (model.rs:112-202)."""

    def __init__(self, cfg: VoxLMConfig, feat_dim: int):
        self.decoder = VoxMiniCPM(cfg, max_rope_len=128)
        self.feat_dim = feat_dim
        self.hidden = cfg.hidden_size
        self.version = 2 if cfg.kv_channels else 1

    def forward(self, p, x, mu, t, cond, dt):
        """x/cond (B, feat_dim, P); mu (B, k·hidden); t/dt (B,) →
        (B, feat_dim, P)."""
        B = x.shape[0]
        xt = nn.linear(p["in_proj"], jnp.swapaxes(x, 1, 2))     # (B, P, H)
        ct = nn.linear(p["cond_proj"], jnp.swapaxes(cond, 1, 2))
        P = xt.shape[1]
        prefix = ct.shape[1]
        temb = timestep_mlp(p["time_mlp"],
                            sinusoidal_time_emb(t, self.hidden))
        temb = temb + timestep_mlp(p["delta_time_mlp"],
                                   sinusoidal_time_emb(dt, self.hidden))
        if self.version == 2:
            mu_t = mu.reshape(B, -1, self.hidden)
            h = jnp.concatenate([mu_t, temb[:, None], ct, xt], axis=1)
            out = self.decoder.forward(p["decoder"], h, causal=False)
            out = out[:, mu_t.shape[1] + 1 + prefix:]
        else:
            h = jnp.concatenate([(mu + temb)[:, None], ct, xt], axis=1)
            out = self.decoder.forward(p["decoder"], h, causal=False)
            out = out[:, 1 + prefix:]
        return jnp.swapaxes(nn.linear(p["out_proj"], out), 1, 2)

    @batched_load
    def load_params(self, src, prefix, dtype):
        return {
            "in_proj": nn.take_linear(src, prefix + "in_proj", dtype),
            "cond_proj": nn.take_linear(src, prefix + "cond_proj", dtype),
            "out_proj": nn.take_linear(src, prefix + "out_proj", dtype),
            "time_mlp": {
                "linear_1": nn.take_linear(src, prefix + "time_mlp.linear_1",
                                           dtype),
                "linear_2": nn.take_linear(src, prefix + "time_mlp.linear_2",
                                           dtype)},
            "delta_time_mlp": {
                "linear_1": nn.take_linear(
                    src, prefix + "delta_time_mlp.linear_1", dtype),
                "linear_2": nn.take_linear(
                    src, prefix + "delta_time_mlp.linear_2", dtype)},
            "decoder": self.decoder.load_params(src, prefix + "decoder.",
                                                dtype),
        }

    def init_random(self, key, scale=0.02):
        ks = iter(jax.random.split(key, 8))

        def lin(i, o):
            return {"w": jax.random.normal(next(ks), (i, o),
                                           jnp.float32) * scale,
                    "b": jnp.zeros(o)}

        H = self.hidden
        return {
            "in_proj": lin(self.feat_dim, H),
            "cond_proj": lin(self.feat_dim, H),
            "out_proj": lin(H, self.feat_dim),
            "time_mlp": {"linear_1": lin(H, H), "linear_2": lin(H, H)},
            "delta_time_mlp": {"linear_1": lin(H, H), "linear_2": lin(H, H)},
            "decoder": self.decoder.init_random(next(ks), scale),
        }


def cfm_sway_t_span(n_timesteps: int, sway: float = 1.0) -> jnp.ndarray:
    """Cosine sway schedule over linspace(1→0) (model.rs:254-261)."""
    t = jnp.linspace(1.0, 0.0, n_timesteps + 1)
    return t + sway * (jnp.cos(t * (math.pi / 2)) - 1.0 + t)


def cfm_solve_euler(dit: VoxCPMLocDiT, p, z, t_span, mu, cond,
                    cfg_value: float, use_cfg_zero_star: bool = True):
    """Euler CFG solver (model.rs:277-338).  n_timesteps is static so the
    loop unrolls into one jitted graph; the CFG pair rides batch axis 2B."""
    n = t_span.shape[0] - 1
    zero_init = max(1, int(n * 0.04)) if use_cfg_zero_star else 0
    B = z.shape[0]
    x = z
    t = t_span[0]
    for step in range(1, n + 1):
        dt = t - t_span[step]
        if step <= zero_init:
            dphi = jnp.zeros_like(x)
        else:
            x_in = jnp.concatenate([x, x], axis=0)
            mu_in = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
            t_in = jnp.broadcast_to(t, (2 * B,))
            dt_in = jnp.zeros(2 * B, x.dtype)  # mean_mode=False
            cond_in = jnp.concatenate([cond, cond], axis=0)
            both = dit.forward(p, x_in, mu_in, t_in, cond_in, dt_in)
            dphi, neg = both[:B], both[B:]
            if use_cfg_zero_star:
                pos_f = dphi.reshape(B, -1)
                neg_f = neg.reshape(B, -1)
                st = (pos_f * neg_f).sum(-1, keepdims=True) / (
                    (neg_f ** 2).sum(-1, keepdims=True) + 1e-8)
                st = st.reshape(B, 1, 1)
            else:
                st = jnp.ones((B, 1, 1), x.dtype)
            base = neg * st
            dphi = base + (dphi - base) * cfg_value
        x = x - dphi * dt
        t = t - dt
    return x


# ---------------------------------------------------------------------------
# Tokenizer (tokenizer.rs)
# ---------------------------------------------------------------------------


def _is_cjk(ch: str) -> bool:
    return 0x4E00 <= ord(ch) <= 0x9FFF


class SingleChineseTokenizer:
    """BPE encode, then split multi-char pure-CJK tokens into single
    characters (tokenizer.rs:42-65)."""

    def __init__(self, path: str):
        from tokenizers import Tokenizer

        self.tok = Tokenizer.from_file(os.path.join(path, "tokenizer.json"))
        self.multichar = {
            t for t in self.tok.get_vocab(False)
            if len(t) >= 2 and all(_is_cjk(c) for c in t)}

    def encode(self, text: str) -> list[int]:
        enc = self.tok.encode(text, add_special_tokens=False)
        out = []
        for token in enc.tokens:
            clean = token.replace("▁", "")
            if clean in self.multichar:
                out.extend(clean)
            else:
                out.append(token)
        ids = [self.tok.token_to_id(t) for t in out]
        return [i for i in ids if i is not None]


# ---------------------------------------------------------------------------
# VoxCPMModel (model.rs:380-947)
# ---------------------------------------------------------------------------

AUDIO_START_TOKEN = 101
REF_AUDIO_START_TOKEN = 103
REF_AUDIO_END_TOKEN = 104


class VoxCPMModel:
    def __init__(self, config: VoxCPMConfig, latent_dim: int):
        c = config
        self.config = c
        self.latent_dim = latent_dim
        self.base_lm = VoxMiniCPM(c.lm, max_rope_len=c.max_length)
        res_cfg = dataclasses.replace(c.lm,
                                      num_hidden_layers=c.residual_lm_num_layers,
                                      vocab_size=0,
                                      no_rope=c.residual_lm_no_rope)
        self.residual_lm = VoxMiniCPM(res_cfg, max_rope_len=c.max_length)
        self.feat_encoder = VoxCPMLocEnc(c.encoder, c.feat_dim)
        self.feat_dit = VoxCPMLocDiT(c.dit, c.feat_dim)
        self._step_jit = {}

    # -- context assembly (model.rs:528-652, host side) ------------------------

    def build_context(self, text_ids: list[int],
                      prompt_feat: np.ndarray | None):
        """Returns (text_token, text_mask, audio_feat, audio_mask) numpy.
        prompt_feat: (T_audio, P, latent) VAE latents of the voice prompt."""
        P, D = self.config.patch_size, self.latent_dim
        ids = np.asarray(list(text_ids) + [AUDIO_START_TOKEN], np.int32)
        tlen = len(ids)
        if prompt_feat is not None and len(prompt_feat):
            alen = len(prompt_feat)
            text_token = np.concatenate([ids, np.zeros(alen, np.int32)])
            audio_feat = np.concatenate(
                [np.zeros((tlen, P, D), np.float32),
                 np.asarray(prompt_feat, np.float32)])
            text_mask = np.concatenate([np.ones(tlen, np.float32),
                                        np.zeros(alen, np.float32)])
            audio_mask = 1.0 - text_mask
        else:
            text_token = ids
            audio_feat = np.zeros((tlen, P, D), np.float32)
            text_mask = np.ones(tlen, np.float32)
            audio_mask = np.zeros(tlen, np.float32)
        return text_token, text_mask, audio_feat, audio_mask

    # -- jitted pieces ----------------------------------------------------------

    def _embed_scale(self):
        c = self.config.lm
        return c.scale_emb if c.use_mup else 1.0

    def _prefill(self, params, text_token, text_mask, audio_feat, audio_mask,
                 cache_b, cache_r):
        """One jitted prefill: returns (lm_hidden, res_hidden, caches)."""
        feat_embed = self.feat_encoder.forward(params["feat_encoder"],
                                               audio_feat)
        feat_embed = nn.linear(params["enc_to_lm_proj"], feat_embed)
        text_embed = nn.embedding(params["base_lm"]["embed"], text_token) \
            * self._embed_scale()
        combined = (text_mask[..., None] * text_embed
                    + audio_mask[..., None] * feat_embed)
        enc, cache_b = self.base_lm.forward_with_cache(params["base_lm"],
                                                       combined, cache_b)
        fsq = scalar_quantize(params["fsq_layer"], enc, self.config.sq_scale)
        enc = fsq * audio_mask[..., None] + enc * text_mask[..., None]
        if self.config.is_v2:
            fused = nn.linear(params["fusion_concat_proj"], jnp.concatenate(
                [enc, audio_mask[..., None] * feat_embed], axis=-1))
        else:
            fused = enc + audio_mask[..., None] * feat_embed
        res, cache_r = self.residual_lm.forward_with_cache(
            params["residual_lm"], fused, cache_r)
        return (enc[:, -1], res[:, -1], audio_feat[:, -1],
                cache_b, cache_r)

    def _decode_step(self, params, lm_hidden, res_hidden, prev_feat,
                     cache_b, cache_r, key, n_timesteps: int,
                     cfg_value: float):
        """One audio patch: DiT CFM → LocEnc feedback → stop logits →
        LM/residual steps (model.rs:767-823)."""
        c = self.config
        d1 = nn.linear(params["lm_to_dit_proj"], lm_hidden)
        d2 = nn.linear(params["res_to_dit_proj"], res_hidden)
        mu = jnp.concatenate([d1, d2], -1) if c.is_v2 else d1 + d2
        cond = jnp.swapaxes(prev_feat, 1, 2)          # (B, D, P)
        z = jax.random.normal(key, cond.shape, cond.dtype)
        t_span = cfm_sway_t_span(n_timesteps)
        pred = cfm_solve_euler(self.feat_dit, params["feat_dit"], z, t_span,
                               mu, cond, cfg_value)
        pred_feat = jnp.swapaxes(pred, 1, 2)          # (B, P, D)

        stop = jax.nn.silu(nn.linear(params["stop_proj"], lm_hidden))
        stop_flag = jnp.argmax(nn.linear(params["stop_head"], stop), -1)[0]

        curr = self.feat_encoder.forward(params["feat_encoder"],
                                         pred_feat[:, None])
        curr = nn.linear(params["enc_to_lm_proj"], curr)
        lm_next, cache_b = self.base_lm.forward_with_cache(
            params["base_lm"], curr, cache_b)
        lm_next = scalar_quantize(params["fsq_layer"], lm_next[:, 0],
                                  c.sq_scale)
        if c.is_v2:
            res_in = nn.linear(params["fusion_concat_proj"],
                               jnp.concatenate([lm_next, curr[:, 0]], -1))
        else:
            res_in = lm_next + curr[:, 0]
        res_next, cache_r = self.residual_lm.forward_with_cache(
            params["residual_lm"], res_in[:, None], cache_r)
        return (pred_feat, stop_flag, lm_next, res_next[:, 0],
                cache_b, cache_r)

    # -- generation loop ---------------------------------------------------------

    def inference(self, params, text_token, text_mask, audio_feat, audio_mask,
                  min_len: int, max_len: int, n_timesteps: int,
                  cfg_value: float, seed: int = 0) -> np.ndarray:
        """Returns predicted latents (T_pred·P, latent_dim) as numpy.
        Host loop over patches; each step is one compiled call."""
        T = len(text_token)
        cache_len = T + max_len + 8
        # cache dtype follows the weights (bf16 params write bf16 K/V)
        dt = params["enc_to_lm_proj"]["w"].dtype
        cache_b = self.base_lm.init_cache(1, cache_len, dt)
        cache_r = self.residual_lm.init_cache(1, cache_len, dt)
        key_pf = (n_timesteps, float(cfg_value))
        if key_pf not in self._step_jit:
            self._step_jit[key_pf] = jax.jit(partial(
                self._decode_step, n_timesteps=n_timesteps,
                cfg_value=float(cfg_value)),
                donate_argnums=(4, 5))
        step = self._step_jit[key_pf]

        if "prefill" not in self._step_jit:
            self._step_jit["prefill"] = jax.jit(self._prefill)
        lm_hidden, res_hidden, prev_feat, cache_b, cache_r = \
            self._step_jit["prefill"](
                params, jnp.asarray(text_token)[None],
                jnp.asarray(text_mask)[None],
                jnp.asarray(audio_feat)[None], jnp.asarray(audio_mask)[None],
                cache_b, cache_r)

        keys = jax.random.split(jax.random.PRNGKey(seed), max_len)
        patches = []
        for i in range(max_len):
            (pred_feat, stop_flag, lm_hidden, res_hidden,
             cache_b, cache_r) = step(params, lm_hidden, res_hidden,
                                      prev_feat, cache_b, cache_r, keys[i])
            patches.append(np.asarray(pred_feat[0]))
            prev_feat = pred_feat
            if i > min_len and int(stop_flag) == 1:
                break
        pred = np.concatenate(patches, axis=0)  # (T_pred·P, D)
        return pred.reshape(-1, self.latent_dim)

    # -- loading ------------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.float32) -> dict:
        c = self.config
        params = {
            "base_lm": self.base_lm.load_params(src, "base_lm.", dtype),
            "residual_lm": self.residual_lm.load_params(src, "residual_lm.",
                                                        dtype),
            "feat_encoder": self.feat_encoder.load_params(
                src, "feat_encoder.", dtype),
            "feat_dit": self.feat_dit.load_params(
                src, "feat_decoder.estimator.", dtype),
            "fsq_layer": {
                "in_proj": nn.take_linear(src, "fsq_layer.in_proj", dtype),
                "out_proj": nn.take_linear(src, "fsq_layer.out_proj", dtype)},
            "enc_to_lm_proj": nn.take_linear(src, "enc_to_lm_proj", dtype),
            "lm_to_dit_proj": nn.take_linear(src, "lm_to_dit_proj", dtype),
            "res_to_dit_proj": nn.take_linear(src, "res_to_dit_proj", dtype),
            "stop_proj": nn.take_linear(src, "stop_proj", dtype),
            "stop_head": nn.take_linear(src, "stop_head", dtype),
        }
        if c.is_v2:
            params["fusion_concat_proj"] = nn.take_linear(
                src, "fusion_concat_proj", dtype)
        return params

    def init_random(self, key, scale: float = 0.02) -> dict:
        c = self.config
        ks = iter(jax.random.split(key, 16))

        def lin(i, o, bias=True):
            out = {"w": jax.random.normal(next(ks), (i, o),
                                          jnp.float32) * scale}
            if bias:
                out["b"] = jnp.zeros(o)
            return out

        H, Hd = c.lm.hidden_size, c.dit.hidden_size
        base = self.base_lm.init_random(next(ks), scale)
        base["embed"] = {"w": jax.random.normal(
            next(ks), (max(c.lm.vocab_size, 128), H), jnp.float32) * scale}
        params = {
            "base_lm": base,
            "residual_lm": self.residual_lm.init_random(next(ks), scale),
            "feat_encoder": self.feat_encoder.init_random(next(ks), scale),
            "feat_dit": self.feat_dit.init_random(next(ks), scale),
            "fsq_layer": {"in_proj": lin(H, c.sq_latent_dim),
                          "out_proj": lin(c.sq_latent_dim, H)},
            "enc_to_lm_proj": lin(c.encoder.hidden_size, H),
            "lm_to_dit_proj": lin(H, Hd),
            "res_to_dit_proj": lin(H, Hd),
            "stop_proj": lin(H, H),
            "stop_head": lin(H, 2, bias=False),
        }
        if c.is_v2:
            params["fusion_concat_proj"] = lin(2 * H, H)
        return params
