"""Fun-ASR-Nano: SANM (FSMN-memory) encoder + adaptor + Qwen3 LLM.

Parity with src/models/fun_asr_nano/model.rs:
- SANM attention (forward_simple, :147-176): fused q/k/v projection; the
  value stream also feeds a zero-padded depthwise FSMN conv whose output is
  added to the attention output (the "memory" path)
- SenseVoiceEncoderSmall (:336-432): x·√d + sinusoidal PE, encoders0 maps
  input (lfr_m·n_mels) → hidden with no attention residual, then uniform
  blocks, after_norm, tp blocks, tp_norm
- AudioAdaptor (:531-578): k-frame stack → linear/relu/linear → attention
  blocks (linear_q/k/v/out names, relu w_1/w_2 MLP)
- LLM: the shared Qwen3Model; audio embeds spliced where fbank_mask == 1
  (processor.rs:85-127); token count from the reference's olens formula

Frontend (kaldi fbank ×32768, LFR 7/6) is host-side numpy
(aha_tpu.ops.audio_feats.kaldi_fbank/apply_lfr).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core import nn
from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model
from aha_tpu.ops.attention import sdpa, segment_attention
from aha_tpu.ops.norms import layer_norm
from aha_tpu.io.weights import batched_load


@dataclasses.dataclass(frozen=True)
class FunAsrEncoderConfig:
    output_size: int = 512
    attention_heads: int = 4
    linear_units: int = 2048
    num_blocks: int = 50
    tp_blocks: int = 20
    kernel_size: int = 11
    sanm_shfit: int = 0
    n_mels: int = 80
    lfr_m: int = 7
    lfr_n: int = 6

    @property
    def input_size(self) -> int:
        return self.lfr_m * self.n_mels

    @classmethod
    def from_dict(cls, enc: dict, frontend: dict) -> "FunAsrEncoderConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in {**frontend, **enc}.items() if k in names}
        return cls(**d)


@dataclasses.dataclass(frozen=True)
class FunAsrAdaptorConfig:
    downsample_rate: int = 2
    encoder_dim: int = 512
    llm_dim: int = 1024
    ffn_dim: int = 2048
    n_layer: int = 2
    attention_heads: int = 8

    @classmethod
    def from_dict(cls, d: dict) -> "FunAsrAdaptorConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


@dataclasses.dataclass(frozen=True)
class FunAsrNanoConfig:
    encoder: FunAsrEncoderConfig
    adaptor: FunAsrAdaptorConfig
    llm: Qwen3Config

    @classmethod
    def from_file(cls, model_dir: str) -> "FunAsrNanoConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            d = json.load(f)
        enc = FunAsrEncoderConfig.from_dict(d.get("audio_encoder_conf", {}),
                                            d.get("frontend_conf", {}))
        ada = FunAsrAdaptorConfig.from_dict(d.get("audio_adaptor_conf", {}))
        llm_path = os.path.join(model_dir, "llm_config.json")
        llm = (Qwen3Config.from_file(os.path.dirname(llm_path))
               if os.path.exists(llm_path) else
               Qwen3Config.from_dict(d.get("llm_conf", {})))
        return cls(encoder=enc, adaptor=ada, llm=llm)


def fun_asr_token_length(t_lfr: int) -> int:
    """LFR frames → spliced token count (processor.rs:100-103)."""
    olens = 1 + (t_lfr - 3 + 2) // 2
    olens = 1 + (olens - 3 + 2) // 2
    return (olens - 1) // 2 + 1


class FunAsrNanoModel:
    """Implements the CausalLM protocol; mm = {speech (1, T_lfr, D_in),
    seg (T_lfr,) validity segments, gather (n_tok,)}."""

    def __init__(self, config: FunAsrNanoConfig, max_rope_len: int = 8192):
        self.config = config
        self.llm = Qwen3Model(config.llm, max_rope_len=max_rope_len)
        self.n_layers = self.llm.n_layers
        from aha_tpu.ops.audio_feats import sinusoidal_pe_cat

        self.pe = jnp.asarray(sinusoidal_pe_cat(4096, config.encoder.input_size))
        self.audio_mask_token = -1  # splice is mask-driven, not token-id

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16):
        return self.llm.init_cache(batch, max_len, dtype)

    # -- SANM encoder ----------------------------------------------------------

    def _sanm_block(self, lp, x, seg, heads, kernel, in_eq_hidden):
        """EncoderLayerSANM.forward_simple (model.rs:317-334)."""
        B, T, _ = x.shape
        h = layer_norm(x, lp["ln1"]["w"], lp["ln1"].get("b"))
        qkv = nn.linear(lp["qkv"], h)
        dim = qkv.shape[-1] // 3
        hd = dim // heads
        q = qkv[..., :dim].reshape(B, T, heads, hd)
        k = qkv[..., dim:2 * dim].reshape(B, T, heads, hd)
        v = qkv[..., 2 * dim:]
        # zero pad-row values so the FSMN conv sees the reference's zero
        # padding at the sequence boundary
        v = jnp.where((seg >= 0)[None, :, None], v, 0.0)
        # FSMN memory: zero-padded depthwise conv over v, + v
        left = (kernel - 1) // 2
        w = lp["fsmn"]["w"]  # (kernel, dim)
        vp = jnp.pad(v, ((0, 0), (left, kernel - 1 - left), (0, 0)))
        mem = sum(vp[:, i:i + T, :] * w[i] for i in range(kernel)) + v
        attn = segment_attention(q, k, v.reshape(B, T, heads, hd), seg)
        out = nn.linear(lp["out"], attn.reshape(B, T, dim)) + mem
        x = (x + out) if in_eq_hidden else out
        h = layer_norm(x, lp["ln2"]["w"], lp["ln2"].get("b"))
        h = jax.nn.relu(nn.linear(lp["fc1"], h))
        return x + nn.linear(lp["fc2"], h)

    def encode_audio(self, ap, speech: jnp.ndarray,
                     seg: jnp.ndarray) -> jnp.ndarray:
        """(1, T_lfr, D_in) → (n_adaptor_rows, llm_dim)."""
        e = self.config.encoder
        a = self.config.adaptor
        T = speech.shape[1]
        valid = (seg >= 0)[None, :, None]
        x = speech * (e.output_size ** 0.5)
        x = x + self.pe[:T][None].astype(x.dtype)
        x = jnp.where(valid, x, 0.0)
        x = self._sanm_block(ap["encoders0"], x, seg, e.attention_heads,
                             e.kernel_size, in_eq_hidden=False)
        for lp in ap["encoders"]:
            x = self._sanm_block(lp, x, seg, e.attention_heads,
                                 e.kernel_size, in_eq_hidden=True)
        x = layer_norm(x, ap["after_norm"]["w"], ap["after_norm"].get("b"))
        for lp in ap["tp_encoders"]:
            x = self._sanm_block(lp, x, seg, e.attention_heads,
                                 e.kernel_size, in_eq_hidden=True)
        x = layer_norm(x, ap["tp_norm"]["w"], ap["tp_norm"].get("b"))

        # adaptor: k-stack → linear/relu/linear → attention blocks
        # (zero pad rows so boundary chunks stack zeros like the reference)
        x = jnp.where(valid, x, 0.0)
        k = a.downsample_rate
        pad = (-T) % k
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            seg = jnp.pad(seg, (0, pad), constant_values=-1)
        B, Tp, D = x.shape
        x = x.reshape(B, Tp // k, D * k)
        x = jax.nn.relu(nn.linear(ap["ada1"], x))
        x = nn.linear(ap["ada2"], x)
        Ta = x.shape[1]
        ada_seg = seg[::k]  # chunk validity follows its first frame
        heads = a.attention_heads
        hd = a.llm_dim // heads
        for lp in ap["ada_blocks"]:
            h = layer_norm(x, lp["ln1"]["w"], lp["ln1"].get("b"))
            q = nn.linear(lp["q"], h).reshape(B, Ta, heads, hd)
            kk = nn.linear(lp["k"], h).reshape(B, Ta, heads, hd)
            vv = nn.linear(lp["v"], h).reshape(B, Ta, heads, hd)
            attn = segment_attention(q, kk, vv, ada_seg
                                     ).reshape(B, Ta, a.llm_dim)
            x = x + nn.linear(lp["out"], attn)
            h = layer_norm(x, lp["ln2"]["w"], lp["ln2"].get("b"))
            x = x + nn.linear(lp["fc2"], jax.nn.relu(nn.linear(lp["fc1"], h)))
        return x[0]

    # -- CausalLM ------------------------------------------------------------

    def backbone(self, params, input_ids, cache, mm: Any = None,
                 prompt_len=None):
        x = nn.embedding(params["llm"]["embed"], input_ids)
        if mm is not None:
            feats = self.encode_audio(params["audio"], mm["speech"],
                                      mm["seg"])
            feats = feats[mm["gather"]]
            fmask = mm["fbank_mask"]  # (S,) bool over padded prompt
            idx = jnp.clip(jnp.cumsum(fmask) - 1, 0, feats.shape[0] - 1)
            x = jnp.where(fmask[None, :, None],
                          feats[idx][None].astype(x.dtype), x)
        return self.llm.run_layers(params["llm"], x, cache)

    def logits(self, params, hidden):
        return self.llm.logits(params["llm"], hidden)

    def fuse_params(self, params: dict) -> dict:
        """Single-device serving: fuse the LLM decoder's q/k/v and gate/up
        projections (models/qwen3.fuse_decode_params, bit-identical); the
        audio encoder/adaptor are untouched."""
        from aha_tpu.models.qwen3 import fuse_decode_params

        return {**params, "llm": fuse_decode_params(params["llm"])}

    # -- loading / init -------------------------------------------------------

    def _sanm_params(self, src, p, dtype):
        wf = src.get(p + "self_attn.fsmn_block.weight", dtype)  # (D,1,K)
        return {
            "ln1": nn.take_norm(src, p + "norm1", dtype),
            "ln2": nn.take_norm(src, p + "norm2", dtype),
            "qkv": nn.take_linear(src, p + "self_attn.linear_q_k_v", dtype),
            "out": nn.take_linear(src, p + "self_attn.linear_out", dtype),
            "fsmn": {"w": jnp.transpose(wf[:, 0, :], (1, 0))},
            "fc1": nn.take_linear(src, p + "feed_forward.w_1", dtype),
            "fc2": nn.take_linear(src, p + "feed_forward.w_2", dtype),
        }

    @batched_load
    def load_params(self, src, dtype=jnp.bfloat16) -> dict:
        e, a = self.config.encoder, self.config.adaptor
        enc = "audio_encoder."
        audio = {
            "encoders0": self._sanm_params(src, enc + "encoders0.0.", dtype),
            "encoders": [self._sanm_params(src, f"{enc}encoders.{i}.", dtype)
                         for i in range(e.num_blocks - 1)],
            "tp_encoders": [self._sanm_params(src, f"{enc}tp_encoders.{i}.",
                                              dtype)
                            for i in range(e.tp_blocks)],
            "after_norm": nn.take_norm(src, enc + "after_norm", dtype),
            "tp_norm": nn.take_norm(src, enc + "tp_norm", dtype),
            "ada1": nn.take_linear(src, "audio_adaptor.linear1", dtype),
            "ada2": nn.take_linear(src, "audio_adaptor.linear2", dtype),
            "ada_blocks": [],
        }
        for i in range(a.n_layer):
            p = f"audio_adaptor.blocks.{i}."
            audio["ada_blocks"].append({
                "ln1": nn.take_norm(src, p + "norm1", dtype),
                "ln2": nn.take_norm(src, p + "norm2", dtype),
                "q": nn.take_linear(src, p + "self_attn.linear_q", dtype),
                "k": nn.take_linear(src, p + "self_attn.linear_k", dtype),
                "v": nn.take_linear(src, p + "self_attn.linear_v", dtype),
                "out": nn.take_linear(src, p + "self_attn.linear_out", dtype),
                "fc1": nn.take_linear(src, p + "feed_forward.w_1", dtype),
                "fc2": nn.take_linear(src, p + "feed_forward.w_2", dtype),
            })

        class _Pref:
            def __init__(self, src):
                self.src = src

            def get(self, name, dtype=None):
                return self.src.get(self._m(name), dtype)

            def __contains__(self, name):
                return self._m(name) in self.src

            def _m(self, name):
                if name.startswith("model."):
                    return "llm.model." + name[len("model."):]
                if name == "lm_head.weight":
                    return ("llm.lm_head.weight"
                            if "llm.lm_head.weight" in self.src else name)
                return name

        llm = self.llm.load_params(_Pref(src), dtype=dtype)
        return {"audio": audio, "llm": llm}

    def init_random(self, key, dtype=jnp.float32, scale: float = 0.02) -> dict:
        e, a = self.config.encoder, self.config.adaptor
        k1, k2 = jax.random.split(key)
        llm = self.llm.init_random(k1, dtype, scale)
        ks = iter(jax.random.split(k2, 8 * (e.num_blocks + e.tp_blocks
                                            + a.n_layer) + 16))

        def w(shape):
            return jax.random.normal(next(ks), shape, dtype) * scale

        def lin(i, o):
            return {"w": w((i, o)), "b": jnp.zeros(o, dtype)}

        def norm(d):
            return {"w": jnp.ones(d, dtype), "b": jnp.zeros(d, dtype)}

        def sanm(in_dim):
            d = e.output_size
            return {
                "ln1": norm(in_dim), "ln2": norm(d),
                "qkv": lin(in_dim, 3 * d), "out": lin(d, d),
                "fsmn": {"w": w((e.kernel_size, d))},
                "fc1": lin(d, e.linear_units), "fc2": lin(e.linear_units, d),
            }

        audio = {
            "encoders0": sanm(e.input_size),
            "encoders": [sanm(e.output_size) for _ in range(e.num_blocks - 1)],
            "tp_encoders": [sanm(e.output_size) for _ in range(e.tp_blocks)],
            "after_norm": norm(e.output_size),
            "tp_norm": norm(e.output_size),
            "ada1": lin(e.output_size * a.downsample_rate, a.ffn_dim),
            "ada2": lin(a.ffn_dim, a.llm_dim),
            "ada_blocks": [{
                "ln1": norm(a.llm_dim), "ln2": norm(a.llm_dim),
                "q": lin(a.llm_dim, a.llm_dim), "k": lin(a.llm_dim, a.llm_dim),
                "v": lin(a.llm_dim, a.llm_dim),
                "out": lin(a.llm_dim, a.llm_dim),
                "fc1": lin(a.llm_dim, a.llm_dim // 4),
                "fc2": lin(a.llm_dim // 4, a.llm_dim),
            } for _ in range(a.n_layer)],
        }
        return {"audio": audio, "llm": llm}


# Tensor-parallel partition rules (SURVEY §5.8): the Qwen3 LLM under "llm."
# carries the weights (qwen3 regexes match by substring); the SANM encoder
# and adaptor are small and stay replicated.
from aha_tpu.models.qwen3 import QWEN3_CACHE_RULES, QWEN3_PARTITION_RULES

FUN_ASR_NANO_PARTITION_RULES = QWEN3_PARTITION_RULES
FUN_ASR_NANO_CACHE_RULES = QWEN3_CACHE_RULES
FunAsrNanoModel.partition_rules = FUN_ASR_NANO_PARTITION_RULES
FunAsrNanoModel.cache_rules = FUN_ASR_NANO_CACHE_RULES
