"""GLM-ASR-Nano: conv-downsampled transformer audio encoder + Llama decoder.

Parity with src/models/glm_asr_nano/:
- encoder (model.rs:170-232): conv1 (k3 s1 p1) gelu → conv2 (k3 s2 p1) gelu
  → transformer layers with partial rotary (head_dim × partial_rotary_factor)
  and LayerNorm pre-norms → final LayerNorm
- 4-frame merge into intermediate_size, TwoLinearMLP projector into the
  text hidden size (model.rs:233-260)
- audio chunked into 30 s windows, whisper mel per window; valid token count
  per window from the conv/merge length formula (processor.rs:187-204)
- decoder: the shared LlamaModel; audio embeds spliced at audio_token_id
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.io.weights import batched_load
from aha_tpu.core import nn
from aha_tpu.models.llama import LlamaConfig, LlamaModel
from aha_tpu.ops.attention import sdpa
from aha_tpu.ops.norms import layer_norm
from aha_tpu.ops.rope import apply_partial_rope, rope_table


@dataclasses.dataclass(frozen=True)
class GlmAsrAudioConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    num_key_value_heads: int = 12
    head_dim: int = 64
    num_mel_bins: int = 128
    partial_rotary_factor: float = 0.5
    rope_theta: float = 10000.0

    @classmethod
    def from_dict(cls, d: dict) -> "GlmAsrAudioConfig":
        d = dict(d)
        rp = d.get("rope_parameters") or {}
        d.setdefault("rope_theta", rp.get("rope_theta", 10000.0))
        if "partial_rotary_factor" not in d:
            d["partial_rotary_factor"] = rp.get("partial_rotary_factor", 0.5)
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


@dataclasses.dataclass(frozen=True)
class GlmAsrNanoConfig:
    audio: GlmAsrAudioConfig
    text: LlamaConfig
    audio_token_id: int = 59260
    merge_factor: int = 4

    @classmethod
    def from_file(cls, model_dir: str) -> "GlmAsrNanoConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            d = json.load(f)
        audio = GlmAsrAudioConfig.from_dict(d.get("audio_config", {}))
        td = dict(d.get("text_config", d))
        rp = td.get("rope_parameters") or {}
        td.setdefault("rope_theta", rp.get("rope_theta", 10000.0))
        text = LlamaConfig.from_dict(td)
        return cls(audio=audio, text=text,
                   audio_token_id=d.get("audio_token_id", 59260))


def audio_token_length(mel_frames: int, merge_factor: int = 4) -> int:
    """mel frames → spliced token count (processor.rs:187-204)."""
    l1 = mel_frames            # k3 s1 p1
    l2 = (l1 - 1) // 2 + 1     # k3 s2 p1
    return (l2 - merge_factor) // merge_factor + 1


class GlmAsrNanoModel:
    """Implements the CausalLM protocol; mm = {mel (nw, n_mel, F),
    gather (n_tok,) indices into the flattened window tokens}."""

    def __init__(self, config: GlmAsrNanoConfig, max_rope_len: int = 8192):
        self.config = config
        self.text = LlamaModel(config.text, max_rope_len=max_rope_len)
        self.n_layers = self.text.n_layers
        a = config.audio
        self.rotary_dim = int(a.head_dim * a.partial_rotary_factor)
        self.a_cos, self.a_sin = rope_table(self.rotary_dim, 4096,
                                            a.rope_theta)

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16):
        return self.text.init_cache(batch, max_len, dtype)

    # -- audio encoder ---------------------------------------------------------

    def encode_audio(self, ap, mel: jnp.ndarray) -> jnp.ndarray:
        """(nw, n_mel, F) → (nw * F/8, text_hidden) flattened window tokens."""
        a = self.config.audio
        dt = ap["conv1"]["w"].dtype
        x = jax.lax.conv_general_dilated(
            mel.astype(dt), ap["conv1"]["w"], (1,), ((1, 1),),
            dimension_numbers=("NCH", "OIH", "NCH")) + ap["conv1"]["b"][None, :, None]
        x = jax.nn.gelu(x)
        x = jax.lax.conv_general_dilated(
            x, ap["conv2"]["w"], (2,), ((1, 1),),
            dimension_numbers=("NCH", "OIH", "NCH")) + ap["conv2"]["b"][None, :, None]
        x = jax.nn.gelu(x)
        x = x.transpose(0, 2, 1)  # (nw, T, hidden)
        nw, T, _ = x.shape
        cos, sin = self.a_cos[:T], self.a_sin[:T]
        H, hd = a.num_attention_heads, a.head_dim
        for lp in ap["layers"]:
            h = layer_norm(x, lp["ln1"]["w"], lp["ln1"].get("b"))
            q = nn.linear(lp["q"], h).reshape(nw, T, H, hd)
            k = nn.linear(lp["k"], h).reshape(nw, T, a.num_key_value_heads, hd)
            v = nn.linear(lp["v"], h).reshape(nw, T, a.num_key_value_heads, hd)
            q, k = apply_partial_rope(q, k, cos, sin, self.rotary_dim)
            attn = sdpa(q, k, v, None).reshape(nw, T, H * hd)
            x = x + nn.linear(lp["o"], attn)
            h = layer_norm(x, lp["ln2"]["w"], lp["ln2"].get("b"))
            x = x + nn.linear(lp["fc2"], jax.nn.gelu(nn.linear(lp["fc1"], h)))
        x = layer_norm(x, ap["norm"]["w"], ap["norm"].get("b"))
        m = self.config.merge_factor
        x = x.reshape(nw, T // m, m * a.hidden_size)
        x = jax.nn.gelu(nn.linear(ap["proj1"], x))
        x = nn.linear(ap["proj2"], x)
        return x.reshape(nw * (T // m), -1)

    # -- CausalLM ------------------------------------------------------------

    def backbone(self, params, input_ids, cache, mm: Any = None,
                 prompt_len=None):
        x = nn.embedding(params["text"]["embed"], input_ids)
        if mm is not None:
            feats = self.encode_audio(params["audio"], mm["mel"])
            feats = feats[mm["gather"]]  # valid tokens, host-ordered
            mask = input_ids == self.config.audio_token_id
            idx = jnp.clip(jnp.cumsum(mask[0]) - 1, 0, feats.shape[0] - 1)
            x = jnp.where(mask[0][None, :, None],
                          feats[idx][None].astype(x.dtype), x)
        return self.text.run_layers(params["text"], x, cache)

    def logits(self, params, hidden):
        return self.text.logits(params["text"], hidden)

    # -- loading ------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.bfloat16) -> dict:
        a = self.config.audio
        at = "audio_tower." if "audio_tower.conv1.weight" in src \
            else "model.audio_tower."
        audio = {
            "conv1": {"w": src.get(at + "conv1.weight", dtype),
                      "b": src.get(at + "conv1.bias", dtype)},
            "conv2": {"w": src.get(at + "conv2.weight", dtype),
                      "b": src.get(at + "conv2.bias", dtype)},
            "norm": nn.take_norm(src, at + "norm", dtype),
            "layers": [],
        }
        for i in range(a.num_hidden_layers):
            p = f"{at}layers.{i}."
            audio["layers"].append({
                "ln1": nn.take_norm(src, p + "input_layernorm", dtype),
                "ln2": nn.take_norm(src, p + "post_attention_layernorm", dtype),
                "q": nn.take_linear(src, p + "self_attn.q_proj", dtype),
                "k": nn.take_linear(src, p + "self_attn.k_proj", dtype),
                "v": nn.take_linear(src, p + "self_attn.v_proj", dtype),
                "o": nn.take_linear(src, p + "self_attn.o_proj", dtype),
                "fc1": nn.take_linear(src, p + "mlp.fc1", dtype),
                "fc2": nn.take_linear(src, p + "mlp.fc2", dtype),
            })
        mp = "multi_modal_projector." \
            if "multi_modal_projector.linear_1.weight" in src \
            else "model.multi_modal_projector."
        audio["proj1"] = nn.take_linear(src, mp + "linear_1", dtype)
        audio["proj2"] = nn.take_linear(src, mp + "linear_2", dtype)
        lm = "language_model." if "language_model.model.embed_tokens.weight" \
            in src else "model.language_model."

        class _Pref:
            def __init__(self, src, frm):
                self.src, self.frm = src, frm

            def get(self, name, dtype=None):
                return self.src.get(self._m(name), dtype)

            def __contains__(self, name):
                return self._m(name) in self.src

            def _m(self, name):
                if name == "lm_head.weight":
                    cand = self.frm + "lm_head.weight"
                    return cand if cand in self.src else name
                return self.frm + name

        text = self.text.load_params(_Pref(src, lm), dtype=dtype)
        return {"audio": audio, "text": text}

    def init_random(self, key, dtype=jnp.float32, scale: float = 0.02) -> dict:
        a = self.config.audio
        k1, k2 = jax.random.split(key)
        text = self.text.init_random(k1, dtype, scale)
        ks = iter(jax.random.split(k2, 8 * a.num_hidden_layers + 8))

        def w(shape):
            return jax.random.normal(next(ks), shape, dtype) * scale

        def lin(i, o):
            return {"w": w((i, o)), "b": jnp.zeros(o, dtype)}

        def norm(d):
            return {"w": jnp.ones(d, dtype), "b": jnp.zeros(d, dtype)}

        d = a.hidden_size
        audio = {
            "conv1": {"w": w((d, a.num_mel_bins, 3)), "b": jnp.zeros(d, dtype)},
            "conv2": {"w": w((d, d, 3)), "b": jnp.zeros(d, dtype)},
            "norm": norm(d),
            "proj1": lin(self.config.merge_factor * d,
                         2 * self.config.text.hidden_size),
            "proj2": lin(2 * self.config.text.hidden_size,
                         self.config.text.hidden_size),
            "layers": [{
                "ln1": norm(d), "ln2": norm(d),
                "q": lin(d, a.num_attention_heads * a.head_dim),
                "k": lin(d, a.num_key_value_heads * a.head_dim),
                "v": lin(d, a.num_key_value_heads * a.head_dim),
                "o": lin(a.num_attention_heads * a.head_dim, d),
                "fc1": lin(d, a.intermediate_size),
                "fc2": lin(a.intermediate_size, d),
            } for _ in range(a.num_hidden_layers)],
        }
        return {"audio": audio, "text": text}


# Tensor-parallel partition rules (SURVEY §5.8): the llama decoder under
# "text." carries the weights; the conv+transformer audio encoder is small
# and stays replicated.
from aha_tpu.models.llama import LLAMA_CACHE_RULES, LLAMA_PARTITION_RULES

GLM_ASR_NANO_PARTITION_RULES = LLAMA_PARTITION_RULES
GLM_ASR_NANO_CACHE_RULES = LLAMA_CACHE_RULES
GlmAsrNanoModel.partition_rules = GLM_ASR_NANO_PARTITION_RULES
GlmAsrNanoModel.cache_rules = GLM_ASR_NANO_CACHE_RULES
