"""Qwen3-ASR: whisper-style audio encoder + Qwen3 "thinker" text decoder.

Parity with src/models/qwen3_asr/: conv2d-downsampled chunked encoder
(model.rs:85-228 — three stride-2 convs per 100-frame window, sinusoidal
PE per chunk, bidirectional transformer, proj1/gelu/proj2 into the text
hidden size), audio embeddings spliced at <|audio_pad|> tokens
(model.rs:336-361), language metadata prompt suffix and <asr_text> cleanup
(processor.rs:126-181, server/asr.rs:142).

The thinker's "ASR M-RoPE" degenerates to standard RoPE for text-only
position ids (all three axes equal), so the decoder IS Qwen3Model; the
encoder runs inside the same prefill jit — mel frames cross host→HBM once.
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
from aha_tpu.ops.attention import attention_prefill, sdpa
from aha_tpu.ops.norms import layer_norm
from aha_tpu.models.qwen3 import Qwen3Config, Qwen3Model


@dataclasses.dataclass(frozen=True)
class Qwen3ASRAudioConfig:
    d_model: int = 896
    encoder_attention_heads: int = 14
    encoder_ffn_dim: int = 3584
    encoder_layers: int = 18
    num_mel_bins: int = 128
    downsample_hidden_size: int = 480
    n_window: int = 50
    output_dim: int = 1024
    conv_chunksize: int = 500
    activation_function: str = "gelu"

    @classmethod
    def from_dict(cls, d: dict) -> "Qwen3ASRAudioConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


@dataclasses.dataclass(frozen=True)
class Qwen3ASRConfig:
    audio: Qwen3ASRAudioConfig
    text: Qwen3Config
    audio_token_id: int = 151646

    @classmethod
    def from_file(cls, model_dir: str) -> "Qwen3ASRConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            d = json.load(f)
        thinker = d.get("thinker_config", d)
        audio = Qwen3ASRAudioConfig.from_dict(thinker.get("audio_config", {}))
        text = Qwen3Config.from_dict(thinker.get("text_config", {}))
        token = (thinker.get("audio_token_id")
                 or d.get("audio_token_id") or 151646)
        return cls(audio=audio, text=text, audio_token_id=token)


def get_feat_extract_output_lengths(audio_len: int) -> int:
    """mel frames → audio tokens after the 3 stride-2 convs, per 100-frame
    chunk (processor.rs:187-195): 13 tokens per full chunk."""
    leave = audio_len % 100
    full = (audio_len // 100) * 13
    if leave > 0:
        f = (leave - 1) // 2 + 1
        f = (f - 1) // 2 + 1
        f = (f - 1) // 2 + 1
        return f + full
    return full


def _conv2d(p, x, stride=2):
    """NCHW conv, kernel 3, pad 1 (get_conv2d in model.rs:113-145)."""
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + p["b"][None, :, None, None]


class Qwen3ASRModel:
    """Implements the CausalLM protocol; mm carries the mel features."""

    def __init__(self, config: Qwen3ASRConfig, max_rope_len: int = 8192):
        self.config = config
        self.text = Qwen3Model(config.text, max_rope_len=max_rope_len)
        self.n_layers = self.text.n_layers
        a = config.audio
        from aha_tpu.ops.audio_feats import sinusoidal_pe_cat

        self.pe_chunk = jnp.asarray(sinusoidal_pe_cat(13, a.d_model))
        self.audio_head_dim = a.d_model // a.encoder_attention_heads

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16):
        return self.text.init_cache(batch, max_len, dtype)

    # -- audio encoder -------------------------------------------------------

    def encode_audio(self, ap, mel: jnp.ndarray,
                     n_valid_out: jnp.ndarray) -> jnp.ndarray:
        """mel: (1, n_mel, T) with T a multiple of 100, frames beyond the
        real length zeroed (the reference zero-pads the last chunk,
        model.rs:171-186). Returns (T//100*13, output_dim)."""
        a = self.config.audio
        _, n_mel, T = mel.shape
        assert T % (a.n_window * 2) == 0, T
        chunk = a.n_window * 2
        n_chunks = T // chunk
        # (1, n_mel, T) → (n_chunks, 1, n_mel, chunk)
        x = mel[0].T.reshape(n_chunks, chunk, n_mel).transpose(0, 2, 1)
        x = x[:, None]
        x = jax.nn.gelu(_conv2d(ap["conv1"], x))
        x = jax.nn.gelu(_conv2d(ap["conv2"], x))
        x = jax.nn.gelu(_conv2d(ap["conv3"], x))
        b, c, f, t = x.shape  # t == 13 for chunk 100
        x = x.transpose(0, 3, 1, 2).reshape(b, t, c * f)
        x = nn.linear(ap["conv_out"], x)          # (chunks, 13, d_model)
        x = x + self.pe_chunk[None].astype(x.dtype)
        x = x.reshape(1, n_chunks * t, a.d_model)

        S = x.shape[1]
        neg = jnp.finfo(jnp.float32).min
        mask = jnp.where(jnp.arange(S)[None, None, None, :] < n_valid_out,
                         0.0, neg)
        H, hd = a.encoder_attention_heads, self.audio_head_dim
        for lp in ap["layers"]:
            h = layer_norm(x, lp["ln1"]["w"], lp["ln1"].get("b"))
            q = nn.linear(lp["q"], h).reshape(1, S, H, hd)
            k = nn.linear(lp["k"], h).reshape(1, S, H, hd)
            v = nn.linear(lp["v"], h).reshape(1, S, H, hd)
            attn = sdpa(q, k, v, mask).reshape(1, S, a.d_model)
            x = x + nn.linear(lp["o"], attn)
            h = layer_norm(x, lp["ln2"]["w"], lp["ln2"].get("b"))
            x = x + nn.linear(lp["fc2"], jax.nn.gelu(nn.linear(lp["fc1"], h)))
        x = layer_norm(x, ap["ln_post"]["w"], ap["ln_post"].get("b"))
        x = jax.nn.gelu(nn.linear(ap["proj1"], x))
        x = nn.linear(ap["proj2"], x)
        return x[0]  # (S, output_dim)

    # -- CausalLM ------------------------------------------------------------

    def backbone(self, params, input_ids, cache, mm: Any = None,
                 prompt_len=None):
        x = nn.embedding(params["text"]["embed"], input_ids)
        if mm is not None:
            feats = self.encode_audio(params["audio"], mm["mel"],
                                      mm["n_out"])
            mask = input_ids == self.config.audio_token_id  # (B, S)
            idx = jnp.clip(jnp.cumsum(mask[0]) - 1, 0, feats.shape[0] - 1)
            x = jnp.where(mask[0][None, :, None],
                          feats[idx][None].astype(x.dtype), x)
        hidden, cache = self.text.run_layers(params["text"], x, cache)
        return hidden, cache

    def logits(self, params, hidden):
        return self.text.logits(params["text"], hidden)

    def fuse_params(self, params: dict) -> dict:
        """Single-device serving: fuse the text decoder's q/k/v and gate/up
        projections (models/qwen3.fuse_decode_params, bit-identical); the
        audio tower is untouched."""
        from aha_tpu.models.qwen3 import fuse_decode_params

        return {**params, "text": fuse_decode_params(params["text"])}

    # -- loading ------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.bfloat16) -> dict:
        a = self.config.audio
        at = "thinker.audio_tower."
        if at + "conv2d1.weight" not in src:
            at = "audio_tower."
        layers = []
        for i in range(a.encoder_layers):
            p = f"{at}layers.{i}."
            layers.append({
                "ln1": nn.take_norm(src, p + "self_attn_layer_norm", dtype),
                "ln2": nn.take_norm(src, p + "final_layer_norm", dtype),
                "q": nn.take_linear(src, p + "self_attn.q_proj", dtype),
                "k": nn.take_linear(src, p + "self_attn.k_proj", dtype),
                "v": nn.take_linear(src, p + "self_attn.v_proj", dtype),
                "o": nn.take_linear(src, p + "self_attn.out_proj", dtype),
                "fc1": nn.take_linear(src, p + "fc1", dtype),
                "fc2": nn.take_linear(src, p + "fc2", dtype),
            })
        audio = {
            "layers": layers,
            "ln_post": nn.take_norm(src, at + "ln_post", dtype),
            "conv_out": nn.take_linear(src, at + "conv_out", dtype),
            "proj1": nn.take_linear(src, at + "proj1", dtype),
            "proj2": nn.take_linear(src, at + "proj2", dtype),
        }
        for i in (1, 2, 3):
            audio[f"conv{i}"] = {
                "w": src.get(f"{at}conv2d{i}.weight", dtype),
                "b": src.get(f"{at}conv2d{i}.bias", dtype),
            }
        prefix = "thinker.model." if f"thinker.model.embed_tokens.weight" in src \
            else "model."

        class _Pref:
            def __init__(self, src, frm, to):
                self.src, self.frm, self.to = src, frm, to

            def get(self, name, dtype=None):
                return self.src.get(self._m(name), dtype)

            def __contains__(self, name):
                return self._m(name) in self.src

            def _m(self, name):
                if name.startswith("model."):
                    return self.frm + name[len("model."):]
                if name == "lm_head.weight":
                    return ("thinker.lm_head.weight"
                            if "thinker.lm_head.weight" in self.src else name)
                return name

        text = self.text.load_params(_Pref(src, prefix, prefix), dtype=dtype)
        return {"audio": audio, "text": text}

    def init_random(self, key, dtype=jnp.float32, scale: float = 0.02) -> dict:
        a = self.config.audio
        k1, k2 = jax.random.split(key)
        text = self.text.init_random(k1, dtype, scale)
        ks = iter(jax.random.split(k2, 10 * a.encoder_layers + 16))

        def w(shape):
            return jax.random.normal(next(ks), shape, dtype) * scale

        def lin(i, o):
            return {"w": w((i, o)), "b": jnp.zeros(o, dtype)}

        def norm(d):
            return {"w": jnp.ones(d, dtype), "b": jnp.zeros(d, dtype)}

        d = a.d_model
        layers = [{
            "ln1": norm(d), "ln2": norm(d),
            "q": lin(d, d), "k": lin(d, d), "v": lin(d, d), "o": lin(d, d),
            "fc1": lin(d, a.encoder_ffn_dim), "fc2": lin(a.encoder_ffn_dim, d),
        } for _ in range(a.encoder_layers)]
        h = a.downsample_hidden_size
        f_after = ((a.num_mel_bins + 1) // 2 + 1) // 2
        f_after = (f_after + 1) // 2
        audio = {
            "layers": layers,
            "ln_post": norm(d),
            "conv_out": {"w": w((h * f_after, d))},
            "proj1": lin(d, d),
            "proj2": lin(d, a.output_dim),
            "conv1": {"w": w((h, 1, 3, 3)), "b": jnp.zeros(h, dtype)},
            "conv2": {"w": w((h, h, 3, 3)), "b": jnp.zeros(h, dtype)},
            "conv3": {"w": w((h, h, 3, 3)), "b": jnp.zeros(h, dtype)},
        }
        return {"audio": audio, "text": text}


# Tensor-parallel partition rules (SURVEY §5.8).  The thinker decoder uses
# the Qwen3 rules (matched under the "text." prefix); the whisper-style
# audio encoder shards its attention projections and FFN over tp (the
# reshape to 14 heads is not tp-aligned — GSPMD inserts the resharding it
# needs; numerics are unchanged).
from aha_tpu.models.qwen3 import QWEN3_CACHE_RULES, QWEN3_PARTITION_RULES

QWEN3_ASR_PARTITION_RULES = (
    *QWEN3_PARTITION_RULES,
    (r"audio\.layers\.\d+\.(q|k|v|fc1)\.w", (None, "tp")),
    (r"audio\.layers\.\d+\.(q|k|v|fc1)\.b", ("tp",)),
    (r"audio\.layers\.\d+\.(o|fc2)\.w", ("tp", None)),
)
QWEN3_ASR_CACHE_RULES = QWEN3_CACHE_RULES
Qwen3ASRModel.partition_rules = QWEN3_ASR_PARTITION_RULES
Qwen3ASRModel.cache_rules = QWEN3_ASR_CACHE_RULES
