"""Moss-TTS-Nano: GPT-2 global transformer + GPT-2 local transformer over
n_vq audio codebooks (delay-free frame layout).

Parity with src/models/moss_tts_nano/model.rs:
- inputs rows are (text_id, vq_0, …, vq_{n-1}); embeds = wte(text) + Σ
  audio_embeddings[c](vq_c) with pad rows masked out (:107-144).
- per frame: global GPT-2 step → local GPT-2 over [global_hidden,
  wte(text), audio_embed(c)…] emitting one token per codebook via per-VQ
  lm heads (:175-244); the text head only ever chooses between the
  assistant-slot and audio-end tokens (:146-163).
- audio sampling: temperature 0.8, top-k 25, top-p 0.95, repetition
  penalty 1.2 over the current frame (:99-102, :224-232).
- generate() returns the audio token frames; decode them to a waveform
  with aha_tpu.models.moss_audio_tokenizer.MossAudioTokenizer.decode_frames
  (the Moss LFQ codec, moss_audio_tokenizer_nano/mod.rs).

TPU notes: the global step is one jitted cache step (same KV machinery as
the text engine); the local transformer is tiny (n_vq+1 positions) and
rolls per-channel under its own small cache.  Sampling runs host-side
with a seeded numpy RNG (the reference draws from its global RNG).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core import cache as kvmod
from aha_tpu.core import nn
from aha_tpu.models.gpt2 import GPT2Config, GPT2Model
from aha_tpu.io.weights import batched_load


@dataclasses.dataclass(frozen=True)
class MossTTSConfig:
    gpt2: GPT2Config
    n_vq: int = 8
    audio_codebook_sizes: tuple[int, ...] = (1024,) * 8
    local_transformer_layers: int = 4
    audio_pad_token_id: int = 1024
    audio_assistant_slot_token_id: int = 0
    audio_end_token_id: int = 1

    @classmethod
    def from_dict(cls, d: dict) -> "MossTTSConfig":
        g = d.get("gpt2_config", d)
        names = {f.name for f in dataclasses.fields(cls)} - {"gpt2"}
        kw = {k: tuple(v) if isinstance(v, list) else v
              for k, v in d.items() if k in names}
        return cls(gpt2=GPT2Config.from_dict(g), **kw)

    @classmethod
    def from_file(cls, model_dir: str) -> "MossTTSConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            return cls.from_dict(json.load(f))


def _sample_audio_token(logits: np.ndarray, prev: list[int],
                        rng: np.random.Generator,
                        temperature: float = 0.8, top_k: int = 25,
                        top_p: float = 0.95,
                        repetition_penalty: float = 1.2) -> int:
    """common/sample.rs simple_sample semantics on one logits row."""
    logits = logits.astype(np.float64).copy()
    for t in set(prev):
        if logits[t] > 0:
            logits[t] /= repetition_penalty
        else:
            logits[t] *= repetition_penalty
    logits /= max(temperature, 1e-6)
    if top_k and top_k < len(logits):
        kth = np.partition(logits, -top_k)[-top_k]
        logits[logits < kth] = -np.inf
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    if top_p < 1.0:
        order = np.argsort(-probs)
        cum = np.cumsum(probs[order])
        cut = np.searchsorted(cum, top_p) + 1
        mask = np.zeros_like(probs)
        mask[order[:cut]] = probs[order[:cut]]
        probs = mask / mask.sum()
    return int(rng.choice(len(probs), p=probs))


class MossTTSModel:
    def __init__(self, config: MossTTSConfig):
        self.config = config
        self.transformer = GPT2Model(config.gpt2)
        local_cfg = dataclasses.replace(
            config.gpt2, n_layer=config.local_transformer_layers,
            n_positions=config.n_vq + 1)
        self.local = GPT2Model(local_cfg)

    # -- embeds (model.rs:107-144) ------------------------------------------------

    def build_inputs_embeds(self, params, input_ids):
        """input_ids (B, S, 1+n_vq) → (B, S, D)."""
        c = self.config
        x = nn.embedding(params["transformer"]["wte"], input_ids[..., 0])
        for ch in range(c.n_vq):
            ids = input_ids[..., ch + 1]
            valid = ids != c.audio_pad_token_id
            safe = jnp.where(valid, ids, 0)
            emb = nn.embedding(params["audio_embeddings"][ch], safe)
            x = x + jnp.where(valid[..., None], emb, 0.0)
        return x

    # -- generation (model.rs:175-244) ---------------------------------------------

    def _global_step(self, params, embeds, cache):
        hidden, cache = self.transformer.run_layers(params["transformer"],
                                                    embeds, cache)
        return hidden[:, -1:], kvmod.advance(cache, embeds.shape[1])

    def _local_run(self, params, embeds_seq):
        """Tiny local transformer, full forward each frame (n_vq+1 ≤ 9
        positions — cheaper than cache churn)."""
        cache = self.local.init_cache(1, self.config.n_vq + 1, jnp.float32)
        hidden, _ = self.local.run_layers(params["local_transformer"],
                                          embeds_seq, cache)
        return hidden[:, -1]

    def generate(self, params, input_ids: np.ndarray, max_frames: int = 100,
                 seed: int = 34562) -> np.ndarray:
        """input_ids (S, 1+n_vq) prompt rows → audio token frames
        (T, n_vq)."""
        c = self.config
        rng = np.random.default_rng(seed)
        S = len(input_ids)
        cache = self.transformer.init_cache(1, S + max_frames + 1,
                                            jnp.float32)
        step = jax.jit(self._global_step)
        local_run = jax.jit(self._local_run)
        rows = jnp.asarray(np.asarray(input_ids, np.int32)[None])
        frames: list[list[int]] = []
        wte = params["transformer"]["wte"]
        for _ in range(max_frames):
            embeds = self.build_inputs_embeds(params, rows)
            g_hidden, cache = step(params, embeds, cache)

            # text head: slot vs end (model.rs:146-163)
            h = local_run(params, g_hidden)
            text_logits = np.asarray(h @ params["text_lm_head"]["w"])[0]
            slot = text_logits[c.audio_assistant_slot_token_id]
            end = text_logits[c.audio_end_token_id]
            if end > slot:
                break
            text_tok = c.audio_assistant_slot_token_id

            # local rollout: one token per codebook
            seq = [g_hidden[0, 0],
                   nn.embedding(wte, jnp.asarray([text_tok]))[0]]
            frame: list[int] = []
            for ch in range(c.n_vq):
                h = local_run(params, jnp.stack(seq)[None])
                logits = np.asarray(
                    h @ params["audio_lm_heads"][ch]["w"])[0]
                tok = _sample_audio_token(logits, frame, rng)
                frame.append(tok)
                seq.append(nn.embedding(params["audio_embeddings"][ch],
                                        jnp.asarray([tok]))[0])
            frames.append(frame)
            rows = jnp.asarray(
                np.asarray([[c.audio_assistant_slot_token_id] + frame],
                           np.int32)[None])
        return np.asarray(frames, np.int32).reshape(-1, c.n_vq)

    # -- loading --------------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.float32) -> dict:
        c = self.config
        params = {
            "transformer": self.transformer.load_params(
                src, dtype, prefix="transformer."),
            "local_transformer": self._load_local(src, dtype),
            "audio_embeddings": [
                nn.take_embedding(src, f"audio_embeddings.{i}", dtype)
                for i in range(c.n_vq)],
            "text_lm_head": {"w": src.get("text_lm_head.weight", dtype).T},
            "audio_lm_heads": [
                {"w": src.get(f"audio_lm_heads.{i}.weight", dtype).T}
                for i in range(c.n_vq)],
        }
        return params

    def _load_local(self, src, dtype):
        """local transformer has no wte (GPT2Model::new_without_wte)."""
        prefix = "local_transformer."

        def conv1d(name):
            q = {"w": src.get(prefix + name + ".weight", dtype)}
            if prefix + name + ".bias" in src:
                q["b"] = src.get(prefix + name + ".bias", dtype)
            return q

        layers = []
        for i in range(self.local.n_layers):
            h = f"h.{i}."
            layers.append({
                "ln1": nn.take_norm(src, prefix + h + "ln_1", dtype),
                "ln2": nn.take_norm(src, prefix + h + "ln_2", dtype),
                "c_attn": conv1d(h + "attn.c_attn"),
                "c_proj": conv1d(h + "attn.c_proj"),
                "mlp_fc": conv1d(h + "mlp.c_fc"),
                "mlp_proj": conv1d(h + "mlp.c_proj"),
            })
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        return {
            "wpe": nn.take_embedding(src, prefix + "wpe", dtype),
            "layers": stacked,
            "ln_f": nn.take_norm(src, prefix + "ln_f", dtype),
        }

    def init_random(self, key, scale: float = 0.02) -> dict:
        c = self.config
        ks = iter(jax.random.split(key, c.n_vq * 2 + 4))

        def w(shape):
            return jax.random.normal(next(ks), shape, jnp.float32) * scale

        d = c.gpt2.n_embd
        local = self.local.init_random(next(ks), jnp.float32, scale)
        local.pop("wte")
        return {
            "transformer": self.transformer.init_random(next(ks),
                                                        jnp.float32, scale),
            "local_transformer": local,
            "audio_embeddings": [{"w": w((c.audio_codebook_sizes[i], d))}
                                 for i in range(c.n_vq)],
            "text_lm_head": {"w": w((d, c.gpt2.vocab_size))},
            "audio_lm_heads": [{"w": w((d, c.audio_codebook_sizes[i]))}
                               for i in range(c.n_vq)],
        }
