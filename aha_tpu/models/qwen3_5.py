"""Qwen3.5 hybrid text model: GatedDeltaNet linear attention interleaved
with gated full attention.

Parity with src/models/qwen3_5/model.rs (the hardest decode path in the
reference, SURVEY §7):
- GatedDeltaNet (:116-589): in_proj_qkv → causal depthwise conv (K=4, silu)
  → per-head L2-normed q/k, beta = sigmoid(b), per-head decay
  g = −exp(A_log)·softplus(a + dt_bias); chunked delta rule for prefill and
  a recurrent step for decode; gated RMSNorm + out_proj.
- full attention (:590-760): q_proj emits query+gate, zero-centered q/k
  norms ((w+1), folded at load), partial rotary (head_dim ×
  partial_rotary_factor), sigmoid(gate) on the attention output.
- decoder (:787-1035): zero-centered input/post norms, dense SwiGLU MLP,
  layer_types per full_attention_interval.

TPU-first redesign of the chunked rule: the reference's per-row triangular
inversion loop (:340-356) is the unit-lower-triangular solve
T = (I − A)⁻¹ — one batched lax triangular_solve; chunks run under one
lax.scan carrying the (B, H, Dk, Dv) recurrent state. Functional state:
cache["conv"] (pre-conv inputs, rolling K window) and cache["rec"] (f32),
placed at the true prompt end under right-padding via prompt_len (padded
positions are masked to no-ops: g=0, beta=0, conv inputs 0).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.core import cache as kvmod
from aha_tpu.core import nn
from aha_tpu.ops.attention import (attention_decode_at, attention_prefill,
                                   attention_prefill_at)
from aha_tpu.ops.norms import rms_norm
from aha_tpu.ops.rope import gather_rope, rope_table, rotate_half
from aha_tpu.io.weights import batched_load

CHUNK = 64


@dataclasses.dataclass(frozen=True)
class Qwen3_5TextConfig:
    vocab_size: int = 151936
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    num_key_value_heads: int = 2
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000000.0
    partial_rotary_factor: float = 0.25
    max_position_embeddings: int = 262144
    tie_word_embeddings: bool = True
    attention_bias: bool = False
    full_attention_interval: int = 4
    layer_types: tuple[str, ...] = ()
    linear_num_value_heads: int = 16
    linear_num_key_heads: int = 8
    linear_key_head_dim: int = 128
    linear_value_head_dim: int = 128
    linear_conv_kernel_dim: int = 4

    def __post_init__(self):
        if not self.layer_types:
            lt = tuple(
                "full_attention"
                if (i + 1) % self.full_attention_interval == 0
                else "linear_attention"
                for i in range(self.num_hidden_layers))
            object.__setattr__(self, "layer_types", lt)

    @classmethod
    def from_dict(cls, d: dict) -> "Qwen3_5TextConfig":
        d = dict(d)
        rp = d.get("rope_parameters") or d.get("rope_scaling") or {}
        d.setdefault("rope_theta", rp.get("rope_theta", 10000000.0))
        d.setdefault("partial_rotary_factor",
                     rp.get("partial_rotary_factor", 0.25))
        if d.get("layer_types"):
            d["layer_types"] = tuple(d["layer_types"])
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    @classmethod
    def from_file(cls, model_dir: str) -> "Qwen3_5TextConfig":
        with open(os.path.join(model_dir, "config.json")) as f:
            d = json.load(f)
        return cls.from_dict(d.get("text_config", d))


# ---------------------------------------------------------------------------
# Gated delta rule (f32 throughout, like the reference's mamba_ssm_dtype)
# ---------------------------------------------------------------------------


def _l2norm(x, eps=1e-6):
    return x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + eps)


def chunk_gated_delta_rule(q, k, v, g, beta, state0, chunk: int = CHUNK):
    """Chunked prefill (torch_chunk_gated_delta_rule, model.rs:283-437).

    q/k: (B, S, H, Dk) already L2-normed; v: (B, S, H, Dv);
    g/beta: (B, S, H); state0: (B, H, Dk, Dv).  Returns (out (B,S,H,Dv),
    final state).  All f32.
    """
    B, S, H, Dk = q.shape
    Dv = v.shape[-1]
    pad = (-S) % chunk
    if pad:
        padv = lambda a: jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2))
        q, k, v, g, beta = map(padv, (q, k, v, g, beta))
    Sp = S + pad
    N = Sp // chunk
    scale = Dk ** -0.5

    def to_chunks(a):  # (B, Sp, H, D) → (N, B, H, C, D)
        return a.reshape(B, N, chunk, H, -1).transpose(1, 0, 3, 2, 4)

    qc = to_chunks(q) * scale
    kc = to_chunks(k)
    vc = to_chunks(v)
    gc = to_chunks(g[..., None])[..., 0]       # (N, B, H, C)
    bc = to_chunks(beta[..., None])[..., 0]

    gc = jnp.cumsum(gc, axis=-1)
    decay = jnp.exp(gc[..., :, None] - gc[..., None, :])
    tril = jnp.tril(jnp.ones((chunk, chunk), bool))
    tril_strict = jnp.tril(jnp.ones((chunk, chunk), bool), k=-1)
    decay_masked = jnp.where(tril, decay, 0.0)

    kb = kc * bc[..., None]
    vb = vc * bc[..., None]
    A = -jnp.einsum("nbhcd,nbhed->nbhce", kb, kc) * decay_masked
    A = jnp.where(tril_strict, A, 0.0)
    eye = jnp.eye(chunk)
    # reference's row-by-row loop == unit-lower-triangular inverse
    T = jax.lax.linalg.triangular_solve(
        eye - A, jnp.broadcast_to(eye, A.shape),
        left_side=True, lower=True, unit_diagonal=True)
    v_t = jnp.einsum("nbhce,nbhed->nbhcd", T, vb)
    k_cumdecay = jnp.einsum("nbhce,nbhed->nbhcd", T,
                            kb * jnp.exp(gc)[..., None])

    def step(state, xs):
        q_i, k_i, v_i, g_i, kcd_i, dm_i = xs
        attn = jnp.einsum("bhcd,bhed->bhce", q_i, k_i) * dm_i
        attn = jnp.where(tril, attn, 0.0)
        v_prime = jnp.einsum("bhcd,bhdv->bhcv", kcd_i, state)
        v_new = v_i - v_prime
        inter = jnp.einsum("bhcd,bhdv->bhcv",
                           q_i * jnp.exp(g_i)[..., None], state)
        out = inter + jnp.einsum("bhce,bhev->bhcv", attn, v_new)
        g_last = g_i[..., -1:]
        state = state * jnp.exp(g_last)[..., None] + jnp.einsum(
            "bhcd,bhcv->bhdv",
            k_i * jnp.exp(g_last - g_i)[..., None], v_new)
        return state, out

    state, outs = jax.lax.scan(step, state0,
                               (qc, kc, v_t, gc, k_cumdecay, decay_masked))
    out = outs.transpose(1, 0, 3, 2, 4).reshape(B, Sp, H, Dv)[:, :S]
    return out, state


def recurrent_gated_delta_rule(q, k, v, g, beta, state):
    """Single-token decode (torch_recurrent_gated_delta_rule, :438-509).
    q/k (B, 1, H, Dk) L2-normed; returns (out (B,1,H,Dv), state)."""
    Dk = q.shape[-1]
    q0, k0, v0 = q[:, 0], k[:, 0], v[:, 0]
    g0, b0 = g[:, 0], beta[:, 0]
    q0 = q0 * Dk ** -0.5
    state = state * jnp.exp(g0)[..., None, None]
    kv_mem = jnp.einsum("bhdv,bhd->bhv", state, k0)
    delta = (v0 - kv_mem) * b0[..., None]
    state = state + jnp.einsum("bhd,bhv->bhdv", k0, delta)
    out = jnp.einsum("bhdv,bhd->bhv", state, q0)
    return out[:, None], state


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Qwen3_5Config:
    """Full VL config (config.json with text_config + vision_config)."""

    text: Qwen3_5TextConfig
    vision: Any = None  # Qwen3VLVisionConfig when multimodal
    mrope_section: tuple[int, ...] = (8, 4, 4)
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652

    @classmethod
    def from_file(cls, model_dir: str) -> "Qwen3_5Config":
        with open(os.path.join(model_dir, "config.json")) as f:
            d = json.load(f)
        text_d = d.get("text_config", d)
        text = Qwen3_5TextConfig.from_dict(text_d)
        vision = None
        if "vision_config" in d:
            from aha_tpu.models.qwen3vl import Qwen3VLVisionConfig

            vision = Qwen3VLVisionConfig.from_dict(d["vision_config"])
        rp = text_d.get("rope_parameters") or text_d.get("rope_scaling") or {}
        sec = tuple(rp.get("mrope_section", (8, 4, 4)))
        return cls(text=text, vision=vision, mrope_section=sec,
                   image_token_id=d.get("image_token_id", 151655),
                   video_token_id=d.get("video_token_id", 151656),
                   vision_start_token_id=d.get("vision_start_token_id",
                                               151652))


class Qwen3_5Model:
    """Implements the CausalLM protocol. Text-only by default; pass
    `vl_config` to attach the shared Qwen3-VL deepstack vision tower
    (model.rs:1039-1475 reuses qwen3vl's visual, :20)."""

    #: decode accepts a per-slot (B,) cache["pos"] vector (continuous
    #: batching); the GatedDeltaNet conv/recurrent states are per-row and
    #: position-free, so only the full-attention layers special-case pos
    supports_slot_decode = True
    #: prefix caching / chunked prefill: from_cache suffix prefill attends
    #: over restored K/V rows AND continues the conv/rec rolling state
    #: captured in the snapshot (the engine skips exact-repeat matches for
    #: state-carrying entries — rolling state can't rewind one token)
    supports_prefix_cache = True

    def __init__(self, config: Qwen3_5TextConfig, max_rope_len: int = 8192,
                 vl_config: "Qwen3_5Config" = None):
        self.config = config
        c = config
        self.n_layers = c.num_hidden_layers
        self.layer_types = c.layer_types
        self.attn_slot, self.lin_slot = {}, {}
        a = l = 0
        for i, t in enumerate(c.layer_types):
            if t == "full_attention":
                self.attn_slot[i] = a
                a += 1
            else:
                self.lin_slot[i] = l
                l += 1
        self.n_attn, self.n_lin = a, l
        self.rotary_dim = int(c.head_dim * c.partial_rotary_factor)
        self.cos, self.sin = rope_table(
            self.rotary_dim, min(max_rope_len, c.max_position_embeddings),
            c.rope_theta)
        self.conv_dim = (2 * c.linear_num_key_heads * c.linear_key_head_dim
                         + c.linear_num_value_heads * c.linear_value_head_dim)
        self.vl = vl_config
        self.tower = None
        if vl_config is not None and vl_config.vision is not None:
            from aha_tpu.models.qwen3vl import Qwen3VLVisionTower

            self.tower = Qwen3VLVisionTower(vl_config.vision)
            # interleaved M-RoPE map over the PARTIAL rotary table
            half_t = self.cos.shape[-1]
            sec = np.zeros(half_t, np.int64)
            for axis in (1, 2):
                limit = vl_config.mrope_section[axis] * 3
                idx = np.arange(axis, min(limit, half_t), 3)
                sec[idx] = axis
            self._mrope_sel = sec

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16):
        c = self.config
        cache = kvmod.init_kv_cache(max(self.n_attn, 1), batch, max_len,
                                    c.num_key_value_heads, c.head_dim, dtype)
        cache["conv"] = jnp.zeros(
            (max(self.n_lin, 1), batch, c.linear_conv_kernel_dim,
             self.conv_dim), dtype)
        cache["rec"] = jnp.zeros(
            (max(self.n_lin, 1), batch, c.linear_num_value_heads,
             c.linear_key_head_dim, c.linear_value_head_dim), jnp.float32)
        cache["rope_delta"] = jnp.zeros((), jnp.int32)
        return cache

    # -- full attention -------------------------------------------------------

    def _full_attn(self, lp, x, cos, sin, kc, vc, slot, pos, is_prefill,
                   from_cache=False):
        c = self.config
        B, S, _ = x.shape
        H, hd = c.num_attention_heads, c.head_dim
        nkv = c.num_key_value_heads * hd
        if "qkv" in lp:
            # fused [q(+gate)|k|v] projection (fuse_decode_params): one
            # weight stream — column blocks are independent, so the split
            # is bit-identical to separate matmuls
            qkv = nn.linear(lp["qkv"], x)
            nq2 = H * 2 * hd
            qg = qkv[..., :nq2].reshape(B, S, H, 2 * hd)
            k = qkv[..., nq2:nq2 + nkv]
            v = qkv[..., nq2 + nkv:nq2 + 2 * nkv]
        else:
            qg = nn.linear(lp["q"], x).reshape(B, S, H, 2 * hd)
            k = nn.linear(lp["k"], x)
            v = nn.linear(lp["v"], x)
        q, gate = qg[..., :hd], qg[..., hd:].reshape(B, S, H * hd)
        k = k.reshape(B, S, c.num_key_value_heads, hd)
        v = v.reshape(B, S, c.num_key_value_heads, hd)
        q = rms_norm(q, lp["q_norm"]["w"], c.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"]["w"], c.rms_norm_eps)
        # partial rotary: rotate the first rotary_dim channels
        rd = self.rotary_dim
        # cos is (S, rd/2), or (B, S, rd/2) under per-slot decode positions
        head_ax = cos.ndim - 1
        c2 = jnp.expand_dims(jnp.concatenate([cos, cos], -1),
                             head_ax).astype(q.dtype)
        s2 = jnp.expand_dims(jnp.concatenate([sin, sin], -1),
                             head_ax).astype(q.dtype)
        q_rot = q[..., :rd] * c2 + rotate_half(q[..., :rd]) * s2
        k_rot = k[..., :rd] * c2 + rotate_half(k[..., :rd]) * s2
        q = jnp.concatenate([q_rot, q[..., rd:]], -1)
        k = jnp.concatenate([k_rot, k[..., rd:]], -1)
        zero = jnp.zeros((), jnp.int32)
        sl = jnp.asarray(slot, jnp.int32)
        if jnp.ndim(pos) == 0:
            kc = jax.lax.dynamic_update_slice(kc, k[None],
                                              (sl, zero, pos, zero, zero))
            vc = jax.lax.dynamic_update_slice(vc, v[None],
                                              (sl, zero, pos, zero, zero))
        else:
            # per-slot decode (continuous batching): one scatter writes each
            # slot's new row at its own position
            b_idx = jnp.arange(pos.shape[0])
            kc = kc.at[sl, b_idx, pos].set(k[:, 0])
            vc = vc.at[sl, b_idx, pos].set(v[:, 0])
        if is_prefill and from_cache:
            # suffix/chunk prefill at offset pos: attend to the previously
            # written cache rows plus causally within the chunk
            attn = attention_prefill_at(q, kc, vc, sl, pos)
        elif is_prefill:
            attn = attention_prefill(q, k, v, causal=True)
        else:
            attn = attention_decode_at(q, kc, vc, sl, pos)
        attn = attn.reshape(B, S, H * hd) * jax.nn.sigmoid(gate)
        return nn.linear(lp["o"], attn), kc, vc

    # -- linear attention -----------------------------------------------------

    def _linear_attn(self, lp, x, conv_state, rec_state, valid, prompt_len,
                     is_prefill, from_cache=False):
        """GatedDeltaNet (model.rs:510-583). valid: (S,) bool for padded
        prefill (None in decode).

        from_cache prefill continues from restored rolling state: the conv
        window's left context comes from conv_state (instead of zero
        padding) and rec_state seeds the chunked delta rule.  A FRESH
        prefill must NOT read either — pooled caches carry the previous
        request's state (kv.reset also zeroes them, belt and braces)."""
        c = self.config
        B, S, _ = x.shape
        Hk, Hv = c.linear_num_key_heads, c.linear_num_value_heads
        Dk, Dv = c.linear_key_head_dim, c.linear_value_head_dim
        K = c.linear_conv_kernel_dim
        key_dim = Hk * Dk

        if valid is not None:
            x = jnp.where(valid[None, :, None], x, 0.0)
        if "in_proj" in lp:
            # fused [qkv|z|b|a] input projection (fuse_decode_params):
            # four matmuls off the same activations become one weight
            # stream, bit-identical on split
            conv_dim = self.conv_dim
            zdim = Hv * Dv
            proj = nn.linear(lp["in_proj"], x)
            mixed = proj[..., :conv_dim]
            z = proj[..., conv_dim:conv_dim + zdim].reshape(B, S, Hv, Dv)
            base = conv_dim + zdim
            # explicit ends: quantized fusions zero-pad the output axis to
            # the kernel's 128-column grid; pad columns fall off here
            b = proj[..., base:base + Hv]
            a = proj[..., base + Hv:base + 2 * Hv]
        else:
            mixed = nn.linear(lp["in_proj_qkv"], x)  # (B, S, conv_dim)
            z = nn.linear(lp["in_proj_z"], x).reshape(B, S, Hv, Dv)
            b = nn.linear(lp["in_proj_b"], x)        # (B, S, Hv)
            a = nn.linear(lp["in_proj_a"], x)
        w = lp["conv"]["w"]                      # (K, conv_dim)

        if is_prefill:
            # left context: zeros for a fresh prompt; the restored window's
            # last K-1 inputs when continuing from stored state.  Either
            # way `padded` is (B, K-1+S, conv_dim) and the slice/window
            # arithmetic below is identical.
            left = (conv_state[:, 1:].astype(mixed.dtype) if from_cache
                    else jnp.zeros((B, K - 1, self.conv_dim), mixed.dtype))
            padded = jnp.concatenate([left, mixed], axis=1)
            conv = sum(padded[:, i:i + S, :] * w[i] for i in range(K))
            start = jnp.maximum(prompt_len - 1, 0)
            conv_state = jax.lax.dynamic_slice(
                padded, (jnp.zeros((), start.dtype), start,
                         jnp.zeros((), start.dtype)),
                (B, K, self.conv_dim))
        else:
            conv_state = jnp.concatenate([conv_state[:, 1:], mixed], axis=1)
            conv = jnp.einsum("bkd,kd->bd", conv_state, w)[:, None, :]
        mixed = jax.nn.silu(conv)

        q = mixed[..., :key_dim].reshape(B, S, Hk, Dk)
        k = mixed[..., key_dim:2 * key_dim].reshape(B, S, Hk, Dk)
        v = mixed[..., 2 * key_dim:].reshape(B, S, Hv, Dv)
        q = _l2norm(q.astype(jnp.float32))
        k = _l2norm(k.astype(jnp.float32))
        if Hv // Hk > 1:
            q = jnp.repeat(q, Hv // Hk, axis=2)
            k = jnp.repeat(k, Hv // Hk, axis=2)
        beta = jax.nn.sigmoid(b.astype(jnp.float32))
        g = -jnp.exp(lp["a_log"].astype(jnp.float32)) * jax.nn.softplus(
            a.astype(jnp.float32) + lp["dt_bias"].astype(jnp.float32))
        if valid is not None:
            # padded positions are no-ops: no decay, no write
            g = jnp.where(valid[None, :, None], g, 0.0)
            beta = jnp.where(valid[None, :, None], beta, 0.0)

        v32 = v.astype(jnp.float32)
        if is_prefill:
            state0 = (rec_state if from_cache
                      else jnp.zeros_like(rec_state))
            out, rec_state = chunk_gated_delta_rule(q, k, v32, g, beta,
                                                    state0)
        else:
            out, rec_state = recurrent_gated_delta_rule(q, k, v32, g, beta,
                                                        rec_state)
        # gated RMSNorm over Dv, silu(z) gate (Qwen3_5RMSNormGated)
        out = rms_norm(out.astype(x.dtype), lp["norm"]["w"], c.rms_norm_eps)
        out = out * jax.nn.silu(z.astype(out.dtype))
        out = out.reshape(B, S, Hv * Dv)
        return nn.linear(lp["out_proj"], out), conv_state, rec_state

    # -- CausalLM ------------------------------------------------------------

    def backbone(self, params, input_ids, cache, mm: Any = None,
                 prompt_len=None, from_cache: bool = False):
        c = self.config
        B, S = input_ids.shape
        pos = cache["pos"]
        is_prefill = S > 1
        if prompt_len is None:
            prompt_len = jnp.asarray(S, jnp.int32)
        valid = (jnp.arange(S) < prompt_len) if is_prefill else None
        x = nn.embedding(params["embed"], input_ids)
        ds = None
        vis_mask = None
        if mm is not None and self.tower is not None:
            feats, ds = self.tower.encode(params["visual"], mm)
            is_img = (input_ids == self.vl.image_token_id) | \
                     (input_ids == self.vl.video_token_id)
            vis_mask = is_img[0]
            ds_idx = jnp.clip(jnp.cumsum(vis_mask) - 1, 0, feats.shape[0] - 1)
            self._ds_idx = ds_idx
            x = jnp.where(vis_mask[None, :, None],
                          feats[ds_idx][None].astype(x.dtype), x)
            cos3, sin3 = gather_rope(self.cos, self.sin, mm["position_ids"])
            sel = jnp.asarray(self._mrope_sel)
            cos = jnp.take_along_axis(cos3, sel[None, None, :], axis=0)[0]
            sin = jnp.take_along_axis(sin3, sel[None, None, :], axis=0)[0]
            cache = {**cache, "rope_delta": mm["rope_delta"]}
        elif S == 1 or from_cache:
            # decode, or a text suffix prefill over restored state:
            # positions continue at pos (+ any restored M-RoPE delta)
            pos_eff = pos + cache.get("rope_delta", jnp.int32(0))
            if jnp.ndim(pos) == 0:
                positions = pos_eff[None] + jnp.arange(S)         # (S,)
            else:
                positions = pos_eff[:, None] + jnp.arange(S)      # (B, S)
            cos, sin = gather_rope(self.cos, self.sin, positions)
        else:
            positions = pos + jnp.arange(S)
            cos, sin = gather_rope(self.cos, self.sin, positions)
            cache = {**cache, "rope_delta": jnp.zeros((), jnp.int32)}
        kc, vc = cache["k"], cache["v"]
        conv, rec = cache["conv"], cache["rec"]
        for i, lp in enumerate(params["layers"]):
            h = rms_norm(x, lp["ln1"]["w"], c.rms_norm_eps)
            if self.layer_types[i] == "full_attention":
                s = self.attn_slot[i]
                out, kc, vc = self._full_attn(
                    lp, h, cos, sin, kc, vc, s, pos, is_prefill, from_cache)
            else:
                s = self.lin_slot[i]
                out, cs, rs = self._linear_attn(
                    lp, h, conv[s], rec[s], valid, prompt_len, is_prefill,
                    from_cache)
                conv = conv.at[s].set(cs)
                rec = rec.at[s].set(rs)
            x = x + out
            h = rms_norm(x, lp["ln2"]["w"], c.rms_norm_eps)
            x = x + nn.swiglu_mlp(lp["mlp"], h)
            if ds is not None and i < ds.shape[0]:
                inject = ds[i][self._ds_idx].astype(x.dtype)
                x = x + jnp.where(vis_mask[None, :, None], inject[None], 0.0)

        cache = {**cache, "k": kc, "v": vc, "conv": conv, "rec": rec}
        x = rms_norm(x, params["norm"]["w"], c.rms_norm_eps)
        return x, cache

    def logits(self, params, hidden):
        return nn.linear(params["lm_head"], hidden)

    # -- loading ------------------------------------------------------------

    @batched_load
    def load_params(self, src, dtype=jnp.bfloat16, prefix: str = "model.") -> dict:
        """Zero-centered norms (Qwen3_5RMSNorm stores γ−1) are folded to
        γ = w+1 at load so the forward uses plain rms_norm."""
        if f"{prefix}embed_tokens.weight" not in src and \
                "model.language_model.embed_tokens.weight" in src:
            prefix = "model.language_model."
        c = self.config

        def centered_norm(name):
            return {"w": src.get(name + ".weight", dtype) + 1.0}

        layers = []
        for i, kind in enumerate(self.layer_types):
            p = f"{prefix}layers.{i}."
            lp = {
                "ln1": centered_norm(p + "input_layernorm"),
                "ln2": centered_norm(p + "post_attention_layernorm"),
                "mlp": {
                    "gate": nn.take_linear(src, p + "mlp.gate_proj", dtype),
                    "up": nn.take_linear(src, p + "mlp.up_proj", dtype),
                    "down": nn.take_linear(src, p + "mlp.down_proj", dtype),
                },
            }
            if kind == "full_attention":
                a = p + "self_attn."
                lp.update({
                    "q": nn.take_linear(src, a + "q_proj", dtype),
                    "k": nn.take_linear(src, a + "k_proj", dtype),
                    "v": nn.take_linear(src, a + "v_proj", dtype),
                    "o": nn.take_linear(src, a + "o_proj", dtype),
                    "q_norm": centered_norm(a + "q_norm"),
                    "k_norm": centered_norm(a + "k_norm"),
                })
            else:
                la = p + "linear_attn."
                wconv = src.get(la + "conv1d.weight", dtype)  # (D, 1, K)
                lp.update({
                    "in_proj_qkv": nn.take_linear(src, la + "in_proj_qkv", dtype),
                    "in_proj_z": nn.take_linear(src, la + "in_proj_z", dtype),
                    "in_proj_b": nn.take_linear(src, la + "in_proj_b", dtype),
                    "in_proj_a": nn.take_linear(src, la + "in_proj_a", dtype),
                    "out_proj": nn.take_linear(src, la + "out_proj", dtype),
                    "conv": {"w": jnp.transpose(wconv[:, 0, :], (1, 0))},
                    "dt_bias": src.get(la + "dt_bias", jnp.float32),
                    "a_log": src.get(la + "A_log", jnp.float32),
                    # gated norm weight is NOT zero-centered (RMSNormGated)
                    "norm": nn.take_norm(src, la + "norm", dtype),
                })
            layers.append(lp)
        embed = nn.take_embedding(src, prefix + "embed_tokens", dtype)
        if c.tie_word_embeddings and "lm_head.weight" not in src:
            lm_head = {"w": embed["w"].T}
        else:
            lm_head = nn.take_linear(src, "lm_head", dtype)
        params = {
            "embed": embed,
            "layers": layers,
            "norm": {"w": src.get(prefix + "norm.weight", dtype) + 1.0},
            "lm_head": lm_head,
        }
        if self.tower is not None:
            vt = "visual." if "visual.patch_embed.proj.weight" in src \
                else "model.visual."
            params["visual"] = self.tower.load_params(src, dtype, vt)
        return params

    def init_random(self, key, dtype=jnp.float32, scale: float = 0.02) -> dict:
        c = self.config
        d = c.hidden_size
        ks = iter(jax.random.split(key, 16 * self.n_layers + 4))

        def w(shape):
            return jax.random.normal(next(ks), shape, dtype) * scale

        layers = []
        for kind in self.layer_types:
            lp = {
                "ln1": {"w": jnp.ones(d, dtype)},
                "ln2": {"w": jnp.ones(d, dtype)},
                "mlp": {"gate": {"w": w((d, c.intermediate_size))},
                        "up": {"w": w((d, c.intermediate_size))},
                        "down": {"w": w((c.intermediate_size, d))}},
            }
            if kind == "full_attention":
                H, hd = c.num_attention_heads, c.head_dim
                lp.update({
                    "q": {"w": w((d, H * hd * 2))},
                    "k": {"w": w((d, c.num_key_value_heads * hd))},
                    "v": {"w": w((d, c.num_key_value_heads * hd))},
                    "o": {"w": w((H * hd, d))},
                    "q_norm": {"w": jnp.ones(hd, dtype)},
                    "k_norm": {"w": jnp.ones(hd, dtype)},
                })
            else:
                Hv = c.linear_num_value_heads
                lp.update({
                    "in_proj_qkv": {"w": w((d, self.conv_dim))},
                    "in_proj_z": {"w": w((d, Hv * c.linear_value_head_dim))},
                    "in_proj_b": {"w": w((d, Hv))},
                    "in_proj_a": {"w": w((d, Hv))},
                    "out_proj": {"w": w((Hv * c.linear_value_head_dim, d))},
                    "conv": {"w": w((c.linear_conv_kernel_dim, self.conv_dim))},
                    "dt_bias": jnp.zeros(Hv, jnp.float32),
                    "a_log": jnp.zeros(Hv, jnp.float32),
                    "norm": {"w": jnp.ones(c.linear_value_head_dim, dtype)},
                })
            layers.append(lp)
        embed_w = w((c.vocab_size, d))
        params = {
            "embed": {"w": embed_w},
            "layers": layers,
            "norm": {"w": jnp.ones(d, dtype)},
            "lm_head": {"w": embed_w.T},
        }
        if self.tower is not None:
            params["visual"] = self.tower.init_random(next(ks), d, dtype,
                                                      scale)
        return params


# Tensor-parallel partition rules (per-layer dicts, unstacked 2-D weights).
# The GatedDeltaNet projections shard their head-major output columns; the
# depthwise conv and per-head gates shard the same axis so conv/recurrent
# state stays head-local on each shard.
QWEN3_5_PARTITION_RULES = (
    (r"layers\.\d+\.(q|k|v)\.w", (None, "tp")),
    (r"layers\.\d+\.o\.w", ("tp", None)),
    (r"mlp\.(gate|up)\.w", (None, "tp")),
    (r"mlp\.down\.w", ("tp", None)),
    (r"in_proj_(qkv|z|b|a)\.w", (None, "tp")),
    (r"out_proj\.w", ("tp", None)),
    (r"\.conv\.w", (None, "tp")),
    (r"(dt_bias|a_log)$", ("tp",)),
    (r"^embed\.w", ("tp", None)),
    (r"^lm_head\.w", (None, "tp")),
)
QWEN3_5_CACHE_RULES = (
    # axis 1 is the slot axis on every cache kind: dp shards it for
    # continuous batching (dropped automatically where B=1)
    (r"^(k|v)$", (None, "dp", None, "tp", None)),
    (r"^conv$", (None, "dp", None, "tp")),
    (r"^rec$", (None, "dp", "tp", None, None)),
)
def fuse_qwen3_5_decode_params(params: dict) -> dict:
    """Single-device decode weight fusion (see qwen3.fuse_decode_params):
    full-attention layers fuse [q(+gate)|k|v], linear-attention layers
    fuse the four input projections [qkv|z|b|a], and every MLP fuses
    [gate|up] — bit-identical splits, fewer weight streams and quant-kernel
    launches per step.  Quantized fusions zero-pad the output axis to the
    kernel's 128-column grid (b/a are only Hv wide); the block slices the
    pad columns off.  Layers arrive as a heterogeneous list, fused
    per-layer."""
    from aha_tpu.models.qwen3 import _fuse_out_axis, pad_quant_cols

    layers = params.get("layers")
    if not isinstance(layers, (list, tuple)):
        return params
    out = []
    for lp in layers:
        lp = dict(lp)
        if "q" in lp:
            fused = _fuse_out_axis([lp["q"], lp["k"], lp["v"]])
            if fused is not None:
                for k_ in ("q", "k", "v"):
                    lp.pop(k_)
                lp["qkv"] = pad_quant_cols(fused)
        if "in_proj_qkv" in lp:
            fused = _fuse_out_axis([lp["in_proj_qkv"], lp["in_proj_z"],
                                    lp["in_proj_b"], lp["in_proj_a"]])
            if fused is not None:
                for k_ in ("in_proj_qkv", "in_proj_z", "in_proj_b",
                           "in_proj_a"):
                    lp.pop(k_)
                lp["in_proj"] = pad_quant_cols(fused)
        mlp = lp.get("mlp")
        if isinstance(mlp, dict) and "gate" in mlp:
            gu = _fuse_out_axis([mlp["gate"], mlp["up"]])
            if gu is not None:
                mlp = dict(mlp)
                mlp.pop("gate")
                mlp.pop("up")
                # no pad: swiglu_mlp splits gateup in half, and pad
                # columns would land inside the up block
                mlp["gateup"] = gu
                lp["mlp"] = mlp
        out.append(lp)
    return {**params, "layers": out}


Qwen3_5Model.fuse_params = staticmethod(fuse_qwen3_5_decode_params)
Qwen3_5Model.partition_rules = QWEN3_5_PARTITION_RULES
Qwen3_5Model.cache_rules = QWEN3_5_CACHE_RULES
