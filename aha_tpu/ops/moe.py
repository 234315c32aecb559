"""Mixture-of-experts FFN for TPU.

Reference semantics: deepseek_ocr/model.rs:764-934 (MoEGate softmax +
greedy top-k + norm_topk_prob + routed_scaling_factor; moe_infer gathers
tokens per hit expert and index-adds the weighted outputs back).

TPU-first design: instead of the reference's host-side nonzero/index_select
loop (data-dependent shapes — untraceable under jit), tokens are dispatched
into a fixed (experts, capacity, dim) buffer with scatter-add, every expert
runs as one batched einsum over its capacity slots (MXU-friendly, static
shapes), and results are gathered back by slot index.  With capacity >=
max tokens routed to any expert this is numerically exact; serving uses a
2x-average capacity with an overflow slot that is sliced off (the GShard
recipe).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def moe_gate(gate_w: jnp.ndarray, x: jnp.ndarray, top_k: int, *,
             scoring: str = "softmax", norm_topk_prob: bool = False,
             routed_scaling_factor: float = 1.0
             ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(weights (S, K) f32, expert indices (S, K) i32).

    Matches MoEGate::forward (model.rs:798-832): fp32 scores, greedy top-k,
    optional weight normalisation, scaling factor.
    """
    logits = x.astype(jnp.float32) @ gate_w.astype(jnp.float32)
    if scoring == "softmax":
        scores = jax.nn.softmax(logits, axis=-1)
    elif scoring == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        raise ValueError(f"unsupported MoE scoring function {scoring}")
    topw, topi = jax.lax.top_k(scores, top_k)
    if top_k > 1 and norm_topk_prob:
        topw = topw / (topw.sum(-1, keepdims=True) + 1e-20)
    topw = topw * routed_scaling_factor
    return topw, topi.astype(jnp.int32)


def default_capacity(n_tokens: int, top_k: int, n_experts: int,
                     factor: float = 4.0) -> int:
    """Per-expert slot count: `factor`× the average load, capped at S."""
    avg = n_tokens * top_k / n_experts
    return max(top_k, min(n_tokens, math.ceil(factor * avg)))


def moe_ffn(p: dict, x: jnp.ndarray, top_k: int, *,
            scoring: str = "softmax", norm_topk_prob: bool = False,
            routed_scaling_factor: float = 1.0,
            capacity: int | None = None) -> jnp.ndarray:
    """Routed experts + shared experts over (S, D) tokens.

    p = {"gate": {"w": (D, E)},
         "experts": {"gate"/"up": {"w": (E, D, F)}, "down": {"w": (E, F, D)}},
         "shared": {"gate"/"up"/"down": ...}}  (shared optional)
    """
    S, D = x.shape
    E = p["gate"]["w"].shape[1]
    C = capacity if capacity is not None else default_capacity(S, top_k, E)

    topw, topi = moe_gate(p["gate"]["w"], x, top_k, scoring=scoring,
                          norm_topk_prob=norm_topk_prob,
                          routed_scaling_factor=routed_scaling_factor)

    flat_e = topi.reshape(-1)                                   # (S*K,)
    onehot = jax.nn.one_hot(flat_e, E, dtype=jnp.int32)         # (S*K, E)
    pos = jnp.cumsum(onehot, axis=0) - 1
    slot = jnp.take_along_axis(pos, flat_e[:, None], 1)[:, 0]   # (S*K,)
    overflow = slot >= C
    slot_c = jnp.minimum(slot, C)                               # C = spill row

    x_rep = jnp.broadcast_to(x[:, None], (S, top_k, D)).reshape(S * top_k, D)
    xe = jnp.zeros((E, C + 1, D), x.dtype).at[flat_e, slot_c].add(x_rep)
    xe = xe[:, :C]                                              # (E, C, D)

    ew = p["experts"]
    g = jnp.einsum("ecd,edf->ecf", xe, ew["gate"]["w"])
    u = jnp.einsum("ecd,edf->ecf", xe, ew["up"]["w"])
    h = jnp.einsum("ecf,efd->ecd", jax.nn.silu(g) * u, ew["down"]["w"])

    h_flat = h.reshape(E * C, D)
    gidx = jnp.clip(flat_e * C + slot, 0, E * C - 1)
    out_sk = jnp.where(overflow[:, None], 0.0, h_flat[gidx])
    out = (out_sk.reshape(S, top_k, D)
           * topw[..., None].astype(x.dtype)).sum(axis=1)

    if "shared" in p:
        sh = p["shared"]
        out = out + (jax.nn.silu(x @ sh["gate"]["w"]) * (x @ sh["up"]["w"])
                     ) @ sh["down"]["w"]
    return out
