"""One-launch-per-layer fused decode kernel (bf16 dense path).

Why this exists (r5 decode-step profile, Qwen3-0.6B on one v5e): the
XLA decode backbone streams weights at ~620 GB/s and the decode
attention kernel pays ~10 us of launch fixed cost per layer — together
1.69 ms of a 2.2 ms step.  Per-matmul Pallas kernels cannot beat that
(their ~4-10 us launch cost eats the 738-vs-620 GB/s streaming edge;
measured in scripts/exp_fused_layer.py), so the only structural win is
ONE Pallas launch per decoder layer that:

  * streams ALL the layer's weight bytes (qkv | o | gate-up | down)
    through a small rotating VMEM staging pool with manual async DMA,
    overlapping the M=8 MXU dots (decode compute is trivial), and
  * computes the whole layer in VMEM: rms-norms, q/k head norms, RoPE,
    the live-window attention read, residuals, and the SwiGLU — so the
    per-layer attention launch disappears entirely.

Design notes:
  * B=1, S=1 (single-stream decode) only; the batched/spec paths keep
    the existing per-op kernels.
  * The KV cache is read through a static `window` (the engine already
    bounds decode dispatches with ops.attention.decode_window); rows at
    indices >= pos are masked, the current token's k/v never round-trip
    through HBM.  The new cache row is RETURNED (k_row, v_row) and the
    caller writes it with one dynamic_update_slice per layer — keeping
    cache donation semantics in XLA.
  * Weights arrive STACKED (L, ...) in HBM (pl.ANY); the layer index is
    a scalar-prefetch argument, so one compiled kernel serves the whole
    lax.scan over layers.

Reference behavior being reimplemented the TPU way: one decoder block of
candle's qwen3 (reference src/models/qwen3/mod.rs: attention + MLP with
RMSNorm/rope), redesigned as a single streaming kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_decode_layer", "fused_layer_supported"]

import os

#: staging chunk columns and pipeline depth (measured sweep,
#: scripts/exp_fused_layer.py)
def _cn() -> int:
    return int(os.environ.get("AHA_FUSED_CN", "1024"))


def _nbuf() -> int:
    return int(os.environ.get("AHA_FUSED_NBUF", "2"))

#: largest static attention window the kernel keeps in VMEM (2x this in
#: bf16 = 8 MB of window buffers; deeper decodes use the flash kernels)
MAX_WINDOW = 2048


def _rms(x, w, eps):
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * w


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _fused_layer_kernel(meta_ref, x_ref, cos_ref, sin_ref,
                        wqkv, wo, wgu, wdn,
                        ln1_ref, ln2_ref, qn_ref, kn_ref,
                        k_stack, v_stack,
                        xo_ref, krow_ref, vrow_ref,
                        stage, kwin, vwin, qkv_acc, h_acc, attn_buf,
                        wsem, ksem, vsem, *,
                        H: int, NQ: int, NKV: int, NI: int,
                        hq: int, hkv: int, D: int, window: int,
                        eps: float, cn: int, nbuf: int):
    li = meta_ref[0]
    pos = meta_ref[1]
    NQKV = NQ + 2 * NKV
    G = hq // hkv
    scale = D ** -0.5

    # -- window fetch: dedicated buffers, started first ----------------------
    kdma = pltpu.make_async_copy(
        k_stack.at[li, 0, pl.ds(0, window)], kwin, ksem)
    vdma = pltpu.make_async_copy(
        v_stack.at[li, 0, pl.ds(0, window)], vwin, vsem)
    kdma.start()
    vdma.start()

    # -- weight chunk plan ----------------------------------------------------
    # kinds: 0 qkv N-chunk, 1 o K-chunk, 2 gate-up N-chunk, 3 down K-chunk
    plan = ([(wqkv, j, 0) for j in range(NQKV // cn)]
            + [(wo, j, 1) for j in range(NQ // H)]
            + [(wgu, j, 2) for j in range(2 * NI // cn)]
            + [(wdn, j, 3) for j in range(NI // H)])

    def make_dma(i, slot):
        src, j, kind = plan[i]
        if kind in (0, 2):
            sl = src.at[li, :, pl.ds(j * cn, cn)]
            return pltpu.make_async_copy(sl, stage.at[slot, :, :cn],
                                         wsem.at[slot])
        sl = src.at[li, pl.ds(j * H, H), :]
        return pltpu.make_async_copy(sl, stage.at[slot, :, :src.shape[2]],
                                     wsem.at[slot])

    dmas = {}
    for i0 in range(min(nbuf, len(plan))):
        dmas[i0] = make_dma(i0, i0)
        dmas[i0].start()

    x = x_ref[...].astype(jnp.float32)            # (8, H), row 0 live
    h1 = _rms(x, ln1_ref[...].astype(jnp.float32), eps).astype(jnp.bfloat16)

    attn_done = False
    for i, (src, j, kind) in enumerate(plan):
        slot = i % nbuf
        dmas[i].wait()
        if kind == 0:
            w = stage[slot, :, :cn]
            qkv_acc[:, j * cn:(j + 1) * cn] = jax.lax.dot(
                h1, w, preferred_element_type=jnp.float32)
        elif kind == 1:
            if not attn_done:
                kdma.wait()
                vdma.wait()
                _attention(qkv_acc, cos_ref, sin_ref, qn_ref, kn_ref,
                           kwin, vwin, attn_buf, krow_ref, vrow_ref,
                           pos, NQ, NKV, hq, hkv, D, G, window, eps, scale)
                attn_done = True
            w = stage[slot, :, :H]
            a = attn_buf[:, j * H:(j + 1) * H].astype(jnp.bfloat16)
            part = jax.lax.dot(a, w, preferred_element_type=jnp.float32)
            if j == 0:
                h_acc[:, :H] = part
            else:
                h_acc[:, :H] += part
        elif kind == 2:
            if j == 0:
                # close the attention residual, open the MLP
                x2 = x + h_acc[:, :H]
                xo_ref[...] = x2.astype(xo_ref.dtype)
                h2 = _rms(x2, ln2_ref[...].astype(jnp.float32), eps)
                qkv_acc[:, :H] = h2      # reuse scratch: normed MLP input
            h2b = qkv_acc[:, :H].astype(jnp.bfloat16)
            w = stage[slot, :, :cn]
            h_acc[:, H + j * cn:H + (j + 1) * cn] = jax.lax.dot(
                h2b, w, preferred_element_type=jnp.float32)
        else:
            if j == 0:
                g = h_acc[:, H:H + NI]
                u = h_acc[:, H + NI:H + 2 * NI]
                act = g * (1.0 / (1.0 + jnp.exp(-g))) * u
                qkv_acc[:, :NI] = act    # reuse scratch: SwiGLU activation
            w = stage[slot, :, :H]
            ab = qkv_acc[:, j * H:(j + 1) * H].astype(jnp.bfloat16)
            part = jax.lax.dot(ab, w, preferred_element_type=jnp.float32)
            if j == 0:
                h_acc[:, :H] = part
            else:
                h_acc[:, :H] += part
        if i + nbuf < len(plan):
            dmas[i + nbuf] = make_dma(i + nbuf, slot)
            dmas[i + nbuf].start()

    xo_ref[...] = (xo_ref[...].astype(jnp.float32)
                   + h_acc[:, :H]).astype(xo_ref.dtype)


def _attention(qkv_acc, cos_ref, sin_ref, qn_ref, kn_ref, kwin, vwin,
               attn_buf, krow_ref, vrow_ref, pos,
               NQ, NKV, hq, hkv, D, G, window, eps, scale):
    """In-VMEM decode attention over the fetched window + the fresh row."""
    cos = cos_ref[...].astype(jnp.float32)        # (1, D)
    sin = sin_ref[...].astype(jnp.float32)
    q = qkv_acc[0:1, :NQ].reshape(hq, D)
    k = qkv_acc[0:1, NQ:NQ + NKV].reshape(hkv, D)
    v = qkv_acc[0:1, NQ + NKV:NQ + 2 * NKV].reshape(hkv, D)

    qn = qn_ref[...].astype(jnp.float32)          # (1, D)
    kn = kn_ref[...].astype(jnp.float32)
    q = _rms(q, qn, eps)
    k = _rms(k, kn, eps)
    q = (q * cos + _rotate_half(q) * sin).astype(jnp.bfloat16)
    k = (k * cos + _rotate_half(k) * sin).astype(jnp.bfloat16)
    vb = v.astype(jnp.bfloat16)
    krow_ref[...] = k
    vrow_ref[...] = vb

    kw = kwin[...]                                 # (window, hkv*D) bf16
    vw = vwin[...]
    in_range = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1) < pos
    for h in range(hkv):
        kh = kw[:, h * D:(h + 1) * D]
        vh = vw[:, h * D:(h + 1) * D]
        qh = q[h * G:(h + 1) * G, :]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(in_range, s, -1e30)
        # current-token score on the VPU: a (G,128)x(1,128) MXU dot trips a
        # Mosaic bf16->f32 broadcast verification bug on this stack
        s_cur = jnp.sum(qh.astype(jnp.float32) * k[h:h + 1, :].astype(
            jnp.float32), axis=1, keepdims=True) * scale   # (G, 1)
        m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_cur)
        p = jnp.exp(s - m)
        p_cur = jnp.exp(s_cur - m)
        l = jnp.sum(p, axis=1, keepdims=True) + p_cur
        o = jax.lax.dot_general(p.astype(jnp.bfloat16), vh,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o = (o + p_cur * vb[h:h + 1, :].astype(jnp.float32)) / l
        # broadcast over the 8 padded rows: downstream dots read all rows
        attn_buf[:, h * G * D:(h + 1) * G * D] = jnp.broadcast_to(
            o.reshape(1, G * D), (attn_buf.shape[0], G * D))


# ---------------------------------------------------------------------------
# Whole-stack kernel: ONE launch per decode step, grid over layers.
#
# The per-layer kernel above still pays 28 Pallas launches (~5 us each)
# plus per-layer XLA glue (norm-row gathers, two cache update-slices,
# meta packing) — measured ~0.4 ms of a ~2.2 ms step.  Folding the layer
# scan into a (L,) grid removes both: the staging pool persists across
# grid steps, the hidden state rides a VMEM scratch, norms live whole in
# VMEM (L x H bf16 = 57 KB), and the new cache rows are DMA'd straight
# into the ALIASED cache outputs — in-place, preserving donation.
# ---------------------------------------------------------------------------


def _fused_stack_kernel(meta_ref, x_ref, cos_ref, sin_ref,
                        wqkv, wo, wgu, wdn,
                        ln1_ref, ln2_ref, qn_ref, kn_ref,
                        k_in, v_in,
                        xo_ref, krow_ref, vrow_ref,
                        stage, kwin, vwin, qkv_acc, h_acc, attn_buf,
                        xbuf,
                        wsem, ksem, vsem, *,
                        H: int, NQ: int, NKV: int, NI: int,
                        hq: int, hkv: int, D: int, window: int,
                        eps: float, cn: int, nbuf: int, n_layers: int):
    li = pl.program_id(0)
    pos = meta_ref[0]
    NQKV = NQ + 2 * NKV
    G = hq // hkv
    scale = D ** -0.5
    HD = hkv * D

    @pl.when(li == 0)
    def _first():
        xbuf[...] = x_ref[...].astype(jnp.float32)

    kdma = pltpu.make_async_copy(
        k_in.at[li, 0, pl.ds(0, window)], kwin, ksem)
    vdma = pltpu.make_async_copy(
        v_in.at[li, 0, pl.ds(0, window)], vwin, vsem)
    kdma.start()
    vdma.start()

    plan = ([(wqkv, j, 0) for j in range(NQKV // cn)]
            + [(wo, j, 1) for j in range(NQ // H)]
            + [(wgu, j, 2) for j in range(2 * NI // cn)]
            + [(wdn, j, 3) for j in range(NI // H)])

    def make_dma(i, slot):
        src, j, kind = plan[i]
        if kind in (0, 2):
            sl = src.at[li, :, pl.ds(j * cn, cn)]
            return pltpu.make_async_copy(sl, stage.at[slot, :, :cn],
                                         wsem.at[slot])
        sl = src.at[li, pl.ds(j * H, H), :]
        return pltpu.make_async_copy(sl, stage.at[slot, :, :src.shape[2]],
                                     wsem.at[slot])

    dmas = {}
    for i0 in range(min(nbuf, len(plan))):
        dmas[i0] = make_dma(i0, i0)
        dmas[i0].start()

    x = xbuf[...]                                  # (8, H) f32 carried state
    # norm stacks arrive f32: Mosaic cannot dynamically index the 2-row
    # sublane packing of a bf16 (L, H) array ("index ... multiple of 2")
    ln1 = ln1_ref[li][None]
    ln2 = ln2_ref[li][None]
    h1 = _rms(x, ln1, eps).astype(jnp.bfloat16)

    attn_done = False
    for i, (src, j, kind) in enumerate(plan):
        slot = i % nbuf
        dmas[i].wait()
        if kind == 0:
            w = stage[slot, :, :cn]
            qkv_acc[:, j * cn:(j + 1) * cn] = jax.lax.dot(
                h1, w, preferred_element_type=jnp.float32)
        elif kind == 1:
            if not attn_done:
                kdma.wait()
                vdma.wait()
                _attention_rows(qkv_acc, cos_ref, sin_ref,
                                qn_ref[li][None], kn_ref[li][None],
                                kwin, vwin, attn_buf, krow_ref, vrow_ref,
                                pos, NQ, NKV, hq, hkv, D, G, window, eps,
                                scale)
                attn_done = True
            w = stage[slot, :, :H]
            a = attn_buf[:, j * H:(j + 1) * H].astype(jnp.bfloat16)
            part = jax.lax.dot(a, w, preferred_element_type=jnp.float32)
            if j == 0:
                h_acc[:, :H] = part
            else:
                h_acc[:, :H] += part
        elif kind == 2:
            if j == 0:
                x2 = x + h_acc[:, :H]
                xbuf[...] = x2
                h2 = _rms(x2, ln2, eps)
                qkv_acc[:, :H] = h2
            h2b = qkv_acc[:, :H].astype(jnp.bfloat16)
            w = stage[slot, :, :cn]
            h_acc[:, H + j * cn:H + (j + 1) * cn] = jax.lax.dot(
                h2b, w, preferred_element_type=jnp.float32)
        else:
            if j == 0:
                g = h_acc[:, H:H + NI]
                u = h_acc[:, H + NI:H + 2 * NI]
                act = g * (1.0 / (1.0 + jnp.exp(-g))) * u
                qkv_acc[:, :NI] = act
            w = stage[slot, :, :H]
            ab = qkv_acc[:, j * H:(j + 1) * H].astype(jnp.bfloat16)
            part = jax.lax.dot(ab, w, preferred_element_type=jnp.float32)
            if j == 0:
                h_acc[:, :H] = part
            else:
                h_acc[:, :H] += part
        if i + nbuf < len(plan):
            dmas[i + nbuf] = make_dma(i + nbuf, slot)
            dmas[i + nbuf].start()

    x3 = xbuf[...] + h_acc[:, :H]
    xbuf[...] = x3
    xo_ref[...] = x3.astype(xo_ref.dtype)


def _attention_rows(qkv_acc, cos_ref, sin_ref, qn, kn, kwin, vwin,
                    attn_buf, krow_s, vrow_s, pos,
                    NQ, NKV, hq, hkv, D, G, window, eps, scale):
    """_attention, but the fresh k/v rows land in FLAT (1, hkv*D) staging
    buffers ready for the in-kernel cache-row DMA."""
    cos = cos_ref[...].astype(jnp.float32)
    sin = sin_ref[...].astype(jnp.float32)
    q = qkv_acc[0:1, :NQ].reshape(hq, D)
    k = qkv_acc[0:1, NQ:NQ + NKV].reshape(hkv, D)
    v = qkv_acc[0:1, NQ + NKV:NQ + 2 * NKV]        # (1, NKV) flat

    q = _rms(q, qn.astype(jnp.float32), eps)
    k = _rms(k, kn.astype(jnp.float32), eps)
    q = (q * cos + _rotate_half(q) * sin).astype(jnp.bfloat16)
    k = (k * cos + _rotate_half(k) * sin).astype(jnp.bfloat16)
    vb = v.astype(jnp.bfloat16)
    # (1, 8, NKV) output blocks (tile-rule padding); row 0 is the new row
    krow_s[...] = jnp.broadcast_to(k.reshape(1, 1, NKV),
                                   (1, 8, NKV)).astype(krow_s.dtype)
    vrow_s[...] = jnp.broadcast_to(vb.reshape(1, 1, NKV), (1, 8, NKV))
    v8 = vb.reshape(hkv, D)

    kw = kwin[...]
    vw = vwin[...]
    in_range = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1) < pos
    for h in range(hkv):
        kh = kw[:, h * D:(h + 1) * D]
        vh = vw[:, h * D:(h + 1) * D]
        qh = q[h * G:(h + 1) * G, :]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(in_range, s, -1e30)
        s_cur = jnp.sum(qh.astype(jnp.float32) * k[h:h + 1, :].astype(
            jnp.float32), axis=1, keepdims=True) * scale
        m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), s_cur)
        p = jnp.exp(s - m)
        p_cur = jnp.exp(s_cur - m)
        l = jnp.sum(p, axis=1, keepdims=True) + p_cur
        o = jax.lax.dot_general(p.astype(jnp.bfloat16), vh,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o = (o + p_cur * v8[h:h + 1, :].astype(jnp.float32)) / l
        attn_buf[:, h * G * D:(h + 1) * G * D] = jnp.broadcast_to(
            o.reshape(1, G * D), (attn_buf.shape[0], G * D))


def fused_decode_stack(x: jnp.ndarray, layers: dict, pos: jnp.ndarray,
                       cos: jnp.ndarray, sin: jnp.ndarray,
                       k_stack: jnp.ndarray, v_stack: jnp.ndarray,
                       window: int, eps: float, interpret: bool = False
                       ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The whole decoder stack in ONE Pallas launch (decode, B=1, S=1).

    Returns (x_out (1, 1, H), k_stack, v_stack) with the new KV rows
    written at column `pos`: the kernel emits per-layer (L, Hkv*D) row
    blocks (a single-row DMA into the sublane-tiled cache is illegal on
    Mosaic) and ONE dynamic_update_slice per cache splices them in —
    in-place on the donated cache buffers.
    """
    B, S, H = x.shape
    assert B == 1 and S == 1
    L, _, Skv, HD = k_stack.shape
    wqkv = layers["qkv"]["w"]
    wo = layers["o"]["w"]
    wgu = layers["mlp"]["gateup"]["w"]
    wdn = layers["mlp"]["down"]["w"]
    NQKV = wqkv.shape[2]
    NQ = wo.shape[1]
    NI = wdn.shape[1]
    D = layers["q_norm"]["w"].shape[-1]
    hkv = HD // D
    hq = NQ // D
    window = min(window, Skv)

    meta = jnp.asarray(pos, jnp.int32)[None]
    x8 = jnp.broadcast_to(x.reshape(1, H), (8, H))
    cn, nbuf = _cn(), _nbuf()

    kernel = functools.partial(
        _fused_stack_kernel, H=H, NQ=NQ, NKV=hkv * D, NI=NI,
        hq=hq, hkv=hkv, D=D, window=window, eps=eps, cn=cn, nbuf=nbuf,
        n_layers=L)
    def cspec(shape, space=pltpu.VMEM):
        # whole-array block, constant index map: fetched once, resident
        # across every grid step
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=space)

    aspec = pl.BlockSpec(memory_space=pl.ANY)
    xo, krows, vrows = pl.pallas_call(
        kernel,
        grid=(L,),
        out_shape=[
            jax.ShapeDtypeStruct((8, H), x.dtype),
            # (1, HD) blocks violate the (8, 128) tile rule; row 0 of each
            # 8-row block carries the layer's new KV row
            jax.ShapeDtypeStruct((L, 8, HD), k_stack.dtype),
            jax.ShapeDtypeStruct((L, 8, HD), v_stack.dtype),
        ],
        in_specs=[
            cspec((1,), pltpu.SMEM),                  # meta (pos,)
            cspec((8, H)), cspec((1, D)), cspec((1, D)),   # x8, cos, sin
            aspec, aspec, aspec, aspec,               # weights
            cspec((L, H)), cspec((L, H)),             # ln1, ln2
            cspec((L, D)), cspec((L, D)),             # q_norm, k_norm
            aspec, aspec,                             # k/v caches (read-only)
        ],
        out_specs=[
            cspec((8, H)),
            pl.BlockSpec((1, 8, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((nbuf, H, max(cn, H)), jnp.bfloat16),   # stage
            pltpu.VMEM((window, HD), jnp.bfloat16),            # kwin
            pltpu.VMEM((window, HD), jnp.bfloat16),            # vwin
            pltpu.VMEM((8, max(NQKV, NI)), jnp.float32),       # qkv/act
            pltpu.VMEM((8, H + 2 * NI), jnp.float32),          # h/o acc
            pltpu.VMEM((8, NQ), jnp.float32),                  # attn out
            pltpu.VMEM((8, H), jnp.float32),                   # x carry
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(meta, x8, cos, sin, wqkv, wo, wgu, wdn,
      layers["ln1"]["w"].astype(jnp.float32),
      layers["ln2"]["w"].astype(jnp.float32),
      layers["q_norm"]["w"].astype(jnp.float32),
      layers["k_norm"]["w"].astype(jnp.float32),
      k_stack, v_stack)
    zero = jnp.zeros((), jnp.int32)
    k_new = jax.lax.dynamic_update_slice(
        k_stack, krows[:, 0].reshape(L, 1, 1, HD), (zero, zero, pos, zero))
    v_new = jax.lax.dynamic_update_slice(
        v_stack, vrows[:, 0].reshape(L, 1, 1, HD), (zero, zero, pos, zero))
    return xo[0:1].reshape(1, 1, H), k_new, v_new


# ---------------------------------------------------------------------------
# Quantized (GGUF grid) whole-stack variant: same one-launch structure,
# weights stay int8 (q8 grid) or nibble-packed int4 (q4 affine grid) all
# the way into the MXU (ops/quant_matmul.py).  Each of the four decoder
# matmuls may be on EITHER grid — llama.cpp mixes formats per tensor.
# ---------------------------------------------------------------------------


def _fused_stack_quant_kernel(meta_ref, x_ref, cos_ref, sin_ref,
                              *refs,
                              H: int, NQ: int, NKV: int, NI: int,
                              hq: int, hkv: int, D: int, window: int,
                              eps: float, cn: int, nbuf: int,
                              q4flags: tuple):
    from aha_tpu.ops.quant_matmul import (_dot_q4_tile, _dot_q8_tile,
                                          _quant_acts)

    # unpack refs: per-matmul weight/scale(/bias) inputs, then the fixed
    # tail (norms, caches, outputs, scratch)
    r = list(refs)
    wrefs, srefs, brefs = [], [], []
    for q4 in q4flags:
        wrefs.append(r.pop(0))
    for q4 in q4flags:
        srefs.append(r.pop(0))
        brefs.append(r.pop(0) if q4 else None)
    (ln1_ref, ln2_ref, qn_ref, kn_ref, k_stack, v_stack,
     xo_ref, krow_ref, vrow_ref,
     stage, kwin, vwin, qkv_acc, h_acc, attn_buf, xbuf) = r[:16]
    sbufs = r[16:16 + sum(2 if f else 1 for f in q4flags)]
    (wsem, ssem, ksem, vsem) = r[16 + len(sbufs):]

    li = pl.program_id(0)
    pos = meta_ref[0]
    NQKV = NQ + 2 * NKV
    G = hq // hkv
    scale = D ** -0.5

    @pl.when(li == 0)
    def _first():
        xbuf[...] = x_ref[...].astype(jnp.float32)

    kdma = pltpu.make_async_copy(
        k_stack.at[li, 0, pl.ds(0, window)], kwin, ksem)
    vdma = pltpu.make_async_copy(
        v_stack.at[li, 0, pl.ds(0, window)], vwin, vsem)
    kdma.start()
    vdma.start()

    # per-layer scale (and q4 bias) rows: small dedicated fetches
    sdmas = []
    sbuf_by_mm = []     # (scale_buf, bias_buf|None) per matmul
    bi = 0
    for mi, q4 in enumerate(q4flags):
        sb = sbufs[bi]
        bi += 1
        bb = None
        if q4:
            bb = sbufs[bi]
            bi += 1
        sbuf_by_mm.append((sb, bb))
        d = pltpu.make_async_copy(srefs[mi].at[li], sb, ssem.at[len(sdmas)])
        d.start()
        sdmas.append(d)
        if q4:
            d = pltpu.make_async_copy(brefs[mi].at[li], bb,
                                      ssem.at[len(sdmas)])
            d.start()
            sdmas.append(d)

    # kinds: 0 qkv N-chunk, 1 o K-chunk, 2 gate-up N-chunk, 3 down K-chunk
    plan = ([(0, j, 0) for j in range(NQKV // cn)]
            + [(1, j, 1) for j in range(NQ // H)]
            + [(2, j, 2) for j in range(2 * NI // cn)]
            + [(3, j, 3) for j in range(NI // H)])

    def make_dma(i, slot):
        mi, j, kind = plan[i]
        q4 = q4flags[mi]
        rows = (H // 2 if q4 else H)
        src = wrefs[mi]
        if kind in (0, 2):
            sl = src.at[li, :, pl.ds(j * cn, cn)]
            return pltpu.make_async_copy(
                sl, stage.at[slot, :src.shape[1], :cn], wsem.at[slot])
        sl = src.at[li, pl.ds(j * rows, rows), :]
        return pltpu.make_async_copy(
            sl, stage.at[slot, :rows, :src.shape[2]], wsem.at[slot])

    dmas = {}
    for i0 in range(min(nbuf, len(plan))):
        dmas[i0] = make_dma(i0, i0)
        dmas[i0].start()

    x = xbuf[...]                                 # (8, H) f32 carried state
    ln1 = ln1_ref[li][None]
    ln2 = ln2_ref[li][None]
    h1 = _rms(x, ln1, eps)
    act1 = _quant_acts(h1)
    ng1 = H // 128
    scales_waited = [False]

    def _scales():
        if not scales_waited[0]:
            for d in sdmas:
                d.wait()
            scales_waited[0] = True

    def _qdot(mi, act, qt_rows, g0, ng, bn):
        """x-chunk @ dequant(weight-chunk) on the matmul's grid.
        act: (xq, sx, xsum) of the activation K-slice; qt_rows: the staged
        packed rows; g0/ng: the chunk's group row range in the scale grid;
        bn: output columns."""
        xq, sx, xsum = act
        sb, bb = sbuf_by_mm[mi]
        if q4flags[mi]:
            return _dot_q4_tile(xq, sx, xsum, qt_rows,
                                sb[g0:g0 + ng, :bn], bb[g0:g0 + ng, :bn],
                                jnp.zeros((8, bn), jnp.float32))
        return _dot_q8_tile(xq, sx, qt_rows, sb[g0:g0 + ng, :bn],
                            jnp.zeros((8, bn), jnp.float32))

    def _qdot_ncols(mi, act, qt_rows, j):
        """N-chunk: full K, columns [j*cn, (j+1)*cn) of the scale grid."""
        xq, sx, xsum = act
        sb, bb = sbuf_by_mm[mi]
        if q4flags[mi]:
            return _dot_q4_tile(xq, sx, xsum, qt_rows,
                                sb[:, j * cn:(j + 1) * cn],
                                bb[:, j * cn:(j + 1) * cn],
                                jnp.zeros((8, cn), jnp.float32))
        return _dot_q8_tile(xq, sx, qt_rows, sb[:, j * cn:(j + 1) * cn],
                            jnp.zeros((8, cn), jnp.float32))

    attn_done = False
    act_q = [None]   # _quant_acts of the MLP input
    for i, (mi, j, kind) in enumerate(plan):
        slot = i % nbuf
        q4 = q4flags[mi]
        rows = (H // 2 if q4 else H)
        dmas[i].wait()
        if kind == 0:
            _scales()
            qt = stage[slot, :rows, :cn]
            qkv_acc[:, j * cn:(j + 1) * cn] = _qdot_ncols(mi, act1, qt, j)
        elif kind == 1:
            if not attn_done:
                kdma.wait()
                vdma.wait()
                _attention_rows(qkv_acc, cos_ref, sin_ref,
                                qn_ref[li][None], kn_ref[li][None],
                                kwin, vwin, attn_buf, krow_ref, vrow_ref,
                                pos, NQ, NKV, hq, hkv, D, G, window, eps,
                                scale)
                attn_done = True
            qt = stage[slot, :rows, :H]
            a = attn_buf[:, j * H:(j + 1) * H]
            part = _qdot(mi, _quant_acts(a), qt, j * ng1, ng1, H)
            if j == 0:
                h_acc[:, :H] = part
            else:
                h_acc[:, :H] += part
        elif kind == 2:
            if j == 0:
                x2 = x + h_acc[:, :H]
                xbuf[...] = x2
                h2 = _rms(x2, ln2, eps)
                act_q[0] = _quant_acts(h2)
            qt = stage[slot, :rows, :cn]
            h_acc[:, H + j * cn:H + (j + 1) * cn] = _qdot_ncols(
                mi, act_q[0], qt, j)
        else:
            if j == 0:
                g = h_acc[:, H:H + NI]
                u = h_acc[:, H + NI:H + 2 * NI]
                qkv_acc[:, :NI] = g * (1.0 / (1.0 + jnp.exp(-g))) * u
            qt = stage[slot, :rows, :H]
            a = qkv_acc[:, j * H:(j + 1) * H]
            part = _qdot(mi, _quant_acts(a), qt, j * ng1, ng1, H)
            if j == 0:
                h_acc[:, :H] = part
            else:
                h_acc[:, :H] += part
        if i + nbuf < len(plan):
            dmas[i + nbuf] = make_dma(i + nbuf, slot)
            dmas[i + nbuf].start()

    x3 = xbuf[...] + h_acc[:, :H]
    xbuf[...] = x3
    xo_ref[...] = x3.astype(xo_ref.dtype)


def _quant_mm_info(p: dict):
    """(is_q4, K, N, weight_arr, scale_arr, bias_arr|None) of a stacked
    quantized dict, or None if it is not on a supported grid."""
    if "qt" in p and "b" not in p:
        Kp, N = p["qt"].shape[-2:]
        return False, Kp, N, p["qt"], p["st"], None
    if "q4" in p and "b" not in p:
        N = p["q4"].shape[-1]
        Kp = p["q4"].shape[-2] * 2
        return True, Kp, N, p["q4"], p["s4"], p["b4"]
    return None


def fused_layer_q8_supported(layers: dict, H: int, hq: int, hkv: int,
                             D: int, n_inter: int,
                             window: int | None) -> bool:
    """Quantized-stack gate: every projection on the int8-per-128 or
    nibble-packed q4 grid with exact (unpadded) K layouts, plus the
    dense-path geometry rules.  (Name kept from the q8-only revision.)"""
    if window is None or window > MAX_WINDOW:
        return False
    if ("qkv" not in layers or "o" not in layers
            or "gateup" not in layers.get("mlp", {})
            or "down" not in layers.get("mlp", {})
            or "q_norm" not in layers or "k_norm" not in layers
            or "ln1" not in layers or "ln2" not in layers):
        return False
    NQ = hq * D
    NKV = hkv * D
    dims = ((layers["qkv"], H, NQ + 2 * NKV), (layers["o"], NQ, H),
            (layers["mlp"]["gateup"], H, 2 * n_inter),
            (layers["mlp"]["down"], n_inter, H))
    for p, K, N in dims:
        info = _quant_mm_info(p)
        if info is None:
            return False
        _, Kp, Np, _, s, _ = info
        if Kp != K or Np != N or s.shape[-2:] != (K // 128, N):
            return False
    cn = _cn()
    return (H % cn == 0 and (NQ + 2 * NKV) % cn == 0
            and (2 * n_inter) % cn == 0 and n_inter % H == 0
            and NQ % H == 0 and D == 128 and hq % hkv == 0)


def fused_decode_stack_q8(x: jnp.ndarray, layers: dict, pos: jnp.ndarray,
                          cos: jnp.ndarray, sin: jnp.ndarray,
                          k_stack: jnp.ndarray, v_stack: jnp.ndarray,
                          window: int, eps: float, interpret: bool = False
                          ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """fused_decode_stack over GGUF-grid weights (q8 int8-per-128 and/or
    q4 nibble grids, per matmul): the whole quantized decoder stack in
    ONE Pallas launch."""
    B, S, H = x.shape
    assert B == 1 and S == 1
    L, _, Skv, HD = k_stack.shape
    mms = [layers["qkv"], layers["o"], layers["mlp"]["gateup"],
           layers["mlp"]["down"]]
    infos = [_quant_mm_info(p) for p in mms]
    q4flags = tuple(i[0] for i in infos)
    NQKV = infos[0][2]
    NQ = infos[1][1]
    NI = infos[3][1]
    D = layers["q_norm"]["w"].shape[-1]
    hkv = HD // D
    hq = NQ // D
    window = min(window, Skv)

    meta = jnp.asarray(pos, jnp.int32)[None]
    x8 = jnp.broadcast_to(x.reshape(1, H), (8, H))
    cn, nbuf = _cn(), _nbuf()

    kernel = functools.partial(
        _fused_stack_quant_kernel, H=H, NQ=NQ, NKV=hkv * D, NI=NI,
        hq=hq, hkv=hkv, D=D, window=window, eps=eps, cn=cn, nbuf=nbuf,
        q4flags=q4flags)

    def cspec(shape, space=pltpu.VMEM):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=space)

    aspec = pl.BlockSpec(memory_space=pl.ANY)
    wargs = [i[3] for i in infos]
    sargs = []
    n_scale_bufs = 0
    scale_scratch = []
    for q4, Kp, N, _, s, b in infos:
        sargs.append(s)
        scale_scratch.append(pltpu.VMEM((Kp // 128, N), jnp.float32))
        n_scale_bufs += 1
        if q4:
            sargs.append(b)
            scale_scratch.append(pltpu.VMEM((Kp // 128, N), jnp.float32))
            n_scale_bufs += 1

    xo, krows, vrows = pl.pallas_call(
        kernel,
        grid=(L,),
        out_shape=[
            jax.ShapeDtypeStruct((8, H), x.dtype),
            jax.ShapeDtypeStruct((L, 8, HD), k_stack.dtype),
            jax.ShapeDtypeStruct((L, 8, HD), v_stack.dtype),
        ],
        in_specs=[
            cspec((1,), pltpu.SMEM),                  # meta (pos,)
            cspec((8, H)), cspec((1, D)), cspec((1, D)),
        ] + [aspec] * (4 + len(sargs)) + [
            cspec((L, H)), cspec((L, H)),             # ln1, ln2 (f32)
            cspec((L, D)), cspec((L, D)),             # q_norm, k_norm (f32)
            aspec, aspec,                             # k/v caches
        ],
        out_specs=[
            cspec((8, H)),
            pl.BlockSpec((1, 8, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((nbuf, H, max(cn, H)), jnp.int8),        # stage
            pltpu.VMEM((window, HD), jnp.bfloat16),             # kwin
            pltpu.VMEM((window, HD), jnp.bfloat16),             # vwin
            pltpu.VMEM((8, max(NQKV, NI)), jnp.float32),        # qkv/act
            pltpu.VMEM((8, H + 2 * NI), jnp.float32),           # h/o acc
            pltpu.VMEM((8, NQ), jnp.float32),                   # attn out
            pltpu.VMEM((8, H), jnp.float32),                    # x carry
        ] + scale_scratch + [
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((n_scale_bufs,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(meta, x8, cos, sin, *wargs, *sargs,
      layers["ln1"]["w"].astype(jnp.float32),
      layers["ln2"]["w"].astype(jnp.float32),
      layers["q_norm"]["w"].astype(jnp.float32),
      layers["k_norm"]["w"].astype(jnp.float32),
      k_stack, v_stack)
    zero = jnp.zeros((), jnp.int32)
    k_new = jax.lax.dynamic_update_slice(
        k_stack, krows[:, 0].reshape(L, 1, 1, HD), (zero, zero, pos, zero))
    v_new = jax.lax.dynamic_update_slice(
        v_stack, vrows[:, 0].reshape(L, 1, 1, HD), (zero, zero, pos, zero))
    return xo[0:1].reshape(1, 1, H), k_new, v_new


def fused_layer_supported(layers: dict, H: int, hq: int, hkv: int, D: int,
                          n_inter: int, window: int | None) -> bool:
    """True when the one-launch fused kernel covers this decode config:
    fused bf16 qkv/gateup weights (fuse_decode_params), q/k head norms
    present, no biases, 128-aligned dims, and a bounded static window."""
    if window is None or window > MAX_WINDOW:
        return False
    if ("qkv" not in layers or "o" not in layers
            or "gateup" not in layers.get("mlp", {})
            or "down" not in layers.get("mlp", {})
            or "q_norm" not in layers or "k_norm" not in layers
            or "ln1" not in layers or "ln2" not in layers):
        return False
    for p in (layers["qkv"], layers["o"], layers["mlp"]["gateup"],
              layers["mlp"]["down"]):
        if "w" not in p or "b" in p or p["w"].dtype != jnp.bfloat16:
            return False
    NQ = hq * D
    NKV = hkv * D
    cn = _cn()
    return (H % cn == 0 and (NQ + 2 * NKV) % cn == 0
            and (2 * n_inter) % cn == 0 and n_inter % H == 0
            and NQ % H == 0 and D % 128 == 0 and D == 128
            and hq % hkv == 0)


def fused_decode_layer(x: jnp.ndarray, layers: dict, li: jnp.ndarray,
                       pos: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                       k_stack: jnp.ndarray, v_stack: jnp.ndarray,
                       window: int, eps: float,
                       interpret: bool = False
                       ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused decoder block at decode time (B=1, S=1).

    x: (1, 1, H); layers: the STACKED (L, ...) decode params (qkv/o/
    gateup/down + norms, from fuse_decode_params); li/pos: scalars;
    cos/sin: (1, D) rope rows for this position; k_stack/v_stack:
    (L, 1, S, hkv*D) flat bf16 cache rows.

    Returns (x_out (1, 1, H), k_row (hkv, D), v_row (hkv, D)); the caller
    writes the rows into the cache at (li, 0, pos).
    """
    B, S, H = x.shape
    assert B == 1 and S == 1
    L, _, Skv, HD = k_stack.shape
    wqkv = layers["qkv"]["w"]
    wo = layers["o"]["w"]
    wgu = layers["mlp"]["gateup"]["w"]
    wdn = layers["mlp"]["down"]["w"]
    NQKV = wqkv.shape[2]
    NQ = wo.shape[1]
    NI = wdn.shape[1]
    D = layers["q_norm"]["w"].shape[-1]
    hkv = HD // D
    hq = NQ // D
    window = min(window, Skv)

    meta = jnp.stack([jnp.asarray(li, jnp.int32),
                      jnp.asarray(pos, jnp.int32)])
    x8 = jnp.broadcast_to(x.reshape(1, H), (8, H))
    cn, nbuf = _cn(), _nbuf()

    kernel = functools.partial(
        _fused_layer_kernel, H=H, NQ=NQ, NKV=hkv * D, NI=NI,
        hq=hq, hkv=hkv, D=D, window=window, eps=eps, cn=cn, nbuf=nbuf)
    # per-layer norm rows arrive as (1, dim) VMEM blocks
    ln1 = jax.lax.dynamic_index_in_dim(layers["ln1"]["w"], li, 0, False)[None]
    ln2 = jax.lax.dynamic_index_in_dim(layers["ln2"]["w"], li, 0, False)[None]
    qn = jax.lax.dynamic_index_in_dim(
        layers["q_norm"]["w"], li, 0, False)[None]
    kn = jax.lax.dynamic_index_in_dim(
        layers["k_norm"]["w"], li, 0, False)[None]

    xo, krow, vrow = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((8, H), x.dtype),
            jax.ShapeDtypeStruct((hkv, D), k_stack.dtype),
            jax.ShapeDtypeStruct((hkv, D), v_stack.dtype),
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # meta (li, pos)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # x8
            pl.BlockSpec(memory_space=pltpu.VMEM),    # cos
            pl.BlockSpec(memory_space=pltpu.VMEM),    # sin
            pl.BlockSpec(memory_space=pl.ANY),     # wqkv
            pl.BlockSpec(memory_space=pl.ANY),     # wo
            pl.BlockSpec(memory_space=pl.ANY),     # wgu
            pl.BlockSpec(memory_space=pl.ANY),     # wdn
            pl.BlockSpec(memory_space=pltpu.VMEM),    # ln1 (1, H)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # ln2
            pl.BlockSpec(memory_space=pltpu.VMEM),    # qn
            pl.BlockSpec(memory_space=pltpu.VMEM),    # kn
            pl.BlockSpec(memory_space=pl.ANY),     # k_stack
            pl.BlockSpec(memory_space=pl.ANY),     # v_stack
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),    # x_out (8, H)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # k_row
            pl.BlockSpec(memory_space=pltpu.VMEM),    # v_row
        ],
        scratch_shapes=[
            pltpu.VMEM((nbuf, H, max(cn, H)), jnp.bfloat16),   # stage
            pltpu.VMEM((window, HD), jnp.bfloat16),            # kwin
            pltpu.VMEM((window, HD), jnp.bfloat16),            # vwin
            pltpu.VMEM((8, max(NQKV, NI)), jnp.float32),       # qkv/act
            pltpu.VMEM((8, H + 2 * NI), jnp.float32),          # h/o acc
            pltpu.VMEM((8, NQ), jnp.float32),                  # attn out
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(meta, x8, cos, sin, wqkv, wo, wgu, wdn, ln1, ln2, qn, kn,
      k_stack, v_stack)
    return xo[0:1].reshape(1, 1, H), krow, vrow
