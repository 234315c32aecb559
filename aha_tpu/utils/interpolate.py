"""Torch-compatible tensor interpolation (reference: src/utils/interpolate.rs,
itself a transcription of torch F.interpolate semantics).

Design: interpolation along an axis is a linear map, so we materialise the
(out_size, in_size) weight matrix on the host (numpy) and apply it as a
matmul.  That gives bit-level torch parity on the host AND an MXU-friendly
formulation on device — a 2-D resize inside a jitted forward pass is just two
matrix multiplies with trace-time-constant weights, which XLA fuses, instead
of a gather-heavy kernel.

Supported: nearest / nearest-exact / linear / bilinear / bicubic,
align_corners True/False, antialias True/False (antialias follows the
PIL/torch algorithm: scaled kernel support + normalised weights).
Torch kernel constants: standard bicubic a=-0.75, antialias bicubic a=-0.5.
"""

from __future__ import annotations

import numpy as np


def _cubic_kernel(x: np.ndarray, a: float) -> np.ndarray:
    x = np.abs(x)
    out = np.where(
        x < 1.0, ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0))
    return out


def _linear_kernel(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.where(x < 1.0, 1.0 - x, 0.0)


def _source_coords(in_size: int, out_size: int, align_corners: bool,
                   cubic: bool) -> np.ndarray:
    """Torch area_pixel_compute_source_index for every output index."""
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size <= 1:
            return np.zeros(out_size)
        return i * (in_size - 1) / (out_size - 1)
    scale = in_size / out_size
    coords = (i + 0.5) * scale - 0.5
    if not cubic:  # linear modes clamp negative coords; cubic does not
        coords = np.maximum(coords, 0.0)
    return coords


def resize_weights_1d(in_size: int, out_size: int, mode: str = "bilinear",
                      align_corners: bool = False,
                      antialias: bool = False) -> np.ndarray:
    """(out_size, in_size) float64 weight matrix W with resized = W @ x."""
    if mode in ("nearest", "nearest-exact"):
        if mode == "nearest":  # torch legacy: floor(i * in/out)
            idx = np.floor(np.arange(out_size) * (in_size / out_size))
        else:  # round from pixel centers (PIL / interpolate.rs nearest)
            idx = np.round((np.arange(out_size) + 0.5) * (in_size / out_size)
                           - 0.5)
        idx = np.clip(idx, 0, in_size - 1).astype(np.int64)
        w = np.zeros((out_size, in_size))
        w[np.arange(out_size), idx] = 1.0
        return w

    cubic = mode in ("bicubic", "cubic")
    if antialias:
        # PIL/torch antialias: stretch the kernel by the downscale factor
        # (clamped to >=1 on upsample) and normalise each row's weights.
        # Torch uses the same path for upsampling too (plain a=-0.5 cubic).
        if align_corners and out_size > 1:
            scale = (in_size - 1) / (out_size - 1)
        else:
            scale = in_size / out_size
        fscale = max(scale, 1.0)
        ksup = 2.0 if cubic else 1.0
        support = ksup * fscale
        w = np.zeros((out_size, in_size))
        centers = scale * (np.arange(out_size, dtype=np.float64) + 0.5)
        for i in range(out_size):
            lo = max(0, int(centers[i] - support + 0.5))
            hi = min(in_size, int(centers[i] + support + 0.5))
            x = (np.arange(lo, hi) + 0.5 - centers[i]) / fscale
            row = _cubic_kernel(x, -0.5) if cubic else _linear_kernel(x)
            s = row.sum()
            if s != 0:
                row = row / s
            w[i, lo:hi] = row
        return w

    coords = _source_coords(in_size, out_size, align_corners, cubic)
    w = np.zeros((out_size, in_size))
    if cubic:
        x0 = np.floor(coords).astype(np.int64)
        t = coords - x0
        for k in range(-1, 3):
            wk = _cubic_kernel(t - k, -0.75)
            idx = np.clip(x0 + k, 0, in_size - 1)
            np.add.at(w, (np.arange(out_size), idx), wk)
    else:
        coords = np.clip(coords, 0.0, in_size - 1)
        x0 = np.floor(coords).astype(np.int64)
        x1 = np.minimum(x0 + 1, in_size - 1)
        t = coords - x0
        np.add.at(w, (np.arange(out_size), x0), 1.0 - t)
        np.add.at(w, (np.arange(out_size), x1), t)
    return w


def interpolate(x, size, mode: str = "bilinear", align_corners: bool = False,
                antialias: bool = False):
    """Torch F.interpolate over the trailing spatial dims.

    x: (..., L) for 1-D modes (nearest/linear) with int `size`, or
       (..., H, W) for 2-D modes with `size=(h, w)`.
    Works on numpy arrays and jax arrays alike: weights are numpy constants;
    the application is matmul in the array's own namespace.
    """
    import jax.numpy as jnp

    is_jax = not isinstance(x, np.ndarray)
    xp = jnp if is_jax else np
    dt = x.dtype
    if isinstance(size, int):
        wl = resize_weights_1d(x.shape[-1], size, mode, align_corners,
                               antialias)
        wl = xp.asarray(wl.T, dtype=np.float32)
        out = xp.matmul(x.astype(np.float32), wl)
        return out.astype(dt)
    th, tw = size
    mode1d = {"bilinear": "linear", "bicubic": "cubic"}.get(mode, mode)
    wh = resize_weights_1d(x.shape[-2], th, mode1d, align_corners, antialias)
    ww = resize_weights_1d(x.shape[-1], tw, mode1d, align_corners, antialias)
    wh = xp.asarray(wh, dtype=np.float32)
    ww = xp.asarray(ww.T, dtype=np.float32)
    out = xp.matmul(wh, x.astype(np.float32))
    out = xp.matmul(out, ww)
    return out.astype(dt)
