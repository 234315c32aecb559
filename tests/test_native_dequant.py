"""Native C++ GGUF dequant vs the numpy reference, per block format."""

import numpy as np
import pytest

from aha_tpu import native
import aha_tpu.io.gguf as gguf

TYPES = {
    "q8_0": gguf.GGML_Q8_0,
    "q4_0": gguf.GGML_Q4_0,
    "q4_1": gguf.GGML_Q4_1,
    "q5_0": gguf.GGML_Q5_0,
    "iq4_nl": gguf.GGML_IQ4_NL,
    "q4_k": gguf.GGML_Q4_K,
    "q6_k": gguf.GGML_Q6_K,
    "q5_k": gguf.GGML_Q5_K,
    "q2_k": gguf.GGML_Q2_K,
    "q3_k": gguf.GGML_Q3_K,
}


def _numpy_dequant(raw, ggml_type, monkeypatch):
    """Run the numpy reference path with native disabled."""
    import unittest.mock as mock

    with mock.patch.object(native, "dequant", lambda *a: None):
        return gguf._dequant(raw, ggml_type)


def _sane_blocks(name: str, n_blocks: int, rng) -> np.ndarray:
    """Random block bytes with finite f16 scale fields."""
    _, bb, _ = native.BLOCK_SPECS[name]
    raw = rng.integers(0, 256, n_blocks * bb, dtype=np.uint8).reshape(
        n_blocks, bb)
    scale = np.float16(rng.uniform(0.001, 2.0, n_blocks))
    if name in ("q8_0", "q4_0", "q5_0", "iq4_nl", "q4_k", "q4_1", "q5_k"):
        raw[:, 0:2] = scale[:, None].view(np.uint8).reshape(n_blocks, 2)
    if name in ("q4_1", "q4_k", "q5_k"):
        m = np.float16(rng.uniform(-1.0, 1.0, n_blocks))
        raw[:, 2:4] = m[:, None].view(np.uint8).reshape(n_blocks, 2)
    if name == "q6_k":
        raw[:, 208:210] = scale[:, None].view(np.uint8).reshape(n_blocks, 2)
    if name == "q3_k":
        raw[:, 108:110] = scale[:, None].view(np.uint8).reshape(n_blocks, 2)
    if name == "q2_k":
        raw[:, 80:82] = scale[:, None].view(np.uint8).reshape(n_blocks, 2)
        m = np.float16(rng.uniform(0.0, 1.0, n_blocks))
        raw[:, 82:84] = m[:, None].view(np.uint8).reshape(n_blocks, 2)
    return raw.reshape(-1)


@pytest.mark.skipif(native.get_lib() is None,
                    reason="no native toolchain in this environment")
@pytest.mark.parametrize("name", sorted(TYPES))
def test_native_matches_numpy(name, monkeypatch):
    rng = np.random.default_rng(42)
    raw = _sane_blocks(name, 64, rng)
    ref = _numpy_dequant(raw, TYPES[name], monkeypatch)
    got = native.dequant(name, raw)
    assert got is not None
    np.testing.assert_allclose(got, np.asarray(ref, np.float32),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(native.get_lib() is None,
                    reason="no native toolchain in this environment")
def test_native_speedup_is_real():
    """The native path must beat numpy by a wide margin on K-quants."""
    import time

    rng = np.random.default_rng(0)
    raw = _sane_blocks("q4_k", 16384, rng)     # 4M elems
    native.dequant("q4_k", raw)                # warm (build cached already)
    t0 = time.perf_counter()
    native.dequant("q4_k", raw)
    t_native = time.perf_counter() - t0
    import unittest.mock as mock

    with mock.patch.object(native, "dequant", lambda *a: None):
        t0 = time.perf_counter()
        gguf._dequant(raw, gguf.GGML_Q4_K)
        t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy, (t_native, t_numpy)


def test_fallback_when_disabled(monkeypatch):
    """AHA_NO_NATIVE / missing toolchain must leave loads working."""
    import unittest.mock as mock

    rng = np.random.default_rng(1)
    raw = _sane_blocks("q8_0", 8, rng)
    with mock.patch.object(native, "dequant", lambda *a: None):
        out = gguf._dequant(raw, gguf.GGML_Q8_0)
    assert out.shape == (256,) and out.dtype == np.float32
