"""Built-in pure-Python torch-pickle reader vs torch.save ground truth.

The serving path loads .pth/.bin through aha_tpu/io/torch_pickle.py with
no torch dependency (the reference hand-rolls the same reader,
src/utils/mod.rs:173-376); these tests round-trip real torch checkpoints
through it and compare bit-for-bit against torch.load."""

import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from aha_tpu.io.torch_pickle import load_torch_pickle
from aha_tpu.io.weights import TorchPickleSource, open_weights


def _roundtrip(tmp_path, sd, name="m.pth"):
    p = str(tmp_path / name)
    torch.save(sd, p)
    return load_torch_pickle(p)


def _as_np(t):
    if t.dtype == torch.bfloat16:
        import ml_dtypes

        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
    return t.numpy()


def test_dtypes_roundtrip(tmp_path):
    g = torch.Generator().manual_seed(0)
    sd = {
        "f32": torch.randn(5, 7, generator=g),
        "f16": torch.randn(4, 3, generator=g).half(),
        "bf16": torch.randn(8, 2, generator=g).bfloat16(),
        "f64": torch.randn(3, generator=g).double(),
        "i64": torch.arange(10),
        "i32": torch.arange(6, dtype=torch.int32).reshape(2, 3),
        "i8": torch.arange(-4, 4, dtype=torch.int8),
        "u8": torch.arange(8, dtype=torch.uint8),
        "bool": torch.tensor([True, False, True]),
        "scalar": torch.tensor(3.25),
    }
    got = _roundtrip(tmp_path, sd)
    assert set(got) == set(sd)
    for k, t in sd.items():
        ref = _as_np(t)
        assert got[k].shape == tuple(t.shape), k
        assert np.asarray(got[k]).tobytes() == np.asarray(ref).tobytes(), k


def test_noncontiguous_and_shared_storage(tmp_path):
    g = torch.Generator().manual_seed(1)
    base = torch.randn(6, 8, generator=g)
    sd = {
        "transposed": base.t(),                 # stride-swapped view
        "sliced": base[1:5, 2:7],               # offset + sub-strides
        "strided": base[::2],                   # step stride
        "base": base,                           # same storage, 3 views
    }
    got = _roundtrip(tmp_path, sd)
    for k, t in sd.items():
        assert np.allclose(got[k], t.numpy()), k
        assert got[k].shape == tuple(t.shape), k


def test_nested_state_dict_unwraps(tmp_path):
    sd = {"state_dict": {"w": torch.ones(2, 2)}, "epoch": 7}
    got = _roundtrip(tmp_path, sd)
    assert set(got) == {"w"}
    assert np.array_equal(got["w"], np.ones((2, 2), np.float32))


def test_parameters_load_as_arrays(tmp_path):
    sd = {"p": torch.nn.Parameter(torch.randn(3, 3))}
    got = _roundtrip(tmp_path, sd)
    assert np.allclose(got["p"], sd["p"].detach().numpy())


def test_matches_torch_load_exactly(tmp_path):
    """Full cross-check: the built-in reader and torch.load agree on a
    model-like checkpoint (the guarantee VoxCPM/Fun-ASR loading relies
    on)."""
    g = torch.Generator().manual_seed(2)
    sd = {f"layers.{i}.{n}": torch.randn(16, 16, generator=g).bfloat16()
          for i in range(3) for n in ("w", "b")}
    p = str(tmp_path / "model.bin")
    torch.save(sd, p)
    ours = load_torch_pickle(p)
    theirs = torch.load(p, map_location="cpu", weights_only=True)
    assert set(ours) == set(theirs)
    for k in ours:
        ref = _as_np(theirs[k])
        assert ours[k].dtype == ref.dtype
        assert np.array_equal(ours[k].view(np.uint16), ref.view(np.uint16))


def test_open_weights_pth_without_torch(tmp_path, monkeypatch):
    """open_weights on a .pth directory must not import torch (the
    packaging-truth guarantee: a clean install loads VoxCPM/.bin)."""
    torch.save({"w": torch.randn(4, 4)}, str(tmp_path / "model.pth"))
    import builtins

    real_import = builtins.__import__

    def no_torch(name, *a, **k):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch forbidden in this test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_torch)
    src = open_weights(str(tmp_path))
    assert "w" in src.keys()
    assert src.get("w").shape == (4, 4)


def test_rejects_arbitrary_pickled_objects(tmp_path):
    """weights-only safety: a checkpoint smuggling a non-safelisted global
    must be refused by the built-in reader, not executed."""
    import os

    class Evil:
        def __reduce__(self):
            return (os.system, ("true",))

    p = str(tmp_path / "evil.pth")
    torch.save({"x": Evil()}, p)
    with pytest.raises(pickle.UnpicklingError, match="does not allow"):
        load_torch_pickle(p)


def test_non_zip_file_raises_actionable(tmp_path):
    p = tmp_path / "legacy.pth"
    p.write_bytes(b"not a zip at all")
    with pytest.raises(Exception, match="pth|zip|checkpoint"):
        load_torch_pickle(str(p))


def test_source_falls_back_and_names_the_extra(tmp_path, monkeypatch):
    """A file the built-in reader rejects loads via torch when available;
    with torch absent the error must name the pth extra."""
    p = tmp_path / "weird.pth"
    p.write_bytes(b"PK\x03\x04 broken zip")
    with pytest.raises(Exception):
        TorchPickleSource([str(p)])   # torch also fails on it → surfaced

    import builtins

    real_import = builtins.__import__

    def no_torch(name, *a, **k):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("no torch")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_torch)
    with pytest.raises(RuntimeError, match="aha-tpu\\[pth\\]"):
        TorchPickleSource([str(p)])
