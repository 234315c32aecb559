"""Pure-Python streaming reader for PyTorch zip checkpoints (.pth / .bin).

The reference hand-rolls exactly this (src/utils/mod.rs:173-376: a zip
walker + minimal pickle machine that only materializes tensor storages).
Rebuilding it here drops the torch dependency from the serving path — a
clean `pip install aha-tpu` can load VoxCPM-0.5B (.bin) and Fun-ASR (.pth)
checkpoints; torch (the `pth` extra) is only used by tests to cross-check
this reader against `torch.load`.

Format: a zip archive holding `<prefix>/data.pkl` (a pickle of the
state-dict whose tensors reference out-of-band storages via
`persistent_id`) and `<prefix>/data/<key>` raw little-endian storage
files.  The unpickler here:

- restricts `find_class` to a safelist (collections, torch rebuild
  helpers, dtype names) — the equivalent of `torch.load(weights_only=True)`;
- resolves `persistent_id = ('storage', <StorageType>, key, location,
  numel)` to a lazy zip read;
- implements `torch._utils._rebuild_tensor_v2` as a numpy
  `as_strided` view over the storage (copied only when non-contiguous).

bf16 tensors come back as ml_dtypes.bfloat16 arrays, ready for jnp.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict

import numpy as np

try:
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:                                    # pragma: no cover
    _BF16 = None

#: torch storage class name → numpy dtype
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "BFloat16Storage": "bf16",          # resolved via ml_dtypes
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("i1"),
    "ByteStorage": np.dtype("u1"),
    "BoolStorage": np.dtype("?"),
    "ComplexFloatStorage": np.dtype("<c8"),
    "ComplexDoubleStorage": np.dtype("<c16"),
}

#: torch.<dtype-name> → numpy dtype (UntypedStorage checkpoints carry the
#: dtype on the rebuild call instead of the storage class)
_DTYPE_NAMES = {
    "float32": np.dtype("<f4"), "float64": np.dtype("<f8"),
    "float16": np.dtype("<f2"), "bfloat16": "bf16",
    "int64": np.dtype("<i8"), "int32": np.dtype("<i4"),
    "int16": np.dtype("<i2"), "int8": np.dtype("i1"),
    "uint8": np.dtype("u1"), "bool": np.dtype("?"),
}


class _StorageRef:
    """Lazy handle to one `<prefix>/data/<key>` zip member."""

    __slots__ = ("zf", "name", "dtype", "numel", "_arr")

    def __init__(self, zf: zipfile.ZipFile, name: str, dtype, numel: int):
        self.zf = zf
        self.name = name
        self.dtype = dtype
        self.numel = numel
        self._arr = None

    def array(self) -> np.ndarray:
        if self._arr is None:
            raw = self.zf.read(self.name)
            dt = self.dtype
            if dt == "bf16":
                if _BF16 is None:
                    raise ImportError(
                        "bfloat16 checkpoint needs ml_dtypes "
                        "(ships with jax): pip install ml_dtypes")
                self._arr = np.frombuffer(raw, np.uint16).view(_BF16)
            else:
                self._arr = np.frombuffer(raw, dt)
        return self._arr


class _TorchDtype:
    """Stand-in for a pickled `torch.<dtype>` attribute."""

    def __init__(self, name: str):
        self.name = name


def _rebuild_tensor_v2(storage: _StorageRef, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None) -> np.ndarray:
    base = storage.array()
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    if not size:
        return base[storage_offset:storage_offset + 1].reshape(()).copy()
    # row-major contiguous → plain reshape (zero-copy over the zip buffer)
    contig = 1
    expect = []
    for s in reversed(size):
        expect.append(contig)
        contig *= s
    if stride == tuple(reversed(expect)):
        n = int(np.prod(size))
        return base[storage_offset:storage_offset + n].reshape(size)
    item = base.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        base[storage_offset:], shape=size,
        strides=tuple(s * item for s in stride))
    return view.copy()


def _rebuild_from_type_v2(func, new_type, args, state):
    # torch serializes subclass tensors (e.g. Parameter) through this
    t = func(*args)
    return t


class _Unpickler(pickle.Unpickler):
    _SAFE = {
        ("collections", "OrderedDict"): OrderedDict,
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
        ("torch._utils", "_rebuild_tensor"): (
            lambda storage, offset, size, stride:
            _rebuild_tensor_v2(storage, offset, size, stride)),
        ("torch._utils", "_rebuild_parameter"): (
            lambda data, requires_grad=True, hooks=None: data),
        ("torch._tensor", "_rebuild_from_type_v2"): _rebuild_from_type_v2,
    }

    def __init__(self, data: bytes, zf: zipfile.ZipFile, prefix: str):
        super().__init__(io.BytesIO(data))
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module: str, name: str):
        if (module, name) in self._SAFE:
            return self._SAFE[(module, name)]
        if module == "torch" and name in _STORAGE_DTYPES:
            return _TorchDtype(name)        # legacy typed-storage classes
        if module == "torch" and name in _DTYPE_NAMES:
            return _TorchDtype(name)        # torch.float32 etc.
        if module == "torch.storage" and name == "_load_from_bytes":
            # nested legacy serialization; torch-only, refuse cleanly
            raise pickle.UnpicklingError(
                "legacy nested torch serialization is not supported by the "
                "built-in reader; install the 'pth' extra (torch) to load "
                "this file")
        raise pickle.UnpicklingError(
            f"checkpoint references {module}.{name}, which the built-in "
            f"weights-only reader does not allow")

    def persistent_load(self, pid):
        kind, storage_type, key, _location, numel = pid
        assert kind == "storage", kind
        if isinstance(storage_type, _TorchDtype):
            tname = storage_type.name
            dt = _STORAGE_DTYPES.get(tname) or _DTYPE_NAMES.get(tname)
        else:                                          # pragma: no cover
            dt = _STORAGE_DTYPES[storage_type.__name__]
        return _StorageRef(self._zf, f"{self._prefix}/data/{key}",
                           dt, int(numel))


def load_torch_pickle(path: str) -> dict:
    """state-dict of numpy arrays from a PyTorch zip checkpoint.

    Tensors are zero-copy views over the decompressed storages where
    contiguous. Raises UnpicklingError for non-zip (legacy) files or
    disallowed pickle content."""
    zf = zipfile.ZipFile(path)
    pkl = [n for n in zf.namelist() if n.endswith("/data.pkl")]
    if not pkl:
        raise pickle.UnpicklingError(
            f"{path} is not a torch zip checkpoint (no data.pkl); legacy "
            "(pre-1.6) serialization needs the 'pth' extra (torch)")
    prefix = pkl[0][:-len("/data.pkl")]
    obj = _Unpickler(zf.read(pkl[0]), zf, prefix).load()
    if isinstance(obj, dict) and "state_dict" in obj and \
            isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        raise pickle.UnpicklingError(
            f"torch checkpoint {path} did not contain a state dict")
    return {k: v for k, v in obj.items() if isinstance(v, np.ndarray)}
