"""Pure numpy/stdlib loader for torch zip-format checkpoints (no torch).

The reference ships two torch ``save()`` artifacts — the RNN state dict
``nn_weights.ckpt`` (/root/reference/model.py:231) and the VRAE
``vrae_5896.pth`` (/root/reference/run.py:176) — but torch is not
installed in this container.  The zip serialization format is public
(``torch/serialization.py``): an archive holding ``<name>/data.pkl`` (a
pickle whose tensors are persistent-id references) plus one raw
little-endian buffer per storage under ``<name>/data/<key>``.

We unpickle with a RESTRICTED unpickler: exactly three globals are
honored (``collections.OrderedDict``, ``torch._utils._rebuild_tensor_v2``
— rebuilt as a numpy strided view — and ``torch.*Storage`` dtype tags,
plus ``_rebuild_parameter`` which unwraps to its data).  Anything else
raises — a checkpoint cannot execute code through this loader, unlike a
raw ``pickle.load``.

Storages are shared: cuDNN-flattened RNN checkpoints store weight_ih /
weight_hh / biases as offset views into ONE buffer, so ``persistent_load``
caches by storage key and ``_rebuild_tensor_v2`` applies (offset, size,
stride) per tensor.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict

import numpy as np

_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _StorageTag:
    """Stands in for a ``torch.XStorage`` class object inside persistent ids."""

    def __init__(self, dtype):
        self.dtype = dtype


def _rebuild_tensor_v2(storage, offset, size, stride, requires_grad=False,
                       backward_hooks=None, metadata=None):
    """``torch._utils._rebuild_tensor_v2`` over a numpy 1-D storage."""
    arr = storage
    if len(size) == 0:
        return np.asarray(arr[offset]).copy()
    strides_bytes = tuple(int(s) * arr.itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        arr[offset:], shape=tuple(int(d) for d in size), strides=strides_bytes
    )
    return np.ascontiguousarray(view)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _RestrictedTorchUnpickler(pickle.Unpickler):
    def __init__(self, data_pkl: bytes, zf: zipfile.ZipFile, prefix: str):
        super().__init__(io.BytesIO(data_pkl))
        self._zf = zf
        self._prefix = prefix
        self._storages: dict[str, np.ndarray] = {}

    def find_class(self, module, name):
        if module == "collections" and name == "OrderedDict":
            return OrderedDict
        if module == "torch._utils" and name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageTag(_STORAGE_DTYPES[name])
        raise pickle.UnpicklingError(
            f"restricted torch-checkpoint loader refuses {module}.{name}"
        )

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unexpected persistent id: {pid!r}")
        tag, key = pid[1], str(pid[2])
        dtype = tag.dtype if isinstance(tag, _StorageTag) else np.float32
        if key not in self._storages:
            raw = self._zf.read(f"{self._prefix}/data/{key}")
            self._storages[key] = np.frombuffer(raw, dtype=dtype).copy()
        return self._storages[key]


def load_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch zip checkpoint into {param_name: numpy array}.

    Works on a plain ``state_dict`` save (nn_weights.ckpt) and on a full
    module save whose pickle only references state tensors (vrae_*.pth).
    Non-tensor entries (``_metadata`` etc.) are dropped.
    """
    with zipfile.ZipFile(path) as zf:
        pkl_name = next(n for n in zf.namelist() if n.endswith("/data.pkl"))
        prefix = pkl_name[: -len("/data.pkl")]
        obj = _RestrictedTorchUnpickler(zf.read(pkl_name), zf, prefix).load()
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(obj["state_dict"], dict):
        obj = obj["state_dict"]  # lightning-style wrapper
    out: dict[str, np.ndarray] = {}
    for k, v in dict(obj).items():
        if isinstance(v, np.ndarray):
            out[str(k)] = v
    return out
