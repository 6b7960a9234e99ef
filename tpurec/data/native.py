"""ctypes bindings for the native recordio runtime (cpp/librecordio.so).

``decode_columnar_native`` is the bulk path behind tpurec.data.loader: it
parses a whole TFRecord shard of ``tf.train.Example`` records into
preallocated columnar numpy arrays in C++ (no protobuf library, no Python
per-record loop). Falls back cleanly when the library isn't built.
"""

from __future__ import annotations

import ctypes
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from tpurec.data.crc32c import _load_native

KIND_INT64 = 0
KIND_FLOAT32 = 1


def native_available() -> bool:
    lib = _load_native()
    return lib is not None and hasattr(lib, "tfrecord_decode_columnar")


def _count_records(lib, path: str) -> int:
    cap = 1 << 16
    while True:
        offsets = np.zeros(cap, np.int64)
        lengths = np.zeros(cap, np.int64)
        n = lib.tfrecord_index(
            path.encode(),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            cap,
        )
        if n == -2:
            cap *= 4
            continue
        if n < 0:
            raise IOError(f"tfrecord_index failed on {path} ({n})")
        return int(n)


def decode_columnar_native(
    path: str,
    schema: Dict[str, Tuple[int, int]],  # name → (kind, width)
    verify: bool = False,
) -> Dict[str, np.ndarray]:
    """Decode one shard into columnar arrays using the C++ parser."""
    lib = _load_native()
    if lib is None or not hasattr(lib, "tfrecord_decode_columnar"):
        raise RuntimeError("native librecordio.so with decoder not available")
    lib.tfrecord_index.restype = ctypes.c_long
    lib.tfrecord_decode_columnar.restype = ctypes.c_long
    n_records = _count_records(lib, path)
    names = sorted(schema)
    name_blob = b"".join(n.encode() + b"\0" for n in names)
    kinds = np.asarray([schema[n][0] for n in names], np.int32)
    widths = np.asarray([schema[n][1] for n in names], np.int64)
    outputs = {}
    out_ptrs = (ctypes.c_void_p * len(names))()
    for i, n in enumerate(names):
        kind, width = schema[n]
        dtype = np.int64 if kind == KIND_INT64 else np.float32
        arr = np.zeros((n_records, width), dtype)
        outputs[n] = arr
        out_ptrs[i] = arr.ctypes.data_as(ctypes.c_void_p)
    got = lib.tfrecord_decode_columnar(
        path.encode(),
        name_blob,
        kinds.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        len(names),
        out_ptrs,
        n_records,
        1 if verify else 0,
    )
    if got < 0:
        raise IOError(f"tfrecord_decode_columnar failed on {path} (code {got})")
    return {
        n: (arr[:got, 0] if schema[n][1] == 1 else arr[:got])
        for n, arr in outputs.items()
    }


def encode_columnar_native(
    path: str,
    columns: Dict[str, np.ndarray],
    append: bool = False,
) -> int:
    """Serialize columnar arrays as framed Example records in C++ (the
    write-side fast path used by the DataGenerators). Columns: (N,) or
    (N, W) int64/float32 arrays."""
    lib = _load_native()
    if lib is None or not hasattr(lib, "tfrecord_encode_columnar"):
        raise RuntimeError("native librecordio.so with encoder not available")
    lib.tfrecord_encode_columnar.restype = ctypes.c_long
    names = sorted(columns)
    n = len(next(iter(columns.values())))
    name_blob = b"".join(nm.encode() + b"\0" for nm in names)
    kinds = []
    widths = []
    arrays = []
    for nm in names:
        arr = np.ascontiguousarray(columns[nm])
        if arr.ndim == 1:
            arr = arr[:, None]
        if np.issubdtype(arr.dtype, np.integer):
            arr = arr.astype(np.int64)
            kinds.append(KIND_INT64)
        else:
            arr = arr.astype(np.float32)
            kinds.append(KIND_FLOAT32)
        widths.append(arr.shape[1])
        arrays.append(arr)
    kinds_np = np.asarray(kinds, np.int32)
    widths_np = np.asarray(widths, np.int64)
    ptrs = (ctypes.c_void_p * len(names))(
        *[a.ctypes.data_as(ctypes.c_void_p) for a in arrays]
    )
    got = lib.tfrecord_encode_columnar(
        path.encode(),
        name_blob,
        kinds_np.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        widths_np.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        len(names),
        ptrs,
        n,
        1 if append else 0,
    )
    if got < 0:
        raise IOError(f"tfrecord_encode_columnar failed on {path} ({got})")
    return int(got)


def infer_schema(example_features: Dict[str, np.ndarray]) -> Dict[str, Tuple[int, int]]:
    """Schema from one decoded record (kind + fixed width per feature)."""
    schema = {}
    for name, val in example_features.items():
        if np.issubdtype(val.dtype, np.integer):
            kind = KIND_INT64
        elif np.issubdtype(val.dtype, np.floating):
            kind = KIND_FLOAT32
        else:
            raise TypeError(f"native decoder does not handle bytes feature {name!r}")
        schema[name] = (kind, int(val.shape[0]))
    return schema
