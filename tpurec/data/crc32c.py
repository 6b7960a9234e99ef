"""CRC32-C (Castagnoli) — required by the TFRecord framing format.

Three tiers, fastest available wins:
1. native C++ (cpp/librecordio.so via ctypes, slice-by-8) — built by `make -C cpp`
2. numpy batch mode: many independent messages CRC'd in lockstep (vectorized
   across messages, python loop only over byte positions)
3. pure-python scalar fallback

The reference leans on TF's internal TFRecord writer (2.FM/Tools.py:8-54);
here the format is implemented from scratch so the framework has no TF
dependency.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_POLY = 0x82F63B78  # reflected Castagnoli polynomial
_MASK_DELTA = 0xA282EAD8


def _make_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (_POLY if crc & 1 else 0)
        table[i] = crc
    return table


_TABLE = _make_table()

# ---------------------------------------------------------------------------
# native fast path
_LIB: Optional[ctypes.CDLL] = None


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (
        os.path.join(here, "cpp", "librecordio.so"),
        os.path.join(os.path.dirname(__file__), "librecordio.so"),
    ):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.crc32c.restype = ctypes.c_uint32
                lib.crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
                _LIB = lib
                return lib
            except OSError:
                pass
    return None


def crc32c(data: bytes) -> int:
    lib = _load_native()
    if lib is not None:
        return int(lib.crc32c(data, len(data)))
    crc = 0xFFFFFFFF
    for byte in data:
        crc = (crc >> 8) ^ int(_TABLE[(crc ^ byte) & 0xFF])
    return crc ^ 0xFFFFFFFF


def crc32c_batch(messages: Sequence[bytes]) -> List[int]:
    """CRC32C of many messages, vectorized across the batch with numpy.

    The python loop runs over byte *positions* (bounded by the longest
    message), while each step processes every message at once.
    """
    lib = _load_native()
    if lib is not None:
        return [int(lib.crc32c(m, len(m))) for m in messages]
    if not messages:
        return []
    lens = np.array([len(m) for m in messages], dtype=np.int64)
    maxlen = int(lens.max())
    buf = np.zeros((len(messages), maxlen), dtype=np.uint8)
    for i, m in enumerate(messages):
        buf[i, : len(m)] = np.frombuffer(m, dtype=np.uint8)
    crc = np.full(len(messages), 0xFFFFFFFF, dtype=np.uint32)
    for j in range(maxlen):
        active = j < lens
        nxt = (crc >> np.uint32(8)) ^ _TABLE[(crc ^ buf[:, j]) & np.uint32(0xFF)]
        crc = np.where(active, nxt, crc)
    crc ^= np.uint32(0xFFFFFFFF)
    return [int(c) for c in crc]


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


def mask(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


def unmask(masked: int) -> int:
    rot = (masked - _MASK_DELTA) & 0xFFFFFFFF
    return ((rot << 15) | (rot >> 17)) & 0xFFFFFFFF
