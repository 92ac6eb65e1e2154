"""Edit (Levenshtein) distance with a native C kernel and Python fallback.

Replaces the reference's dependency on the `editdistance` PyPI C++ extension
(reference: src/postprocess.py:1).
"""

from __future__ import annotations

import ctypes
from typing import Hashable, Sequence

import numpy as np

from ss_asr_tpu import native

_lib = native.load("editdistance.c", "libeditdistance.so")
if _lib is not None:
    _lib.edit_distance_u64.restype = ctypes.c_long
    _lib.edit_distance_u64.argtypes = [
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.c_long,
    ]


def _hash_tokens(tokens: Sequence[Hashable]) -> np.ndarray:
    return np.array([hash(t) & 0xFFFFFFFFFFFFFFFF for t in tokens], dtype=np.uint64)


def _edit_distance_py(a: np.ndarray, b: np.ndarray) -> int:
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    row = np.arange(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        prev = row.copy()
        row[0] = i
        sub = prev[:-1] + (a[i - 1] != b)
        for j in range(1, m + 1):
            row[j] = min(prev[j] + 1, row[j - 1] + 1, sub[j - 1])
    return int(row[m])


def edit_distance(a: Sequence[Hashable], b: Sequence[Hashable]) -> int:
    """Levenshtein distance between two token sequences (words or chars)."""
    ha, hb = _hash_tokens(a), _hash_tokens(b)
    if _lib is not None:
        pa = ha.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
        pb = hb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
        d = _lib.edit_distance_u64(pa, len(ha), pb, len(hb))
        if d >= 0:
            return int(d)
    return _edit_distance_py(ha, hb)
