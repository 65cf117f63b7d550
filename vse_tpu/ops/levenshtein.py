"""Levenshtein similarity ratio.

The reference's dedup/span logic keys on `Levenshtein.ratio`
(reference backend/main.py:798, :949). That ratio is the normalized *indel*
similarity: ``(len(a) + len(b) - D) / (len(a) + len(b))`` where D is the
edit distance with substitution cost 2 (equivalently twice the LCS
complement).

Resolution order: the optional C extension built from
vse_tpu/native/levenshtein.cpp (fastest), then the python-Levenshtein wheel
if present, then the pure-Python DP below — all three agree exactly (see
tests/test_levenshtein.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

_impl = None


def _pure_ratio(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    lensum = la + lb
    if lensum == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    # indel distance DP, two rows
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            if ca == b[j - 1]:
                cur[j] = prev[j - 1]
            else:
                cur[j] = 1 + min(prev[j], cur[j - 1])
        prev = cur
    dist = prev[lb]
    return (lensum - dist) / lensum


_native = None


def _load_native():
    global _native
    if _native is not None:
        return _native
    so = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native",
        "libvse_native.so",
    )
    if os.path.exists(so):
        try:
            lib = ctypes.CDLL(so)
            lib.vse_indel_ratio_u32.restype = ctypes.c_double
            lib.vse_indel_ratio_u32.argtypes = [
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_size_t,
            ]
            _native = lib
            return lib
        except OSError:
            pass
    _native = False
    return False


def _native_ratio(a: str, b: str) -> float:
    lib = _load_native()
    ca = (ctypes.c_uint32 * len(a))(*[ord(c) for c in a])
    cb = (ctypes.c_uint32 * len(b))(*[ord(c) for c in b])
    return lib.vse_indel_ratio_u32(ca, len(a), cb, len(b))


def ratio(a: str, b: str) -> float:
    """Normalized indel similarity in [0, 1]."""
    if _load_native():
        return _native_ratio(a, b)
    try:
        import Levenshtein  # type: ignore

        return Levenshtein.ratio(a, b)
    except ImportError:
        return _pure_ratio(a, b)


def pure_ratio(a: str, b: str) -> float:
    """Exported for verification tests."""
    return _pure_ratio(a, b)
