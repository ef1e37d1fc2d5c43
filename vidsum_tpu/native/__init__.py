"""ctypes bindings for the C++ eval runtime (see ``src/eval_runtime.cc``).

The library is built on demand (first import compiles it with g++ if the
shared object is missing and a compiler is available); importers treat any
failure as "native unavailable" and fall back to the NumPy paths — the
Python implementations in ``vidsum_tpu.ops`` are the semantics of record,
the native ones are bit-identical accelerations (tested in
``tests/test_native.py``).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libvidsum_native.so")


def _load() -> ctypes.CDLL:
    if not os.path.exists(_LIB_PATH):
        from vidsum_tpu.native.build import build

        build(verbose=False)
    lib = ctypes.CDLL(_LIB_PATH)

    i64 = ctypes.c_int64
    pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    pf64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

    lib.vs_knapsack.restype = i64
    lib.vs_knapsack.argtypes = [i64, pi64, pf64, i64, pi64]
    lib.vs_calc_scatters.restype = None
    lib.vs_calc_scatters.argtypes = [pf64, i64, pf64]
    lib.vs_cpd_dp.restype = None
    lib.vs_cpd_dp.argtypes = [pf64, i64, i64, i64, i64, pf64, pi64]
    return lib


_lib = _load()


def knapsack_native(W: int, wt: np.ndarray, val: np.ndarray) -> List[int]:
    wt = np.ascontiguousarray(wt, dtype=np.int64)
    val = np.ascontiguousarray(val, dtype=np.float64)
    n = len(wt)
    out = np.zeros(max(n, 1), dtype=np.int64)
    count = _lib.vs_knapsack(int(W), wt, val, n, out)
    return out[:count].tolist()


def calc_scatters_native(K: np.ndarray) -> np.ndarray:
    K = np.ascontiguousarray(K, dtype=np.float64)
    n = K.shape[0]
    out = np.zeros((n, n), dtype=np.float64)
    _lib.vs_calc_scatters(K, n, out)
    return out


def cpd_dp_native(J: np.ndarray, m: int, lmin: int = 1,
                  lmax: int = 100000) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (cps (m,), scores (m+1,)) from a precomputed scatter matrix."""
    J = np.ascontiguousarray(J, dtype=np.float64)
    n = J.shape[0]
    scores = np.zeros(m + 1, dtype=np.float64)
    cps = np.zeros(max(m, 1), dtype=np.int64)
    _lib.vs_cpd_dp(J, n, m, lmin, lmax, scores, cps)
    return cps[:m], scores
