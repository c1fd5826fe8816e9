"""ctypes bindings for the native C++ helpers (built from ``native/``).

The library is auto-built on first use when a toolchain is available
(g++ -O3 -shared -fPIC), cached under ``nnpde_tpu/_native/``; every caller
has a pure-Python/scipy fallback, so the native path is an optimisation,
never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_ROOT = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_ROOT, "_native", "libnnpde_native.so")
_SRC = os.path.join(os.path.dirname(_ROOT), "native", "tridiag_eigh.cpp")


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.nnpde_tridiag_eigh.restype = ctypes.c_int
        lib.nnpde_tridiag_eigh.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def tridiag_eigh(
    diag: np.ndarray, offd: np.ndarray, k: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """k smallest eigenpairs of the symmetric tridiagonal (diag, offd).

    Returns (evals (k,), evecs (n, k) unit-norm columns), or None when the
    native library is unavailable (callers fall back to scipy/numpy).
    """
    lib = load()
    if lib is None:
        return None
    d = np.ascontiguousarray(diag, np.float64)
    e = np.ascontiguousarray(offd, np.float64)
    n = d.shape[0]
    w = np.empty(k, np.float64)
    z = np.empty((k, n), np.float64)
    rc = lib.nnpde_tridiag_eigh(n, d, e, k, w, z)
    if rc != 0:
        return None
    return w, z.T.copy()
