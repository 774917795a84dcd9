"""ctypes bridge to the native float64 QP solver (csrc/qp_solver.cpp).

The shared library is built on demand with g++ and cached next to the
source; loading falls back gracefully (callers use the JAX solver when
the toolchain is unavailable).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_SO_PATH = os.path.join(_CSRC, "libsaidqp.so")
_LIB = None
_TRIED = False


def _build() -> bool:
    src = os.path.join(_CSRC, "qp_solver.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO_PATH, src],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native solver; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None:
        return _LIB
    if _TRIED:
        return None
    _TRIED = True
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.said_solve_sequence_qp.restype = ctypes.c_int
    lib.said_solve_sequence_qp.argtypes = [
        ctypes.POINTER(ctypes.c_double),  # gram
        ctypes.POINTER(ctypes.c_double),  # q
        ctypes.c_int,  # T
        ctypes.c_int,  # N
        ctypes.c_double,  # delta
        ctypes.c_double,  # tol
        ctypes.c_int,  # max_iters
        ctypes.POINTER(ctypes.c_double),  # w_init (nullable)
        ctypes.POINTER(ctypes.c_double),  # out_w
    ]
    _LIB = lib
    return lib


def solve_sequence_qp_native(
    gram: np.ndarray,
    q: np.ndarray,
    delta: float = 0.1,
    init_vals: Optional[np.ndarray] = None,
    max_iters: int = 20000,
    tol: float = 1e-9,
) -> Optional[np.ndarray]:
    """Double-precision sequence QP via the C++ solver; None if unbuilt."""
    lib = load()
    if lib is None:
        return None
    gram = np.ascontiguousarray(gram, dtype=np.float64)
    q = np.ascontiguousarray(q, dtype=np.float64)
    t, n = q.shape
    out = np.empty((t, n), dtype=np.float64)
    w0 = (
        np.ascontiguousarray(init_vals, dtype=np.float64)
        if init_vals is not None
        else None
    )
    dptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    iters = lib.said_solve_sequence_qp(
        dptr(gram),
        dptr(q),
        t,
        n,
        float(delta),
        float(tol),
        int(max_iters),
        dptr(w0) if w0 is not None else None,
        dptr(out),
    )
    if iters < 0:
        return None
    return out
