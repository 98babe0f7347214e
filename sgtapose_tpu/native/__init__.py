"""Native (C++) components: float64 LM pose refiner.

Counterpart of the reference's native solver layer (L0: libtestso_final.so,
loaded via ctypes at rf_tools/LM.py:10 and called through register_GN_C at
:256-266). Ours builds from source on first use (g++ available in the image)
and caches the .so next to the source; the binary is not committed, so a
source edit always rebuilds (no mtime-staleness trap) and non-x86 hosts get
a native build instead of a CDLL failure.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lm_solver.cpp")
_SO = os.path.join(_HERE, "liblm_solver.so")

_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the solver if needed; returns the .so path."""
    if force or not os.path.exists(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
        )
    return _SO


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        try:
            lib = ctypes.CDLL(build())
        except OSError:
            # cached .so unloadable (e.g. copied from another arch) —
            # rebuild from source once before giving up
            lib = ctypes.CDLL(build(force=True))
        dp = ctypes.POINTER(ctypes.c_double)
        lib.LM.argtypes = [dp, dp, dp, dp, dp, dp, ctypes.c_int]
        lib.LM.restype = None
        _lib = lib
    return _lib


# fixed Jacobian scratch bound in lm_solver.cpp (kMaxN)
MAX_N = 512


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def lm_refine(
    x2d: np.ndarray,
    x3d: np.ndarray,
    quat_init: np.ndarray,
    trans_init: np.ndarray,
    weights: np.ndarray,
    camera_K: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Float64 weighted GN refine (ref register_GN_C semantics).

    x2d (N,2), x3d (N,3), quat_init (4,) wxyz, trans_init (3,),
    weights (N,2), camera_K (3,3). Returns (quat (4,), trans (3,)).
    N must be <= MAX_N (the solver's fixed scratch bound).
    """
    lib = _load()
    n = int(x2d.shape[0])
    if n > MAX_N:
        raise ValueError(
            f"lm_refine supports at most {MAX_N} correspondences, got {n}; "
            "solve larger stacks with the JAX solver (core/pnp.register_gn)"
        )
    value = np.ascontiguousarray(
        np.concatenate([quat_init.ravel(), trans_init.ravel()]), np.float64
    )
    x2d_c = np.ascontiguousarray(x2d, np.float64)
    x3d_c = np.ascontiguousarray(x3d, np.float64)
    # trailing constraint-weight pair for ABI parity with the reference layout
    w_c = np.ascontiguousarray(
        np.concatenate([np.asarray(weights, np.float64).reshape(n, 2),
                        np.full((1, 2), 1e8)]),
        np.float64,
    )
    cam_c = np.ascontiguousarray(camera_K, np.float64)
    ans = np.zeros(7, np.float64)

    dp = ctypes.POINTER(ctypes.c_double)
    as_p = lambda a: a.ctypes.data_as(dp)
    lib.LM(as_p(value), as_p(x2d_c), as_p(x3d_c), as_p(w_c), as_p(cam_c), as_p(ans), n)
    return ans[:4], ans[4:]
