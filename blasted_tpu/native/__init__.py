"""ctypes bindings for the native host-preprocessing library.

Compiles ``native/blasted_host.cpp`` on first use (cached as
``native/build/libblasted_host.so``) and exposes the symbolic/setup routines
the reference implements natively (level scheduling, diagonal search, ILU(0)
position lists).  Every entry point has a pure-NumPy/Python fallback in the
main tree; set ``BLASTED_NO_NATIVE=1`` to force the fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["available", "levels_lower", "levels_upper", "diagind",
           "ilu_positions"]

_LIB = None
_TRIED = False


def _repo_root() -> Path:
    return Path(__file__).resolve().parents[2]


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("BLASTED_NO_NATIVE") == "1":
        return None
    src = _repo_root() / "native" / "blasted_host.cpp"
    if not src.exists():
        return None
    build = _repo_root() / "native" / "build"
    so = build / "libblasted_host.so"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            build.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 str(src), "-o", str(so)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(so))
    except Exception:
        return None

    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.blasted_levels_lower.argtypes = [ctypes.c_int64, i64p, i32p, i32p]
    lib.blasted_levels_upper.argtypes = [ctypes.c_int64, i64p, i32p, i32p]
    lib.blasted_diagind.argtypes = [ctypes.c_int64, i64p, i32p, i32p]
    lib.blasted_diagind.restype = ctypes.c_int64
    lib.blasted_ilu_positions.argtypes = [
        ctypes.c_int64, i64p, i32p, i32p, i64p,
        ctypes.c_void_p, ctypes.c_void_p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _prep(rowptr, colind):
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int64)
    colind = np.ascontiguousarray(colind, dtype=np.int32)
    return rowptr, colind


def levels_lower(rowptr, colind) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    rowptr, colind = _prep(rowptr, colind)
    n = rowptr.shape[0] - 1
    out = np.zeros(n, dtype=np.int32)
    lib.blasted_levels_lower(n, rowptr, colind, out)
    return out


def levels_upper(rowptr, colind) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    rowptr, colind = _prep(rowptr, colind)
    n = rowptr.shape[0] - 1
    out = np.zeros(n, dtype=np.int32)
    lib.blasted_levels_upper(n, rowptr, colind, out)
    return out


def diagind(rowptr, colind) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    rowptr, colind = _prep(rowptr, colind)
    n = rowptr.shape[0] - 1
    out = np.zeros(n, dtype=np.int32)
    bad = lib.blasted_diagind(n, rowptr, colind, out)
    if bad >= 0:
        raise ValueError(f"Row {bad} has no diagonal entry")
    return out


def ilu_positions(rowptr, colind, diag):
    """Returns (posptr, lowerp, upperp) or None if the library is missing."""
    lib = _load()
    if lib is None:
        return None
    rowptr, colind = _prep(rowptr, colind)
    diag = np.ascontiguousarray(diag, dtype=np.int32)
    n = rowptr.shape[0] - 1
    nnz = int(rowptr[-1])
    posptr = np.zeros(nnz + 1, dtype=np.int64)
    lib.blasted_ilu_positions(n, rowptr, colind, diag, posptr, None, None)
    total = int(posptr[-1])
    lowerp = np.zeros(total, dtype=np.int32)
    upperp = np.zeros(total, dtype=np.int32)
    lib.blasted_ilu_positions(
        n, rowptr, colind, diag, posptr,
        lowerp.ctypes.data_as(ctypes.c_void_p),
        upperp.ctypes.data_as(ctypes.c_void_p))
    return posptr, lowerp, upperp
