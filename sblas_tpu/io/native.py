"""ctypes bridge to the native Matrix-Market parser (native/mtxparse.cpp).

Loads `native/libsblasio.so`, building it with `make` on first use when a
compiler is available.  Falls back silently to the pure-numpy path in
`mmio.py` when unavailable — the native library is a performance tier, not
a capability tier.  Parity contract: byte-identical triplets to the numpy
parser (tested in tests/test_native_io.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libsblasio.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False

FIELD_CODES = {"pattern": 0, "real": 1, "integer": 1, "complex": 2}


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and \
            os.environ.get("SBLAS_NO_NATIVE_BUILD") != "1":
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           capture_output=True, timeout=120, check=True)
        except (OSError, subprocess.SubprocessError):
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.sblas_mtx_parse.restype = ctypes.c_int
    lib.sblas_mtx_parse.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.sblas_mtx_count_lines.restype = ctypes.c_int64
    lib.sblas_mtx_count_lines.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.sblas_edge_color.restype = ctypes.c_int
    lib.sblas_edge_color.argtypes = [
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def edge_color(src: np.ndarray, dst: np.ndarray, n_left: int, n_right: int,
               d: int) -> np.ndarray:
    """Color a d-regular bipartite multigraph with d colors (native/route.cpp).

    Raises RuntimeError when the native library is unavailable or the input
    is not d-regular (caller may fall back to the pure-python path)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native edge coloring unavailable")
    src32 = np.ascontiguousarray(src, dtype=np.int32)
    dst32 = np.ascontiguousarray(dst, dtype=np.int32)
    out = np.empty(len(src32), dtype=np.int32)
    rc = lib.sblas_edge_color(
        n_left, n_right, len(src32), d,
        src32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dst32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        raise RuntimeError(f"native edge coloring failed with code {rc}")
    return out


def available() -> bool:
    return (os.environ.get("SBLAS_NO_NATIVE") != "1") and _load() is not None


def parse_coordinate(path: str, offset: int, nnz: int, field: str):
    """Parse `nnz` coordinate entries; returns (rows, cols, vals[, imag]).

    Raises RuntimeError on parse failure (caller may fall back to numpy).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native parser unavailable")
    rows = np.empty(nnz, dtype=np.int64)
    cols = np.empty(nnz, dtype=np.int64)
    vals = np.empty(nnz, dtype=np.float64)
    want_imag = field == "complex"
    imag = np.empty(nnz, dtype=np.float64) if want_imag else None
    rc = lib.sblas_mtx_parse(
        path.encode(), offset, nnz, FIELD_CODES[field],
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        imag.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        if want_imag else None)
    if rc != 0:
        raise RuntimeError(f"native mtx parse failed with code {rc}")
    return (rows, cols, vals, imag) if want_imag else (rows, cols, vals)
