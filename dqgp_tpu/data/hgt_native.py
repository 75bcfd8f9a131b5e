"""ctypes wrapper over the native SRTM .hgt parser (native/hgtio.cpp)."""

from __future__ import annotations

import ctypes

import numpy as np

from ..native_build import load_native


def read_hgt(path: str, n: int) -> np.ndarray:
    lib = load_native("hgtio")
    if lib is None:
        raise RuntimeError("native hgtio unavailable")
    fn = lib.read_hgt
    fn.restype = ctypes.c_longlong
    fn.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                   ctypes.POINTER(ctypes.c_double)]
    out = np.empty((n, n), np.float64)
    rc = fn(path.encode(), n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc == -1:
        raise FileNotFoundError(path)
    if rc == -2:
        raise IOError(f"short read parsing {path}")
    return out
