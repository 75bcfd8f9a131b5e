"""Lazy native-code builder: compiles the C++ sources in ``native/`` into
shared libraries on first use (g++ -O3 -shared -fPIC) and loads them via
ctypes. No pip/pybind11 required; artifacts cache next to the sources in
``native/build/`` keyed by source mtime."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_BUILD_DIR = os.path.join(_NATIVE_DIR, "build")

_cache: dict = {}


def load_native(name: str) -> Optional[ctypes.CDLL]:
    """Compile-and-load ``native/<name>.cpp`` -> lib<name>.so. Returns None if
    the toolchain or source is unavailable (callers fall back to Python)."""
    if name in _cache:
        return _cache[name]
    src = os.path.join(_NATIVE_DIR, f"{name}.cpp")
    if not os.path.exists(src):
        _cache[name] = None
        return None
    os.makedirs(_BUILD_DIR, exist_ok=True)
    so = os.path.join(_BUILD_DIR, f"lib{name}.so")
    try:
        # <=: a source edit within the artifact's mtime second must rebuild
        if (not os.path.exists(so)
                or os.path.getmtime(so) <= os.path.getmtime(src)):
            # Compile to a private temp path and rename into place: g++
            # writing the final path directly means an interrupted compile
            # leaves a truncated .so whose fresh mtime suppresses rebuilds
            # forever (and a concurrent process could CDLL a torn file).
            # rename() is atomic within the directory.
            tmp = os.path.join(_BUILD_DIR, f".lib{name}.{os.getpid()}.tmp.so")
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src],
                    check=True, capture_output=True,
                )
                os.replace(tmp, so)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        lib = ctypes.CDLL(so)
    except Exception:
        _cache[name] = None
        return None
    _cache[name] = lib
    return lib
