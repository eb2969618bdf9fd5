"""Native (C++) builder components, loaded via ctypes with numpy fallback.

Compiles spray_tpu/native/builder.cpp on first use (result cached next to the
source, rebuilt when the source is newer).  Everything here degrades to the
pure-numpy implementations if a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "builder.cpp")
_LIB = os.path.join(_HERE, "_libspray.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB,
           "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True, timeout=300)


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            lib.spray_morton_order.argtypes = [f32p, f32p, ctypes.c_int64, i64p]
            lib.spray_morton_order.restype = None
            lib.spray_tri_transforms.argtypes = [
                f32p, f32p, f32p, ctypes.c_int64, f32p,
            ]
            lib.spray_tri_transforms.restype = None
            _lib = lib
        except (OSError, subprocess.SubprocessError):
            _lib = None
        return _lib


def morton_order(tlo, thi):
    """Native Morton ordering; returns (n,) int64 or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    tlo = np.ascontiguousarray(tlo, np.float32)
    thi = np.ascontiguousarray(thi, np.float32)
    n = len(tlo)
    out = np.empty(n, np.int64)
    lib.spray_morton_order(tlo, thi, n, out)
    return out


def tri_transforms(v0, e1, e2):
    """Native Woop transforms; returns (n,4,3) f32 or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    v0 = np.ascontiguousarray(v0, np.float32)
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    n = len(v0)
    out = np.empty((n, 4, 3), np.float32)
    lib.spray_tri_transforms(v0, e1, e2, n, out)
    return out
