"""Native (C++) runtime components, loaded via ctypes.

The reference's runtime is C++ throughout; here the TPU compute path is
JAX/XLA and the host-side runtime pieces that benefit from native code —
the compact wire serializer (bandwidth-critical, SURVEY.md §5.8) — are
C++ compiled on first use into native/build/.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_DIR, "build")
_LOCK = threading.Lock()
_LIB = None


def _compile() -> str:
    os.makedirs(_BUILD, exist_ok=True)
    src = os.path.join(_DIR, "serializer.cpp")
    so = os.path.join(_BUILD, "libcoxnative.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", src, "-o", so + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(so + ".tmp", so)
    return so


def lib() -> ctypes.CDLL:
    """Load (compiling if needed) the native library."""
    global _LIB
    with _LOCK:
        if _LIB is None:
            L = ctypes.CDLL(_compile())
            L.cox_serialized_bound.restype = ctypes.c_size_t
            L.cox_serialized_bound.argtypes = [ctypes.c_uint32,
                                               ctypes.c_uint32]
            L.cox_serialize.restype = ctypes.c_size_t
            L.cox_serialize.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
                ctypes.c_float, ctypes.c_float, ctypes.c_void_p,
                ctypes.c_size_t]
            L.cox_peek.restype = ctypes.c_int
            L.cox_peek.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float)]
            L.cox_deserialize.restype = ctypes.c_int
            L.cox_deserialize.argtypes = [
                ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            _LIB = L
    return _LIB
