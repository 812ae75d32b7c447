"""ctypes loader for the native TOPO kernels (native/topo.cc).

Build-on-first-use with g++ (same pattern as graph/nms.py); every entry
point degrades to the pure-Python implementation when the toolchain or
source is unavailable. Compiled with -ffp-contract=off so C++ doubles track
Python doubles bit-for-bit (no fma contraction)."""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess

_NATIVE = None
_NATIVE_TRIED = False


def load_topo_native():
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    try:
        root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        src = os.path.join(root, "native", "topo.cc")
        if not os.path.exists(src) or shutil.which("g++") is None:
            return None
        build_dir = os.path.join(root, "native", "build")
        os.makedirs(build_dir, exist_ok=True)
        lib = os.path.join(build_dir, "libsamroad_topo.so")
        if not os.path.exists(lib) or os.path.getmtime(lib) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O2", "-ffp-contract=off", "-shared", "-fPIC",
                 "-std=c++17", "-o", lib, src],
                check=True, capture_output=True,
            )
        dll = ctypes.CDLL(lib)
        i64, f64 = ctypes.c_int64, ctypes.c_double
        pi64 = ctypes.POINTER(ctypes.c_int64)
        pf64 = ctypes.POINTER(ctypes.c_double)
        dll.topo_graph_create.restype = ctypes.c_void_p
        dll.topo_graph_create.argtypes = [i64, pf64, pi64, pi64, pi64, pi64]
        dll.topo_graph_free.argtypes = [ctypes.c_void_p]
        dll.topo_walk.restype = i64
        dll.topo_walk.argtypes = [
            ctypes.c_void_p, i64, f64, f64, ctypes.c_int, ctypes.c_int,
            i64, i64, f64, f64, ctypes.c_int, pf64, i64,
        ]
        dll.topo_loc_distance.restype = f64
        dll.topo_loc_distance.argtypes = [
            ctypes.c_void_p, i64, i64, f64, f64, i64, i64, f64, f64, f64,
        ]
        dll.topo_match.restype = i64
        dll.topo_match.argtypes = [pf64, i64, pf64, i64, f64, ctypes.c_int]
        _NATIVE = dll
    except Exception:
        _NATIVE = None
    return _NATIVE
