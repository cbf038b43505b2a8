"""Native (C++) components, built on demand with the system toolchain.

The reference delegates its host-side mesh processing to C++ (Open3D's core;
SURVEY.md §2.7). Here the equivalents are small self-contained C++ libraries
compiled at first use with g++ and bound via ctypes (pybind11 is not
available in this environment).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE = os.path.join(_DIR, "_build")


def _build(name: str, source: str) -> str:
    """Compile `source` (path) into a cached shared library; returns path."""
    os.makedirs(_CACHE, exist_ok=True)
    with open(source, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_CACHE, f"{name}_{digest}.so")
    if not os.path.exists(so_path):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", source, "-o", so_path],
            check=True,
            capture_output=True,
        )
    return so_path


_qem_lib = None


def _load_qem():
    global _qem_lib
    if _qem_lib is None:
        so = _build("qem", os.path.join(_DIR, "qem.cpp"))
        lib = ctypes.CDLL(so)
        lib.qem_decimate.restype = ctypes.c_int
        lib.qem_decimate.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        _qem_lib = lib
    return _qem_lib


def qem_available() -> bool:
    try:
        _load_qem()
        return True
    except Exception:
        return False


def qem_decimate(
    vertices: np.ndarray, faces: np.ndarray, target_vertices: int
) -> tuple[np.ndarray, np.ndarray]:
    """Garland-Heckbert quadric decimation to ~target_vertices."""
    lib = _load_qem()
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int64)
    out_v = np.empty_like(v)
    out_f = np.empty_like(f)
    nv = ctypes.c_int64(0)
    nf = ctypes.c_int64(0)
    rc = lib.qem_decimate(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.shape[0],
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), f.shape[0],
        int(target_vertices),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(nv),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(nf),
    )
    if rc != 0:
        raise RuntimeError(f"qem_decimate failed with code {rc}")
    return out_v[: nv.value].copy(), out_f[: nf.value].copy()
