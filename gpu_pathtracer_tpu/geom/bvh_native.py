"""ctypes loader for the native C++ SAH BVH builder (native/bvh_builder.cpp).

Compiles the shared library on first use (g++ -O2); the numpy fallback in
geom/bvh.py takes over if compilation or loading fails. The native builder
is the analog of the reference's CPU build hot loop (bvh.cpp:38-151) —
required to keep million-triangle scene startup fast.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "bvh_builder.cpp")
_SO = os.path.join(_REPO, "native", "libbvh_builder.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O2", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC],
            check=True, capture_output=True)
    lib = ctypes.CDLL(_SO)
    lib.build_bvh.restype = ctypes.c_int
    lib.build_bvh.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def build_bvh_native(prim_bbox_min: np.ndarray, prim_bbox_max: np.ndarray):
    from gpu_pathtracer_tpu.geom.bvh import FlatBVH

    lib = _load()
    n = prim_bbox_min.shape[0]
    cap = max(2 * n, 2)
    bmin = np.ascontiguousarray(prim_bbox_min, np.float32)
    bmax = np.ascontiguousarray(prim_bbox_max, np.float32)
    nb_min = np.empty((cap, 3), np.float32)
    nb_max = np.empty((cap, 3), np.float32)
    second = np.empty(cap, np.int32)
    start = np.empty(cap, np.int32)
    end = np.empty(cap, np.int32)
    is_leaf = np.empty(cap, np.uint8)
    order = np.empty(n, np.int32)
    n_nodes = np.zeros(1, np.int32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.build_bvh(
        ptr(bmin, ctypes.c_float), ptr(bmax, ctypes.c_float), n,
        ptr(nb_min, ctypes.c_float), ptr(nb_max, ctypes.c_float),
        ptr(second, ctypes.c_int32), ptr(start, ctypes.c_int32),
        ptr(end, ctypes.c_int32), ptr(is_leaf, ctypes.c_uint8),
        ptr(order, ctypes.c_int32), ptr(n_nodes, ctypes.c_int32))
    if rc != 0:
        raise RuntimeError(f"native bvh build failed rc={rc}")
    k = int(n_nodes[0])
    return FlatBVH(
        bbox_min=nb_min[:k].copy(), bbox_max=nb_max[:k].copy(),
        is_leaf=is_leaf[:k].astype(bool), second_child=second[:k].copy(),
        start=start[:k].copy(), end=end[:k].copy(), prim_order=order)
