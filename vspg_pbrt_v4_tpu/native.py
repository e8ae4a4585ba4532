"""ctypes bindings for the native helper library (native/*.cpp).

The reference implements its scene-build hot paths natively (BVH build in
cpu/aggregates.cpp, PLY loading via ext/rply). This module loads
``native/libvspg_native.so``, auto-building it with g++ on first use;
callers fall back to the pure-Python implementations when no compiler is
available (`ops/bvh.build_bvh` stays the correctness oracle).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_SO = os.path.join(_NATIVE_DIR, "libvspg_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    lib.vspg_build_bvh.restype = ctypes.c_int32
    lib.vspg_build_bvh.argtypes = [f32p, f32p, ctypes.c_int32, ctypes.c_int32,
                                   f32p, f32p, i32p, i32p, i32p, i32p]
    lib.vspg_ply_open.restype = ctypes.c_void_p
    lib.vspg_ply_open.argtypes = [ctypes.c_char_p]
    for name in ("vspg_ply_n_vertices", "vspg_ply_n_triangles"):
        getattr(lib, name).restype = ctypes.c_int64
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    for name in ("vspg_ply_has_normals", "vspg_ply_has_uv"):
        getattr(lib, name).restype = ctypes.c_int32
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.vspg_ply_fill.restype = None
    lib.vspg_ply_fill.argtypes = [ctypes.c_void_p, f32p, ctypes.c_void_p,
                                  ctypes.c_void_p, i32p]
    lib.vspg_ply_free.restype = None
    lib.vspg_ply_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available():
    return _load() is not None


def build_bvh_native(prim_bmin, prim_bmax, max_leaf=4):
    """Native binned-SAH build; returns the same tuple layout as
    ops.bvh.build_bvh or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pmin = np.ascontiguousarray(prim_bmin, np.float32)
    pmax = np.ascontiguousarray(prim_bmax, np.float32)
    n = pmin.shape[0]
    cap = max(2 * n, 1)
    bmin = np.empty((cap, 3), np.float32)
    bmax = np.empty((cap, 3), np.float32)
    right = np.empty(cap, np.int32)
    start = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    order = np.empty(max(n, 1), np.int32)
    n_nodes = lib.vspg_build_bvh(pmin, pmax, n, max_leaf, bmin, bmax, right,
                                 start, count, order)
    from .ops.bvh import BVH
    import jax.numpy as jnp

    return BVH(jnp.asarray(bmin[:n_nodes]), jnp.asarray(bmax[:n_nodes]),
               jnp.asarray(right[:n_nodes]), jnp.asarray(start[:n_nodes]),
               jnp.asarray(count[:n_nodes]), jnp.asarray(order))


def load_ply(path):
    """Load a PLY mesh natively. Returns dict(P, indices[, N][, uv]) or None."""
    lib = _load()
    if lib is None:
        return None
    h = lib.vspg_ply_open(str(path).encode())
    if not h:
        return None
    try:
        nv = lib.vspg_ply_n_vertices(h)
        nt = lib.vspg_ply_n_triangles(h)
        pos = np.empty((nv, 3), np.float32)
        idx = np.empty((nt, 3), np.int32)
        has_n = bool(lib.vspg_ply_has_normals(h))
        has_uv = bool(lib.vspg_ply_has_uv(h))
        nrm = np.empty((nv, 3), np.float32) if has_n else None
        uv = np.empty((nv, 2), np.float32) if has_uv else None
        lib.vspg_ply_fill(
            h, pos,
            nrm.ctypes.data_as(ctypes.c_void_p) if has_n else None,
            uv.ctypes.data_as(ctypes.c_void_p) if has_uv else None,
            idx)
        out = dict(P=pos, indices=idx)
        if has_n:
            out["N"] = nrm
        if has_uv:
            out["uv"] = uv
        return out
    finally:
        lib.vspg_ply_free(h)
