"""Python surface over the native spatial library (ctypes).

Mirrors the slice of the reference's vendored ``spatial`` package that the
framework uses (/root/reference/spatial/__init__.py:100-105 exports qhull
only): ``Delaunay`` with the *modified* ``find_simplex(..., return_c=True)``
returning barycentric coordinates (qhull.pyx:2075,2154-2163), a ckdtree-class
nearest-neighbor query, and ``directed_hausdorff``. Auto-builds
``libfovealspatial.so`` with make on first use.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libfovealspatial.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _HERE], check=True, capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.delaunay_triangulate.restype = ctypes.c_int
    lib.delaunay_triangulate.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
    ]
    lib.find_simplex_bary.restype = None
    lib.find_simplex_bary.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double,
    ]
    lib.nearest_neighbor.restype = None
    lib.nearest_neighbor.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.directed_hausdorff.restype = ctypes.c_double
    lib.directed_hausdorff.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
    ]
    _lib = lib
    return lib


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class Delaunay:
    """Planar Delaunay triangulation with barycentric point location.

    API shape mirrors ``spatial.qhull.Delaunay`` (points -> .simplices;
    ``find_simplex(xi, return_c=True)`` -> (simplex ids, barycentric
    coordinates) — the reference's one functional qhull modification).
    """

    def __init__(self, points: np.ndarray):
        pts = np.ascontiguousarray(points, dtype=np.float64)
        assert pts.ndim == 2 and pts.shape[1] == 2, "2-D points expected"
        self.points = pts
        n = len(pts)
        lib = _load()
        max_tris = max(4 * n + 16, 64)
        out = np.empty((max_tris, 3), dtype=np.int32)
        cnt = lib.delaunay_triangulate(_dptr(pts), n, _iptr(out), max_tris)
        if cnt < 0:
            raise RuntimeError("triangle buffer overflow")
        self.simplices = np.ascontiguousarray(out[:cnt])

    def find_simplex(self, xi: np.ndarray, return_c: bool = False, tol: float = 1e-9):
        q = np.ascontiguousarray(xi, dtype=np.float64).reshape(-1, 2)
        lib = _load()
        simplex = np.empty(len(q), dtype=np.int32)
        bary = np.zeros((len(q), 3), dtype=np.float64)
        lib.find_simplex_bary(
            _dptr(self.points), len(self.points),
            _iptr(self.simplices), len(self.simplices),
            _dptr(q), len(q), _iptr(simplex), _dptr(bary), tol,
        )
        if return_c:
            return simplex, bary
        return simplex


def nearest_neighbor(points: np.ndarray, queries: np.ndarray) -> np.ndarray:
    """Index of the nearest point for each query (exact, grid-bucketed)."""
    pts = np.ascontiguousarray(points, dtype=np.float64).reshape(-1, 2)
    q = np.ascontiguousarray(queries, dtype=np.float64).reshape(-1, 2)
    out = np.empty(len(q), dtype=np.int32)
    _load().nearest_neighbor(_dptr(pts), len(pts), _dptr(q), len(q), _iptr(out))
    return out


def directed_hausdorff(a: np.ndarray, b: np.ndarray) -> float:
    aa = np.ascontiguousarray(a, dtype=np.float64).reshape(-1, 2)
    bb = np.ascontiguousarray(b, dtype=np.float64).reshape(-1, 2)
    return float(_load().directed_hausdorff(_dptr(aa), len(aa), _dptr(bb), len(bb)))
