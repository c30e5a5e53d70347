"""ctypes bindings for the C++ parity kernels (tests only).

Builds cpp/libparity.so on demand (single small TU, compiles in seconds) and
exposes the two reference-native-equivalent kernels: pairwise IoU and the
weighted Gauss-Newton pose refiner. See cpp/parity_kernels.cpp.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libparity.so")
_lib = None


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_CPP_DIR, "parity_kernels.cpp")
    stale = (
        not os.path.exists(_LIB_PATH)
        or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
    )
    if stale:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-o", _LIB_PATH, src],
            check=True,
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.iou_pairwise.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    gn_sig = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_double,
    ]
    lib.gn_refine_pose.argtypes = gn_sig
    lib.gn_refine_pose_cov.argtypes = gn_sig
    _lib = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def cpp_iou(boxes: np.ndarray, query: np.ndarray) -> np.ndarray:
    lib = load_library()
    boxes = np.ascontiguousarray(boxes, np.float32)
    query = np.ascontiguousarray(query, np.float32)
    out = np.zeros((len(boxes), len(query)), np.float32)
    lib.iou_pairwise(_fptr(boxes), len(boxes), _fptr(query), len(query), _fptr(out))
    return out


def cpp_gn_refine(
    rot: np.ndarray,
    trans: np.ndarray,
    pts2d: np.ndarray,
    pts3d: np.ndarray,
    weights: np.ndarray,
    cam: np.ndarray,
    iterations: int = 5,
    damping: float = 1e-3,
) -> tuple[np.ndarray, np.ndarray]:
    lib = load_library()
    r = np.ascontiguousarray(rot, np.float64).copy()
    t = np.ascontiguousarray(trans, np.float64).copy()
    p2 = np.ascontiguousarray(pts2d, np.float64)
    p3 = np.ascontiguousarray(pts3d, np.float64)
    w = np.ascontiguousarray(weights, np.float64)
    c = np.ascontiguousarray(cam, np.float64)
    lib.gn_refine_pose(
        _dptr(r), _dptr(t), _dptr(p2), _dptr(p3), _dptr(w), len(p3), _dptr(c),
        iterations, damping,
    )
    return r, t


def cpp_gn_refine_cov(
    rot: np.ndarray,
    trans: np.ndarray,
    pts2d: np.ndarray,
    pts3d: np.ndarray,
    cov_weights: np.ndarray,
    cam: np.ndarray,
    iterations: int = 5,
    damping: float = 1e-3,
) -> tuple[np.ndarray, np.ndarray]:
    """Covariance-weighted GN (cov_weights (n,3) = wxx, wxy, wyy): the
    reference Ceres cost's weight matrix, uncertainty_pnp.cpp:29-31."""
    lib = load_library()
    r = np.ascontiguousarray(rot, np.float64).copy()
    t = np.ascontiguousarray(trans, np.float64).copy()
    p2 = np.ascontiguousarray(pts2d, np.float64)
    p3 = np.ascontiguousarray(pts3d, np.float64)
    w = np.ascontiguousarray(cov_weights, np.float64)
    c = np.ascontiguousarray(cam, np.float64)
    lib.gn_refine_pose_cov(
        _dptr(r), _dptr(t), _dptr(p2), _dptr(p3), _dptr(w), len(p3), _dptr(c),
        iterations, damping,
    )
    return r, t
