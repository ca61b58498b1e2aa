"""Native (C++) host-side preprocessing — ctypes bindings + lazy build.

The shared library is compiled on first use (g++ -O3, no external deps) and
cached next to the source. Python falls back to numpy implementations when a
compiler is unavailable (pipelines.py keeps the reference semantics either
way).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "pointprep.cc")
_LIB = os.path.join(_HERE, "libpointprep.so")
_lock = threading.Lock()
_lib = None


def _build() -> str:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def load():
    """Returns the ctypes lib or None (no compiler)."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            lib = ctypes.CDLL(_build())
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            return None
        i64, u64, f32p, i32p, cp = (
            ctypes.c_int64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p,
        )
        lib.pp_read_bin.restype = i64
        lib.pp_read_bin.argtypes = [cp, f32p, i64]
        lib.pp_range_filter.restype = i64
        lib.pp_range_filter.argtypes = [f32p, i64, i64, f32p]
        lib.pp_global_rot_scale_trans.restype = None
        lib.pp_global_rot_scale_trans.argtypes = [
            f32p, i64, i64, f32p, i64, i64, ctypes.c_float, ctypes.c_float, f32p,
        ]
        lib.pp_flip.restype = None
        lib.pp_flip.argtypes = [f32p, i64, i64, f32p, i64, i64, ctypes.c_int]
        lib.pp_shuffle_pad.restype = i64
        lib.pp_shuffle_pad.argtypes = [f32p, i64, i64, f32p, i64, u64]
        lib.pp_tanh_cols.restype = None
        lib.pp_tanh_cols.argtypes = [f32p, i64, i64, i64, i64]
        lib.pp_prepare_sample.restype = i64
        lib.pp_prepare_sample.argtypes = [
            cp, i64, i32p, i64, f32p, ctypes.c_float, ctypes.c_float, f32p,
            ctypes.c_int, ctypes.c_int, f32p, i64, u64, f32p, i64,
        ]
        _lib = lib
        return _lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def available() -> bool:
    return load() is not None


def read_bin(path: str, max_floats: int = 8 << 20) -> np.ndarray | None:
    lib = load()
    if lib is None:
        return None
    buf = np.empty(max_floats, np.float32)
    n = lib.pp_read_bin(path.encode(), _fp(buf), buf.size)
    if n < 0:
        return None
    return buf[:n]


def range_filter(pts: np.ndarray, pcr) -> np.ndarray:
    lib = load()
    pts = np.ascontiguousarray(pts, np.float32)
    if lib is None:
        m = (
            (pts[:, 0] >= pcr[0]) & (pts[:, 0] < pcr[3])
            & (pts[:, 1] >= pcr[1]) & (pts[:, 1] < pcr[4])
            & (pts[:, 2] >= pcr[2]) & (pts[:, 2] < pcr[5])
        )
        return pts[m]
    pcr = np.ascontiguousarray(pcr, np.float32)
    n = lib.pp_range_filter(_fp(pts), len(pts), pts.shape[1], _fp(pcr))
    return pts[:n]


def shuffle_pad(pts: np.ndarray, cap: int, seed: int):
    lib = load()
    pts = np.ascontiguousarray(pts, np.float32)
    out = np.zeros((cap, pts.shape[1]), np.float32)
    if lib is None:
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        keep = min(len(pts), cap)
        idx = rng.permutation(len(pts))[:keep]
        out[:keep] = pts[idx]
        return out, keep
    keep = lib.pp_shuffle_pad(_fp(pts), len(pts), pts.shape[1], _fp(out), cap,
                              seed)
    return out, int(keep)


def global_rot_scale_trans(pts, boxes, angle, scale, trans):
    lib = load()
    pts = np.ascontiguousarray(pts, np.float32)
    boxes = np.ascontiguousarray(
        boxes if boxes is not None else np.zeros((0, 7)), np.float32)
    if lib is None:
        raise RuntimeError("native lib unavailable")
    trans = np.ascontiguousarray(trans, np.float32)
    lib.pp_global_rot_scale_trans(
        _fp(pts), len(pts), pts.shape[1], _fp(boxes), len(boxes),
        boxes.shape[1] if boxes.size else 7, float(angle), float(scale),
        _fp(trans),
    )
    return pts, boxes


def flip(pts, boxes, axis: int):
    lib = load()
    pts = np.ascontiguousarray(pts, np.float32)
    boxes = np.ascontiguousarray(
        boxes if boxes is not None else np.zeros((0, 7)), np.float32)
    if lib is None:
        raise RuntimeError("native lib unavailable")
    lib.pp_flip(_fp(pts), len(pts), pts.shape[1], _fp(boxes), len(boxes),
                boxes.shape[1] if boxes.size else 7, axis)
    return pts, boxes
