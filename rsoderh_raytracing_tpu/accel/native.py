"""ctypes bindings to the native C++ host builders (native/).

Compiled on first use with g++ (cached next to the source); every entry
point returns None when the native library is unavailable so callers
fall back to the numpy implementations transparently.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
    )


def _load() -> ctypes.CDLL | None:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        src = os.path.join(_native_dir(), "raytracing_native.cpp")
        lib_path = os.path.join(_native_dir(), "libraytracing_native.so")
        try:
            if not os.path.exists(lib_path) or os.path.getmtime(
                lib_path
            ) < os.path.getmtime(src):
                subprocess.run(
                    [
                        "g++",
                        "-O3",
                        "-shared",
                        "-fPIC",
                        "-std=c++17",
                        src,
                        "-o",
                        lib_path,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(lib_path)
        except (OSError, subprocess.CalledProcessError) as err:
            log.warning("native library unavailable (%s); using numpy", err)
            _load_failed = True
            return None

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

        lib.build_alias_table.restype = ctypes.c_int64
        lib.build_alias_table.argtypes = [
            f32p, ctypes.c_int64, f32p, i32p, f32p,
        ]
        lib.build_bvh_sah.restype = ctypes.c_int64
        lib.build_bvh_sah.argtypes = [
            f32p, f32p, ctypes.c_int64,
            f32p, f32p, i32p, i32p, i32p, i32p,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_alias_table_native(probabilities: np.ndarray):
    """probabilities: f32 normalized to mean 1. Returns
    (probability, alias_index, pmf, leftover_count) or None."""
    lib = _load()
    if lib is None:
        return None
    probabilities = np.ascontiguousarray(probabilities, np.float32)
    length = len(probabilities)
    out_prob = np.empty(length, np.float32)
    out_alias = np.empty(length, np.int32)
    out_pmf = np.empty(length, np.float32)
    leftover = lib.build_alias_table(
        probabilities, length, out_prob, out_alias, out_pmf
    )
    if leftover > 0:
        log.info("AliasTable: %d left over pixels out of %d", leftover, length)
    return out_prob, out_alias, out_pmf, int(leftover)


def build_bvh_native(mins: np.ndarray, maxs: np.ndarray):
    """Returns (nodes_min, nodes_max, payload, count, axis, order, depth)
    or None. Same flat layout as the numpy builder."""
    lib = _load()
    if lib is None:
        return None
    mins = np.ascontiguousarray(mins, np.float32)
    maxs = np.ascontiguousarray(maxs, np.float32)
    n = len(mins)
    cap = max(1, 2 * n - 1)
    nodes_min = np.empty((cap, 3), np.float32)
    nodes_max = np.empty((cap, 3), np.float32)
    payload = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    axis = np.empty(cap, np.int32)
    order = np.empty(n, np.int32)
    depth = ctypes.c_int32(0)
    k = lib.build_bvh_sah(
        mins, maxs, n, nodes_min, nodes_max, payload, count, axis, order,
        ctypes.byref(depth),
    )
    if k < 0:
        return None
    return (
        nodes_min[:k].copy(),
        nodes_max[:k].copy(),
        payload[:k].copy(),
        count[:k].copy(),
        axis[:k].copy(),
        order,
        int(depth.value),
    )
