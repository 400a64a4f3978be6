"""ctypes bindings for the native (C++) velodyne loader (native/lidar_io.cpp).

The reference feeds training from torch DataLoader worker *processes*
(main.py num_workers); here a C++ thread pool prefetches fixed-capacity scan
buffers in-process (no pickling, no fork), and the projection happens on the
TPU (ops.lidar). Builds on demand with the baked-in toolchain; falls back to
the pure-python reader when compilation is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "liblidar_io.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "lidar_io.cpp")


def build_native(force: bool = False) -> Optional[str]:
    """Compile the shared library (g++ is baked into the image)."""
    if os.path.exists(_SO_PATH) and not force:
        return _SO_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _SO_PATH, _SRC_PATH, "-lpthread"],
            check=True, capture_output=True)
        return _SO_PATH
    except Exception as e:  # pragma: no cover - toolchain missing
        print(f"[native_loader] build failed ({e}); using python fallback")
        return None


class NativeScanLoader:
    """Threaded prefetching reader over a list of velodyne .bin files."""

    def __init__(self, paths: List[str], max_points: int = 130000,
                 n_threads: int = 4, prefetch: int = 16):
        so = build_native()
        if so is None:
            raise RuntimeError("native loader unavailable")
        self.lib = ctypes.CDLL(so)
        self.lib.lidar_loader_create.restype = ctypes.c_void_p
        self.lib.lidar_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        self.lib.lidar_loader_destroy.argtypes = [ctypes.c_void_p]
        self.lib.lidar_loader_enqueue.argtypes = [ctypes.c_void_p,
                                                  ctypes.c_int64]
        self.lib.lidar_loader_next.restype = ctypes.c_int64
        self.lib.lidar_loader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32)]

        self.max_points = max_points
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._paths_keepalive = arr
        self.handle = self.lib.lidar_loader_create(
            arr, len(paths), max_points, n_threads, prefetch)
        self.n = len(paths)

    def enqueue(self, idx: int) -> None:
        self.lib.lidar_loader_enqueue(self.handle, idx)

    def next(self) -> Tuple[int, np.ndarray, np.ndarray, int]:
        """Blocking: (scan_index, xyz (max_points,3), remission, n_valid)."""
        xyz = np.empty((self.max_points, 3), np.float32)
        rem = np.empty((self.max_points,), np.float32)
        nv = ctypes.c_int32(0)
        idx = self.lib.lidar_loader_next(
            self.handle,
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rem.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(nv))
        return int(idx), xyz, rem, int(nv.value)

    def close(self):
        if getattr(self, "handle", None):
            self.lib.lidar_loader_destroy(self.handle)
            self.handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
