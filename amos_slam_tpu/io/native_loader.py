"""ctypes bindings for the native C++ dataset loader (native/loader.cc).

The reference's host runtime is C++ (its dataset mains decode with OpenCV,
Examples/RGB-D/rgbd_tum.cc); this is the framework's native equivalent: PNG
decode + luma/metric-depth conversion + multi-threaded prefetch, so the
Python host loop never blocks on IO. Falls back gracefully when the shared
library has not been built (``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "libaslloader.so"
)


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        # self-build once if the toolchain is present
        import subprocess

        script = os.path.join(os.path.dirname(path), "build.sh")
        if os.path.exists(script):
            try:
                subprocess.run(
                    ["sh", script], check=True, capture_output=True, timeout=120
                )
            except Exception:
                pass
    if not os.path.exists(path):
        raise RuntimeError(
            f"native loader not built: run native/build.sh (missing {path})"
        )
    lib = ctypes.CDLL(path)
    lib.asl_decode_png.restype = ctypes.c_int64
    lib.asl_decode_png.argtypes = [ctypes.c_char_p, ctypes.c_float, ctypes.c_int]
    lib.asl_loader_create.restype = ctypes.c_int64
    lib.asl_loader_create.argtypes = [ctypes.c_float, ctypes.c_int, ctypes.c_int]
    lib.asl_loader_add.argtypes = [ctypes.c_int64, ctypes.c_char_p, ctypes.c_char_p]
    lib.asl_loader_get.restype = ctypes.c_int64
    lib.asl_loader_get.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.asl_loader_destroy.argtypes = [ctypes.c_int64]
    for name in ("width", "height", "has_depth", "has_rgb"):
        fn = getattr(lib, f"asl_frame_{name}")
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_int64]
    lib.asl_frame_copy_gray.argtypes = [ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
    lib.asl_frame_copy_depth.argtypes = [ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
    lib.asl_frame_copy_rgb.argtypes = [ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)]
    lib.asl_frame_release.argtypes = [ctypes.c_int64]
    _LIB = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def _frame_to_arrays(lib, handle):
    w = lib.asl_frame_width(handle)
    h = lib.asl_frame_height(handle)
    gray = np.empty((h, w), np.float32)
    lib.asl_frame_copy_gray(
        handle, gray.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    depth = None
    if lib.asl_frame_has_depth(handle):
        depth = np.empty((h, w), np.float32)
        lib.asl_frame_copy_depth(
            handle, depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
    rgb = None
    if lib.asl_frame_has_rgb(handle):
        rgb = np.empty((h, w, 3), np.uint8)
        lib.asl_frame_copy_rgb(
            handle, rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
    lib.asl_frame_release(handle)
    return gray, depth, rgb


def decode_png(path: str, depth_factor: float = 5000.0, is_depth: bool = False):
    """Decode one PNG natively -> (gray, depth, rgb) (unused slots None)."""
    lib = _load()
    handle = lib.asl_decode_png(path.encode(), depth_factor, int(is_depth))
    if handle == 0:
        raise RuntimeError(f"native decode failed: {path}")
    return _frame_to_arrays(lib, handle)


class NativePrefetchLoader:
    """Prefetching RGB-D sequence loader backed by the C++ thread pool."""

    def __init__(
        self,
        items: List[Tuple[float, str, Optional[str]]],  # (t, rgb, depth|None)
        depth_factor: float = 5000.0,
        n_workers: int = 4,
        ahead: int = 8,
    ):
        self.lib = _load()
        self.timestamps = [t for (t, _, _) in items]
        self.handle = self.lib.asl_loader_create(depth_factor, n_workers, ahead)
        for (_, rgb, dep) in items:
            self.lib.asl_loader_add(
                self.handle, rgb.encode(), dep.encode() if dep else None
            )

    def __len__(self):
        return len(self.timestamps)

    def __getitem__(self, i: int):
        fh = self.lib.asl_loader_get(self.handle, i)
        if fh == 0:
            raise RuntimeError(f"native loader failed at index {i}")
        gray, depth, rgb = _frame_to_arrays(self.lib, fh)
        return gray, depth, rgb, self.timestamps[i]

    def close(self):
        if self.handle:
            self.lib.asl_loader_destroy(self.handle)
            self.handle = 0

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
