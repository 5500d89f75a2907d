"""ctypes binding + on-demand build for the native C++ frame loader.

The reference decodes every frame inline on the tracking thread
(cv::VideoCapture in the main loop, ``src/main.cpp:199-226``), so decode
latency serializes with compute.  ``native/ellc_loader.cpp`` moves
decode+gray+resize to a C++ thread pool with a bounded in-order queue;
this module builds it with g++ on first use (no pybind11 in this image —
plain C ABI via ctypes) and exposes it as the same frame iterator
protocol ``runtime.io.image_dir_frames`` provides, with a transparent
PIL fallback when the toolchain or libjpeg is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "native", "ellc_loader.cpp")
_LIB = os.path.join(_HERE, "..", "native", "libellc_loader.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           os.path.abspath(_SRC), "-o", os.path.abspath(_LIB),
           "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(os.path.abspath(_LIB))
        except OSError:
            _build_failed = True
            return None
        lib.ellc_loader_open.restype = ctypes.c_void_p
        lib.ellc_loader_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int]
        lib.ellc_loader_count.restype = ctypes.c_int
        lib.ellc_loader_count.argtypes = [ctypes.c_void_p]
        lib.ellc_loader_next.restype = ctypes.c_int
        lib.ellc_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.ellc_loader_skip.restype = None
        lib.ellc_loader_skip.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ellc_loader_close.restype = None
        lib.ellc_loader_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeFrameLoader:
    """In-order prefetching frame source backed by the C++ pool."""

    def __init__(self, directory: str, rows: int, cols: int,
                 n_threads: int = 2, queue_cap: int = 8):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._h = lib.ellc_loader_open(directory.encode(), rows, cols,
                                       n_threads, queue_cap)
        if not self._h:
            raise FileNotFoundError(directory)
        self.rows, self.cols = rows, cols

    def __len__(self) -> int:
        return self._lib.ellc_loader_count(self._h)

    def skip(self, n: int) -> None:
        self._lib.ellc_loader_skip(self._h, n)

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self) -> np.ndarray:
        out = np.empty((self.rows, self.cols), np.float32)
        ok = self._lib.ellc_loader_next(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if not ok:
            raise StopIteration
        return out

    def close(self) -> None:
        if self._h:
            self._lib.ellc_loader_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def frames(directory: str, rows: int, cols: int,
           n_threads: int = 2, queue_cap: int = 8) -> Iterator[np.ndarray]:
    """Best-effort frame iterator: native C++ prefetch loader when
    buildable, otherwise the PIL path (resized to rows x cols)."""
    try:
        loader = NativeFrameLoader(directory, rows, cols, n_threads,
                                   queue_cap)
    except (RuntimeError, FileNotFoundError):
        from PIL import Image

        from egomotion_with_local_loop_closures_tpu.runtime import io as eio
        for img in eio.image_dir_frames(directory):
            if img.shape != (rows, cols):
                img = np.asarray(
                    Image.fromarray(img.astype(np.uint8)).resize(
                        (cols, rows), Image.BILINEAR), np.float32)
            yield img
        return
    with loader:
        yield from loader
