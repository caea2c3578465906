"""ctypes binding for the native C++ decode/prefetch runtime (native/loader.cpp).

Builds libnhvr_loader.so on first use (g++ -O3, links system libjpeg/libpng)
and caches it under native/build/. Falls back cleanly when the toolchain or
libraries are unavailable — callers check `available()`.

API:
  decode_image(path, size, mode) -> np.ndarray       one-shot decode
  NativeBatcher(paths, size, mode, threads)          worker-pool prefetcher
      .submit(indices) / .wait() -> (N, ...) array
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "loader.cpp")
_BUILD = os.path.join(_REPO, "native", "build")
_SO = os.path.join(_BUILD, "libnhvr_loader.so")

MODE_RGB = 0     # float32 (S,S,3) in [-1,1]
MODE_GRAY = 1    # float32 (S,S) in [0,1]
MODE_LABEL = 2   # uint8 (S,S,3), nearest resize (IUV)

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _build_failed or not os.path.exists(_SRC):
        return None
    os.makedirs(_BUILD, exist_ok=True)
    if not os.path.exists(_SO) or (os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
               "-o", _SO, "-ljpeg", "-lpng", "-lpthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        _build_failed = True
        return None
    lib.nhvr_decode_image.restype = ctypes.c_int
    lib.nhvr_decode_image.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                      ctypes.c_int, ctypes.c_int]
    lib.nhvr_batch_create.restype = ctypes.c_void_p
    lib.nhvr_batch_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int]
    lib.nhvr_batch_submit.restype = ctypes.c_int
    lib.nhvr_batch_submit.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.c_int, ctypes.c_void_p]
    lib.nhvr_batch_wait.restype = ctypes.c_int
    lib.nhvr_batch_wait.argtypes = [ctypes.c_void_p]
    lib.nhvr_batch_destroy.argtypes = [ctypes.c_void_p]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is None and not _build_failed:
            _lib = _build()
        return _lib


def available() -> bool:
    return _get_lib() is not None


def _item_shape(size: int, mode: int):
    if mode == MODE_GRAY:
        return (size, size)
    return (size, size, 3)


def _item_dtype(mode: int):
    return np.uint8 if mode == MODE_LABEL else np.float32


def decode_image(path: str, size: int, mode: int = MODE_RGB) -> np.ndarray:
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty(_item_shape(size, mode), _item_dtype(mode))
    rc = lib.nhvr_decode_image(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                               size, mode)
    if rc != 0:
        raise IOError(f"native decode failed ({rc}): {path}")
    return out


class NativeBatcher:
    """Worker-pool decoder: submit a batch of file indices, wait for the
    assembled tensor. Decoding overlaps the caller's device step."""

    def __init__(self, paths: Sequence[str], size: int, mode: int = MODE_RGB,
                 threads: int = 4):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self.size, self.mode = size, mode
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = lib.nhvr_batch_create(arr, len(paths), size, mode, threads)
        self._out: Optional[np.ndarray] = None

    def submit(self, indices: Sequence[int]) -> None:
        n = len(indices)
        self._out = np.empty((n,) + _item_shape(self.size, self.mode),
                             _item_dtype(self.mode))
        idx = (ctypes.c_int * n)(*[int(i) for i in indices])
        rc = self._lib.nhvr_batch_submit(
            self._handle, idx, n, self._out.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise RuntimeError(f"batch submit failed ({rc})")

    def wait(self) -> np.ndarray:
        rc = self._lib.nhvr_batch_wait(self._handle)
        if rc != 0:
            raise IOError(f"{-rc} decode errors in batch")
        out, self._out = self._out, None
        return out

    def close(self) -> None:
        if self._handle:
            self._lib.nhvr_batch_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
