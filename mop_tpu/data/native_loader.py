"""ctypes binding for the native C++ prefetching batch loader.

Builds ``native/mop_loader.cpp`` on first use (g++, cached under
``native/build/``) and exposes a ``NativeBatchIterator`` drop-in for
``BatchIterator``: worker threads assemble shuffled uint8 batches into a
prefetch ring off the step critical path. Falls back cleanly if no compiler
is available (``is_available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "mop_loader.cpp")
_SO = os.path.join(_NATIVE_DIR, "build", "libmop_loader.so")

_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return None
    except FileNotFoundError:
        return "g++ not found"
    except subprocess.CalledProcessError as e:  # pragma: no cover
        return e.stderr[:2000]


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        _build_error = _build()
        if _build_error:
            return None
    lib = ctypes.CDLL(_SO)
    lib.mop_loader_create.restype = ctypes.c_void_p
    lib.mop_loader_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_uint64, ctypes.c_int64,
    ]
    lib.mop_loader_next.restype = ctypes.c_int
    lib.mop_loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_void_p]
    lib.mop_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def is_available() -> bool:
    return _load() is not None


class NativeBatchIterator:
    """Infinite shuffled batch iterator backed by the C++ prefetch loader.

    Same interface as ``mop_tpu.data.BatchIterator`` (yields (uint8 batch,
    int32 labels)); batches are assembled in background threads.
    """

    def __init__(self, x: np.ndarray, y: np.ndarray, batch: int,
                 seed: int = 0, queue_depth: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self._lib = lib
        # Own contiguous copies for the loader's lifetime (it borrows pointers).
        self._x = np.ascontiguousarray(x, dtype=np.uint8)
        self._y = np.ascontiguousarray(y, dtype=np.int32)
        self.batch = int(batch)
        self.sample_shape = self._x.shape[1:]
        sample_bytes = int(np.prod(self.sample_shape))
        self._handle = lib.mop_loader_create(
            self._x.ctypes.data_as(ctypes.c_void_p),
            self._y.ctypes.data_as(ctypes.c_void_p),
            len(self._x), sample_bytes, self.batch,
            int(seed) & (2**64 - 1), int(queue_depth),
        )
        self._out_x = np.empty((self.batch,) + self.sample_shape, np.uint8)
        self._out_y = np.empty((self.batch,), np.int32)

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        rc = self._lib.mop_loader_next(
            self._handle,
            self._out_x.ctypes.data_as(ctypes.c_void_p),
            self._out_y.ctypes.data_as(ctypes.c_void_p),
        )
        if rc != 0:
            raise StopIteration
        return self._out_x.copy(), self._out_y.copy()

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.mop_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
