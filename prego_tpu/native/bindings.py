"""ctypes bindings for the native feature store (feature_store.cc).

Build: ``make -C prego_tpu/native`` (or ``build_native_library()``); the
data layer auto-detects the shared library and falls back to numpy when
absent, so the native engine is an acceleration, not a dependency.
"""

from __future__ import annotations

import ctypes
import os.path as osp
import subprocess
from typing import Optional, Sequence

import numpy as np

_LIB_DIR = osp.dirname(osp.abspath(__file__))
_LIB_PATH = osp.join(_LIB_DIR, "libprego_native.so")
_lib: Optional[ctypes.CDLL] = None


def build_native_library(quiet: bool = True) -> bool:
    """Compile libprego_native.so in place. Returns success."""
    try:
        subprocess.run(
            ["make", "-C", _LIB_DIR],
            check=True,
            capture_output=quiet,
        )
        return osp.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not osp.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fs_open.restype = ctypes.c_void_p
    lib.fs_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.fs_dims.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.fs_gather_windows.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
    ]
    # async gather entry points were added after the first .so release; a
    # stale library (built before them) must not break loading — degrade
    # to the synchronous gather path instead
    try:
        lib.fs_gather_windows_async.restype = ctypes.c_void_p
        lib.fs_gather_windows_async.argtypes = lib.fs_gather_windows.argtypes
        lib.fs_gather_wait.argtypes = [ctypes.c_void_p]
        lib._has_async_gather = True
    except AttributeError:
        lib._has_async_gather = False
    lib.fs_read_all.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.fs_read_rows.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int32,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.fs_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class PendingGather:
    """Handle for an in-flight background gather (double buffering)."""

    def __init__(self, lib, ticket, out: np.ndarray):
        self._lib = lib
        self._ticket = ticket
        self.out = out  # keeps the buffer alive while the C thread writes it

    def wait(self) -> np.ndarray:
        if self._ticket is not None:
            self._lib.fs_gather_wait(self._ticket)
            self._ticket = None
        return self.out

    def __del__(self):
        try:
            self.wait()  # never leak a running thread writing freed memory
        except Exception:
            pass


class NativeFeatureStore:
    """mmap'd .npy files with native parallel window gathering."""

    def __init__(self, paths: Sequence[str], n_threads: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "libprego_native.so not built — run make -C prego_tpu/native"
            )
        self._lib = lib
        self.n_threads = n_threads
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths]
        )
        ok = (ctypes.c_int32 * len(paths))()
        self._handle = lib.fs_open(arr, len(paths), ok)
        self.ok = np.ctypeslib.as_array(ok).astype(bool).copy()
        self.paths = list(paths)

    def dims(self, i: int):
        r, c = ctypes.c_int64(), ctypes.c_int64()
        self._lib.fs_dims(self._handle, i, ctypes.byref(r), ctypes.byref(c))
        return r.value, c.value

    def gather_windows(
        self, vid_idx: np.ndarray, starts: np.ndarray, window: int, dim: int
    ) -> np.ndarray:
        """Assemble (count, window, dim) float32 windows in parallel.
        Out-of-range windows are zero-filled (the training zero-prefix
        semantics are expressed as negative starts by the caller)."""
        vid_idx = np.ascontiguousarray(vid_idx, np.int32)
        starts = np.ascontiguousarray(starts, np.int64)
        count = len(vid_idx)
        out = np.empty((count, window, dim), np.float32)
        self._lib.fs_gather_windows(
            self._handle,
            vid_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            count,
            window,
            dim,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n_threads,
        )
        return out

    def gather_windows_async(
        self, vid_idx: np.ndarray, starts: np.ndarray, window: int, dim: int,
        out: Optional[np.ndarray] = None,
    ) -> "PendingGather":
        """Start a background gather into `out` (allocated if None); the
        next batch is assembled by the pthread pool while the accelerator
        runs the current step. Call .wait() before touching `out`."""
        vid_idx = np.ascontiguousarray(vid_idx, np.int32)
        starts = np.ascontiguousarray(starts, np.int64)
        count = len(vid_idx)
        if out is None:
            out = np.empty((count, window, dim), np.float32)
        assert out.shape == (count, window, dim) and out.dtype == np.float32
        if not getattr(self._lib, "_has_async_gather", False):
            # stale .so without the async entry points: gather synchronously
            out[:] = self.gather_windows(vid_idx, starts, window, dim)
            return PendingGather(self._lib, None, out)
        ticket = self._lib.fs_gather_windows_async(
            self._handle,
            vid_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            count,
            window,
            dim,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n_threads,
        )
        return PendingGather(self._lib, ticket, out)

    def read_all(self, i: int) -> np.ndarray:
        rows, cols = self.dims(i)
        out = np.empty((rows, cols), np.float32)
        self._lib.fs_read_all(
            self._handle, i, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return out

    def read_rows(self, i: int, start: int, count: int) -> np.ndarray:
        """Rows [start, start+count) as f32; out-of-range rows zero-filled."""
        _, cols = self.dims(i)
        out = np.empty((count, cols), np.float32)
        self._lib.fs_read_rows(
            self._handle, i, start, count,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out

    def close(self):
        if self._handle:
            self._lib.fs_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
