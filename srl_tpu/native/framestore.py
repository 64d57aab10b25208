"""ctypes bindings for the native framestore (see framestore.cpp).

The shared library is compiled on first use with the system g++ (no
pybind11) and cached next to the source; everything degrades gracefully to
the npz path when no compiler is present.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DTYPES = {np.dtype(np.uint8): 0, np.dtype(np.float32): 1, np.dtype(np.int32): 2}
_DTYPES_INV = {v: k for k, v in _DTYPES.items()}

_lib = None
_lib_lock = threading.Lock()
_SRC = os.path.join(os.path.dirname(__file__), "framestore.cpp")
_SO = os.path.join(os.path.dirname(__file__), "libframestore.so")


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC,
             "-lpthread"],
            check=True, capture_output=True,
        )
        return _SO
    except (OSError, subprocess.CalledProcessError):
        return None


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.fs_writer_open.restype = ctypes.c_void_p
        lib.fs_writer_open.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.fs_writer_push.restype = ctypes.c_int
        lib.fs_writer_push.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
        ]
        lib.fs_writer_frames.restype = ctypes.c_uint64
        lib.fs_writer_frames.argtypes = [ctypes.c_void_p]
        lib.fs_writer_close.restype = ctypes.c_uint64
        lib.fs_writer_close.argtypes = [ctypes.c_void_p]
        lib.fs_reader_open.restype = ctypes.c_void_p
        lib.fs_reader_open.argtypes = [ctypes.c_char_p]
        lib.fs_reader_data.restype = ctypes.c_void_p
        lib.fs_reader_data.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.fs_reader_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class FrameStoreWriter:
    """Non-blocking frame sink: push() copies the batch into the native ring
    queue and returns; background threads drain to disk."""

    def __init__(self, path: str, frame_shape: Tuple[int, ...],
                 dtype=np.uint8):
        lib = _load()
        assert lib is not None, "native framestore unavailable (no g++?)"
        self._lib = lib
        dims = (ctypes.c_uint64 * len(frame_shape))(*frame_shape)
        self.frame_shape = tuple(frame_shape)
        self.dtype = np.dtype(dtype)
        self._handle = lib.fs_writer_open(
            path.encode(), _DTYPES[self.dtype], len(frame_shape), dims
        )
        assert self._handle, f"failed to open framestore at {path}"

    def push(self, frames: np.ndarray):
        frames = np.ascontiguousarray(frames, self.dtype)
        assert frames.shape[1:] == self.frame_shape, (
            f"{frames.shape[1:]} != {self.frame_shape}"
        )
        rc = self._lib.fs_writer_push(
            self._handle, frames.ctypes.data_as(ctypes.c_void_p),
            frames.shape[0],
        )
        assert rc == 0, "framestore push failed"

    def close(self) -> int:
        total = self._lib.fs_writer_close(self._handle)
        self._handle = None
        return int(total)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self._handle:
            self.close()


class FrameStoreReader:
    """Zero-copy mmap view over a frame store."""

    def __init__(self, path: str):
        lib = _load()
        assert lib is not None, "native framestore unavailable"
        self._lib = lib
        self._handle = lib.fs_reader_open(path.encode())
        assert self._handle, f"failed to open framestore at {path}"
        dtype = ctypes.c_uint32()
        ndim = ctypes.c_uint32()
        dims = (ctypes.c_uint64 * 5)()
        nframes = ctypes.c_uint64()
        ptr = lib.fs_reader_data(
            self._handle, ctypes.byref(dtype), ctypes.byref(ndim), dims,
            ctypes.byref(nframes),
        )
        shape = (int(nframes.value),) + tuple(
            int(dims[i]) for i in range(ndim.value)
        )
        np_dtype = _DTYPES_INV[dtype.value]
        nbytes = int(np.prod(shape)) * np_dtype.itemsize
        buf = (ctypes.c_char * nbytes).from_address(ptr)
        self.frames = np.frombuffer(buf, dtype=np_dtype).reshape(shape)
        self.frames.flags.writeable = False

    def close(self):
        # Invalidate the view before unmapping.
        self.frames = None
        self._lib.fs_reader_close(self._handle)
        self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self._handle:
            self.close()
