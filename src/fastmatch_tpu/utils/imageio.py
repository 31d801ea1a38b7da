"""Host-side image loading via the first-party native library (native/).

ctypes binding over libfmimageio.so (JPEG/PNG/PGM/PPM -> grayscale float32
in [0,1], optional bilinear resize). Builds the library on first use with
g++ if it isn't present (no cv2 anywhere in the product path — cv2 remains
a test oracle only, SURVEY.md §3.1).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None


def _native_dir() -> str:
    # src/fastmatch_tpu/utils/ -> repo root /native
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.normpath(os.path.join(here, "..", "..", "..", "native"))


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    ndir = _native_dir()
    so = os.path.join(ndir, "libfmimageio.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", ndir], check=True, capture_output=True)
    lib = ctypes.CDLL(so)
    lib.fm_load_gray.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.fm_load_gray.restype = ctypes.c_int
    lib.fm_resize_bilinear.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    lib.fm_resize_bilinear.restype = ctypes.c_int
    lib.fm_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return lib


def load_gray(path: str, size: tuple[int, int] | None = None) -> np.ndarray:
    """Decode an image to (H, W) float32 grayscale in [0,1]; optionally
    resize to ``size`` = (width, height)."""
    lib = _load_lib()
    data = ctypes.POINTER(ctypes.c_float)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.fm_load_gray(path.encode(), ctypes.byref(data), ctypes.byref(w),
                          ctypes.byref(h))
    if rc != 0:
        raise IOError(f"fm_load_gray({path!r}) failed with code {rc}")
    try:
        img = np.ctypeslib.as_array(data, shape=(h.value, w.value)).copy()
    finally:
        lib.fm_free(data)
    if size is not None and (w.value, h.value) != size:
        dw, dh = size
        out = np.empty((dh, dw), np.float32)
        rc = lib.fm_resize_bilinear(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w.value, h.value,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dw, dh,
        )
        if rc != 0:
            raise IOError("fm_resize_bilinear failed")
        return out
    return img


class FrameLoader:
    """Threaded prefetching frame loader over the native library (loader.cpp):
    N worker threads decode+resize ahead of the consumer into a bounded
    reorder buffer; iteration yields (index, (H, W) float32 [0,1]) strictly
    in order. The pipeline's data stage overlaps host decode with device
    compute (detect/match/BA) without any Python-thread involvement.

    Usage:
        with FrameLoader(paths, size=(640, 480)) as frames:
            for idx, img in frames: ...
    """

    def __init__(self, paths: list[str], size: tuple[int, int],
                 n_threads: int = 4, prefetch: int = 8):
        self._handle = None  # set first: __del__ runs even if init fails
        lib = _load_lib()
        lib.fm_loader_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.fm_loader_open.restype = ctypes.c_void_p
        lib.fm_loader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.fm_loader_next.restype = ctypes.c_int
        lib.fm_loader_close.argtypes = [ctypes.c_void_p]
        self._lib = lib
        self._paths = list(paths)
        self._w, self._h = size
        joined = "\n".join(self._paths).encode()
        self._handle = lib.fm_loader_open(
            joined, len(self._paths), self._w, self._h, n_threads, prefetch
        )
        if not self._handle:
            raise IOError("fm_loader_open failed")

    def __iter__(self):
        while True:
            buf = np.empty((self._h, self._w), np.float32)
            rc = self._lib.fm_loader_next(
                self._handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            )
            if rc == -1:
                return
            if rc == -2:
                continue  # decode error: skip the frame, keep streaming
            yield rc, buf

    def close(self):
        if self._handle:
            self._lib.fm_loader_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        self.close()
