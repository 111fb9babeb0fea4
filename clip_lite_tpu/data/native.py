"""ctypes bindings for the native data-plane (native/clrec_core.cpp).

Exposes:
  * NativeClRecReader — mmap'd CLRec access through the C++ reader
    (zero-copy payload views, no Python struct/mmap overhead);
  * decode_crop_batch — threaded fused JPEG decode -> crop -> bilinear
    resize -> flip into one output buffer, GIL-free for the whole batch
    (the framework's native replacement for the reference's
    LMDB + OpenCV + albumentations hot path).

Falls back gracefully: ``native_available()`` is False when the shared
library has not been built (``make -C native``), and callers use the
pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import pickle
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libclrec_core.so"),
    os.path.join(os.path.dirname(__file__), "libclrec_core.so"),
]

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for path in _LIB_PATHS:
        path = os.path.abspath(path)
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            lib.clrec_open.restype = ctypes.c_void_p
            lib.clrec_open.argtypes = [ctypes.c_char_p]
            lib.clrec_count.restype = ctypes.c_uint64
            lib.clrec_count.argtypes = [ctypes.c_void_p]
            lib.clrec_record.restype = ctypes.c_int
            lib.clrec_record.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_uint64)]
            lib.clrec_close.argtypes = [ctypes.c_void_p]
            lib.decode_crop_batch.restype = ctypes.c_int
            lib.decode_crop_batch.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),   # jpegs
                ctypes.POINTER(ctypes.c_uint64),   # lens
                ctypes.c_int,                      # n
                ctypes.c_int,                      # out_size
                ctypes.POINTER(ctypes.c_float),    # crop_boxes
                ctypes.POINTER(ctypes.c_uint8),    # flips
                ctypes.POINTER(ctypes.c_uint8),    # out
                ctypes.c_int]                      # num_threads
            _lib = lib
            return _lib
    return None


def native_available() -> bool:
    return _load() is not None


class NativeClRecReader:
    """CLRec reader backed by the C++ mmap core; returns unpickled records."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (make -C native)")
        self.path = path
        self._lib = lib
        self._h = lib.clrec_open(path.encode())
        if not self._h:
            raise ValueError(f"{path}: not a CLRec file")
        self._count = lib.clrec_count(self._h)

    def __len__(self) -> int:
        return self._count

    def payload(self, i: int) -> bytes:
        ptr = ctypes.POINTER(ctypes.c_uint8)()
        ln = ctypes.c_uint64()
        if self._lib.clrec_record(self._h, i, ctypes.byref(ptr),
                                  ctypes.byref(ln)) != 0:
            raise IndexError(i)
        return ctypes.string_at(ptr, ln.value)

    def __getitem__(self, i: int):
        return pickle.loads(self.payload(i))

    def close(self):
        if self._h:
            self._lib.clrec_close(self._h)
            self._h = None

    def __getstate__(self):
        return {"path": self.path}

    def __setstate__(self, state):
        self.__init__(state["path"])


def decode_crop_batch(jpegs: Sequence[bytes], out_size: int,
                      crop_boxes: np.ndarray, flips: np.ndarray,
                      num_threads: int = 4) -> Tuple[np.ndarray, int]:
    """Fused decode+crop+resize+flip for a batch of JPEG buffers.

    crop_boxes: (N, 4) float32 normalized (y0, x0, y1, x1); y0 < 0 means
    full-image resize.  Returns (N, out, out, 3) uint8 and the number of
    failed decodes (zero-filled tiles).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    n = len(jpegs)
    keepalive = [np.frombuffer(j, np.uint8) for j in jpegs]
    ptrs = (ctypes.c_void_p * n)(
        *[arr.ctypes.data_as(ctypes.c_void_p).value for arr in keepalive])
    lens = (ctypes.c_uint64 * n)(*[len(j) for j in jpegs])
    boxes = np.ascontiguousarray(crop_boxes, np.float32)
    flips = np.ascontiguousarray(flips, np.uint8)
    out = np.empty((n, out_size, out_size, 3), np.uint8)
    failures = lib.decode_crop_batch(
        ptrs, lens, n, out_size,
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads)
    return out, failures


def random_resized_crop_boxes(rng: np.random.Generator, n: int,
                              scale=(0.2, 1.0), ratio=(0.75, 4 / 3)
                              ) -> np.ndarray:
    """Normalized crop boxes with the same area/aspect law as the host
    RandomResizedSquareCrop (data/transforms.py)."""
    boxes = np.empty((n, 4), np.float32)
    for i in range(n):
        area = rng.uniform(*scale)
        aspect = np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1])))
        cw = min(1.0, np.sqrt(area * aspect))
        ch = min(1.0, np.sqrt(area / aspect))
        x0 = rng.uniform(0, 1 - cw)
        y0 = rng.uniform(0, 1 - ch)
        boxes[i] = (y0, x0, y0 + ch, x0 + cw)
    return boxes
