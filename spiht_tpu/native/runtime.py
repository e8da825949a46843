"""ctypes bindings + on-demand build of the native SPIHT scheduling kernel.

The shared library is compiled once from spiht_kernel.cpp with g++ and
cached next to this file (or in SPIHT_TPU_CACHE). All entry points release
the GIL for the duration of the C call, so Python-level thread pools get
real parallelism on top of the kernel's own batch threading.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "spiht_kernel.cpp")
_LOCK = threading.Lock()
_LIB = None
_LOAD_FAILED = False

c_i32_p = ctypes.POINTER(ctypes.c_int32)
c_i8_p = ctypes.POINTER(ctypes.c_int8)
c_u8_p = ctypes.POINTER(ctypes.c_uint8)


def _build(so_path: str) -> None:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-o",
        so_path,
        _SRC,
        "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _so_path() -> str:
    cache = os.environ.get("SPIHT_TPU_CACHE", _HERE)
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libspiht_kernel.so")


class _Kernel:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.spiht_encode.restype = ctypes.c_int
        lib.spiht_encode.argtypes = [
            c_i32_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_longlong, ctypes.c_int,
            c_i8_p, c_i8_p, c_i8_p,
            ctypes.POINTER(c_u8_p), ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.spiht_decode.restype = ctypes.c_int
        lib.spiht_decode.argtypes = [
            c_u8_p, ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            c_i32_p, ctypes.c_int, c_i32_p, c_i32_p, c_i32_p, ctypes.c_int,
        ]
        lib.spiht_free.restype = None
        lib.spiht_free.argtypes = [c_u8_p]
        lib.spiht_compute_maps.restype = None
        lib.spiht_compute_maps.argtypes = [
            c_i32_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, c_i8_p, c_i8_p, c_i8_p,
        ]

    # -- core ---------------------------------------------------------------
    def encode(
        self,
        arr: np.ndarray,
        ll_h: int,
        ll_w: int,
        max_bits: int,
        use_maps: bool = True,
        maps: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None,
    ) -> Tuple[bytes, int]:
        arr = np.ascontiguousarray(arr, dtype=np.int32)
        c, h, w = arr.shape
        out_data = c_u8_p()
        out_nbits = ctypes.c_longlong()
        out_max_n = ctypes.c_int()
        if maps is not None:
            M, D, G = (np.ascontiguousarray(m, dtype=np.int8) for m in maps)
            mp, dp, gp = (
                M.ctypes.data_as(c_i8_p),
                D.ctypes.data_as(c_i8_p),
                G.ctypes.data_as(c_i8_p),
            )
        else:
            mp = dp = gp = ctypes.cast(None, c_i8_p)
        # clamp the python-level "unbounded" sentinel into int64 range
        max_bits = min(int(max_bits), 2**62)
        rc = self._lib.spiht_encode(
            arr.ctypes.data_as(c_i32_p), c, h, w, ll_h, ll_w,
            max_bits, int(use_maps), mp, dp, gp,
            ctypes.byref(out_data), ctypes.byref(out_nbits),
            ctypes.byref(out_max_n),
        )
        if rc != 0:
            raise ValueError(f"spiht_encode failed (rc={rc}); ll dims must be > 1")
        nbytes = (out_nbits.value + 7) // 8
        data = ctypes.string_at(out_data, nbytes)
        self._lib.spiht_free(out_data)
        return data, out_max_n.value

    def decode(
        self, data: bytes, n: int, c: int, h: int, w: int, ll_h: int, ll_w: int
    ) -> np.ndarray:
        rec = np.zeros((c, h, w), dtype=np.int32)
        buf = np.frombuffer(data, dtype=np.uint8)
        nullp = ctypes.cast(None, c_i32_p)
        rc = self._lib.spiht_decode(
            buf.ctypes.data_as(c_u8_p), len(data) * 8, n, c, h, w, ll_h, ll_w,
            rec.ctypes.data_as(c_i32_p), 0, nullp, nullp, nullp, 0,
        )
        if rc != 0:
            raise ValueError(f"spiht_decode failed (rc={rc})")
        return rec

    def decode_with_metadata(
        self, data: bytes, n: int, c: int, h: int, w: int, ll_h: int,
        ll_w: int, top_slice, other_slices,
    ) -> Tuple[np.ndarray, np.ndarray]:
        rec = np.zeros((c, h, w), dtype=np.int32)
        nbits = len(data) * 8
        meta = np.zeros((nbits + 1, 8), dtype=np.int32)
        top = np.array([top_slice[0][1], top_slice[1][1]], dtype=np.int32)
        level = len(other_slices)
        other = np.zeros((level, 3, 2, 2), dtype=np.int32)
        for li, filters in enumerate(other_slices):
            for fi, rect in enumerate(filters):
                other[li, fi, 0] = rect[0]
                other[li, fi, 1] = rect[1]
        buf = np.frombuffer(data, dtype=np.uint8)
        rc = self._lib.spiht_decode(
            buf.ctypes.data_as(c_u8_p), nbits, n, c, h, w, ll_h, ll_w,
            rec.ctypes.data_as(c_i32_p), 1, meta.ctypes.data_as(c_i32_p),
            top.ctypes.data_as(c_i32_p), other.ctypes.data_as(c_i32_p), level,
        )
        if rc != 0:
            raise ValueError(f"spiht_decode failed (rc={rc})")
        return rec, meta

    def compute_maps(self, arr: np.ndarray, ll_h: int, ll_w: int):
        arr = np.ascontiguousarray(arr, dtype=np.int32)
        c, h, w = arr.shape
        M = np.empty((c, h, w), dtype=np.int8)
        D = np.empty((c, h, w), dtype=np.int8)
        G = np.empty((c, h, w), dtype=np.int8)
        self._lib.spiht_compute_maps(
            arr.ctypes.data_as(c_i32_p), c, h, w, ll_h, ll_w,
            M.ctypes.data_as(c_i8_p), D.ctypes.data_as(c_i8_p),
            G.ctypes.data_as(c_i8_p),
        )
        return M, D, G


def load() -> Optional[_Kernel]:
    """Load (building if needed) the native kernel; None if unavailable."""
    global _LIB, _LOAD_FAILED
    if _LIB is not None:
        return _LIB
    if _LOAD_FAILED or os.environ.get("SPIHT_TPU_NO_NATIVE"):
        return None
    with _LOCK:
        if _LIB is not None:
            return _LIB
        so = _so_path()
        try:
            if (not os.path.exists(so)) or (
                os.path.getmtime(so) < os.path.getmtime(_SRC)
            ):
                _build(so)
            _LIB = _Kernel(ctypes.CDLL(so))
        except Exception:
            _LOAD_FAILED = True
            return None
        return _LIB
