"""ctypes bindings to the native host runtime (native/libsmallpt_host.so).

The reference's host-side native layer is C++ threading (ThreadUtils.h) plus
GL presentation (glutils.*); the TPU build's host runtime is a small C++
library covering the host-bound work that is off the XLA compute path:
threaded tone-mapping + PPM/PNG encoding of large frames, and an async frame
writer for the progressive viewer. Falls back to numpy when unbuilt.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libsmallpt_host.so"),
    os.path.join(os.path.dirname(__file__), "libsmallpt_host.so"),
]


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
                lib.spt_write_ppm.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.c_int,
                ]
                lib.spt_write_ppm.restype = ctypes.c_int
                lib.spt_tonemap.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_longlong,
                    ctypes.c_int,
                ]
                lib.spt_tonemap.restype = None
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def available() -> bool:
    return _load() is not None


def write_ppm(path: str, img: np.ndarray) -> None:
    """Threaded tone-map + ASCII P3 write. img: (H,W,3) float32, already
    flipped by the caller."""
    lib = _load()
    data = np.ascontiguousarray(img, dtype=np.float32)
    h, w = data.shape[:2]
    rc = lib.spt_write_ppm(
        path.encode(),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w,
        h,
        0,
    )
    if rc != 0:
        raise IOError(f"spt_write_ppm failed with {rc}")


def tonemap(img: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """Gamma-2.2 8-bit tone-map via the native threaded path."""
    lib = _load()
    data = np.ascontiguousarray(img, dtype=np.float32)
    out = np.empty(data.shape, dtype=np.uint8)
    lib.spt_tonemap(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_longlong(data.size),
        n_threads,
    )
    return out
