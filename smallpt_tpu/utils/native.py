"""ctypes bindings to the native host runtime (native/libsmallpt_host.so).

The reference's host-side native layer is C++ threading (ThreadUtils.h) plus
GL presentation (glutils.*); the TPU build's host runtime is a small C++
library covering the host-bound work that is off the XLA compute path:
threaded tone-mapping + PPM encoding of large frames, threaded vertical flip,
and an async frame writer for the progressive viewer (the reference's
producer/consumer display thread, smallpt.cpp:895-988, without a window).

The library is auto-built from source with `make` on first use when a
toolchain is available; everything falls back to numpy when unbuilt
(set SMALLPT_TPU_NO_NATIVE=1 to force the fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)
_LIB_PATHS = [
    os.path.join(_NATIVE_DIR, "libsmallpt_host.so"),
    os.path.join(os.path.dirname(__file__), "libsmallpt_host.so"),
]


def _try_build() -> None:
    """Build the shared library in-tree if the source + make are present.

    The attempt (and any failure) is logged via log_json so the implicit
    compile side effect is observable; SMALLPT_TPU_NO_NATIVE=1 disables the
    native path (and with it this build) entirely."""
    from smallpt_tpu.utils.metrics import log_json

    src = os.path.join(_NATIVE_DIR, "smallpt_host.cpp")
    if not os.path.exists(src):
        return
    log_json("native_build", {"dir": _NATIVE_DIR, "status": "start"})
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "libsmallpt_host.so"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        log_json("native_build", {"dir": _NATIVE_DIR, "status": "ok"})
    except (OSError, subprocess.SubprocessError) as e:
        log_json(
            "native_build",
            {"dir": _NATIVE_DIR, "status": "failed", "error": str(e)[:200]},
        )


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_u8_p = ctypes.POINTER(ctypes.c_uint8)
    lib.spt_version.argtypes = []
    lib.spt_version.restype = ctypes.c_int
    lib.spt_default_threads.argtypes = []
    lib.spt_default_threads.restype = ctypes.c_int
    lib.spt_tonemap.argtypes = [c_float_p, c_u8_p, ctypes.c_longlong, ctypes.c_int]
    lib.spt_tonemap.restype = None
    lib.spt_flip_y.argtypes = [c_float_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.spt_flip_y.restype = None
    lib.spt_write_ppm.argtypes = [
        ctypes.c_char_p, c_float_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.spt_write_ppm.restype = ctypes.c_int
    lib.spt_frame_writer_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.spt_frame_writer_create.restype = ctypes.c_void_p
    lib.spt_frame_writer_push.argtypes = [ctypes.c_void_p, c_float_p, ctypes.c_int]
    lib.spt_frame_writer_push.restype = ctypes.c_int
    lib.spt_frame_writer_pending.argtypes = [ctypes.c_void_p]
    lib.spt_frame_writer_pending.restype = ctypes.c_int
    lib.spt_frame_writer_errors.argtypes = [ctypes.c_void_p]
    lib.spt_frame_writer_errors.restype = ctypes.c_int
    lib.spt_frame_writer_destroy.argtypes = [ctypes.c_void_p]
    lib.spt_frame_writer_destroy.restype = None
    return lib


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SMALLPT_TPU_NO_NATIVE"):
        return None
    if not any(os.path.exists(p) for p in _LIB_PATHS):
        _try_build()
    for p in _LIB_PATHS:
        if os.path.exists(p):
            try:
                _LIB = _bind(ctypes.CDLL(p))
                break
            except (OSError, AttributeError):
                continue
    return _LIB


def available() -> bool:
    return _load() is not None


def _as_float_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def write_ppm(path: str, img: np.ndarray, binary: bool = False) -> None:
    """Threaded tone-map + PPM write (ASCII P3 by default, like the
    reference's writeImage). img: (H,W,3) float32, already flipped by the
    caller."""
    lib = _load()
    data = np.ascontiguousarray(img, dtype=np.float32)
    h, w = data.shape[:2]
    rc = lib.spt_write_ppm(path.encode(), _as_float_ptr(data), w, h, int(binary))
    if rc != 0:
        raise IOError(f"spt_write_ppm failed with {rc}")


def tonemap(img: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """Gamma-2.2 8-bit tone-map via the native threaded path."""
    lib = _load()
    data = np.ascontiguousarray(img, dtype=np.float32)
    out = np.empty(data.shape, dtype=np.uint8)
    lib.spt_tonemap(
        _as_float_ptr(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_longlong(data.size),
        n_threads,
    )
    return out


def flip_y(img: np.ndarray, n_threads: int = 0) -> np.ndarray:
    """Threaded in-place vertical flip; returns the (possibly copied) array."""
    lib = _load()
    data = np.ascontiguousarray(img, dtype=np.float32)
    h, w = data.shape[:2]
    lib.spt_flip_y(_as_float_ptr(data), w, h, n_threads)
    return data


class FrameWriter:
    """Async frame sink: a native consumer thread encodes + writes frames
    while the caller keeps rendering — the reference's render/display
    producer-consumer split (smallpt.cpp:895-988)."""

    def __init__(self, pattern: str, width: int, height: int,
                 binary: bool = True, max_queue: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._shape = (height, width, 3)
        self._handle = lib.spt_frame_writer_create(
            pattern.encode(), width, height, int(binary), max_queue
        )
        if not self._handle:
            raise RuntimeError("spt_frame_writer_create failed")

    def push(self, img: np.ndarray, frame_idx: int) -> None:
        data = np.ascontiguousarray(img, dtype=np.float32)
        if data.shape != self._shape:
            # the native side reads exactly 3*w*h floats — a smaller frame
            # would be a heap overread
            raise ValueError(f"frame shape {data.shape} != {self._shape}")
        rc = self._lib.spt_frame_writer_push(self._handle, _as_float_ptr(data), frame_idx)
        if rc != 0:
            raise IOError(f"spt_frame_writer_push failed with {rc}")

    @property
    def pending(self) -> int:
        return self._lib.spt_frame_writer_pending(self._handle)

    @property
    def errors(self) -> int:
        return self._lib.spt_frame_writer_errors(self._handle)

    def close(self) -> None:
        if self._handle:
            self._lib.spt_frame_writer_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
