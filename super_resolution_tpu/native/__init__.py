"""Native (C++) runtime components, bound via ctypes.

The reference framework is C++ end to end; the pieces that belong in native
code here are the host-side runtime around the XLA compute path — currently
the streaming ENVI BSQ reader/writer (multithreaded, endian-aware, cropped
seeks). The shared library builds on demand with g++ and callers fall back to
the pure-numpy implementation when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["get_library", "native_available", "read_bsq", "write_bsq", "build_library"]

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_THIS_DIR, "envi_loader.cpp")
_LIB = os.path.join(_THIS_DIR, "libsr_envi.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def build_library(force: bool = False) -> str | None:
    """Compile the native library if needed; returns its path or None."""
    global _build_failed
    with _lock:
        if os.path.exists(_LIB) and not force:
            if not force and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
                return _LIB
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            "-pthread", _SRC, "-o", _LIB,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            _build_failed = False
            return _LIB
        except (subprocess.SubprocessError, FileNotFoundError):
            _build_failed = True
            return None


def get_library():
    """Load (building if necessary) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    path = _LIB if os.path.exists(_LIB) else build_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.sr_envi_read_bsq.restype = ctypes.c_int
    lib.sr_envi_read_bsq.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.sr_envi_write_bsq.restype = ctypes.c_int
    lib.sr_envi_write_bsq.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_library() is not None


def read_bsq(
    path: str,
    bands: int,
    rows: int,
    cols: int,
    crop=(None, None, None),
    header_offset: int = 0,
    big_endian: bool = False,
    num_threads: int = 0,
) -> np.ndarray:
    """Read a cropped float32 BSQ sub-cube natively. ``crop`` is
    ((b0, b1), (r0, r1), (c0, c1)) with None meaning the full range."""
    lib = get_library()
    if lib is None:
        raise RuntimeError("Native ENVI library unavailable.")
    (b0, b1), (r0, r1), (c0, c1) = [
        rng if rng is not None else (0, full)
        for rng, full in zip(crop, (bands, rows, cols))
    ]
    out = np.empty((b1 - b0, r1 - r0, c1 - c0), dtype=np.float32)
    threads = num_threads or min(os.cpu_count() or 1, 8)
    status = lib.sr_envi_read_bsq(
        path.encode(), header_offset, bands, rows, cols,
        b0, b1, r0, r1, c0, c1,
        1 if big_endian else 0, threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if status != 0:
        raise IOError(f"sr_envi_read_bsq failed with status {status} for {path}")
    return out


def write_bsq(path: str, cube: np.ndarray, big_endian: bool = False) -> None:
    lib = get_library()
    if lib is None:
        raise RuntimeError("Native ENVI library unavailable.")
    cube = np.ascontiguousarray(cube, dtype=np.float32)
    bands, rows, cols = cube.shape
    status = lib.sr_envi_write_bsq(
        path.encode(), bands, rows, cols, 1 if big_endian else 0,
        cube.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if status != 0:
        raise IOError(f"sr_envi_write_bsq failed with status {status} for {path}")
