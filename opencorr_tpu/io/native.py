"""ctypes bridge to the native I/O runtime (native/opencorr_native.cpp).

Auto-builds the shared library on first use if a compiler is available; all
callers fall back to the pure-Python path when the library is missing, so the
package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libopencorr_native.so"))

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "opencorr_native.cpp")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", _LIB_PATH, src],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.oc_write_table.restype = ctypes.c_int
    lib.oc_write_table.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_char,
    ]
    lib.oc_read_table.restype = ctypes.c_int64
    lib.oc_read_table.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_char,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.oc_write_volume_bin.restype = ctypes.c_int
    lib.oc_write_volume_bin.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def write_table(path: str, header: str, data: np.ndarray,
                delimiter: str = ",") -> bool:
    lib = _load()
    if lib is None:
        return False
    arr = np.ascontiguousarray(data, np.float32)
    rc = lib.oc_write_table(
        path.encode(), header.encode(), arr,
        arr.shape[0], arr.shape[1], delimiter.encode())
    return rc == 0


def read_table(path: str, skip_header: bool = True, max_cols: int = 64,
               delimiter: str = ",") -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    try:
        # Exact row bound: count newlines (tight, unlike filesize//3 which
        # over-allocated ~85x for wide tables).
        max_rows = 1
        with open(path, "rb") as f:
            while True:
                chunk = f.read(1 << 20)
                if not chunk:
                    break
                max_rows += chunk.count(b"\n")
        out = np.zeros((max_rows, max_cols), np.float32)
        ncols = ctypes.c_int64(0)
        rows = lib.oc_read_table(path.encode(), int(skip_header), out,
                                 max_rows, max_cols, delimiter.encode(),
                                 ctypes.byref(ncols))
    except (OSError, MemoryError):
        return None  # callers fall back to the pure-Python path
    if rows < 0 or ncols.value <= 0:
        return None
    return out[: rows, : ncols.value].copy()
