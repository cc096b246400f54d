"""ctypes bindings for the native data-loader helpers (native/*.cpp).

The C++ .amat parser cuts static-binarized-MNIST startup from ~10 s
(numpy text parsing of ~50 MB ASCII per split) to ~0.2 s. The shared
library is built lazily from ``native/Makefile`` on first use; every
entry point has a pure-numpy fallback so the framework works without a
toolchain (SURVEY.md §2.4: the reference itself has no native code — this
is a performance addition, not a parity requirement).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native", "libamat.so")
_NATIVE_DIR = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.amat_dims.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.amat_dims.restype = ctypes.c_int
        lib.amat_parse_binary.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.amat_parse_binary.restype = ctypes.c_int
        lib.amat_parse_float.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.amat_parse_float.restype = ctypes.c_int
        _lib = lib
    except OSError:
        return None
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def load_amat_binary(path: str) -> Optional[np.ndarray]:
    """Parse a {0,1} .amat via the C++ parser. None if unavailable/failed."""
    lib = _load_lib()
    if lib is None:
        return None
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    if lib.amat_dims(path.encode(), ctypes.byref(rows), ctypes.byref(cols)) != 0:
        return None
    out = np.empty((rows.value, cols.value), dtype=np.uint8)
    rc = lib.amat_parse_binary(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rows.value,
        cols.value,
    )
    return out if rc == 0 else None


def load_amat_float(path: str) -> Optional[np.ndarray]:
    """Parse a float .amat via the C++ parser. None if unavailable/failed."""
    lib = _load_lib()
    if lib is None:
        return None
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    if lib.amat_dims(path.encode(), ctypes.byref(rows), ctypes.byref(cols)) != 0:
        return None
    out = np.empty((rows.value, cols.value), dtype=np.float32)
    rc = lib.amat_parse_float(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows.value,
        cols.value,
    )
    return out if rc == 0 else None
