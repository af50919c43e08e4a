"""ctypes binding for the native fastparse library (``native/fastparse.cpp``).

Loads ``native/libfastparse.so`` when present (build with ``make -C native``);
callers fall back to the pure-Python parser when it is not. The binding
copies the malloc'd columns into numpy arrays and frees the C buffers.
"""
from __future__ import annotations

import ctypes
import logging
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libfastparse.so"
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.parse_int4_file.restype = ctypes.c_int64
        lib.parse_int4_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ]
        lib.fastparse_free.argtypes = [ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        logger.info("Loaded native fastparse from %s", _LIB_PATH)
    except OSError as exc:  # pragma: no cover
        logger.warning("Failed to load %s: %s", _LIB_PATH, exc)
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def parse_int4_file(path: str) -> Optional[Tuple[np.ndarray, ...]]:
    """Parse an all-integer ``a::b::c::d`` file into 4 int64 arrays.

    Returns None when the native library is unavailable or parsing fails
    (callers then use the Python parser).
    """
    lib = _load()
    if lib is None:
        return None
    ptrs = [ctypes.POINTER(ctypes.c_int64)() for _ in range(4)]
    n = lib.parse_int4_file(
        str(path).encode(), *[ctypes.byref(p) for p in ptrs]
    )
    if n < 0:
        return None
    try:
        cols = tuple(
            np.ctypeslib.as_array(p, shape=(n,)).copy() for p in ptrs
        )
    finally:
        for p in ptrs:
            lib.fastparse_free(p)
    return cols
