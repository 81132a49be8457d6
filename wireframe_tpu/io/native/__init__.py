"""ctypes bridge to the C++ .xyz parser (fastparse.cpp).

Builds the shared object on first use with g++ (cached next to the
source); every failure path degrades to `None`, which makes
`wireframe_tpu.io.xyz.read_xyz` fall back to its numpy tokenizer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastparse.cpp")
_SO = os.path.join(_DIR, "_fastparse.so")
_LOCK = threading.Lock()
_LIB = None
_FAILED = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _LIB, _FAILED
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                _FAILED = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.parse_xyz.restype = ctypes.c_int
            lib.parse_xyz.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_long),
            ]
            lib.free_xyz_buffer.restype = None
            lib.free_xyz_buffer.argtypes = [
                ctypes.POINTER(ctypes.c_double)]
            _LIB = lib
        except Exception:
            _FAILED = True
        return _LIB


def parse_xyz_native(path: str) -> Optional[np.ndarray]:
    """Parse with the C++ backend; None on any failure (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    rc = lib.parse_xyz(path.encode(), ctypes.byref(data),
                       ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        return None
    try:
        n = rows.value * cols.value
        arr = np.ctypeslib.as_array(data, shape=(n,)).copy()
        return arr.reshape(rows.value, cols.value)
    finally:
        lib.free_xyz_buffer(data)
