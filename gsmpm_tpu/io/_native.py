"""ctypes bridge to the native IO tier (csrc/gsmpm_native.cpp).

Loads gsmpm_tpu/io/libgsmpm_native.so, building it with
scripts/build_native.sh on first use if a compiler is available. Every entry
point returns None on any failure so callers fall back to the pure-Python
codec in io/ply.py -- the native tier is an accelerator, not a dependency.

Set GSMPM_NO_NATIVE=1 to disable entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_SO = os.path.join(os.path.dirname(__file__), "libgsmpm_native.so")
_BUILD = os.path.join(
    os.path.dirname(__file__), "..", "..", "scripts", "build_native.sh"
)


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("GSMPM_NO_NATIVE"):
        return None
    try:
        if not os.path.exists(_SO) and os.path.exists(_BUILD):
            subprocess.run(
                ["sh", _BUILD], check=True, capture_output=True, timeout=120
            )
        lib = ctypes.CDLL(_SO)
        lib.gsn_ply_header.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.gsn_ply_header.restype = ctypes.c_int
        lib.gsn_ply_read_f32_planar.argtypes = [
            ctypes.c_char_p,
            ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.gsn_ply_read_f32_planar.restype = ctypes.c_int
        lib.gsn_ply_write_f32_planar.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.gsn_ply_write_f32_planar.restype = ctypes.c_int
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _n_threads() -> int:
    return min(8, os.cpu_count() or 1)


def read_ply_f32_columns(path: str) -> Optional[Dict[str, np.ndarray]]:
    """Fast path for all-float32 binary_little_endian vertex PLYs.

    Returns {prop_name: (n,) float32} or None (caller falls back).
    """
    lib = _load()
    if lib is None:
        return None
    n = ctypes.c_longlong()
    n_props = ctypes.c_int()
    names = ctypes.create_string_buffer(16384)
    off = ctypes.c_longlong()
    all_f32 = ctypes.c_int()
    rc = lib.gsn_ply_header(
        path.encode(), ctypes.byref(n), ctypes.byref(n_props), names,
        len(names), ctypes.byref(off), ctypes.byref(all_f32),
    )
    if rc != 0 or not all_f32.value or n.value <= 0:
        return None
    out = np.empty((n_props.value, n.value), np.float32)
    rc = lib.gsn_ply_read_f32_planar(
        path.encode(), off.value, n.value, n_props.value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _n_threads(),
    )
    if rc != 0:
        return None
    cols = names.value.decode().split("\n")
    return {name: out[i] for i, name in enumerate(cols)}


def write_ply_f32_planar(
    path: str, header: str, planar: np.ndarray
) -> bool:
    """Write header + interleaved block from (n_props, n) f32 planar data."""
    lib = _load()
    if lib is None:
        return False
    planar = np.ascontiguousarray(planar, np.float32)
    rc = lib.gsn_ply_write_f32_planar(
        path.encode(), header.encode(),
        planar.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        planar.shape[1], planar.shape[0], _n_threads(),
    )
    return rc == 0
