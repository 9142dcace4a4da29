"""ctypes bindings for the native (C++) IO components.

Loads careless_tpu/xtal/_native_lib.so (built from cpp/ via `make -C cpp`).
Falls back silently when unbuilt — pure-Python paths cover all
functionality; the native paths are the high-throughput data loaders.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native_lib.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        raise ImportError(f"native library not built: {_LIB_PATH}")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.stream_parse.restype = ctypes.c_void_p
    lib.stream_parse.argtypes = [ctypes.c_char_p]
    lib.stream_n_refl.restype = ctypes.c_int64
    lib.stream_n_refl.argtypes = [ctypes.c_void_p]
    lib.stream_hkl.restype = ctypes.POINTER(ctypes.c_int32)
    lib.stream_hkl.argtypes = [ctypes.c_void_p]
    lib.stream_cols.restype = ctypes.POINTER(ctypes.c_float)
    lib.stream_cols.argtypes = [ctypes.c_void_p]
    lib.stream_cell.restype = ctypes.POINTER(ctypes.c_double)
    lib.stream_cell.argtypes = [ctypes.c_void_p]
    lib.stream_error.restype = ctypes.c_char_p
    lib.stream_error.argtypes = [ctypes.c_void_p]
    lib.stream_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def parse_stream(path: str) -> Tuple[dict, Optional[list]]:
    """Parse a CrystFEL stream via the native parser.

    Returns (arrays dict matching xtal.stream column contract, cell params).
    """
    lib = _load()
    handle = lib.stream_parse(path.encode())
    try:
        err = lib.stream_error(handle)
        if err:
            raise ValueError(err.decode())
        n = lib.stream_n_refl(handle)
        hkl = np.ctypeslib.as_array(lib.stream_hkl(handle),
                                    shape=(n, 3)).copy()
        cols = np.ctypeslib.as_array(lib.stream_cols(handle),
                                     shape=(n, 11)).copy()
        cell_ptr = lib.stream_cell(handle)
        cell = list(np.ctypeslib.as_array(cell_ptr, shape=(6,))) if cell_ptr \
            else None
    finally:
        lib.stream_free(handle)

    arrays = {
        "H": hkl[:, 0], "K": hkl[:, 1], "L": hkl[:, 2],
        "I": cols[:, 0], "SigI": cols[:, 1],
        "BATCH": cols[:, 2].astype(np.int32),
        "s1x": cols[:, 3], "s1y": cols[:, 4], "s1z": cols[:, 5],
        "ewald_offset": cols[:, 6],
        "angular_ewald_offset": cols[:, 7],
        "XDET": cols[:, 8], "YDET": cols[:, 9],
        "Wavelength": cols[:, 10],
    }
    return arrays, cell
