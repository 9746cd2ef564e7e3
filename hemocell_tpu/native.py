"""ctypes loader for the native C++ runtime library (native/).

The compute path is JAX/Pallas on TPU; the *data path* around it (here: the
STL voxelizer, the C++ replacement for Palabos' VoxelizedDomain3D
classification) is native C++, mirroring the reference's C++ runtime.  The
library auto-builds on first use when a toolchain is present; every caller
has a pure-numpy fallback, so the package works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhemocell_native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        # lazy first-use build; stays quiet on failure (numpy fallback)
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "libhemocell_native.so"],
                capture_output=True, timeout=120, check=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.hemo_voxelize_parity.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.hemo_voxelize_parity.restype = None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def voxelize_parity(tris: np.ndarray, shape) -> np.ndarray | None:
    """Inside mask by +x ray-crossing parity (native). Returns None when the
    native library is unavailable (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    X, Y, Z = (int(s) for s in shape)
    t = np.ascontiguousarray(tris, dtype=np.float64)
    inside = np.empty((X, Y, Z), dtype=np.uint8)
    lib.hemo_voxelize_parity(
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(t.shape[0]),
        ctypes.c_int64(X), ctypes.c_int64(Y), ctypes.c_int64(Z),
        inside.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return inside.astype(bool)
