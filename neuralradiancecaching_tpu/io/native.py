"""ctypes bindings for the native IO library (csrc/nrcio.cpp).

Every entry point has a pure-Python fallback elsewhere in io/; loaders call
:func:`available` and prefer the native path when the library is built
(``make`` at the repo root).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "libnrcio.so")
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.nrc_hdr_decode.restype = ctypes.c_int
        lib.nrc_build_inv_cdfs.restype = ctypes.c_int
        lib.nrc_read_density.restype = ctypes.c_int
        lib.nrc_synthesize_cloud.restype = ctypes.c_int
        lib.nrc_write_exr.restype = ctypes.c_int
        lib.nrc_read_idx1.restype = ctypes.c_int64
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def hdr_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    lib = _load()
    out = np.empty((height, width, 3), dtype=np.float32)
    rc = lib.nrc_hdr_decode(payload, ctypes.c_int64(len(payload)),
                            width, height, _fptr(out))
    if rc != 0:
        raise ValueError(f"nrc_hdr_decode failed rc={rc}")
    return out


def build_inv_cdfs(rgb: np.ndarray):
    lib = _load()
    rgb = np.ascontiguousarray(rgb, dtype=np.float32)
    h, w = rgb.shape[:2]
    inv_x = np.empty((h, w), dtype=np.float32)
    inv_y = np.empty((h,), dtype=np.float32)
    rc = lib.nrc_build_inv_cdfs(_fptr(rgb), w, h, _fptr(inv_x), _fptr(inv_y))
    if rc != 0:
        raise ValueError("nrc_build_inv_cdfs failed")
    return inv_x, inv_y


def read_density(path: str, shape) -> np.ndarray:
    lib = _load()
    nx, ny, nz = shape
    out = np.empty((nx, ny, nz), dtype=np.float32)
    rc = lib.nrc_read_density(path.encode(), nx, ny, nz, _fptr(out))
    if rc != 0:
        raise ValueError(f"nrc_read_density failed rc={rc}")
    return out


def synthesize_cloud(shape, seed: int = 7) -> np.ndarray:
    lib = _load()
    nx, ny, nz = shape
    out = np.empty((nx, ny, nz), dtype=np.float32)
    lib.nrc_synthesize_cloud(nx, ny, nz, ctypes.c_uint32(seed), _fptr(out))
    return out


def write_exr(path: str, rgb: np.ndarray) -> None:
    lib = _load()
    rgb = np.ascontiguousarray(rgb[..., :3], dtype=np.float32)
    h, w = rgb.shape[:2]
    rc = lib.nrc_write_exr(path.encode(), _fptr(rgb), w, h)
    if rc != 0:
        raise ValueError(f"nrc_write_exr failed rc={rc}")


def read_idx1(path: str, limit: int = 1 << 31) -> np.ndarray:
    lib = _load()
    out = np.empty((min(limit, 1 << 26),), dtype=np.uint8)
    n = lib.nrc_read_idx1(path.encode(),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                          ctypes.c_int64(out.size))
    if n < 0:
        raise ValueError("nrc_read_idx1 failed")
    return out[:n].copy()
