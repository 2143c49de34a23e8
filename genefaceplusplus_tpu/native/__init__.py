"""ctypes bindings for the native host data-path library (gfpp_native.cpp).

Auto-builds with the repo's g++ on first use; every entry point has a pure
numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgfpp_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.gather_pixels_u8_mt.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.gather_mask.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    lib.pack_frame_u8.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    lib.pack_bitfield_spatial.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_float, ctypes.c_void_p,
    ]
    lib.unpack_bitfield_spatial.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def gather_pixels(img_u8: np.ndarray, indices: np.ndarray, n_threads: int = 4) -> np.ndarray:
    """uint8 [H,W,3] + int64 [N] flat pixel ids -> float32 [N,3] in [0,1]."""
    img_u8 = np.ascontiguousarray(img_u8, dtype=np.uint8)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    lib = _load()
    if lib is None:
        return img_u8.reshape(-1, 3)[indices].astype(np.float32) / 255.0
    out = np.empty((len(indices), 3), np.float32)
    lib.gather_pixels_u8_mt(
        img_u8.ctypes.data, indices.ctypes.data, len(indices), out.ctypes.data, n_threads
    )
    return out


def pack_frame(img_f32: np.ndarray) -> np.ndarray:
    """float [H,W,3] in [0,1] -> uint8 RGB."""
    img_f32 = np.ascontiguousarray(img_f32, dtype=np.float32)
    lib = _load()
    if lib is None:
        return (np.clip(img_f32, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    out = np.empty(img_f32.shape, np.uint8)
    lib.pack_frame_u8(img_f32.ctypes.data, img_f32.size // 3, out.ctypes.data)
    return out


def pack_bitfield_spatial(grid: np.ndarray, thresh: float) -> np.ndarray:
    """spatial [H,H,H] float -> reference-format morton bitfield [H^3/8]u8."""
    grid = np.ascontiguousarray(grid, dtype=np.float32)
    H = grid.shape[0]
    lib = _load()
    if lib is None:
        from genefaceplusplus_tpu.ops import morton
        import jax.numpy as jnp

        return np.asarray(morton.occupancy_to_bitfield(jnp.asarray(grid[None] > thresh)))
    out = np.zeros(H * H * H // 8, np.uint8)
    lib.pack_bitfield_spatial(grid.ctypes.data, H, ctypes.c_float(thresh), out.ctypes.data)
    return out


def unpack_bitfield_spatial(bitfield: np.ndarray, H: int) -> np.ndarray:
    """reference-format morton bitfield -> spatial [H,H,H] bool."""
    bitfield = np.ascontiguousarray(bitfield, dtype=np.uint8)
    lib = _load()
    if lib is None:
        from genefaceplusplus_tpu.ops import morton
        import jax.numpy as jnp

        return np.asarray(morton.bitfield_to_occupancy(jnp.asarray(bitfield), 1, H))[0]
    out = np.zeros((H, H, H), np.uint8)
    lib.unpack_bitfield_spatial(bitfield.ctypes.data, H, out.ctypes.data)
    return out.astype(bool)
