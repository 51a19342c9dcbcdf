"""ctypes bindings for the native C++ runtime (native/poca_native.cpp).

Builds the shared library on first use (g++ via make) and caches it; all
entry points have pure-Python/NumPy fallbacks so the framework works
without a toolchain — the native path is the fast one (BVH builds for
large scenes, PNG encoding off the render thread)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libpoca_native.so"))
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            raise RuntimeError("native build previously failed")
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception as e:
                _build_failed = True
                raise RuntimeError(f"native build failed: {e}") from e
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.poca_bvh_build.restype = ctypes.c_int
        lib.poca_bvh_build.argtypes = [
            ctypes.c_int, f32p, f32p, i32p, i32p, i32p, f32p, f32p,
        ]
        lib.poca_pack_bgra8.restype = None
        lib.poca_pack_bgra8.argtypes = [f32p, ctypes.c_int, u8p]
        lib.poca_pack_rgb8.restype = None
        lib.poca_pack_rgb8.argtypes = [f32p, ctypes.c_int, u8p]
        lib.poca_png_write.restype = ctypes.c_long
        lib.poca_png_write.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
        ]
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def build_bvh(aabb_min: np.ndarray, aabb_max: np.ndarray) -> dict:
    """Native median-split BVH build; same output as
    ops.bvh.build_bvh_numpy."""
    lib = _load()
    n = aabb_min.shape[0]
    cap = max(2 * n, 1)
    amin = np.ascontiguousarray(aabb_min, np.float32)
    amax = np.ascontiguousarray(aabb_max, np.float32)
    left = np.empty(cap, np.int32)
    right = np.empty(cap, np.int32)
    obj = np.empty(cap, np.int32)
    nmin = np.empty((cap, 3), np.float32)
    nmax = np.empty((cap, 3), np.float32)
    m = lib.poca_bvh_build(n, amin, amax, left, right, obj, nmin, nmax)
    if m < 0:
        raise RuntimeError("poca_bvh_build failed")
    if m == 0:
        return {
            "left": np.array([-1], np.int32),
            "right": np.array([-1], np.int32),
            "obj_idx": np.array([-1], np.int32),
            "aabb_min": np.full((1, 3), np.inf, np.float32),
            "aabb_max": np.full((1, 3), -np.inf, np.float32),
        }
    return {
        "left": left[:m].copy(),
        "right": right[:m].copy(),
        "obj_idx": obj[:m].copy(),
        "aabb_min": nmin[:m].copy(),
        "aabb_max": nmax[:m].copy(),
    }


def pack_bgra8(rgb: np.ndarray) -> np.ndarray:
    lib = _load()
    flat = np.ascontiguousarray(rgb, np.float32).reshape(-1, 3)
    out = np.empty((flat.shape[0], 4), np.uint8)
    lib.poca_pack_bgra8(flat, flat.shape[0], out)
    return out.reshape(rgb.shape[:-1] + (4,))


def write_png(path: str, rgb8: np.ndarray) -> None:
    lib = _load()
    img = np.ascontiguousarray(rgb8, np.uint8)
    h, w, c = img.shape
    assert c == 3
    n = lib.poca_png_write(img, w, h, str(path).encode())
    if n < 0:
        raise RuntimeError(f"poca_png_write failed for {path}")
