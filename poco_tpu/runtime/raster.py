"""ctypes binding + build for the native mesh rasterizer.

Builds `native/poco_raster.cpp` on first use (g++ -O3, cached beside the
source) and exposes `raster_mesh(...)` — the fast path behind
poco_tpu.viz.renderer.Renderer.render. Falls back silently (returns
False from `native_available()`) when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()
_SRC = osp.join(osp.dirname(osp.abspath(__file__)), "native", "poco_raster.cpp")
_SO = osp.join(osp.dirname(osp.abspath(__file__)), "native", "libpoco_raster.so")


def _build() -> str | None:
    if osp.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def _load():
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        if os.environ.get("POCO_TPU_NATIVE_RASTER", "1") == "0":
            _LIB = False
            return _LIB
        so = _build()
        if so is None:
            _LIB = False
            return _LIB
        lib = ctypes.CDLL(so)
        lib.poco_raster_mesh.restype = None
        lib.poco_raster_mesh.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int,
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return bool(_load())


def raster_mesh(
    overlay: np.ndarray,
    uv: np.ndarray,
    face_z: np.ndarray,
    faces: np.ndarray,
    face_rgb: np.ndarray,
    onscreen: np.ndarray,
) -> np.ndarray:
    """Rasterize flat-shaded triangles over `overlay`; RETURNS the result.

    The input is normalized with np.ascontiguousarray (which copies for
    non-float32 / non-contiguous input), so callers must use the RETURN
    VALUE — the argument is only mutated when it happened to be a
    contiguous float32 array.

    Args:
        overlay: (H, W, 3) RGB, pre-filled with the background.
        uv: (V, 2) float32 pixel coords.
        face_z: (F,) float32 mean depth (bigger = closer = wins).
        faces: (F, 3) int64 vertex indices.
        face_rgb: (F, 3) float32 shaded colors in 0..255.
        onscreen: (F,) bool cull mask.
    """
    lib = _load()
    if not lib:
        raise RuntimeError("native rasterizer unavailable")
    overlay = np.ascontiguousarray(overlay, np.float32)
    uv_c = np.ascontiguousarray(uv, np.float32)
    z_c = np.ascontiguousarray(face_z, np.float32)
    f_c = np.ascontiguousarray(faces, np.int64)
    c_c = np.ascontiguousarray(face_rgb, np.float32)
    m_c = np.ascontiguousarray(onscreen, np.uint8)
    h, w = overlay.shape[:2]
    lib.poco_raster_mesh(
        overlay.ctypes.data, h, w,
        uv_c.ctypes.data, z_c.ctypes.data, f_c.ctypes.data,
        c_c.ctypes.data, m_c.ctypes.data,
        len(uv_c), len(f_c),
    )
    return overlay
