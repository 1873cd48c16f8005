"""ctypes bindings + build for the native C++ data loader.

Builds `poco_tpu/runtime/native/poco_loader.cpp` into a shared library on
first use (g++ -O3, cached beside the source) and exposes:

    decode_jpeg(path_or_bytes)            -> (H, W, 3) uint8
    affine_crop(img, center, bbox, res)   -> (R, R, 3) float32
    batch_decode_crop(paths, centers, bbox_sizes, res)
                                          -> (N, R, R, 3) float32

`batch_decode_crop` runs decode+crop across a C++ thread pool — the
native fast path for the training input pipeline (the reference does
this per item in Python DataLoader workers). Falls back to cv2 when the
toolchain or libjpeg is unavailable (`native_available()`).
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
_SRC = osp.join(osp.dirname(osp.abspath(__file__)), "native", "poco_loader.cpp")
_SO = osp.join(osp.dirname(osp.abspath(__file__)), "native", "libpoco_loader.so")

MAX_H, MAX_W = 4096, 4096
_TLS = threading.local()  # per-thread reusable decode buffer


def _build() -> str | None:
    if osp.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    # Prefer PNG support; retry JPEG-only so a libpng-less host still
    # gets the fast path for JPEG.
    for extra in (["-ljpeg", "-lpng", "-DPOCO_HAS_PNG"], ["-ljpeg"]):
        try:
            subprocess.run(
                base + extra + ["-lpthread"], check=True, capture_output=True
            )
            return _SO
        except (subprocess.CalledProcessError, FileNotFoundError):
            continue
    return None


def _load():
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        so = _build()
        if so is None:
            _LIB = False
            return _LIB
        lib = ctypes.CDLL(so)
        lib.poco_decode_jpeg.restype = ctypes.c_int
        lib.poco_decode_jpeg.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.poco_decode_image.restype = ctypes.c_int
        lib.poco_decode_image.argtypes = lib.poco_decode_jpeg.argtypes
        lib.poco_has_png.restype = ctypes.c_int
        lib.poco_has_png.argtypes = []
        lib.poco_affine_crop.restype = None
        lib.poco_affine_crop.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_void_p,
        ]
        lib.poco_batch_decode_crop.restype = None
        lib.poco_batch_decode_crop.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.poco_batch_decode_affine.restype = None
        lib.poco_batch_decode_affine.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int,
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return bool(_load())


def png_available() -> bool:
    """True when the built library can decode PNG (libpng present)."""
    lib = _load()
    return bool(lib) and bool(lib.poco_has_png())


def native_exts() -> tuple[str, ...]:
    """File extensions the native decoder handles on this host."""
    if not native_available():
        return ()
    if png_available():
        return (".jpg", ".jpeg", ".png")
    return (".jpg", ".jpeg")


def decode_image(data: bytes | str) -> np.ndarray:
    """Decode a JPEG/PNG file path or byte buffer to (H, W, 3) RGB uint8.

    The C side sniffs the container from magic bytes, so mislabeled
    extensions are fine."""
    lib = _load()
    if not lib:
        raise RuntimeError("native loader unavailable")
    if isinstance(data, str):
        with open(data, "rb") as f:
            data = f.read()
    # reuse one decode buffer per thread: a fresh 48 MB allocation per
    # item would dominate the per-item fallback path
    buf = getattr(_TLS, "decode_buf", None)
    if buf is None:
        buf = np.empty((MAX_H, MAX_W, 3), np.uint8)
        _TLS.decode_buf = buf
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.poco_decode_image(
        data, len(data), buf.ctypes.data, MAX_H, MAX_W,
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        raise ValueError(f"image decode failed (rc={rc})")
    # Rows were written with stride w*3 — reinterpret the prefix.
    flat = buf.reshape(-1)[: h.value * w.value * 3]
    return flat.reshape(h.value, w.value, 3).copy()


def decode_jpeg(data: bytes | str) -> np.ndarray:
    """Decode a JPEG file path or byte buffer to (H, W, 3) RGB uint8.

    Kept for callers that specifically expect the JPEG-only contract;
    `decode_image` additionally handles PNG."""
    return decode_image(data)


def affine_crop(
    img: np.ndarray, center, bbox_size: float, out_res: int = 224
) -> np.ndarray:
    """(H, W, 3) uint8 -> (R, R, 3) float32 crop (cv2-parity bilinear)."""
    lib = _load()
    if not lib:
        raise RuntimeError("native loader unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((out_res, out_res, 3), np.float32)
    lib.poco_affine_crop(
        img.ctypes.data, img.shape[0], img.shape[1],
        float(center[0]), float(center[1]), float(bbox_size),
        out_res, out.ctypes.data,
    )
    return out


def batch_decode_crop(
    paths: list[str],
    centers: np.ndarray,
    bbox_sizes: np.ndarray,
    out_res: int = 224,
    num_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Parallel decode+crop of a batch of JPEG files.

    Returns (crops (N, R, R, 3) float32, statuses (N,) int32 — 0 = ok).
    """
    lib = _load()
    if not lib:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(
        *[p.encode() for p in paths]
    )
    centers = np.ascontiguousarray(centers, np.float32)
    bbox_sizes = np.ascontiguousarray(bbox_sizes, np.float32)
    out = np.empty((n, out_res, out_res, 3), np.float32)
    statuses = np.zeros(n, np.int32)
    lib.poco_batch_decode_crop(
        c_paths, n, centers.ctypes.data, bbox_sizes.ctypes.data,
        out_res, MAX_H, MAX_W, out.ctypes.data, statuses.ctypes.data,
        num_threads,
    )
    return out, statuses


def read_image_rgb(path: str) -> np.ndarray:
    """Read an image as (H, W, 3) RGB uint8 — native JPEG/PNG fast path.

    JPEG and (when libpng was available at build time) PNG files go
    through the C++ decoder; anything else falls back to cv2. This is
    the single frame-read entry point for the demo pipeline (the
    reference reads every frame with cv2.imread, tester.py:362-580).
    """
    if path.lower().endswith(native_exts()):
        try:
            return decode_image(path)
        except (ValueError, OSError):
            pass  # corrupt/odd file: fall through to cv2
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(f"unreadable image: {path}")
    return img[:, :, ::-1]


def image_size(path: str) -> tuple[int, int]:
    """(height, width) from the file header WITHOUT decoding pixels.

    Pure-Python probe of the PNG IHDR / JPEG SOFn markers — a few
    hundred bytes of IO per file, so per-frame image dimensions (CLIFF's
    full-image camera conditioning needs them) stay cheap even for
    thousand-frame tracklets. Falls back to a full decode for anything
    else.
    """
    import struct

    with open(path, "rb") as f:
        head = f.read(32)
        if head[:8] == b"\x89PNG\r\n\x1a\n":
            w, h = struct.unpack(">II", head[16:24])
            return int(h), int(w)
        if head[:2] == b"\xff\xd8":  # JPEG: walk markers to SOFn
            f.seek(2)
            while True:
                seg = f.read(4)
                if len(seg) < 4:
                    break
                if seg[0] != 0xFF:
                    break
                marker, ln = seg[1], struct.unpack(">H", seg[2:4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (
                    0xC4, 0xC8, 0xCC
                ):
                    body = f.read(5)
                    h, w = struct.unpack(">HH", body[1:5])
                    return int(h), int(w)
                f.seek(ln - 2, 1)
    img = read_image_rgb(path)
    return int(img.shape[0]), int(img.shape[1])


def read_images_rgb(paths: list[str], num_threads: int = 8) -> list[np.ndarray]:
    """Read many images in parallel (ctypes releases the GIL during the
    native decode, so Python threads give real parallelism on JPEG)."""
    if len(paths) <= 1 or num_threads <= 1:
        return [read_image_rgb(p) for p in paths]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(min(num_threads, len(paths))) as pool:
        return list(pool.map(read_image_rgb, paths))


def batch_decode_affine(
    paths: list[str],
    affines: np.ndarray,
    gains: np.ndarray,
    out_res: int = 224,
    num_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parallel decode + general affine warp of a batch of JPEG files.

    Args:
        affines: (N, 2, 3) output->source matrices (cv2 convention, same
            math as data.transforms._affine_matrix(inv=True); rotation,
            flip and scale are all encoded in the matrix).
        gains: (N, 3) per-channel multipliers (channel-noise aug),
            clamped to [0, 255].
    Returns:
        (crops (N, R, R, 3) float32, statuses (N,) int32 0=ok,
         dims (N, 2) int32 decoded (h, w)).
    """
    lib = _load()
    if not lib:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    affines = np.ascontiguousarray(
        np.asarray(affines, np.float32).reshape(n, 6)
    )
    gains = np.ascontiguousarray(np.asarray(gains, np.float32))
    out = np.empty((n, out_res, out_res, 3), np.float32)
    statuses = np.zeros(n, np.int32)
    dims = np.zeros((n, 2), np.int32)
    lib.poco_batch_decode_affine(
        c_paths, n, affines.ctypes.data, gains.ctypes.data,
        out_res, MAX_H, MAX_W, out.ctypes.data, statuses.ctypes.data,
        dims.ctypes.data, num_threads,
    )
    return out, statuses, dims
