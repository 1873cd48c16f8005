"""Fused on-device preprocessing: crop -> resize -> normalize as XLA ops.

The reference preprocesses on the host, one detection at a time, with
cv2.warpAffine (pocolib/utils/vibe_image_utils.py:58-107,
image_utils.py:189-206) and normalizes in the DataLoader. Here the whole
stage is batched JAX: the original image is uploaded once (uint8), and
all person crops are produced by one vectorized inverse-affine bilinear
gather feeding straight into the jitted model — the "fused preprocessing
stage" of BASELINE.json.

Conventions match cv2 exactly (pixel centers at integer coordinates,
INTER_LINEAR, BORDER_CONSTANT=0) so host-side and device-side paths are
interchangeable to interpolation precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import IMG_NORM_MEAN, IMG_NORM_STD, IMG_RES


def crop_transform_params(
    center: jnp.ndarray,
    bbox_size: jnp.ndarray,
    rot_deg: jnp.ndarray | None = None,
    out_res: int = IMG_RES,
):
    """Per-crop affine parameters mapping output pixel -> source pixel.

    Derivation mirrors gen_trans_from_patch_cv (vibe_image_utils.py:58-91)
    with inv=True: src = center + R(rot) @ ((dst - res/2) * bbox/res).

    Args:
        center: (B, 2) crop centers in source pixels.
        bbox_size: (B,) square bbox edge in source pixels (scale * 200).
        rot_deg: optional (B,) rotation in degrees.
    Returns:
        (a (B,2,2) linear maps, t (B,2) translations).
    """
    batch = center.shape[0]
    sx = bbox_size / out_res
    if rot_deg is None:
        rot_rad = jnp.zeros((batch,), jnp.float32)
    else:
        rot_rad = jnp.deg2rad(rot_deg)
    cos, sin = jnp.cos(rot_rad), jnp.sin(rot_rad)
    # R(rot) applied to scaled offsets; cv2's rotate_2d convention.
    a = jnp.stack(
        [
            jnp.stack([cos * sx, -sin * sx], axis=-1),
            jnp.stack([sin * sx, cos * sx], axis=-1),
        ],
        axis=-2,
    )  # (B, 2, 2) rows = (x_src, y_src) coefficients on (x_dst, y_dst)
    t = center - jnp.einsum(
        "bij,j->bi", a, jnp.asarray([out_res / 2.0, out_res / 2.0])
    ) + 0.0
    return a, t


def bilinear_sample_image(
    image: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray
) -> jnp.ndarray:
    """Sample (H, W, C) image at float coords with zero padding.

    Args:
        image: (H, W, C) float array.
        xs, ys: (...,) source coordinates.
    Returns:
        (..., C) sampled values.
    """
    h, w = image.shape[:2]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]

    def tap(yi, xi):
        valid = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        return image[yc, xc] * valid[..., None]

    return (
        tap(y0, x0) * (1 - wx) * (1 - wy)
        + tap(y0, x0 + 1) * wx * (1 - wy)
        + tap(y0 + 1, x0) * (1 - wx) * wy
        + tap(y0 + 1, x0 + 1) * wx * wy
    )


def crop_and_resize(
    image: jnp.ndarray,
    center: jnp.ndarray,
    bbox_size: jnp.ndarray,
    rot_deg: jnp.ndarray | None = None,
    out_res: int = IMG_RES,
) -> jnp.ndarray:
    """All person crops from one image in a single gather.

    Args:
        image: (H, W, 3) source image (float or uint8).
        center: (B, 2) crop centers (x, y).
        bbox_size: (B,) bbox edge length in pixels.
    Returns:
        (B, out_res, out_res, 3) float32 crops (same value scale as input).
    """
    image = image.astype(jnp.float32)
    a, t = crop_transform_params(center, bbox_size, rot_deg, out_res)
    grid = jnp.arange(out_res, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(grid, grid)               # (R, R) x/y dst coords
    # src = A @ (x, y) + t, batched over crops.
    xs = a[:, 0, 0, None, None] * gx + a[:, 0, 1, None, None] * gy + t[:, 0, None, None]
    ys = a[:, 1, 0, None, None] * gx + a[:, 1, 1, None, None] * gy + t[:, 1, None, None]
    return bilinear_sample_image(image, xs, ys)


def crop_and_resize_mxu(
    image: jnp.ndarray,
    center: jnp.ndarray,
    bbox_size: jnp.ndarray,
    out_res: int = IMG_RES,
) -> jnp.ndarray:
    """Axis-aligned crop/resize as two MXU matmuls (TPU fast path).

    An unrotated bilinear resample is separable: out = Ry @ img @ Rx^T,
    where Ry (R, H) and Rx (R, W) carry at most two bilinear taps per
    row. Building the weight matrices densely (VPU broadcast compare)
    and contracting them on the MXU replaces the per-pixel gather of
    `crop_and_resize` — the gather-free formulation TPUs prefer.
    Zero-padding outside the image falls out of the weight rows summing
    to < 1 at the borders.

    Args:
        image: (H, W, 3) source image.
        center: (B, 2) crop centers (x, y).
        bbox_size: (B,) bbox edge in source pixels.
    Returns:
        (B, out_res, out_res, 3) float32 crops.
    """
    image = image.astype(jnp.float32)
    h, w = image.shape[:2]

    def weight_matrix(coords: jnp.ndarray, n: int) -> jnp.ndarray:
        """(B, R) source coords -> (B, R, n) bilinear weight rows."""
        idx = jnp.arange(n, dtype=jnp.float32)
        d = jnp.abs(coords[..., None] - idx)        # (B, R, n)
        return jnp.maximum(0.0, 1.0 - d)

    grid = jnp.arange(out_res, dtype=jnp.float32)
    scale = (bbox_size / out_res)[:, None]
    xs = (grid[None, :] - out_res / 2.0) * scale + center[:, :1]
    ys = (grid[None, :] - out_res / 2.0) * scale + center[:, 1:2]

    rx = weight_matrix(xs, w)                       # (B, R, W)
    ry = weight_matrix(ys, h)                       # (B, R, H)

    # out[b, i, j, c] = sum_{y,x} ry[b,i,y] rx[b,j,x] img[y,x,c]
    # Full precision: default bf16 contraction deviates from the gather
    # path by up to 0.5/255 per pixel (measured), breaking the
    # interchangeability contract with crop_and_resize/cv2.
    hi = jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("biy,yxc->bixc", ry, image, precision=hi)
    return jnp.einsum("bjx,bixc->bijc", rx, tmp, precision=hi)


def normalize_image(crops: jnp.ndarray, max_val: float = 255.0) -> jnp.ndarray:
    """ImageNet normalization (reference constants.py:2-3).

    Args:
        crops: (..., 3) RGB in [0, max_val].
    """
    mean = jnp.asarray(IMG_NORM_MEAN, jnp.float32)
    std = jnp.asarray(IMG_NORM_STD, jnp.float32)
    return (crops / max_val - mean) / std


def calculate_focal_length(img_h, img_w):
    """Full-image focal proxy: sqrt(h^2 + w^2) (image_utils.py:171-172)."""
    return jnp.sqrt(img_h**2.0 + img_w**2.0)


def calculate_bbox_info(
    center: jnp.ndarray, scale: jnp.ndarray, orig_shape: jnp.ndarray
) -> jnp.ndarray:
    """CLIFF bbox descriptor with H36M normalization constants.

    Reference contract: image_utils.py:174-187.

    Args:
        center: (B, 2) bbox centers (x, y).
        scale: (B,) bbox height / 200.
        orig_shape: (B, 2) original (h, w).
    Returns:
        (B, 3) normalized [cx - w/2, cy - h/2, b].
    """
    img_h, img_w = orig_shape[..., 0], orig_shape[..., 1]
    focal = calculate_focal_length(img_h, img_w)
    b = scale * 200.0
    cx = (center[..., 0] - img_w / 2.0) / focal * 2.8
    cy = (center[..., 1] - img_h / 2.0) / focal * 2.8
    bn = (b - 0.24 * focal) / (0.06 * focal)
    return jnp.stack([cx, cy, bn], axis=-1)


def preprocess_crops(
    image: jnp.ndarray,
    centers: jnp.ndarray,
    scales: jnp.ndarray,
    out_res: int = IMG_RES,
    true_hw: jnp.ndarray | None = None,
) -> dict[str, jnp.ndarray]:
    """Fused demo preprocessing: one image + N detections -> model batch.

    Produces every CLIFF input (normalized crops, bbox_info, focal length,
    scale/center/orig_shape) in one jittable function; compose with
    POCO.apply for the single-XLA-program demo path (BASELINE.json
    north star; replaces tester.py:171-212's per-detection host loop).

    Args:
        image: (H, W, 3) uint8/float RGB image. May be zero-padded at the
            bottom/right to a bucketed size (padding reads as
            border-constant zeros, identical to cv2 semantics).
        centers: (B, 2) bbox centers.
        scales: (B,) bbox height / 200.
        true_hw: optional (2,) float array with the *unpadded* (h, w) —
            used for bbox_info / focal / orig_shape so size-bucketing the
            upload doesn't change the camera model.
    """
    h, w = image.shape[:2]
    crops = crop_and_resize(image, centers, scales * 200.0, out_res=out_res)
    batch = centers.shape[0]
    if true_hw is None:
        true_hw = jnp.asarray([h, w], jnp.float32)
    orig_shape = jnp.broadcast_to(true_hw.astype(jnp.float32), (batch, 2))
    return {
        "img": normalize_image(crops),
        "bbox_info": calculate_bbox_info(centers, scales, orig_shape),
        "focal_length": jnp.broadcast_to(
            calculate_focal_length(true_hw[0], true_hw[1]), (batch,)
        ),
        "scale": scales,
        "center": centers,
        "orig_shape": orig_shape,
    }


def flip_image_horizontal(crops: jnp.ndarray) -> jnp.ndarray:
    """Horizontal flip of (..., H, W, C) crops."""
    return crops[..., :, ::-1, :]
