"""User-facing SMPL layer and camera-projection heads (pure functions).

The reference wraps smplx and reorders to a 49-joint convention
(pocolib/models/head/smpl_head.py:12-83) and has a CLIFF full-image camera
variant (pocolib/models/head/smplcam_head.py:26-96). Both are re-expressed
here as jit-friendly pure functions over a `SmplParams` pytree, so the
entire crop->backbone->head->SMPL->projection path compiles into one XLA
program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..constants import FOCAL_LENGTH, IMG_RES, JOINT_MAP_49
from ..ops.camera import (
    crop_cam_to_full_img_cam,
    perspective_projection,
    weak_perspective_to_perspective,
)
from .lbs import SmplParams, smpl_forward


class SmplHeadOutput(NamedTuple):
    vertices: jnp.ndarray        # (B, V, 3)
    joints3d: jnp.ndarray        # (B, 49, 3)
    joints2d: jnp.ndarray        # (B, 49, 2)
    cam_t: jnp.ndarray           # (B, 3) crop-frame camera translation
    fullimg_cam_t: jnp.ndarray | None  # (B, 3) CLIFF full-image translation


def smpl_49(
    params: SmplParams, betas: jnp.ndarray, pose_rotmats: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SMPL forward with the 49-joint reordering.

    Returns (vertices (B,V,3), joints49 (B,49,3)).
    Reference contract: pocolib/models/head/smpl_head.py:22-34.
    """
    out = smpl_forward(params, betas, pose_rotmats)
    return out.vertices, out.joints[:, JOINT_MAP_49]


def smpl_head(
    params: SmplParams,
    rotmat: jnp.ndarray,
    shape: jnp.ndarray,
    cam: jnp.ndarray,
    focal_length: float = FOCAL_LENGTH,
    img_res: int = IMG_RES,
    normalize_joints2d: bool = False,
) -> SmplHeadOutput:
    """Weak-perspective SMPL head (PARE/HMR path).

    Projects the 49 joints with a centered camera in crop coordinates.
    Reference contract: pocolib/models/head/smpl_head.py:45-83.
    """
    verts, joints3d = smpl_49(params, shape, rotmat)
    cam_t = weak_perspective_to_perspective(cam, focal_length, img_res)
    joints2d = perspective_projection(joints3d, cam_t, focal_length)
    if normalize_joints2d:
        joints2d = joints2d / (img_res / 2.0)
    return SmplHeadOutput(
        vertices=verts,
        joints3d=joints3d,
        joints2d=joints2d,
        cam_t=cam_t,
        fullimg_cam_t=None,
    )


def smplcam_head(
    params: SmplParams,
    rotmat: jnp.ndarray,
    shape: jnp.ndarray,
    cam: jnp.ndarray,
    focal_length: jnp.ndarray,
    bbox_scale: jnp.ndarray,
    bbox_center: jnp.ndarray,
    img_w: jnp.ndarray,
    img_h: jnp.ndarray,
    img_res: int = IMG_RES,
) -> SmplHeadOutput:
    """CLIFF full-image-camera SMPL head.

    The weak-perspective crop camera is lifted to a full-image perspective
    translation and the 49 joints are projected in original-image pixel
    coordinates. Reference contract:
    pocolib/models/head/smplcam_head.py:34-96.

    Args:
        focal_length: (B,) full-image focal lengths.
        bbox_scale: (B,) bbox height / 200.
        bbox_center: (B, 2) bbox center in original-image pixels.
        img_w, img_h: (B,) original image sizes.
    """
    verts, joints3d = smpl_49(params, shape, rotmat)

    fullimg_cam_t = crop_cam_to_full_img_cam(
        crop_cam=jax_stop_gradient(cam),
        bbox_height=bbox_scale * 200.0,
        bbox_center=bbox_center,
        img_w=img_w,
        img_h=img_h,
        focal_length=focal_length,
        crop_res=img_res,
    )
    crop_cam_t = weak_perspective_to_perspective(cam, FOCAL_LENGTH, img_res)

    camera_center = jnp.stack([img_w / 2.0, img_h / 2.0], axis=-1)
    joints2d = perspective_projection(
        joints3d, fullimg_cam_t, focal_length, camera_center
    )
    return SmplHeadOutput(
        vertices=verts,
        joints3d=joints3d,
        joints2d=joints2d,
        cam_t=crop_cam_t,
        fullimg_cam_t=fullimg_cam_t,
    )


def jax_stop_gradient(x: jnp.ndarray) -> jnp.ndarray:
    """The reference detaches the camera before the full-image conversion
    (smplcam_head.py:72 `cam.detach().clone()`); `stop_gradient` is the JAX
    equivalent."""
    import jax

    return jax.lax.stop_gradient(x)
