"""Compute ops: rotations, cameras, fused preprocessing, Pallas kernels."""

from .camera import (
    crop_cam_to_full_img_cam,
    estimate_translation,
    perspective_projection,
    perspective_to_weak_perspective,
    weak_perspective_to_perspective,
)
from .preprocess import (
    crop_and_resize,
    crop_and_resize_mxu,
    normalize_image,
    preprocess_crops,
)
from .rotation import (
    axis_angle_to_rotmat,
    rot6d_to_rotmat,
    rotmat_to_axis_angle,
    rotmat_to_rot6d,
)
