"""Temporal pose smoothing: OneEuro over rotation matrices + SMPL re-run.

Reference contract: pocolib/utils/smooth_pose.py:25-71. The sequential
OneEuro filter stays host-side (it is inherently recurrent and tiny), but
the SMPL re-evaluation of the smoothed track runs as ONE batched jitted
LBS over all frames instead of the reference's per-frame torch calls.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..smpl.lbs import SmplParams
from ..smpl.model import smpl_49
from .one_euro import OneEuroFilter


def smooth_pose(
    pred_pose: np.ndarray,
    pred_betas: np.ndarray,
    smpl: SmplParams,
    min_cutoff: float = 0.004,
    beta: float = 0.7,
):
    """Filter a pose track and regenerate vertices/joints.

    Args:
        pred_pose: (T, 24, 3, 3) rotation matrices.
        pred_betas: (T, 10).
    Returns:
        (verts (T, V, 3), pose_hat (T, 24, 3, 3), joints3d (T, 49, 3)).
    """
    pred_pose = np.asarray(pred_pose)
    filt = OneEuroFilter(
        np.zeros_like(pred_pose[0]), pred_pose[0],
        min_cutoff=min_cutoff, beta=beta,
    )
    pose_hat = np.zeros_like(pred_pose)
    pose_hat[0] = pred_pose[0]
    for idx in range(1, len(pred_pose)):
        t = np.ones_like(pred_pose[idx]) * idx
        pose_hat[idx] = filt(t, pred_pose[idx])

    verts, joints3d = smpl_49(
        smpl, jnp.asarray(pred_betas), jnp.asarray(pose_hat)
    )
    return np.asarray(verts), pose_hat, np.asarray(joints3d)
