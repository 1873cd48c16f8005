"""Temporal pose smoothing: OneEuro over rotation matrices + SMPL re-run.

Reference contract: pocolib/utils/smooth_pose.py:25-71. The OneEuro pass
filters the whole (T, 24, 3, 3) track with all channels vectorized per
frame (host-side — the recurrence is over T and tiny), then the SMPL
re-evaluation of the smoothed track runs as ONE batched jitted LBS over
all frames instead of the reference's per-frame torch calls.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..smpl.lbs import SmplParams
from ..smpl.model import smpl_49
from .one_euro import one_euro_track


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
    pose_hat = one_euro_track(
        np.asarray(pred_pose), min_cutoff=min_cutoff, beta=beta
    )
    verts, joints3d = smpl_49(
        smpl, jnp.asarray(pred_betas), jnp.asarray(pose_hat)
    )
    return np.asarray(verts), pose_hat, np.asarray(joints3d)
