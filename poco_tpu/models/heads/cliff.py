"""CLIFF bbox-conditioned iterative SMPL regressor head (flax.linen).

Reference contract: pocolib/models/head/cliff_head.py:10-133 — pooled
backbone features concatenated with the 3-d bbox descriptor, three
iterations of fc1(1024)->fc2(1024)->residual decoders for
pose(24x6)/shape(10)/cam(3) starting from the SMPL mean parameters.

The 3-iteration loop is statically unrolled (compile-time constant), so
the whole head fuses into the surrounding XLA program.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...ops.rotation import rot6d_to_rotmat
from ...smpl.mean_params import load_mean_params


class CliffHead(nn.Module):
    num_input_features: int = 2048
    num_joints: int = 24
    n_iter: int = 3
    mean_params_path: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        bbox_info: jnp.ndarray,
        train: bool = False,
    ) -> dict[str, jnp.ndarray]:
        """Args:
            features: (B, C) pooled features (or (B, H, W, C), pooled here).
            bbox_info: (B, 3) CLIFF bbox descriptor
                [cx-w/2, cy-h/2, b] / focal-normalized.
        Returns dict with pred_pose (B,24,3,3), pred_shape (B,10),
        pred_cam (B,3), pred_pose_6d (B,144), uncert_feat (B,C),
        body_feat2 (B,1024).
        """
        if features.ndim > 2:
            features = jnp.mean(features, axis=(1, 2))
        batch = features.shape[0]
        npose = self.num_joints * 6

        mean_pose, mean_shape, mean_cam = load_mean_params(
            self.mean_params_path, self.num_joints
        )
        init_pose = self.variable(
            "buffers", "init_pose", lambda: jnp.asarray(mean_pose)
        ).value
        init_shape = self.variable(
            "buffers", "init_shape", lambda: jnp.asarray(mean_shape)
        ).value
        init_cam = self.variable(
            "buffers", "init_cam", lambda: jnp.asarray(mean_cam)
        ).value

        fc1 = nn.Dense(1024, name="fc1", dtype=self.dtype)
        fc2 = nn.Dense(1024, name="fc2", dtype=self.dtype)
        decpose = nn.Dense(
            npose, name="decpose", dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                0.01**2, "fan_avg", "uniform"
            ),
        )
        decshape = nn.Dense(
            10, name="decshape", dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                0.01**2, "fan_avg", "uniform"
            ),
        )
        deccam = nn.Dense(
            3, name="deccam", dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                0.01**2, "fan_avg", "uniform"
            ),
        )
        drop1 = nn.Dropout(0.5, deterministic=not train)
        drop2 = nn.Dropout(0.5, deterministic=not train)

        pred_pose = jnp.broadcast_to(init_pose, (batch, npose))
        pred_shape = jnp.broadcast_to(init_shape, (batch, 10))
        pred_cam = jnp.broadcast_to(init_cam, (batch, 3))

        xc = None
        for _ in range(self.n_iter):
            xc = jnp.concatenate(
                [features, bbox_info, pred_pose, pred_shape, pred_cam], axis=1
            )
            xc = drop1(fc1(xc))
            xc = drop2(fc2(xc))
            pred_pose = decpose(xc) + pred_pose
            pred_shape = decshape(xc) + pred_shape
            pred_cam = deccam(xc) + pred_cam

        pred_rotmat = rot6d_to_rotmat(pred_pose).reshape(
            batch, self.num_joints, 3, 3
        )
        return {
            "pred_pose": pred_rotmat,
            "pred_cam": pred_cam,
            "pred_shape": pred_shape,
            "pred_pose_6d": pred_pose,
            "uncert_feat": features,
            "body_feat2": xc,
        }

    def get_output_channels(self) -> int:
        return self.num_input_features
