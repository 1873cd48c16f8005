"""Classic HMR iterative SMPL regressor head (flax.linen).

Reference contract: pocolib/models/head/hmr_head.py:9-91 — global average
pool over the backbone feature map, then three iterations of residual
pose/shape/cam decoding from the mean SMPL parameters.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...ops.rotation import rot6d_to_rotmat
from ...smpl.mean_params import load_mean_params


class HmrHead(nn.Module):
    num_input_features: int = 2048
    num_joints: int = 24
    n_iter: int = 3
    mean_params_path: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, features: jnp.ndarray, train: bool = False
    ) -> dict[str, jnp.ndarray]:
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
        small = nn.initializers.variance_scaling(0.01**2, "fan_avg", "uniform")
        decpose = nn.Dense(npose, name="decpose", kernel_init=small, dtype=self.dtype)
        decshape = nn.Dense(10, name="decshape", kernel_init=small, dtype=self.dtype)
        deccam = nn.Dense(3, name="deccam", kernel_init=small, dtype=self.dtype)
        drop1 = nn.Dropout(0.5, deterministic=not train)
        drop2 = nn.Dropout(0.5, deterministic=not train)

        pred_pose = jnp.broadcast_to(init_pose, (batch, npose))
        pred_shape = jnp.broadcast_to(init_shape, (batch, 10))
        pred_cam = jnp.broadcast_to(init_cam, (batch, 3))

        for _ in range(self.n_iter):
            xc = jnp.concatenate(
                [features, pred_pose, pred_shape, pred_cam], axis=1
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
            "uncert_feat": features,
            "pred_pose": pred_rotmat,
            "pred_cam": pred_cam,
            "pred_shape": pred_shape,
            "pred_pose_6d": pred_pose,
        }

    def get_output_channels(self) -> int:
        return self.num_input_features
