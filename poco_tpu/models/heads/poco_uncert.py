"""POCO uncertainty head: per-joint variance from pose-head features.

Reference contract: pocolib/models/head/poco_head.py:14-154. Three input
modes:
  * "feat"          — MLP over the pose head's `uncert_feat`;
  * "feat-pose"     — concat the flattened predicted pose (24*3*3) to the
                      features before the MLP (PARE config);
  * "feat-pose-net" — separate sigmoid MLP encoders for pose and features,
                      concatenated (CLIFF config).

TPU-first redesign: the reference builds its layer stack with exec() and
selects GT-pose-conditioned rows with host-side numpy string comparisons
(poco_head.py:74-82, 101-107); here the stack is an explicit list of Dense
layers and GT-pose conditioning is a traced boolean mask supplied by the
data pipeline (`gt_pose_cond_mask`), applied with `jnp.where` so the whole
head jits.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


def num_uncert_outputs(
    loss_ver: str, sigma_dim: int, num_uncert_parts: int
) -> int:
    """Output width per loss version (reference: poco_head.py:84-94)."""
    if loss_ver in ("genG", "delta", "mse_genG"):
        return num_uncert_parts * 2 * sigma_dim
    if loss_ver == "gauss_genG":
        return num_uncert_parts * 3 * sigma_dim
    return num_uncert_parts * sigma_dim


class PocoUncertHead(nn.Module):
    num_input_channels: int
    num_neurons: Sequence[int] = (216,)
    sigma_dim: int = 1
    activation_type: str = "sigmoid"
    use_dropout: bool = True
    uncert_inp_type: str = "feat-pose-net"
    exclude_uncert_idx: Sequence[int] = ()
    loss_ver: str = "norm_flow_res_gaus"
    uncert_type: str = "pose"
    num_joints: int = 24
    dtype: Any = jnp.float32

    @property
    def num_uncert_parts(self) -> int:
        return self.num_joints - len(self.exclude_uncert_idx)

    def _act(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.activation_type == "sigmoid":
            return nn.sigmoid(x)
        if self.activation_type == "softplus":
            return nn.softplus(x)
        return x

    @nn.compact
    def __call__(
        self,
        uncert_feat: jnp.ndarray,
        pred_pose: jnp.ndarray,
        gt_pose_rotmat: jnp.ndarray | None = None,
        gt_pose_cond_mask: jnp.ndarray | None = None,
        train: bool = False,
    ) -> dict[str, jnp.ndarray]:
        """Args:
            uncert_feat: (B, C) pose-head features.
            pred_pose: (B, 24, 3, 3) predicted rotations.
            gt_pose_rotmat: optional (B, 24, 3, 3) GT rotations for the
                calibration trick (reference GT_POSE_COND, poco_head.py:
                101-121): rows where `gt_pose_cond_mask` is True feed the
                GT pose instead of the prediction.
            gt_pose_cond_mask: optional (B,) bool.
        Returns:
            {"var_pose": (B, P*sigma_dim) or (B, P, 3, 3) if sigma_dim==9}.
        """
        batch = uncert_feat.shape[0]
        sigma_dim = self.sigma_dim if "norm_flow" in self.loss_ver else 1
        out_width = num_uncert_outputs(
            self.loss_ver, sigma_dim, self.num_uncert_parts
        )

        x = uncert_feat
        neurons = list(self.num_neurons)

        if "pose" in self.uncert_inp_type:
            pose_inp = jax_flatten_pose(pred_pose, batch)
            if gt_pose_rotmat is not None and gt_pose_cond_mask is not None:
                gt_flat = jax_flatten_pose(gt_pose_rotmat, batch)
                pose_inp = jnp.where(
                    gt_pose_cond_mask[:, None], gt_flat, pose_inp
                )
            if "pose-net" in self.uncert_inp_type:
                # Parallel sigmoid encoders, then concat (CLIFF config).
                width = neurons[0]
                pose_feats = nn.Dense(
                    width, name="poseNet_fc", dtype=self.dtype
                )(pose_inp)
                pose_feats = nn.Dropout(0.5, deterministic=not train)(pose_feats)
                pose_feats = nn.sigmoid(pose_feats)
                x = nn.Dense(width, name="featNet_fc", dtype=self.dtype)(x)
                x = nn.Dropout(0.5, deterministic=not train)(x)
                x = nn.sigmoid(x)
                x = jnp.concatenate([x, pose_feats], axis=1)
                neurons = [out_width]  # only the final projection remains
            else:
                x = jnp.concatenate([x, pose_inp], axis=1)
                neurons = neurons + [out_width]
        else:
            neurons = neurons + [out_width]

        for i, width in enumerate(neurons):
            x = nn.Dense(width, name=f"fc{i + 1}", dtype=self.dtype)(x)
            if self.use_dropout:
                x = nn.Dropout(0.5, deterministic=not train)(x)
            x = self._act(x)

        var_pose = x[:, :out_width]
        if sigma_dim == 9:
            var_pose = var_pose.reshape(batch, -1, 3, 3)
        return {"var_pose": var_pose}


def jax_flatten_pose(pose_rotmat: jnp.ndarray, batch: int) -> jnp.ndarray:
    return pose_rotmat.reshape(batch, -1)
