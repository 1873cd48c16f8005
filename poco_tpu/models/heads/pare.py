"""PARE part-attention SMPL regressor head (flax.linen).

Reference contract: pocolib/models/head/pare_head.py:35-969. Implemented
paths (the shipped hrnet_w32-pare config and its documented variants):

  * dual conv branches over the backbone feature map (2D keypoint branch
    + 3D SMPL branch), 2x [3x3 conv -> BN -> ReLU] each
    (pare_head.py:158-168);
  * part attention from the keypoint branch: `part_segm` (J+1-channel
    segmentation logits, background dropped), `hm`, `hm_soft`,
    `part_segm_pool`, or `attention` modes (pare_head.py:781-826);
  * KeypointAttention soft pooling of both branches per joint
    (pare_head.py:754-763), or bilinear sampling at predicted keypoints
    when keypoint attention is off;
  * per-joint pose decoders as unshared 1x1 convs over the [24, 1] grid,
    shape/cam MLPs over flattened per-joint SMPL features
    (pare_head.py:855-928);
  * optional HMR-style iterative regression over pooled features
    (pare_head.py:834-853) and iterative per-joint regression
    (pare_head.py:865-895, input types feats/self_pose/shape/cam);
  * `same_branch_v1` in-head uncertainty MLP (pare_head.py:298-305,
    909-917) and `diff_branch` uncert_feat export (pare_head.py:743-750).

Not carried over (all off in every shipped config): co-attention,
non-local blocks, soft attention, position encodings, branch iteration
(pare_head.py:312-389, 706-728).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.rotation import rot6d_to_rotmat
from ...smpl.mean_params import load_mean_params
from ..backbones.common import batch_norm, conv
from ..layers import (
    PerPositionConv1x1,
    get_heatmap_preds,
    grid_sample_bilinear,
    keypoint_attention,
    softargmax2d,
)


class PareHead(nn.Module):
    num_input_features: int = 480
    num_joints: int = 24
    uncert_layer: str = "diff_branch"
    uncert_act: str = "sigmoid"
    softmax_temp: float = 1.0
    num_deconv_layers: int = 2
    num_deconv_filters: tuple[int, ...] = (128, 128)
    num_camera_params: int = 3
    num_features_smpl: int = 64
    final_conv_kernel: int = 1
    use_heatmaps: str = "part_segm"
    use_keypoint_attention: bool = True
    keypoint_attention_act: str = "softmax"
    use_scale_keypoint_attention: bool = False
    use_hmr_regression: bool = False
    iterative_regression: bool = False
    iter_residual: bool = False
    num_iterations: int = 3
    pose_input_type: str = "feats.self_pose.shape.cam"
    shape_input_type: str = "feats.shape.cam"
    use_mean_camshape: bool = False
    use_mean_pose: bool = False
    mean_params_path: str | None = None
    dtype: Any = jnp.float32

    @property
    def _use_kp_attention(self) -> bool:
        # part_segm / attention modes force keypoint attention on
        # (reference pare_head.py:129-132).
        if self.use_heatmaps in ("part_segm", "attention"):
            return True
        return self.use_keypoint_attention

    def _conv_branch(self, x, name: str, train: bool):
        """2x [3x3 conv (no bias) -> BN -> ReLU] (pare_head.py:468-491)."""
        for i in range(self.num_deconv_layers):
            x = conv(
                self.num_deconv_filters[i], 3, 1,
                name=f"{name}_conv{i}", dtype=self.dtype,
            )(x)
            x = batch_norm(train, name=f"{name}_bn{i}", dtype=self.dtype)(x)
            x = nn.relu(x)
        return x

    @nn.compact
    def __call__(
        self, features: jnp.ndarray, train: bool = False
    ) -> dict[str, jnp.ndarray]:
        """Args:
            features: (B, H, W, C) backbone feature map (NHWC), e.g.
                (B, 56, 56, 480) from hrnet_w32.
        """
        batch = features.shape[0]
        nj = self.num_joints
        output: dict[str, jnp.ndarray] = {}

        mean_pose, mean_shape, mean_cam = load_mean_params(
            self.mean_params_path, nj
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

        # --- dual conv branches (NHWC) ---
        part_feats = self._conv_branch(features, "keypoint_deconv", train)
        smpl_feats = self._conv_branch(features, "smpl_deconv", train)

        # --- keypoint branch final conv -> heatmaps / segmentation ---
        n_maps = (
            nj + 1 if self.use_heatmaps in ("part_segm", "part_segm_pool") else nj
        )
        pad = 1 if self.final_conv_kernel == 3 else 0
        heatmaps = conv(
            n_maps, self.final_conv_kernel, 1, padding=pad, use_bias=True,
            name="keypoint_final_layer", dtype=self.dtype,
        )(part_feats)
        heatmaps = jnp.transpose(heatmaps, (0, 3, 1, 2))  # (B, J(+1), H, W)

        if self.use_heatmaps == "hm":
            kp, confidence = get_heatmap_preds(heatmaps)
            output["pred_kp2d"] = kp
            output["pred_kp2d_conf"] = confidence
            output["pred_heatmaps_2d"] = heatmaps
        elif self.use_heatmaps == "hm_soft":
            kp, _ = softargmax2d(heatmaps, self.softmax_temp)
            output["pred_kp2d"] = kp
            output["pred_heatmaps_2d"] = heatmaps
        elif self.use_heatmaps == "part_segm":
            output["pred_segm_mask"] = heatmaps
            heatmaps = heatmaps[:, 1:]
        elif self.use_heatmaps == "part_segm_pool":
            output["pred_segm_mask"] = heatmaps
            heatmaps = heatmaps[:, 1:]
            kp, _ = softargmax2d(heatmaps, self.softmax_temp)
            output["pred_kp2d"] = kp
        elif self.use_heatmaps == "attention":
            output["pred_attention"] = heatmaps
        else:
            kp, _ = softargmax2d(heatmaps, self.softmax_temp)
            output["pred_kp2d"] = kp
            output["pred_heatmaps_2d"] = heatmaps

        # --- SMPL branch final conv (shape/cam features) ---
        cam_shape_feats = conv(
            self.num_features_smpl, self.final_conv_kernel, 1, padding=pad,
            use_bias=True, name="smpl_final_layer", dtype=self.dtype,
        )(smpl_feats)

        smpl_feats_nchw = jnp.transpose(smpl_feats, (0, 3, 1, 2))
        cam_shape_nchw = jnp.transpose(cam_shape_feats, (0, 3, 1, 2))

        # --- per-joint feature pooling ---
        if self._use_kp_attention:
            point_local_feat = keypoint_attention(
                smpl_feats_nchw, heatmaps,
                act=self.keypoint_attention_act,
                use_scale=self.use_scale_keypoint_attention,
            )
            cam_shape_pooled = keypoint_attention(
                cam_shape_nchw, heatmaps,
                act=self.keypoint_attention_act,
                use_scale=self.use_scale_keypoint_attention,
            )
        else:
            kp = output["pred_kp2d"]
            point_local_feat = grid_sample_bilinear(smpl_feats_nchw, kp)
            cam_shape_pooled = grid_sample_bilinear(cam_shape_nchw, kp)

        # --- final predictions ---
        pred_uncert = None
        if self.use_hmr_regression:
            pred_pose, pred_shape, pred_cam = self._hmr_final_preds(
                cam_shape_pooled, init_pose, init_shape, init_cam, batch, train
            )
        elif self.iterative_regression:
            pred_pose, pred_shape, pred_cam = self._iterative_final_preds(
                point_local_feat, cam_shape_pooled,
                init_pose, init_shape, init_cam, batch,
            )
        else:
            pose_grid = point_local_feat[..., None]      # (B, C, J, 1)
            shape_flat = cam_shape_pooled.reshape(batch, -1)
            pred_pose = PerPositionConv1x1(
                6, (nj, 1), name="pose_mlp", dtype=self.dtype
            )(pose_grid)                                  # (B, 6, J, 1)
            pred_cam = nn.Dense(
                self.num_camera_params, name="cam_mlp", dtype=self.dtype
            )(shape_flat)
            pred_shape = nn.Dense(10, name="shape_mlp", dtype=self.dtype)(
                shape_flat
            )
            if self.uncert_layer == "same_branch_v1":
                u = PerPositionConv1x1(
                    1, (nj, 1), name="uncert_mlp", dtype=self.dtype
                )(pose_grid)
                if self.uncert_act == "sigmoid":
                    u = nn.sigmoid(u)
                elif self.uncert_act == "relu":
                    u = nn.relu(u)
                elif self.uncert_act == "softplus":
                    u = nn.softplus(u)
                pred_uncert = u[:, 0, :, 0]               # (B, J)
            if self.use_mean_camshape:
                pred_cam = pred_cam + init_cam
                pred_shape = pred_shape + init_shape
            if self.use_mean_pose:
                pred_pose = pred_pose + init_pose.reshape(1, 6, nj, 1)
            pred_pose = pred_pose[..., 0].transpose(0, 2, 1)  # (B, J, 6)

        pred_rotmat = rot6d_to_rotmat(pred_pose).reshape(batch, nj, 3, 3)
        output.update(
            pred_pose=pred_rotmat,
            pred_pose_6d=pred_pose.reshape(batch, -1),
            pred_cam=pred_cam,
            pred_shape=pred_shape,
        )
        if pred_uncert is not None:
            output["var_pose"] = pred_uncert
        if self.uncert_layer == "diff_branch":
            output["uncert_feat"] = point_local_feat.reshape(batch, -1)
        elif self.uncert_layer == "diff_branch_lc2d":
            output["uncert_feat"] = point_local_feat[..., None]
        return output

    def _hmr_final_preds(
        self, cam_shape_pooled, init_pose, init_shape, init_cam, batch, train
    ):
        """HMR-style 3-iteration regression (pare_head.py:834-853)."""
        xf = cam_shape_pooled.reshape(batch, -1)
        fc1 = nn.Dense(1024, name="fc1", dtype=self.dtype)
        fc2 = nn.Dense(1024, name="fc2", dtype=self.dtype)
        small = nn.initializers.variance_scaling(0.01**2, "fan_avg", "uniform")
        decpose = nn.Dense(
            self.num_joints * 6, name="decpose", kernel_init=small,
            dtype=self.dtype,
        )
        decshape = nn.Dense(10, name="decshape", kernel_init=small, dtype=self.dtype)
        deccam = nn.Dense(
            self.num_camera_params, name="deccam", kernel_init=small,
            dtype=self.dtype,
        )
        drop1 = nn.Dropout(0.5, deterministic=not train)
        drop2 = nn.Dropout(0.5, deterministic=not train)

        pred_pose = jnp.broadcast_to(init_pose, (batch, self.num_joints * 6))
        pred_shape = jnp.broadcast_to(init_shape, (batch, 10))
        pred_cam = jnp.broadcast_to(init_cam, (batch, self.num_camera_params))
        for _ in range(3):
            xc = jnp.concatenate([xf, pred_pose, pred_shape, pred_cam], axis=1)
            xc = drop2(fc2(drop1(fc1(xc))))
            pred_pose = decpose(xc) + pred_pose
            pred_shape = decshape(xc) + pred_shape
            pred_cam = deccam(xc) + pred_cam
        return pred_pose.reshape(batch, self.num_joints, 6), pred_shape, pred_cam

    def _iterative_final_preds(
        self, point_local_feat, cam_shape_pooled,
        init_pose, init_shape, init_cam, batch,
    ):
        """Per-joint iterative regression (pare_head.py:865-895), with the
        default input types feats.self_pose.shape.cam / feats.shape.cam."""
        nj = self.num_joints
        pose_types = self.pose_input_type.split(".")
        shape_types = self.shape_input_type.split(".")
        shape_flat = cam_shape_pooled.reshape(batch, -1)

        pose_inp_dim = self.num_deconv_filters[-1] + sum(
            {"feats": 0, "self_pose": 6, "shape": 10,
             "cam": self.num_camera_params, "all_pose": nj * 6}.get(t, 0)
            for t in pose_types
        )
        pose_mlp = PerPositionConv1x1(
            6, (nj, 1), name="pose_mlp", dtype=self.dtype
        )
        cam_mlp = nn.Dense(self.num_camera_params, name="cam_mlp", dtype=self.dtype)
        shape_mlp = nn.Dense(10, name="shape_mlp", dtype=self.dtype)

        pred_pose = jnp.broadcast_to(
            init_pose.reshape(1, 6, nj, 1), (batch, 6, nj, 1)
        )
        pred_shape = jnp.broadcast_to(init_shape, (batch, 10))
        pred_cam = jnp.broadcast_to(init_cam, (batch, self.num_camera_params))

        for _ in range(self.num_iterations):
            inp = [point_local_feat[..., None]]
            if "self_pose" in pose_types:
                inp.append(pred_pose)
            if "all_pose" in pose_types:
                ap = pred_pose.reshape(batch, 6 * nj, 1, 1)
                inp.append(jnp.broadcast_to(ap, (batch, 6 * nj, nj, 1)))
            if "shape" in pose_types:
                sh = pred_shape[:, :, None, None]
                inp.append(jnp.broadcast_to(sh, (batch, 10, nj, 1)))
            if "cam" in pose_types:
                cm = pred_cam[:, :, None, None]
                inp.append(
                    jnp.broadcast_to(cm, (batch, self.num_camera_params, nj, 1))
                )
            pose_mlp_inp = jnp.concatenate(inp, axis=1)

            sh_inp = [shape_flat]
            if "all_pose" in shape_types:
                sh_inp.append(pred_pose.reshape(batch, -1))
            if "shape" in shape_types:
                sh_inp.append(pred_shape)
            if "cam" in shape_types:
                sh_inp.append(pred_cam)
            shape_mlp_inp = jnp.concatenate(sh_inp, axis=1)

            if self.iter_residual:
                pred_pose = pose_mlp(pose_mlp_inp) + pred_pose
                pred_cam = cam_mlp(shape_mlp_inp) + pred_cam
                pred_shape = shape_mlp(shape_mlp_inp) + pred_shape
            else:
                pred_pose = pose_mlp(pose_mlp_inp)
                pred_cam = cam_mlp(shape_mlp_inp)
                pred_shape = shape_mlp(shape_mlp_inp) + init_shape

        return pred_pose[..., 0].transpose(0, 2, 1), pred_shape, pred_cam

    def get_output_channels(self) -> int:
        if "lc2d" in self.uncert_layer:
            return self.num_deconv_filters[-1]
        return self.num_joints * self.num_deconv_filters[-1]
