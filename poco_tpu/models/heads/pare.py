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
    909-917) and `diff_branch` uncert_feat export (pare_head.py:743-750);
  * the optional variants (off in every shipped config but part of the
    PARE option surface): co-attention between branches
    (pare_head.py:350-352, 706-713), branch/final non-local blocks
    (pare_head.py:312-338), soft attention (pare_head.py:195-210),
    coordinate position encodings (pare_head.py:136-141), and branch
    iteration (pare_head.py:354-389, 715-728).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...ops.rotation import rot6d_to_rotmat
from ...smpl.mean_params import load_mean_params
from ..backbones.common import (
    LaneConv,
    _pad_last,
    batch_norm,
    conv,
    lane_pad_target,
)
from ..layers import (
    PerPositionConv1x1,
    get_heatmap_preds,
    grid_sample_bilinear,
    keypoint_attention,
    softargmax2d,
)


def coord_maps(size: int) -> jnp.ndarray:
    """(1, size, size, 2) normalized xy coordinate channels
    (reference get_coord_maps, geometry.py:581-610)."""
    r = jnp.arange(size, dtype=jnp.float32) / (size - 1) * 2.0 - 1.0
    xx = jnp.broadcast_to(r[None, :], (size, size))
    yy = jnp.broadcast_to(r[:, None], (size, size))
    return jnp.stack([xx, yy], axis=-1)[None]


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
    use_coattention: bool = False
    num_coattention_iter: int = 1
    coattention_conv: str = "simple"
    use_branch_nonlocal: bool = False
    use_final_nonlocal: bool = False
    num_branch_iteration: int = 0
    use_soft_attention: bool = False
    use_position_encodings: bool = False
    use_keypoint_features_for_smpl: bool = False
    mean_params_path: str | None = None
    # Lane-pad the branch conv0 input contraction (480 -> 512 for the
    # shipped w32 concat map). Exact math — padded input channels are
    # zero — but MEASURED NET-NEGATIVE on the v5e (BENCHMARKS.md "PARE
    # head attribution"): the branch convs are HBM-bandwidth-bound at
    # ~255 GB/s, and padding moves ~47% more activation bytes for a
    # 7.715 -> 8.067 ms full-head regression at bf16/128. Default off
    # for every dtype; kept as an option for other chip generations.
    lane_pad: bool = False
    dtype: Any = jnp.float32

    @property
    def _use_kp_attention(self) -> bool:
        # part_segm / attention modes force keypoint attention on
        # (reference pare_head.py:129-132).
        if self.use_heatmaps in ("part_segm", "attention"):
            return True
        return self.use_keypoint_attention

    @property
    def _use_hmr(self) -> bool:
        # soft attention forces HMR regression (pare_head.py:112-116).
        return self.use_hmr_regression or self.use_soft_attention

    @property
    def _use_kp_feats_for_smpl(self) -> bool:
        # Reference override chain (pare_head.py:112-123): soft attention
        # forces it True, co-attention forces it False.
        if self.use_soft_attention:
            return True
        if self.use_coattention:
            return False
        return self.use_keypoint_features_for_smpl

    def _conv_branch(self, x, name: str, train: bool, logical_in: int | None = None):
        """2x [3x3 conv (no bias) -> BN -> ReLU] (pare_head.py:468-491).

        When `logical_in` differs from x's channel count, x is the
        lane-padded input and conv0 runs as a LaneConv (logical kernel
        shape, zero-padded contraction — checkpoint compatible).
        """
        for i in range(self.num_deconv_layers):
            if i == 0 and logical_in is not None and x.shape[-1] != logical_in:
                x = LaneConv(
                    self.num_deconv_filters[i], logical_in, 3,
                    pad_in=x.shape[-1],
                    name=f"{name}_conv{i}", dtype=self.dtype,
                )(x)
            else:
                x = conv(
                    self.num_deconv_filters[i], 3, 1,
                    name=f"{name}_conv{i}", dtype=self.dtype,
                )(x)
            x = batch_norm(train, name=f"{name}_bn{i}", dtype=self.dtype)(x)
            x = nn.relu(x)
        return x

    def _make_final_layer(self, out_ch: int, name: str, train: bool):
        """Build a reusable final-layer callable: 1x1 conv, or
        conv3x3->BN->ReLU->conv1x1 with soft attention
        (pare_head.py:195-227). Modules are created once so repeated
        calls (co-attention / branch iteration loops) share parameters."""
        pad = 1 if self.final_conv_kernel == 3 else 0
        if self.use_soft_attention:
            pre = conv(256, 3, 1, name=f"{name}_pre", dtype=self.dtype)
            prebn = batch_norm(train, name=f"{name}_prebn", dtype=self.dtype)
            last = conv(
                out_ch, 1, padding=0, use_bias=True, name=name,
                dtype=self.dtype,
            )
            return lambda x: last(nn.relu(prebn(pre(x))))
        mod = conv(
            out_ch, self.final_conv_kernel, 1, padding=pad, use_bias=True,
            name=name, dtype=self.dtype,
        )
        return mod

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

        if self.use_position_encodings:
            pos = jnp.broadcast_to(
                coord_maps(features.shape[1]),
                (batch, features.shape[1], features.shape[2], 2),
            )
            features = jnp.concatenate([features, pos], axis=-1)

        # --- optional submodules (created once, reused in loops) ---
        coatt = None
        if self.use_coattention:
            from ..attention import CoAttention

            coatt = CoAttention(
                n_channel=self.num_deconv_filters[-1],
                final_conv=self.coattention_conv,
                name="coattention", dtype=self.dtype,
            )
        branch_nl_2d = branch_nl_3d = None
        if self.use_branch_nonlocal:
            from ..attention import NonLocalBlock

            branch_nl_2d = NonLocalBlock(
                self.num_deconv_filters[-1], name="branch_2d_nonlocal",
                dtype=self.dtype,
            )
            branch_nl_3d = NonLocalBlock(
                self.num_deconv_filters[-1], name="branch_3d_nonlocal",
                dtype=self.dtype,
            )
        final_nl_pose = final_nl_shape = None
        if self.use_final_nonlocal:
            from ..attention import NonLocalBlock

            final_nl_pose = NonLocalBlock(
                self.num_deconv_filters[-1], name="final_pose_nonlocal",
                dtype=self.dtype,
            )
            final_nl_shape = NonLocalBlock(
                self.num_features_smpl, name="final_shape_nonlocal",
                dtype=self.dtype,
            )
        branch_iter_nl = None
        if self.num_branch_iteration > 0:
            from ..attention import NonLocalBlock

            branch_iter_nl = NonLocalBlock(
                self.num_deconv_filters[-1], name="branch_iter_3d_nonlocal",
                dtype=self.dtype,
            )

        # --- dual conv branches (NHWC) ---
        use_lp = self.lane_pad
        cin = features.shape[-1]
        branch_in = features
        logical_in = None
        if use_lp and lane_pad_target(cin) != cin:
            branch_in = _pad_last(features, lane_pad_target(cin))
            logical_in = cin
        part_feats = self._conv_branch(
            branch_in, "keypoint_deconv", train, logical_in
        )
        if branch_nl_2d is not None:
            part_feats = branch_nl_2d(part_feats, train)
        if self._use_kp_feats_for_smpl:
            smpl_feats = part_feats  # pare_head.py:772 / 950
        else:
            smpl_feats = self._conv_branch(
                branch_in, "smpl_deconv", train, logical_in
            )
            if branch_nl_3d is not None:
                smpl_feats = branch_nl_3d(smpl_feats, train)

        keypoint_final = self._make_final_layer(
            nj + 1 if self.use_heatmaps in ("part_segm", "part_segm_pool") else nj,
            "keypoint_final_layer", train,
        )
        smpl_final = self._make_final_layer(
            self.num_features_smpl, "smpl_final_layer", train
        )

        def get_part_attention(pf):
            """Heatmaps/segmentation -> attention map (pare_head.py:781-826)."""
            hm = jnp.transpose(keypoint_final(pf), (0, 3, 1, 2))
            if self.use_heatmaps == "hm":
                kp, confidence = get_heatmap_preds(hm)
                output["pred_kp2d"] = kp
                output["pred_kp2d_conf"] = confidence
                output["pred_heatmaps_2d"] = hm
            elif self.use_heatmaps == "hm_soft":
                kp, _ = softargmax2d(hm, self.softmax_temp)
                output["pred_kp2d"] = kp
                output["pred_heatmaps_2d"] = hm
            elif self.use_heatmaps == "part_segm":
                output["pred_segm_mask"] = hm
                hm = hm[:, 1:]
            elif self.use_heatmaps == "part_segm_pool":
                output["pred_segm_mask"] = hm
                hm = hm[:, 1:]
                kp, _ = softargmax2d(hm, self.softmax_temp)
                output["pred_kp2d"] = kp
            elif self.use_heatmaps == "attention":
                output["pred_attention"] = hm
            else:
                kp, _ = softargmax2d(hm, self.softmax_temp)
                output["pred_kp2d"] = kp
                output["pred_heatmaps_2d"] = hm
            return hm

        def get_local_feats(sf, attention):
            """Per-joint pooling of both branches (pare_head.py:754-763)."""
            csf = smpl_final(sf)
            sf_nchw = jnp.transpose(sf, (0, 3, 1, 2))
            csf_nchw = jnp.transpose(csf, (0, 3, 1, 2))
            if self._use_kp_attention:
                plf = keypoint_attention(
                    sf_nchw, attention,
                    act=self.keypoint_attention_act,
                    use_scale=self.use_scale_keypoint_attention,
                )
                csp = keypoint_attention(
                    csf_nchw, attention,
                    act=self.keypoint_attention_act,
                    use_scale=self.use_scale_keypoint_attention,
                )
            else:
                kp = output["pred_kp2d"]
                plf = grid_sample_bilinear(sf_nchw, kp)
                csp = grid_sample_bilinear(csf_nchw, kp)
            return plf, csp

        # --- decoders (shared across co-attention / branch iterations) ---
        if self._use_hmr:
            fc1 = nn.Dense(1024, name="fc1", dtype=self.dtype)
            fc2 = nn.Dense(1024, name="fc2", dtype=self.dtype)
            small = nn.initializers.variance_scaling(
                0.01**2, "fan_avg", "uniform"
            )
            decpose = nn.Dense(nj * 6, name="decpose", kernel_init=small,
                               dtype=self.dtype)
            decshape = nn.Dense(10, name="decshape", kernel_init=small,
                                dtype=self.dtype)
            deccam = nn.Dense(self.num_camera_params, name="deccam",
                              kernel_init=small, dtype=self.dtype)
            drop1 = nn.Dropout(0.5, deterministic=not train)
            drop2 = nn.Dropout(0.5, deterministic=not train)

            def final_preds(plf, csp, p0, s0, c0):
                xf = csp.reshape(batch, -1)
                pose = jnp.broadcast_to(p0.reshape(-1)[None], (batch, nj * 6)) \
                    if p0.ndim == 1 else p0.reshape(batch, -1)
                shape = jnp.broadcast_to(s0, (batch, 10)) if s0.ndim == 1 else s0
                cam = (
                    jnp.broadcast_to(c0, (batch, self.num_camera_params))
                    if c0.ndim == 1 else c0
                )
                for _ in range(3):
                    xc = jnp.concatenate([xf, pose, shape, cam], axis=1)
                    xc = drop2(fc2(drop1(fc1(xc))))
                    pose = decpose(xc) + pose
                    shape = decshape(xc) + shape
                    cam = deccam(xc) + cam
                return pose.reshape(batch, nj, 6), shape, cam, None
        else:
            pose_mlp = PerPositionConv1x1(
                6, (nj, 1), name="pose_mlp", dtype=self.dtype
            )
            cam_mlp = nn.Dense(
                self.num_camera_params, name="cam_mlp", dtype=self.dtype
            )
            shape_mlp = nn.Dense(10, name="shape_mlp", dtype=self.dtype)
            mlps = (pose_mlp, cam_mlp, shape_mlp)
            uncert_mlp = (
                PerPositionConv1x1(1, (nj, 1), name="uncert_mlp",
                                   dtype=self.dtype)
                if self.uncert_layer == "same_branch_v1"
                else None
            )

            def final_preds(plf, csp, p0, s0, c0):
                pose_grid = plf[..., None]                # (B, C, J, 1)
                shape_feats = csp
                if final_nl_pose is not None:
                    pg = final_nl_pose(
                        plf.transpose(0, 2, 1), train
                    ).transpose(0, 2, 1)
                    pose_grid = pg[..., None]
                    shape_feats = final_nl_shape(
                        csp.transpose(0, 2, 1), train
                    ).transpose(0, 2, 1)
                shape_flat = shape_feats.reshape(batch, -1)
                pose = pose_mlp(pose_grid)
                cam = cam_mlp(shape_flat)
                shape = shape_mlp(shape_flat)
                uncert = None
                if uncert_mlp is not None:
                    u = uncert_mlp(pose_grid)
                    if self.uncert_act == "sigmoid":
                        u = nn.sigmoid(u)
                    elif self.uncert_act == "relu":
                        u = nn.relu(u)
                    elif self.uncert_act == "softplus":
                        u = nn.softplus(u)
                    uncert = u[:, 0, :, 0]
                if self.use_mean_camshape:
                    cam = cam + c0
                    shape = shape + s0
                if self.use_mean_pose:
                    pose = pose + p0.reshape(1, 6, nj, 1)
                return pose[..., 0].transpose(0, 2, 1), shape, cam, uncert

        # --- main flow ---
        part_attention = get_part_attention(part_feats)
        point_local_feat, cam_shape_pooled = get_local_feats(
            smpl_feats, part_attention
        )

        if self.iterative_regression and not self._use_hmr:
            pred_pose, pred_shape, pred_cam = self._iterative_final_preds(
                mlps, point_local_feat, cam_shape_pooled,
                init_pose, init_shape, init_cam, batch,
            )
            pred_uncert = None
        else:
            pred_pose, pred_shape, pred_cam, pred_uncert = final_preds(
                point_local_feat, cam_shape_pooled,
                init_pose, init_shape, init_cam,
            )

        if coatt is not None:
            for _ in range(self.num_coattention_iter):
                smpl_feats, part_feats = coatt(smpl_feats, part_feats, train)
                part_attention = get_part_attention(part_feats)
                point_local_feat, cam_shape_pooled = get_local_feats(
                    smpl_feats, part_attention
                )
                pred_pose, pred_shape, pred_cam, pred_uncert = final_preds(
                    point_local_feat, cam_shape_pooled,
                    pred_pose, pred_shape, pred_cam,
                )

        if branch_iter_nl is not None:
            for _ in range(self.num_branch_iteration):
                smpl_feats = branch_iter_nl(smpl_feats, train)
                part_feats = smpl_feats
                part_attention = get_part_attention(part_feats)
                point_local_feat, cam_shape_pooled = get_local_feats(
                    smpl_feats, part_attention
                )
                pred_pose, pred_shape, pred_cam, pred_uncert = final_preds(
                    point_local_feat, cam_shape_pooled,
                    pred_pose, pred_shape, pred_cam,
                )

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

    def _iterative_final_preds(
        self, mlps, point_local_feat, cam_shape_pooled,
        init_pose, init_shape, init_cam, batch,
    ):
        """Per-joint iterative regression (pare_head.py:865-895), with the
        default input types feats.self_pose.shape.cam / feats.shape.cam."""
        nj = self.num_joints
        pose_types = self.pose_input_type.split(".")
        shape_types = self.shape_input_type.split(".")
        shape_flat = cam_shape_pooled.reshape(batch, -1)
        pose_mlp, cam_mlp, shape_mlp = mlps

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
