"""POCO / HMR training losses in JAX.

Reference contract: pocolib/losses/losses.py:164-509. TPU-first redesign:
the reference masks samples with boolean indexing (`x[has_smpl == 1]`),
which produces data-dependent shapes; here every component is a masked
mean with static shapes so the whole loss jits and shards cleanly.

GT dict keys (device arrays):
    pose          (B, 72)  axis-angle SMPL pose
    betas         (B, 10)
    pose_3d       (B, 24, 4) GT 3D joints + confidence
    vertices      (B, V, 3) GT mesh
    has_smpl      (B,) float {0,1}
    has_pose_3d   (B,) float {0,1}
    keypoints     (B, 49, 3) crop-frame keypoints, [-1,1] normalized + conf
    keypoints_fullimg (B, 49, 3) full-image pixel keypoints + conf
    orig_shape    (B, 2) original (h, w)
    scale         (B,) bbox height / 200
    gt_pose_cond_mask (B,) bool — rows fed GT pose into the uncert head
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax.numpy as jnp

from ..ops.rotation import axis_angle_to_rotmat

_EPS = 1e-8


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Weights mirror configs/demo_poco_cliff.yaml and config.py defaults."""

    shape_loss_weight: float = 0.0
    keypoint3d_loss_weight: float = 5.0
    keypoint2d_loss_weight: float = 2.5
    keypoint2d_noncrop: bool = False
    pose_loss_weight: float = 1.0
    beta_loss_weight: float = 0.001
    openpose_train_weight: float = 0.0
    gt_train_weight: float = 1.0
    pose_uncert_weight: float = 1.0
    beta_uncert_weight: float = 1.0
    nf_loss_weight: float = 0.01
    loss_weight: float = 60.0
    loss_ver: str = "norm_flow_res_gaus"
    uncert_type: str = "pose"
    exclude_uncert_idx: tuple[int, ...] = ()
    use_smpl_segm_loss: bool = False
    smpl_segm_loss_weight: float = 1.0
    use_smpl_render_loss: bool = False
    smpl_render_loss_weight: float = 1.0
    # The reference's smpl_losses_uncertainty silently trains the pose
    # term as plain MSE whenever sigma is 2-D (SIGMA_DIM=1 — all shipped
    # configs): the `if len(pose_var.shape) == 2` branch swallows the
    # loss_ver elif chain (losses.py:477-496). We replicate that by
    # default; set sigma1_nll=True to apply the Gaussian NLL with a
    # broadcast sigma instead (documented divergence, PARITY.md).
    sigma1_nll: bool = False

    @property
    def effective_pose_weight(self) -> float:
        # Reference multiplies pose weight by the uncert multiplier
        # (losses.py:218-219) for every uncertainty-aware loss version.
        if "pose" in self.uncert_type and self.loss_ver != "norm_flow":
            return self.pose_loss_weight * self.pose_uncert_weight
        return self.pose_loss_weight


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over rows where mask is 1; 0 if no rows selected.

    mask has shape (B,); x has shape (B, ...).
    """
    mask = mask.astype(x.dtype)
    shape = (-1,) + (1,) * (x.ndim - 1)
    weighted = x * mask.reshape(shape)
    per_row = x[0].size
    denom = jnp.maximum(mask.sum() * per_row, 1.0)
    return weighted.sum() / denom


def projected_keypoint_loss(
    pred_kp2d: jnp.ndarray,
    gt_kp2d: jnp.ndarray,
    openpose_weight: float,
    gt_weight: float,
) -> jnp.ndarray:
    """Confidence-weighted squared reprojection error, unreduced.

    Reference: losses.py:361-376.
    """
    conf = gt_kp2d[..., -1:]
    conf = jnp.concatenate(
        [conf[:, :25] * openpose_weight, conf[:, 25:] * gt_weight], axis=1
    )
    return conf * (pred_kp2d - gt_kp2d[..., :-1]) ** 2


def keypoint_3d_loss(
    pred_joints49: jnp.ndarray,
    gt_joints24: jnp.ndarray,
    has_pose_3d: jnp.ndarray,
) -> jnp.ndarray:
    """Pelvis-centered confidence-weighted MSE over the 24 GT joints
    (reference losses.py:392-419 multiplies by the per-joint conf)."""
    pred = pred_joints49[:, 25:, :]
    gt = gt_joints24[..., :-1]
    conf = gt_joints24[..., -1:]
    gt_pelvis = (gt[:, 2, :] + gt[:, 3, :]) / 2.0
    pred_pelvis = (pred[:, 2, :] + pred[:, 3, :]) / 2.0
    gt = gt - gt_pelvis[:, None, :]
    pred = pred - pred_pelvis[:, None, :]
    return masked_mean(conf * (pred - gt) ** 2, has_pose_3d)


def shape_loss(
    pred_vertices: jnp.ndarray,
    gt_vertices: jnp.ndarray,
    has_smpl: jnp.ndarray,
) -> jnp.ndarray:
    """Per-vertex L1 (reference losses.py:422-434)."""
    return masked_mean(jnp.abs(pred_vertices - gt_vertices), has_smpl)


def smpl_losses_uncertainty(
    pred_rotmat: jnp.ndarray,
    pred_betas: jnp.ndarray,
    gt_pose_aa: jnp.ndarray,
    gt_betas: jnp.ndarray,
    has_smpl: jnp.ndarray,
    gt_pose_cond_mask: jnp.ndarray | None,
    var_pose: jnp.ndarray | None,
    cfg: LossConfig,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pose/shape parameter losses with uncertainty weighting.

    Reference: losses.py:437-509. GT-pose-conditioned rows are excluded
    from the sigma-weighted pose loss; they contribute a plain MSE plus a
    mean-sigma regularizer instead (losses.py:503-507).
    """
    batch = pred_rotmat.shape[0]
    gt_rotmat = axis_angle_to_rotmat(gt_pose_aa.reshape(-1, 3)).reshape(
        batch, 24, 3, 3
    )

    if gt_pose_cond_mask is None:
        gt_pose_cond_mask = jnp.zeros((batch,), bool)
    no_uncert = jnp.logical_and(gt_pose_cond_mask, has_smpl > 0)
    uncert = jnp.logical_and(jnp.logical_not(gt_pose_cond_mask), has_smpl > 0)

    sq_err = (pred_rotmat - gt_rotmat) ** 2

    if var_pose is not None and "pose" in cfg.uncert_type:
        sigma = var_pose
        sigma_was_2d = sigma.ndim == 2
        if sigma_was_2d:
            sigma = jnp.broadcast_to(
                sigma[:, :, None, None], sigma.shape[:2] + (3, 3)
            )
        if sigma_was_2d and not cfg.sigma1_nll:
            # Reference fallthrough: 2-D sigma (SIGMA_DIM=1) -> plain MSE
            # for the pose term (losses.py:477-479 swallows the elifs).
            loss_pose = masked_mean(sq_err, uncert)
        elif cfg.loss_ver == "norm_flow_res":
            if sigma.shape[1] < 24:
                # EXCLUDE_UNCERT_IDX shrinks sigma to P < 24 parts; the
                # reference broadcasts mismatched shapes here and crashes
                # (losses.py:480-484). Deliberate divergence: fall back
                # to plain MSE, mirroring its own norm_flow_res_gaus
                # handling of the same case (losses.py:487-488).
                loss_pose = masked_mean(sq_err, uncert)
            else:
                amp = 1.0 / math.sqrt(2.0 * math.pi)
                log_q = jnp.log(sigma / amp) + jnp.abs(
                    pred_rotmat - gt_rotmat
                ) / (math.sqrt(2.0) * sigma + 1e-9)
                loss_pose = masked_mean(log_q, uncert)
        elif cfg.loss_ver == "norm_flow_res_gaus":
            if sigma.shape[1] < 24:
                # Reference parity: excluded-parts sigma -> plain MSE
                # (losses.py:487-488 "Some parts are excluded").
                loss_pose = masked_mean(sq_err, uncert)
            else:
                nll = sq_err / (sigma + _EPS) + jnp.log(sigma + _EPS)
                loss_pose = 0.5 * masked_mean(nll, uncert)
        else:
            # Reference: unknown loss_ver with 'pose' uncert -> zero pose
            # loss (losses.py:494-496 fills 0) — kept as masked MSE here
            # would diverge; replicate the zero.
            loss_pose = jnp.zeros((), pred_rotmat.dtype)
    else:
        loss_pose = masked_mean(sq_err, uncert)

    loss_betas = masked_mean((pred_betas - gt_betas) ** 2, has_smpl)

    # GT-pose-conditioned rows: plain MSE + sigma regularizer.
    if var_pose is not None:
        loss_pose_no_uncert = masked_mean(sq_err, no_uncert)
        loss_gt_var = masked_mean(var_pose, no_uncert)
        any_cond = jnp.any(no_uncert).astype(loss_pose.dtype)
        loss_pose = loss_pose + any_cond * (loss_pose_no_uncert + loss_gt_var)

    return loss_pose, loss_betas


def poco_loss(
    pred: dict[str, Any],
    gt: dict[str, jnp.ndarray],
    cfg: LossConfig = LossConfig(),
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Total POCO training loss (reference: POCOLoss.forward, losses.py:227-358)."""
    has_smpl = gt["has_smpl"].astype(jnp.float32)
    has_pose_3d = gt["has_pose_3d"].astype(jnp.float32)
    var_pose = pred.get("var_pose")
    gt_pose_cond_mask = gt.get("gt_pose_cond_mask")

    pred_kp2d = pred["smpl_joints2d"]
    if cfg.keypoint2d_noncrop:
        # orig_shape stores (h, w); normalize pixel coords by (w, h).
        img_size = gt["orig_shape"][:, ::-1][:, None, :]
        pred_norm = 2.0 * (pred_kp2d / img_size) - 1.0
        gt_kp = gt["keypoints_fullimg"]
        gt_norm = jnp.concatenate(
            [2.0 * (gt_kp[..., :2] / img_size) - 1.0, gt_kp[..., 2:]], axis=-1
        )
        kp_loss = projected_keypoint_loss(
            pred_norm, gt_norm, cfg.openpose_train_weight, cfg.gt_train_weight
        )
        scale_w = img_size[:, 0, :] / (gt["scale"] * 200.0)[:, None]
        loss_keypoints = (kp_loss * scale_w[:, None, :]).mean()
    else:
        kp_loss = projected_keypoint_loss(
            pred_kp2d, gt["keypoints"],
            cfg.openpose_train_weight, cfg.gt_train_weight,
        )
        loss_keypoints = kp_loss.mean()

    loss_regr_pose, loss_regr_betas = smpl_losses_uncertainty(
        pred["pred_pose"], pred["pred_shape"],
        gt["pose"], gt["betas"],
        has_smpl, gt_pose_cond_mask, var_pose, cfg,
    )

    loss_keypoints_3d = keypoint_3d_loss(
        pred["smpl_joints3d"], gt["pose_3d"], has_pose_3d
    )
    loss_shape = shape_loss(pred["smpl_vertices"], gt["vertices"], has_smpl)
    loss_cam = jnp.mean(jnp.exp(-pred["pred_cam"][:, 0] * 10.0) ** 2) * 0.016

    loss_dict = {
        "loss/loss_keypoints": loss_keypoints * cfg.keypoint2d_loss_weight,
        "loss/loss_keypoints_3d": loss_keypoints_3d * cfg.keypoint3d_loss_weight,
        "loss/loss_regr_pose": loss_regr_pose * cfg.effective_pose_weight,
        "loss/loss_regr_betas": loss_regr_betas
        * cfg.beta_loss_weight
        * cfg.beta_uncert_weight,
        "loss/loss_shape": loss_shape * cfg.shape_loss_weight,
        "loss/loss_cam": loss_cam,
    }

    # Optional part-segmentation CE (reference losses.py:334-340) and
    # differentiable-render MSE (losses.py:328-332).
    if cfg.use_smpl_segm_loss and "pred_segm_mask" in pred and "gt_segm_mask" in gt:
        from .segmentation import part_segmentation_loss

        loss_dict["loss/loss_smpl_segm"] = (
            part_segmentation_loss(
                pred["pred_segm_mask"], gt["gt_segm_mask"], has_smpl
            )
            * cfg.smpl_segm_loss_weight
        )
    if (
        cfg.use_smpl_render_loss
        and "pred_smpl_render" in pred
        and "gt_smpl_render" in gt
    ):
        loss_dict["loss/loss_smpl_render"] = (
            jnp.mean((pred["pred_smpl_render"] - gt["gt_smpl_render"]) ** 2)
            * cfg.smpl_render_loss_weight
        )

    # Normalizing-flow calibration loss (reference losses.py:342-347).
    log_phi = pred.get("log_phi")
    if log_phi is not None and var_pose is not None:
        nf_term = jnp.log(var_pose + _EPS) - log_phi
        loss_dict["loss/loss_nf"] = (
            masked_mean(nf_term, has_smpl) * cfg.nf_loss_weight
        )

    total = sum(loss_dict.values()) * cfg.loss_weight
    loss_dict["loss/total_loss"] = total
    return total, loss_dict


def hmr_loss_config(**overrides) -> LossConfig:
    """Loss config for the plain HMR baseline (reference HMRLoss,
    losses.py:15-162): no uncertainty weighting, no flow term."""
    defaults = dict(loss_ver="mse", uncert_type="", nf_loss_weight=0.0)
    defaults.update(overrides)
    return LossConfig(**defaults)
