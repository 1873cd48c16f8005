"""Jitted train / eval steps.

Replaces the reference's LitModule.training_step / validation_step
(pocolib/core/trainer.py:210-362) with pure jitted functions:

  * GT mesh generation (gendered SMPL on GT pose/shape) and camera
    translation fitting happen *inside* the step — the reference's
    per-sample numpy `estimate_translation` host sync
    (trainer.py:238-243) becomes a batched on-device solve;
  * loss + backward + Adam update is one XLA program; donated state;
  * data parallelism: the same step jitted with a sharded batch runs SPMD
    over the mesh, XLA inserting the gradient psum (vs. DDP/NCCL in the
    reference, train.py:81-96).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import FOCAL_LENGTH, IMG_RES
from ..losses.losses import LossConfig, poco_loss
from ..ops.camera import perspective_projection
from ..ops.rotation import axis_angle_to_rotmat
from ..smpl.lbs import SmplParams
from ..smpl.model import smpl_49
from .state import TrainState


def prepare_gt(
    batch: dict[str, jnp.ndarray], smpl: SmplParams
) -> dict[str, jnp.ndarray]:
    """Build GT supervision targets on device.

    Mirrors trainer.py:220-247: run SMPL on GT pose/betas for GT
    vertices/joints, fit the GT camera translation from the 24 GT
    keypoints, and synthesize crop-frame GT 2D keypoints when needed.
    """
    gt_pose = batch["pose"]                      # (B, 72) axis-angle
    gt_betas = batch["betas"]                    # (B, 10)
    batch_size = gt_pose.shape[0]

    gt_rotmat = axis_angle_to_rotmat(gt_pose.reshape(-1, 3)).reshape(
        batch_size, 24, 3, 3
    )
    gt_vertices, gt_joints49 = smpl_49(smpl, gt_betas, gt_rotmat)

    gt = dict(batch)
    gt["gt_pose_rotmat"] = gt_rotmat
    gt["vertices"] = gt_vertices
    gt["model_joints"] = gt_joints49

    if "pose_3d" not in batch:
        conf = jnp.ones((batch_size, 24, 1), jnp.float32)
        gt["pose_3d"] = jnp.concatenate([gt_joints49[:, 25:], conf], axis=-1)

    if "keypoints" not in batch:
        # No 2D annotations: synthesize crop-frame GT keypoints by
        # projecting the GT joints with a canonical camera (fixed depth
        # tz = 2f/res, i.e. weak-perspective s=1, principal point at the
        # crop center) and normalizing to [-1, 1]. A translation fit
        # against 3D xy coordinates would be geometrically meaningless
        # (they are meters, not pixels).
        cam_t = jnp.tile(
            jnp.asarray(
                [[0.0, 0.0, 2.0 * FOCAL_LENGTH / IMG_RES]], jnp.float32
            ),
            (batch_size, 1),
        )
        center = jnp.full((batch_size, 2), IMG_RES / 2.0, jnp.float32)
        proj = perspective_projection(
            gt_joints49, cam_t, FOCAL_LENGTH, camera_center=center
        )
        norm = 2.0 * proj / IMG_RES - 1.0
        gt["keypoints"] = jnp.concatenate(
            [norm, jnp.ones((batch_size, 49, 1))], axis=-1
        )
    return gt


def make_train_step(
    model,
    loss_cfg: LossConfig = LossConfig(),
    donate: bool = True,
):
    """Build the jitted training step.

    Returns step(state, batch, smpl, rng) -> (state, metrics).
    Batch must contain: img, bbox_info/focal_length/scale/center/orig_shape
    (cliff), pose, betas, has_smpl, has_pose_3d, keypoints (or none),
    gt_pose_cond_mask (optional).
    """

    def step(state: TrainState, batch, smpl: SmplParams, rng):
        gt = prepare_gt(batch, smpl)
        model_batch = dict(batch)
        model_batch["gt_pose_rotmat"] = gt["gt_pose_rotmat"]

        # Optional render / part-segmentation supervision (reference
        # trainer.py:251-275, broken as shipped — here produced by the
        # differentiable soft rasterizer, ops/soft_raster.py).
        if loss_cfg.use_smpl_render_loss or loss_cfg.use_smpl_segm_loss:
            from ..ops.soft_raster import soft_part_probs, soft_silhouette

            gt_cam = batch.get(
                "gt_cam", jnp.tile(jnp.asarray([[0.9, 0.0, 0.0]]),
                                   (gt["vertices"].shape[0], 1))
            )
            if loss_cfg.use_smpl_render_loss:
                gt["gt_smpl_render"] = soft_silhouette(
                    gt["vertices"], gt_cam
                )
                gt["gt_cam_render"] = gt_cam
            if loss_cfg.use_smpl_segm_loss:
                probs = soft_part_probs(
                    gt["vertices"], gt_cam, smpl.lbs_weights
                )
                gt["gt_segm_mask"] = jnp.argmax(probs, axis=-1)

        def loss_fn_with_out(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            if state.buffers is not None:
                variables["buffers"] = state.buffers
            out, mutated = state.apply_fn(
                variables,
                model_batch,
                smpl,
                train=True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            if loss_cfg.use_smpl_render_loss and "gt_smpl_render" in gt:
                from ..ops.soft_raster import soft_silhouette

                out = dict(out)
                out["pred_smpl_render"] = soft_silhouette(
                    out["smpl_vertices"], gt["gt_cam_render"]
                )
            loss, loss_dict = poco_loss(out, gt, loss_cfg)
            return loss, (loss_dict, mutated.get("batch_stats"), out)

        (loss, (loss_dict, new_stats, out)), grads = jax.value_and_grad(
            loss_fn_with_out, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads)
        if new_stats is not None:
            new_state = new_state.replace(batch_stats=new_stats)
        metrics = dict(loss_dict)
        metrics["grad_norm"] = optax_global_norm(grads)
        # Non-scalar auxiliaries ("_"-prefixed; the trainer pops them):
        # uncertainty stats input and a small viz payload.
        if out.get("var_pose") is not None:
            metrics["_var_pose"] = out["var_pose"]
        metrics["_viz"] = {
            "pred_verts": out["smpl_vertices"][:4],
            "pred_cam": out["pred_cam"][:4],
            "gt_verts": gt["vertices"][:4],
        }
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, j_regressor_h36m: jnp.ndarray | None = None):
    """Build the jitted eval step computing per-sample metrics.

    Returns step(variables, batch, smpl) -> dict of per-sample arrays:
    mpjpe, pa_mpjpe, v2v (meters) plus predicted uncertainty.
    Mirrors validation_step (trainer.py:298-362).
    """
    from ..eval.metrics import (
        joints_from_vertices,
        mpjpe,
        pa_mpjpe,
        vertex_error,
    )

    def step(variables, batch, smpl: SmplParams):
        out = model.apply(variables, batch, smpl, train=False)
        pred_verts = out["smpl_vertices"]

        gt_verts = batch["gt_vertices"]
        if j_regressor_h36m is not None:
            pred_j14 = joints_from_vertices(j_regressor_h36m, pred_verts)
            gt_j14 = joints_from_vertices(j_regressor_h36m, gt_verts)
        else:
            # Fall back to the 14 common joints from the 49-joint output.
            from ..constants import J24_TO_J14

            sel = jnp.asarray(J24_TO_J14)
            pred_j = out["smpl_joints3d"][:, 25:][:, sel]
            gt_j = batch["gt_joints3d"][:, sel]
            # Hip-midpoint pelvis, matching keypoint_3d_loss and the
            # reference eval convention (joints 2 and 3 averaged).
            pred_j14 = pred_j - (pred_j[:, 2:3] + pred_j[:, 3:4]) / 2.0
            gt_j14 = gt_j - (gt_j[:, 2:3] + gt_j[:, 3:4]) / 2.0

        metrics = {
            "mpjpe": mpjpe(pred_j14, gt_j14),
            "pa_mpjpe": pa_mpjpe(pred_j14, gt_j14),
            # Raw vertices, no alignment — the reference protocol
            # (eval_utils.py:104-118 compares unaligned meshes).
            "v2v": vertex_error(pred_verts, gt_verts),
        }
        if out.get("var_pose") is not None:
            metrics["uncert"] = out["var_pose"].mean(axis=-1)
        return metrics

    return jax.jit(step)


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves))


def best_model_metric(pa_mpjpe_mm: float, mpjpe_mm: float) -> float:
    """Composite selection criterion (reference trainer.py:407-408)."""
    return 0.5 * (1.5 * pa_mpjpe_mm + mpjpe_mm)
