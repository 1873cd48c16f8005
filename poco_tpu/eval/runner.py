"""Sharded evaluation pipeline: dataset -> per-sample metrics -> reports.

Replaces the reference's validation/test loop (pocolib/core/trainer.py:
298-465) and offline pkl re-slicer (pocolib/utils/compute_error.py:29-85):

  * GT mesh generation (gendered SMPL) runs *inside* the jitted eval step
    — the reference runs a torch SMPL per dataset item on the host
    (base_dataset.py:341-379);
  * Procrustes alignment is a batched on-device SVD;
  * batches are padded to a fixed size and sharded over the device mesh
    ("data" axis), so the full 3DPW test set is a stream of identical
    SPMD programs (BASELINE.json configs[4]);
  * per-sample metrics come back to the host once per batch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    PW3D_OCCLUDED_SEQUENCES,
    PW3D_TEST_SEQUENCES,
    SMPL_J24_TO_COMMON_J14,
)
from ..ops.rotation import axis_angle_to_rotmat
from ..parallel.mesh import make_mesh, pad_to_multiple, shard_batch
from ..smpl.lbs import SmplParams, smpl_forward
from ..train.step import best_model_metric
from .metrics import mpjpe, pa_mpjpe, uncert_error_correlation, vertex_error
from .uncertainty import prepare_uncert


def make_gendered_eval_step(
    model,
    j_regressor_eval: jnp.ndarray | None = None,
    flip_test: bool = False,
):
    """Jitted eval step with on-device gendered GT mesh generation.

    Args:
        model: POCO flax module.
        j_regressor_eval: optional (17, V) H36M regressor; if None, the
            14 common joints are taken from the SMPL skeleton directly.
        flip_test: horizontal-flip test-time augmentation. The reference
            INTENDED this (`TestAugDataset`, a nonexistent import at
            pocolib/core/trainer.py:24 — shipped broken); here it is one
            SPMD program: the flipped crop runs through the same forward,
            the mirrored pose is un-flipped by conjugation with
            S=diag(1,-1,-1) under the SMPL left/right joint permutation
            (the rotmat form of the reference's axis-angle flip rule,
            constants.py:104-114), the two rotations are chordally
            averaged and projected back to SO(3) by batched SVD, betas
            averaged, and ONE extra SMPL pass produces the evaluated
            mesh. Costs 2x backbone+head + 1 LBS per batch.
    Returns:
        step(variables, batch, smpl_neutral, smpl_male, smpl_female)
        -> per-sample metric dict. Batch needs img/bbox fields plus
        pose (B,72), betas (B,10), gender (B,) int {-1,0:male,1:female}.
    """

    def step(variables, batch, smpl_n: SmplParams, smpl_m: SmplParams,
             smpl_f: SmplParams):
        out = model.apply(variables, batch, smpl_n, train=False)
        pred_verts = out["smpl_vertices"]
        pred_pose_eval = out["pred_pose"]
        pred_shape_eval = out["pred_shape"]

        if flip_test:
            fb = dict(batch)
            fb["img"] = batch["img"][:, :, ::-1, :]
            if "bbox_info" in fb:
                # CLIFF conditioning under mirror: cx negates, cy and
                # scale terms are mirror-invariant (image_utils.py:174-187)
                fb["bbox_info"] = fb["bbox_info"] * jnp.asarray(
                    [-1.0, 1.0, 1.0], fb["bbox_info"].dtype
                )
            if "center" in fb and "orig_shape" in fb:
                w = fb["orig_shape"][:, 1]
                fb["center"] = jnp.stack(
                    [w - fb["center"][:, 0], fb["center"][:, 1]], axis=1
                )
            out_flip = model.apply(variables, fb, smpl_n, train=False)
            from ..ops.rotation import average_rotmats, flip_pose_rotmat

            pred_pose_eval = average_rotmats(
                out["pred_pose"], flip_pose_rotmat(out_flip["pred_pose"])
            )
            pred_shape_eval = 0.5 * (
                out["pred_shape"] + out_flip["pred_shape"]
            )
            pred_verts = smpl_forward(
                smpl_n, pred_shape_eval, pred_pose_eval
            ).vertices

        bsz = batch["pose"].shape[0]
        gt_rotmat = axis_angle_to_rotmat(
            batch["pose"].reshape(-1, 3)
        ).reshape(bsz, 24, 3, 3)

        out_n = smpl_forward(smpl_n, batch["betas"], gt_rotmat)
        out_m = smpl_forward(smpl_m, batch["betas"], gt_rotmat)
        out_f = smpl_forward(smpl_f, batch["betas"], gt_rotmat)
        # gender: -1 unknown -> NEUTRAL GT (datasets without a gender
        # field, dataset.py:159); 0 male, 1 female
        gender = batch["gender"].reshape(-1, 1, 1)
        gt_verts = jnp.where(
            gender == 1, out_f.vertices,
            jnp.where(gender == 0, out_m.vertices, out_n.vertices),
        )
        gt_joints24 = jnp.where(
            gender == 1, out_f.joints_lbs,
            jnp.where(gender == 0, out_m.joints_lbs, out_n.joints_lbs),
        )

        if j_regressor_eval is not None:
            from .metrics import joints_from_vertices

            pred_j14 = joints_from_vertices(j_regressor_eval, pred_verts)
            gt_j14 = joints_from_vertices(j_regressor_eval, gt_verts)
        else:
            # No-regressor fallback: 14 LSP-ordered joints from the SMPL
            # skeleton (the gendered GT meshes only provide skeleton
            # joints, so pred uses the same space via one extra LBS).
            # Hip-midpoint pelvis (positions 2/3 in LSP order), matching
            # train/step.py's fallback and keypoint_3d_loss.
            sel = jnp.asarray(SMPL_J24_TO_COMMON_J14)
            pred_out = smpl_forward(smpl_n, pred_shape_eval, pred_pose_eval)
            pred_j = pred_out.joints_lbs[:, sel]
            gt_j = gt_joints24[:, sel]
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
            metrics["var_pose"] = out["var_pose"]
            # Per-joint rotation-space distance — the x-vector of the
            # reference's calibration Pearson (eval_utils.py:154-160
            # calculate_distance_pose: elementwise rotmat MSE, mean over
            # the 3x3). ALWAYS the primary pass's pose, even under
            # flip_test: sigma was trained to scale the single-pass
            # residual, so pairing it with the TTA-averaged residual
            # would shift the calibration metric for reasons unrelated
            # to calibration (accuracy metrics above do use the TTA
            # prediction).
            metrics["pose_dist"] = jnp.mean(
                (out["pred_pose"] - gt_rotmat) ** 2, axis=(-1, -2)
            )
        return metrics

    return jax.jit(step)


@dataclasses.dataclass
class EvalResult:
    imgnames: list[str]
    mpjpe_mm: np.ndarray
    pa_mpjpe_mm: np.ndarray
    v2v_mm: np.ndarray
    uncert: np.ndarray | None = None
    pose_dist: np.ndarray | None = None  # (N, 24) per-joint rotmat MSE

    def summary(self) -> dict[str, float]:
        s = {
            "mpjpe": float(self.mpjpe_mm.mean()),
            "pa_mpjpe": float(self.pa_mpjpe_mm.mean()),
            "v2v": float(self.v2v_mm.mean()),
        }
        s["best_model_metric"] = best_model_metric(s["pa_mpjpe"], s["mpjpe"])
        if self.uncert is not None:
            per_sample_var = self.uncert.mean(axis=-1)
            # Per-SAMPLE mm-space correlation (stricter than the
            # reference's; kept for the mpjpe_var machinery below).
            s["uncert_mpjpe_corr"] = float(
                uncert_error_correlation(
                    jnp.asarray(per_sample_var), jnp.asarray(self.mpjpe_mm)
                )
            )
            if (
                self.pose_dist is not None
                and self.uncert.shape == self.pose_dist.shape
            ):
                # The reference's calibration Pearson (trainer.py:380-383
                # via save_results.accumulate_corr_vect): PER-JOINT
                # rotation distance vs PER-JOINT prepared sigma, both
                # flattened over (N, 24) — sigma_j is trained to scale
                # joint j's residual, so this is the direct measure.
                s["uncert_pose_corr"] = float(
                    uncert_error_correlation(
                        jnp.asarray(self.uncert.reshape(-1)),
                        jnp.asarray(self.pose_dist.reshape(-1)),
                    )
                )
            # Var-MPJPE (reference trainer.py:374-377): per-sample error
            # divided by predicted variance — low means accurate AND
            # confident. The reference logs it and resolves a
            # best_mpjpe_var checkpoint but never saves one
            # (train_utils.py:132-133 dangling); here the trainer tracks
            # and saves it.
            s["val_var"] = float(per_sample_var.mean())
            s["mpjpe_var"] = float(
                (self.mpjpe_mm / (per_sample_var + 1e-9)).mean()
            )
        return s

    def per_joint_stats(self) -> dict | None:
        """Across-joint calibration diagnostics for the eval report.

        Per joint: mean prepared sigma and mean rotation distance (the
        two vectors whose flattened Pearson is `uncert_pose_corr`), plus
        each vector's across-joint coefficient of variation (std/mean).
        The CoV of the residuals is the heterogeneity the per-joint
        correlation has to rank — when it collapses (every joint equally
        wrong), a falling Pearson reflects a vanishing signal, not a
        worse sigma head. Mirrors the per-joint quantities the reference
        tracks in POCOUtils (pocolib/utils/poco_utils.py:97-294), in the
        eval report instead of TensorBoard histograms.
        """
        if (
            self.uncert is None
            or self.pose_dist is None
            or self.uncert.shape != self.pose_dist.shape
        ):
            return None
        from ..constants import SMPL_JOINT_NAMES

        sig = self.uncert.mean(axis=0)
        err = self.pose_dist.mean(axis=0)
        names = list(SMPL_JOINT_NAMES[: sig.shape[0]])

        def _cov(v: np.ndarray) -> float:
            m = float(v.mean())
            return float(v.std() / m) if m > 0 else float("nan")

        return {
            "joint_names": names,
            "sigma_mean": [round(float(x), 5) for x in sig],
            "pose_dist_mean": [round(float(x), 6) for x in err],
            "sigma_cov": round(_cov(sig), 4),
            "pose_dist_cov": round(_cov(err), 4),
        }


def run_eval(
    model,
    variables: dict,
    dataset,
    smpl_neutral: SmplParams,
    smpl_male: SmplParams | None = None,
    smpl_female: SmplParams | None = None,
    batch_size: int = 32,
    mesh=None,
    loss_ver: str = "norm_flow_res_gaus",
    j_regressor_eval: jnp.ndarray | None = None,
    max_batches: int | None = None,
    flip_test: bool = False,
) -> EvalResult:
    """Evaluate a dataset, sharding each padded batch over the mesh."""
    from ..data.dataset import DataLoader

    smpl_male = smpl_male or smpl_neutral
    smpl_female = smpl_female or smpl_neutral
    mesh = mesh or make_mesh()
    step = make_gendered_eval_step(
        model, j_regressor_eval, flip_test=flip_test
    )

    loader = DataLoader(
        dataset, batch_size=batch_size, shuffle=False, drop_last=False
    )
    names: list[str] = []
    accum: dict[str, list[np.ndarray]] = {}
    n_dev = int(mesh.devices.size)

    # Multi-process: every process walks the full dataset (host data is
    # identical), each batch is sharded over the GLOBAL mesh, and the
    # per-sample metric fetch becomes a collective all-gather — the
    # reference instead disables result accumulation entirely for
    # NUM_GPUS>1 (save_results.py:47).
    from ..parallel import distributed as dist

    def fetch(v):
        return np.asarray(dist.allgather(v))

    for bi, host_batch in enumerate(loader):
        if max_batches is not None and bi >= max_batches:
            break
        n_valid = host_batch["pose"].shape[0]
        # Robust sample names: imgname list, else sample_index, else a
        # running counter; always exactly n_valid strings so `names`
        # stays aligned with the metric arrays.
        raw = host_batch.get("imgname")
        if raw is None:
            raw = host_batch.get("sample_index")
        if raw is None:
            raw = range(len(names), len(names) + n_valid)
        batch_names = [str(n) for n in list(raw)[:n_valid]]
        batch_names += [
            str(i) for i in range(len(names) + len(batch_names),
                                  len(names) + n_valid)
        ]
        names.extend(batch_names)
        dev_batch = {}
        for k, v in host_batch.items():
            if isinstance(v, list):
                continue
            padded, _ = pad_to_multiple(np.asarray(v), max(n_dev, 1))
            dev_batch[k] = padded
        if "img" in dev_batch:
            from ..ops.preprocess import normalize_image

            dev_batch["img"] = np.asarray(dev_batch["img"], np.float32)
        with mesh:
            sharded = shard_batch(
                {k: jnp.asarray(v) for k, v in dev_batch.items()}, mesh
            )
            if "img" in sharded:
                sharded["img"] = normalize_image(sharded["img"])
            m = step(variables, sharded, smpl_neutral, smpl_male, smpl_female)
        for k, v in m.items():
            accum.setdefault(k, []).append(fetch(v)[:n_valid])

    mpj = np.concatenate(accum["mpjpe"]) * 1000.0
    pa = np.concatenate(accum["pa_mpjpe"]) * 1000.0
    v2v = np.concatenate(accum["v2v"]) * 1000.0
    uncert = None
    if "var_pose" in accum:
        uncert = prepare_uncert(
            np.concatenate(accum["var_pose"]), loss_ver=loss_ver
        )
    pose_dist = (
        np.concatenate(accum["pose_dist"]) if "pose_dist" in accum else None
    )
    return EvalResult(
        imgnames=names, mpjpe_mm=mpj, pa_mpjpe_mm=pa, v2v_mm=v2v,
        uncert=uncert, pose_dist=pose_dist,
    )


def pw3d_split_report(
    imgnames: list[str],
    mpjpe_mm: np.ndarray,
    pa_mpjpe_mm: np.ndarray,
    v2v_mm: np.ndarray,
) -> dict[str, dict[str, float]]:
    """3DPW All / Test-sequences / Occluded-sequences error report.

    Reference: pocolib/utils/compute_error.py:29-85 — membership by
    sequence-name substring of each image path.
    """
    imgnames = [str(n) for n in imgnames]

    def subset(seqs):
        idx = [
            i for i, n in enumerate(imgnames) if any(s in n for s in seqs)
        ]
        return np.asarray(idx, np.int64)

    report = {
        "all": {
            "mpjpe": float(np.mean(mpjpe_mm)),
            "pa_mpjpe": float(np.mean(pa_mpjpe_mm)),
            "pve": float(np.mean(v2v_mm)),
        }
    }
    for name, seqs in (
        ("test_seq", PW3D_TEST_SEQUENCES),
        ("occluded_seq", PW3D_OCCLUDED_SEQUENCES),
    ):
        idx = subset(seqs)
        if len(idx):
            report[name] = {
                "mpjpe": float(np.mean(mpjpe_mm[idx])),
                "pa_mpjpe": float(np.mean(pa_mpjpe_mm[idx])),
                "pve": float(np.mean(v2v_mm[idx])),
            }
    return report
