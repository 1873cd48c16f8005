"""Evaluation metrics: MPJPE, PA-MPJPE (batched Procrustes), PVE.

TPU-first redesign: the reference computes Procrustes alignment with a
per-sample numpy SVD loop on the host (pocolib/utils/eval_utils.py:11-118);
here the whole batch runs one `jnp.linalg.svd` on device and shards over
chips with the batch axis, so the full 3DPW test set evaluates in one
sharded XLA program.

All metrics are returned per-sample (in the input length units; multiply
by 1000 for mm) so split-wise re-aggregation (compute_error-style 3DPW
All/Test/Occluded reports) stays exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# TPU default matmul precision is bf16; metrics feed the 0.5 mm parity
# budget (measured: exact-fit PA-MPJPE 2.4-7.1 mm at default vs 2e-7 m
# at HIGHEST), so every contraction here runs at full fp32.
_HI = jax.lax.Precision.HIGHEST

from ..constants import H36M_TO_J14


def mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean per-joint position error, per sample.

    Args:
        pred, gt: (B, J, 3) joints, already pelvis-aligned if desired.
    Returns:
        (B,) mean euclidean error.
    Reference contract: eval_utils.py:99-107 (mpjpe_error).
    """
    return jnp.linalg.norm(pred - gt, axis=-1).mean(axis=-1)


def vertex_error(pred_verts: jnp.ndarray, gt_verts: jnp.ndarray) -> jnp.ndarray:
    """Per-vertex error (PVE / V2V), per sample (reference eval_utils.py:109-118)."""
    return jnp.linalg.norm(pred_verts - gt_verts, axis=-1).mean(axis=-1)


def procrustes_align(
    pred: jnp.ndarray, gt: jnp.ndarray
) -> jnp.ndarray:
    """Batched similarity (Procrustes) alignment of pred onto gt.

    Solves scale s, rotation R, translation t minimizing
    ||s * pred @ R^T + t - gt||^2 for every sample at once (one batched
    SVD on device). Equivalent to the reference's per-sample
    compute_similarity_transform (eval_utils.py:11-82).

    Args:
        pred, gt: (B, N, 3).
    Returns:
        (B, N, 3) aligned prediction.
    """
    mu_p = pred.mean(axis=1, keepdims=True)
    mu_g = gt.mean(axis=1, keepdims=True)
    xp = pred - mu_p
    xg = gt - mu_g

    var_p = jnp.sum(xp**2, axis=(1, 2))                     # (B,)
    k = jnp.einsum("bni,bnj->bij", xp, xg, precision=_HI)   # (B, 3, 3)
    u, s, vh = jnp.linalg.svd(k)

    # Reflection guard: flip the smallest singular vector if det < 0.
    det = jnp.linalg.det(jnp.einsum("bij,bjk->bik", u, vh, precision=_HI))
    d = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), jnp.sign(det)], axis=-1
    )
    rot = jnp.einsum("bji,bj,bkj->bik", vh, d, u, precision=_HI)  # V diag(d) U^T
    scale = jnp.sum(s * d, axis=-1) / jnp.maximum(var_p, 1e-12)

    aligned = (
        scale[:, None, None]
        * jnp.einsum("bij,bnj->bni", rot, xp, precision=_HI)
        + mu_g
    )
    return aligned


def pa_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Procrustes-aligned MPJPE, per sample (reference eval_utils.py:84-97)."""
    return mpjpe(procrustes_align(pred, gt), gt)


def joints_from_vertices(
    j_regressor: jnp.ndarray, vertices: jnp.ndarray
) -> jnp.ndarray:
    """H36M 17-joint regression from mesh then J14 selection, pelvis-centered.

    Reference contract: eval_utils.py:62-75 (get_jnts_from_mesh) as used by
    the validation loop (trainer.py:314-325): regress 17 H36M joints from
    the mesh, center on the pelvis (H36M joint 0), keep the 14 LSP joints.

    Args:
        j_regressor: (17, V) H36M regressor.
        vertices: (B, V, 3).
    Returns:
        (B, 14, 3) pelvis-centered joints.
    """
    j17 = jnp.einsum("jv,bvk->bjk", j_regressor, vertices, precision=_HI)
    pelvis = j17[:, 0:1]
    j14 = j17[:, jnp.asarray(H36M_TO_J14)]
    return j14 - pelvis


def uncert_error_correlation(
    uncert: jnp.ndarray, err: jnp.ndarray
) -> jnp.ndarray:
    """Pearson correlation between predicted uncertainty and actual error.

    The reference tracks this every epoch as the confidence sanity metric
    (eval_utils.py:162-165, trainer.py:380-383).
    """
    u = uncert - uncert.mean()
    e = err - err.mean()
    denom = jnp.sqrt(jnp.sum(u**2) * jnp.sum(e**2)) + 1e-12
    return jnp.sum(u * e) / denom
