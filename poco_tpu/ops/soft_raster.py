"""Differentiable soft rasterization of SMPL meshes (JAX, TPU-friendly).

The reference's render and part-segmentation training losses depend on
the CUDA neural_renderer, whose import is missing so the losses crash as
shipped (trainer.py:125-131, SURVEY §2.1). This module provides a
TPU-native differentiable alternative: vertex point-splatting with
Gaussian kernels, which reduces to one big (pixels x vertices) distance
matrix per sample — exactly the dense, batched arithmetic TPUs like —
and is smooth in the vertex positions, so silhouette-IoU and part-CE
losses backpropagate to pose/shape.

Outputs:
  * soft_silhouette:   (B, R, R) coverage in [0, 1] — feed to
    losses.segmentation.neg_iou_loss as pred/gt_smpl_render;
  * soft_part_probs:   (B, R, R, 25) background+24-part probabilities —
    differentiable counterpart of the GT labels from
    viz.part_labels.render_part_labels.
"""

from __future__ import annotations

import jax.numpy as jnp



def project_weak_perspective(
    verts: jnp.ndarray, cam: jnp.ndarray, out_res: int
) -> jnp.ndarray:
    """(B, V, 3) + (B, 3) [s, tx, ty] -> (B, V, 2) pixel coords
    (same convention as the host renderer, viz/renderer.py)."""
    s, tx, ty = cam[:, 0:1], cam[:, 1:2], cam[:, 2:3]
    x = verts[..., 0]
    y = -verts[..., 1]
    u = (s * (x + tx) + 1.0) * out_res / 2.0
    v = (s * (y + ty) + 1.0) * out_res / 2.0
    return jnp.stack([u, v], axis=-1)


def _pixel_grid(out_res: int) -> jnp.ndarray:
    r = jnp.arange(out_res, dtype=jnp.float32) + 0.5
    gx = jnp.broadcast_to(r[None, :], (out_res, out_res))
    gy = jnp.broadcast_to(r[:, None], (out_res, out_res))
    return jnp.stack([gx, gy], axis=-1).reshape(-1, 2)  # (P, 2)


def soft_silhouette(
    verts: jnp.ndarray,
    cam: jnp.ndarray,
    out_res: int = 56,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Differentiable silhouette via Gaussian vertex splats.

    Args:
        verts: (B, V, 3) mesh vertices.
        cam: (B, 3) weak-perspective crop camera.
        sigma: splat radius in pixels.
    Returns:
        (B, R, R) soft coverage in [0, 1].
    """
    uv = project_weak_perspective(verts, cam, out_res)     # (B, V, 2)
    pix = _pixel_grid(out_res)                             # (P, 2)
    # Squared distances via the (|p|^2 - 2 p.v + |v|^2) expansion: the
    # cross term is a (P, 2) x (B, 2, V) matmul -> MXU.
    cross = jnp.einsum("pk,bvk->bpv", pix, uv)
    d2 = (
        jnp.sum(pix**2, axis=-1)[None, :, None]
        - 2.0 * cross
        + jnp.sum(uv**2, axis=-1)[:, None, :]
    )
    # Coverage = 1 - prod(1 - splat) ~= 1 - exp(-sum splat); use the
    # numerically-stable log-sum formulation.
    splat_sum = jnp.sum(jnp.exp(-d2 / (2.0 * sigma**2)), axis=-1)
    cover = 1.0 - jnp.exp(-splat_sum)
    return cover.reshape(verts.shape[0], out_res, out_res)


def soft_part_probs(
    verts: jnp.ndarray,
    cam: jnp.ndarray,
    vertex_parts_onehot: jnp.ndarray,
    out_res: int = 56,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Differentiable part-probability maps.

    Args:
        verts: (B, V, 3).
        cam: (B, 3).
        vertex_parts_onehot: (V, 24) one-hot (or soft) part assignment —
            e.g. the SMPL skinning weights themselves.
    Returns:
        (B, R, R, 25) probabilities, channel 0 = background.
    """
    uv = project_weak_perspective(verts, cam, out_res)
    pix = _pixel_grid(out_res)
    cross = jnp.einsum("pk,bvk->bpv", pix, uv)
    d2 = (
        jnp.sum(pix**2, axis=-1)[None, :, None]
        - 2.0 * cross
        + jnp.sum(uv**2, axis=-1)[:, None, :]
    )
    w = jnp.exp(-d2 / (2.0 * sigma**2))                    # (B, P, V)
    part_mass = jnp.einsum("bpv,vj->bpj", w, vertex_parts_onehot)
    total = part_mass.sum(-1, keepdims=True)
    bg = jnp.exp(-total)                                   # background weight
    probs = jnp.concatenate(
        [bg, (1.0 - bg) * part_mass / jnp.maximum(total, 1e-9)], axis=-1
    )
    batch = verts.shape[0]
    return probs.reshape(batch, out_res, out_res, -1)


def render_losses(
    pred_verts: jnp.ndarray,
    gt_verts: jnp.ndarray,
    cam: jnp.ndarray,
    out_res: int = 56,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Silhouette IoU render loss between predicted and GT meshes.

    Drop-in producer for the reference's SMPL render loss
    (losses.py:328-332 + neg_iou_loss:556-563), fully on device and
    differentiable in the predicted vertices.
    """
    from ..losses.segmentation import neg_iou_loss

    pred_sil = soft_silhouette(pred_verts, cam, out_res, sigma)
    gt_sil = soft_silhouette(gt_verts, cam, out_res, sigma)
    return neg_iou_loss(pred_sil, gt_sil)
