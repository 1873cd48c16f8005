"""Part-segmentation and silhouette losses (optional training signals).

Reference contracts: pocolib/losses/segmentation.py:12-27 (cross-entropy
over the PARE part-segmentation logits) and losses.py:556-563
(neg_iou_loss for the differentiable-render silhouette loss). Both are
off in every shipped config; they plug into poco_loss via the
`pred_segm_mask` / `gt_segm_mask` and `pred_smpl_render` /
`gt_smpl_render` keys.
"""

from __future__ import annotations

import jax.numpy as jnp


def part_segmentation_loss(
    pred_logits: jnp.ndarray,
    gt_labels: jnp.ndarray,
    valid_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Pixel-wise cross-entropy over J+1 part classes.

    Args:
        pred_logits: (B, C, H, W) segmentation logits (class 0 =
            background), the PARE head's `pred_segm_mask` layout.
        gt_labels: (B, H, W) int labels in [0, C).
        valid_mask: optional (B,) sample validity weights (has_smpl).
    """
    logz = jnp.log(
        jnp.sum(jnp.exp(pred_logits - pred_logits.max(axis=1, keepdims=True)),
                axis=1)
    ) + pred_logits.max(axis=1, keepdims=True)[:, 0]
    gathered = jnp.take_along_axis(
        pred_logits, gt_labels[:, None].astype(jnp.int32), axis=1
    )[:, 0]
    ce = logz - gathered                                    # (B, H, W)
    per_sample = ce.mean(axis=(1, 2))
    if valid_mask is not None:
        w = valid_mask.astype(per_sample.dtype)
        return (per_sample * w).sum() / jnp.maximum(w.sum(), 1.0)
    return per_sample.mean()


def neg_iou_loss(predict: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 - soft-IoU between silhouettes (reference losses.py:556-563).

    Args:
        predict, target: (B, ...) soft masks in [0, 1].
    """
    dims = tuple(range(1, predict.ndim))
    intersect = (predict * target).sum(dims) + 1e-6
    union = (predict + target - predict * target).sum(dims) + 1e-6
    return 1.0 - (intersect / union).mean()
