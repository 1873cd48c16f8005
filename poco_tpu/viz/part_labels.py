"""GT part-label rendering for the part-segmentation loss.

Reference contract: pocolib/utils/image_utils.py:289-314
(generate_part_labels) — render the GT SMPL mesh with per-vertex body
part colors into a (B, H, W) label map used as supervision for PARE's
`pred_segm_mask`. The reference depends on the CUDA neural_renderer and
actually crashes as shipped (the `nr` import is missing,
trainer.py:125-131 / SURVEY §2.1); here the labels come from the same
painter's-algorithm rasterizer as the demo renderer, with parts derived
from the dominant skinning weight.

Labels: 0 = background, j+1 = SMPL joint j (matches the 25-channel
segmentation head: background + 24 parts).
"""

from __future__ import annotations

import numpy as np

from .renderer import vertex_part_ids


def render_part_labels(
    verts: np.ndarray,
    faces: np.ndarray,
    cam: np.ndarray,
    lbs_weights: np.ndarray,
    out_res: int = 56,
) -> np.ndarray:
    """Rasterize one mesh into a part-label map.

    Args:
        verts: (V, 3) SMPL vertices.
        faces: (F, 3) triangles.
        cam: (3,) [s, tx, ty] weak-perspective crop camera or (4,)
            [sx, sy, tx, ty].
        lbs_weights: (V, 24) skinning weights (parts = argmax).
        out_res: label-map resolution (56 matches the PARE heads' 1/4
            feature grid).
    Returns:
        (out_res, out_res) uint8 label map (0 = background).
    """
    import cv2

    cam = np.asarray(cam, np.float32).reshape(-1)
    if cam.shape[0] == 3:
        cam = np.array([cam[0], cam[0], cam[1], cam[2]], np.float32)
    sx, sy, tx, ty = cam

    x, y, z = verts[:, 0], -verts[:, 1], -verts[:, 2]
    u = (sx * (x + tx) + 1.0) * out_res / 2.0
    v = (sy * (y + ty) + 1.0) * out_res / 2.0
    uv = np.stack([u, v], axis=-1)

    parts = vertex_part_ids(lbs_weights)
    face_part = parts[faces[:, 0]].astype(np.uint8)  # part of first vertex
    tri_uv = uv[faces]
    tri_z = z[faces].mean(axis=-1)

    labels = np.zeros((out_res, out_res), np.uint8)
    order = np.argsort(tri_z)  # far first; near parts overwrite
    for fi in order:
        pts = np.round(tri_uv[fi]).astype(np.int32)
        if pts[:, 0].max() < 0 or pts[:, 0].min() >= out_res:
            continue
        if pts[:, 1].max() < 0 or pts[:, 1].min() >= out_res:
            continue
        cv2.fillPoly(labels, [pts], int(face_part[fi]) + 1)
    return labels


def generate_part_labels(
    verts_batch: np.ndarray,
    faces: np.ndarray,
    cams: np.ndarray,
    lbs_weights: np.ndarray,
    out_res: int = 56,
) -> np.ndarray:
    """Batch version: (B, V, 3) + (B, 3) cams -> (B, R, R) uint8 labels."""
    return np.stack(
        [
            render_part_labels(
                np.asarray(verts_batch[i]), faces, np.asarray(cams[i]),
                lbs_weights, out_res,
            )
            for i in range(len(verts_batch))
        ]
    )
