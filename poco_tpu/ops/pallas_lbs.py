"""Pallas TPU kernel: fused SMPL skinning (blend + transform).

The skinning stage of LBS computes per-vertex blended transforms and
applies them:

    T[b, v] = sum_j W[v, j] * A[b, j]        # (V, 24) @ (B, 24, 4, 4)
    out[b, v] = T[b, v, :3, :3] @ v_posed[b, v] + T[b, v, :3, 3]

The XLA einsum path materializes T — (B, V, 16) floats — in HBM
(~3.5 MB/sample at V=6890), read back immediately by the transform. This
kernel tiles vertices, computes the (Vt, 24) @ (24, 16) blend on the MXU
into VMEM scratch, and applies the transform in-register, so T never
touches HBM: the only HBM traffic is W, A, v_posed in and vertices out
(~19 bytes/vertex instead of ~90).

Used by `poco_tpu.smpl.lbs.lbs(..., use_pallas=True)`; interpret=True
runs the same kernel on CPU for tests.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def _skin_kernel(w_ref, tfm_ref, vp_ref, out_ref):
    """One program = (batch b, vertex tile).

    w_ref:   (Vt, 24)  skinning weight tile
    tfm_ref: (1, 24, 16) flattened relative transforms for sample b
    vp_ref:  (1, Vt, 3) posed vertices tile
    out_ref: (1, Vt, 3) output tile
    """
    w = w_ref[...]
    tfm = tfm_ref[0]
    vp = vp_ref[0]

    # Blend transforms on the MXU: (Vt, 24) @ (24, 16) -> (Vt, 16).
    t = jnp.dot(
        w, tfm, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    # Apply the affine transform per vertex (VPU, fused):
    # row-major 4x4 layout -> rotation entries t[:, 4i+j], translation
    # t[:, 4i+3].
    x, y, z = vp[:, 0], vp[:, 1], vp[:, 2]
    ox = t[:, 0] * x + t[:, 1] * y + t[:, 2] * z + t[:, 3]
    oy = t[:, 4] * x + t[:, 5] * y + t[:, 6] * z + t[:, 7]
    oz = t[:, 8] * x + t[:, 9] * y + t[:, 10] * z + t[:, 11]
    out_ref[0] = jnp.stack([ox, oy, oz], axis=-1)


def skinning_pallas(
    lbs_weights: jnp.ndarray,
    rel_tfms: jnp.ndarray,
    v_posed: jnp.ndarray,
    vertex_tile: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused skinning.

    Args:
        lbs_weights: (V, J) skinning weights.
        rel_tfms: (B, J, 4, 4) relative joint transforms.
        v_posed: (B, V, 3) posed (pre-skinning) vertices.
    Returns:
        (B, V, 3) skinned vertices.
    """
    from jax.experimental import pallas as pl

    batch, num_joints = rel_tfms.shape[:2]
    num_verts = lbs_weights.shape[0]

    # Pad vertices to a tile multiple (static).
    vt = min(vertex_tile, num_verts)
    pad = (-num_verts) % vt
    if pad:
        lbs_weights = jnp.pad(lbs_weights, ((0, pad), (0, 0)))
        v_posed = jnp.pad(v_posed, ((0, 0), (0, pad), (0, 0)))
    vp_total = num_verts + pad
    n_tiles = vp_total // vt

    tfm_flat = rel_tfms.reshape(batch, num_joints, 16)

    out = pl.pallas_call(
        _skin_kernel,
        out_shape=jax.ShapeDtypeStruct((batch, vp_total, 3), jnp.float32),
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec((vt, num_joints), lambda b, v: (v, 0)),
            pl.BlockSpec((1, num_joints, 16), lambda b, v: (b, 0, 0)),
            pl.BlockSpec((1, vt, 3), lambda b, v: (b, v, 0)),
        ],
        out_specs=pl.BlockSpec((1, vt, 3), lambda b, v: (b, v, 0)),
        interpret=interpret,
    )(
        lbs_weights.astype(jnp.float32),
        tfm_flat.astype(jnp.float32),
        v_posed.astype(jnp.float32),
    )
    return out[:, :num_verts]
