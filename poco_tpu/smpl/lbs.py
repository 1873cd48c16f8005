"""Batched linear blend skinning (LBS) for the SMPL body model, in JAX.

TPU-first design: every stage is a large batched matmul/einsum that XLA maps
onto the MXU —

  * shape blendshapes:  (B, 10)  @ (10, V*3)
  * pose-corrective blendshapes: (B, 207) @ (207, V*3)
  * joint regression:   (24, V)  @ (B, V, 3)
  * skinning:           (V, 24)  @ (B, 24, 16)

The 24-step kinematic chain is unrolled statically (compile-time constant
parent table), so the whole forward is a single fused XLA program with no
data-dependent control flow.

Semantics match the reference's SMPL path (smplx LBS as consumed by
pocolib/models/head/smpl_head.py:12-34) to numerical parity on identical
model weights.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# SMPL numerical parity (0.5 mm MPJPE budget, SURVEY.md §7.3) requires
# true-fp32 contractions: TPU matmuls default to bf16 passes otherwise.
_PRECISION = jax.lax.Precision.HIGHEST


@struct.dataclass
class SmplParams:
    """SMPL model weights as a pytree of device arrays.

    The kinematic parent table and vertex-keypoint indices are *static*
    (hashable tuples, not pytree leaves): `parents` drives the statically
    unrolled FK chain and must be concrete under jit.

    Shapes (V = num vertices, standard SMPL V = 6890):
        v_template:  (V, 3)    rest-pose template mesh
        shapedirs:   (V, 3, num_betas) shape blendshape basis
        posedirs:    (207, V*3)       pose-corrective blendshape basis
        j_regressor: (24, V)   rest-joint regressor
        lbs_weights: (V, 24)   skinning weights
        parents:     tuple[int] kinematic parent table (parents[0] == -1)
        j_regressor_extra: (E, V) extra-joint regressor (E=9 for the
            reference's 49-joint convention), applied to posed vertices
        vertex_joint_ids: tuple[int] vertex indices appended as keypoints
            (21 standard), applied to posed vertices
        faces: (F, 3) int32 triangle indices (host-side, rendering only)
    """

    v_template: jnp.ndarray
    shapedirs: jnp.ndarray
    posedirs: jnp.ndarray
    j_regressor: jnp.ndarray
    lbs_weights: jnp.ndarray
    j_regressor_extra: jnp.ndarray
    faces: jnp.ndarray
    parents: tuple = struct.field(pytree_node=False)
    vertex_joint_ids: tuple = struct.field(pytree_node=False)


class SmplOutput(NamedTuple):
    vertices: jnp.ndarray    # (B, V, 3)
    joints: jnp.ndarray      # (B, 54, 3): 24 LBS + 21 vertex + 9 extra
    joints_lbs: jnp.ndarray  # (B, 24, 3) posed skeleton joints


def blend_shapes(betas: jnp.ndarray, shapedirs: jnp.ndarray) -> jnp.ndarray:
    """(B, num_betas) x (V, 3, num_betas) -> (B, V, 3) shape offsets."""
    num_verts = shapedirs.shape[0]
    basis = shapedirs.reshape(num_verts * 3, -1)  # (V*3, nb)
    offsets = jnp.dot(betas, basis.T, precision=_PRECISION)
    return offsets.reshape(betas.shape[0], num_verts, 3)


def vertices2joints(j_regressor: jnp.ndarray, verts: jnp.ndarray) -> jnp.ndarray:
    """(J, V) x (B, V, 3) -> (B, J, 3)."""
    return jnp.einsum("jv,bvk->bjk", j_regressor, verts, precision=_PRECISION)


def batch_rigid_transform(
    rotmats: jnp.ndarray, joints: jnp.ndarray, parents
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward-kinematics chain.

    Args:
        rotmats: (B, J, 3, 3) per-joint local rotations.
        joints: (B, J, 3) rest-pose joint locations.
        parents: length-J static parent table (tuple/array of ints).
    Returns:
        posed_joints: (B, J, 3) world-frame joint positions.
        rel_transforms: (B, J, 4, 4) skinning transforms (world transform
            with the rest-pose joint location factored out).
    """
    batch = rotmats.shape[0]
    num_joints = joints.shape[1]
    parents = np.asarray(parents)

    rel_joints = joints - jnp.concatenate(
        [jnp.zeros_like(joints[:, :1]), joints[:, parents[1:]]], axis=1
    )

    # Local 4x4 transforms.
    tfm = jnp.zeros((batch, num_joints, 4, 4), dtype=rotmats.dtype)
    tfm = tfm.at[:, :, :3, :3].set(rotmats)
    tfm = tfm.at[:, :, :3, 3].set(rel_joints)
    tfm = tfm.at[:, :, 3, 3].set(1.0)

    # Statically unrolled chain (J is a compile-time constant, J=24).
    world = [tfm[:, 0]]
    for j in range(1, num_joints):
        world.append(world[parents[j]] @ tfm[:, j])
    world = jnp.stack(world, axis=1)  # (B, J, 4, 4)

    posed_joints = world[:, :, :3, 3]

    # Factor out the rest joint location: rel = W - [0 | W_rot @ j_rest].
    correction = jnp.einsum("bjxy,bjy->bjx", world[:, :, :3, :3], joints)
    rel = world.at[:, :, :3, 3].add(-correction)
    return posed_joints, rel


def lbs(
    betas: jnp.ndarray,
    pose_rotmats: jnp.ndarray,
    params: SmplParams,
    use_pallas: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full SMPL LBS forward.

    Args:
        betas: (B, num_betas) shape coefficients.
        pose_rotmats: (B, 24, 3, 3) per-joint rotations (root first).
        params: model weights.
    Returns:
        vertices: (B, V, 3), joints_lbs: (B, 24, 3).
    """
    batch = betas.shape[0]
    num_verts = params.v_template.shape[0]
    dtype = params.v_template.dtype
    betas = betas.astype(dtype)
    pose_rotmats = pose_rotmats.astype(dtype)

    # 1. Shape blendshapes.
    v_shaped = params.v_template[None] + blend_shapes(betas, params.shapedirs)

    # 2. Rest joints.
    j_rest = vertices2joints(params.j_regressor, v_shaped)

    # 3. Pose-corrective blendshapes (identity-relative, body joints only).
    ident = jnp.eye(3, dtype=dtype)
    pose_feature = (pose_rotmats[:, 1:] - ident).reshape(batch, -1)  # (B, 207)
    pose_offsets = jnp.dot(
        pose_feature, params.posedirs, precision=_PRECISION
    ).reshape(batch, num_verts, 3)
    v_posed = v_shaped + pose_offsets

    # 4. Forward kinematics.
    joints_posed, rel_tfms = batch_rigid_transform(
        pose_rotmats, j_rest, params.parents
    )

    # 5. Skinning: per-vertex blended transform. The Pallas path fuses
    # the blend and the transform so the (B, V, 16) per-vertex transform
    # tensor never hits HBM (ops/pallas_lbs.py); the XLA path is the
    # plain einsum formulation.
    if use_pallas:
        from ..ops.pallas_lbs import skinning_pallas

        verts = skinning_pallas(params.lbs_weights, rel_tfms, v_posed)
    else:
        tfm_flat = rel_tfms.reshape(batch, rel_tfms.shape[1], 16)
        vert_tfms = jnp.einsum(
            "vj,bjk->bvk", params.lbs_weights, tfm_flat,
            precision=_PRECISION,
        )
        vert_tfms = vert_tfms.reshape(batch, num_verts, 4, 4)
        verts = (
            jnp.einsum("bvxy,bvy->bvx", vert_tfms[:, :, :3, :3], v_posed)
            + vert_tfms[:, :, :3, 3]
        )
    return verts, joints_posed


def smpl_forward(
    params: SmplParams,
    betas: jnp.ndarray,
    pose_rotmats: jnp.ndarray,
    use_pallas: bool | None = None,
) -> SmplOutput:
    """SMPL forward producing the 54-joint superset.

    Joint layout (reference contract, pocolib/models/head/smpl_head.py:22-34):
        [0:24)   LBS skeleton joints
        [24:45)  vertex-selected keypoints (face/feet/hand tips)
        [45:54)  extra regressed joints (J_regressor_extra)
    """
    if use_pallas is None:
        import os

        use_pallas = bool(os.environ.get("POCO_TPU_PALLAS_LBS"))
    verts, joints_lbs = lbs(betas, pose_rotmats, params, use_pallas=use_pallas)
    vertex_joints = verts[:, np.asarray(params.vertex_joint_ids)]
    extra_joints = vertices2joints(params.j_regressor_extra, verts)
    joints = jnp.concatenate([joints_lbs, vertex_joints, extra_joints], axis=1)
    return SmplOutput(vertices=verts, joints=joints, joints_lbs=joints_lbs)
