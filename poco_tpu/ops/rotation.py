"""Batched rotation representation conversions in JAX.

All functions accept arbitrary leading batch dimensions, are jit/vmap/grad
friendly (branchless: `jnp.where` instead of boolean indexing), and run in
float32. Conventions match the reference framework so converted checkpoints
produce identical rotations (reference: pocolib/utils/geometry.py:207-445).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) -> rotation matrix.

    Args:
        quat: (..., 4), not necessarily normalized.
    Returns:
        (..., 3, 3) rotation matrices.
    Reference contract: pocolib/utils/geometry.py:224-244.
    """
    norm = jnp.linalg.norm(quat, axis=-1, keepdims=True)
    q = quat / jnp.maximum(norm, _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=-1,
    )
    return rot.reshape(quat.shape[:-1] + (3, 3))


def axis_angle_to_quat(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> quaternion (..., 4) with real part first.

    Uses the 2nd-order Taylor expansion of sin(x/2)/x near zero so the
    function is smooth and differentiable at the identity
    (reference contract: pocolib/utils/geometry.py:37-67).
    """
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    half = 0.5 * angle
    small = jnp.abs(angle) < 1e-6
    safe_angle = jnp.where(small, 1.0, angle)
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angle * angle) / 48.0, jnp.sin(half) / safe_angle
    )
    return jnp.concatenate([jnp.cos(half), aa * sin_half_over_angle], axis=-1)


def quat_to_axis_angle(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) -> axis-angle (..., 3).

    Reference contract: pocolib/utils/geometry.py:69-98.
    """
    norm = jnp.linalg.norm(quat[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(norm, quat[..., :1])
    angle = 2.0 * half
    small = jnp.abs(angle) < 1e-6
    safe_angle = jnp.where(small, 1.0, angle)
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angle * angle) / 48.0, jnp.sin(half) / safe_angle
    )
    return quat[..., 1:] / sin_half_over_angle


def axis_angle_to_rotmat(aa: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula via the quaternion route.

    Matches the reference's `batch_rodrigues` (which normalizes
    `theta + 1e-8`) to float tolerance (pocolib/utils/geometry.py:207-221).

    Args:
        aa: (..., 3) axis-angle rotations.
    Returns:
        (..., 3, 3) rotation matrices.
    """
    return quat_to_rotmat(axis_angle_to_quat(aa))


def rotmat_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), w >= 0.

    Branchless Shepperd-style selection of the numerically largest of the
    four candidate decompositions (reference contract:
    pocolib/utils/geometry.py:101-127 / 349-429).
    """
    m = rot
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidate 4*q_i^2 traces.
    t_w = 1.0 + m00 + m11 + m22
    t_x = 1.0 + m00 - m11 - m22
    t_y = 1.0 - m00 + m11 - m22
    t_z = 1.0 - m00 - m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # Quaternion from each branch, scaled by 0.5/sqrt(t).
    q_w = jnp.stack([t_w, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    q_x = jnp.stack([m21 - m12, t_x, m01 + m10, m02 + m20], axis=-1)
    q_y = jnp.stack([m02 - m20, m01 + m10, t_y, m12 + m21], axis=-1)
    q_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, t_z], axis=-1)

    traces = jnp.stack([t_w, t_x, t_y, t_z], axis=-1)
    best = jnp.argmax(traces, axis=-1)
    cands = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    t_best = jnp.take_along_axis(traces, best[..., None], axis=-1)
    q = q * (0.5 / _safe_sqrt(t_best))
    # Canonicalize sign: w >= 0.
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def rotmat_to_axis_angle(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3)."""
    return quat_to_axis_angle(rotmat_to_quat(rot))


def rot6d_to_rotmat(x: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation -> rotation matrix (Zhou et al. 2019).

    The 6 values are interpreted as a (3, 2) column pair — element order
    [a1_0, a2_0, a1_1, a2_1, a1_2, a2_2] — and Gram-Schmidt produces the
    first two *columns* of the matrix, exactly matching the reference
    (pocolib/utils/geometry.py:247-261) so converted head weights decode
    identical rotations.

    Args:
        x: (..., 6) or any shape with trailing size divisible by 6;
           reshaped to (-1, 3, 2) internally.
    Returns:
        (N, 3, 3) rotation matrices where N = x.size // 6.
    """
    m = x.reshape(-1, 3, 2)
    a1, a2 = m[..., 0], m[..., 1]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), _EPS)
    a2_proj = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2_proj / jnp.maximum(
        jnp.linalg.norm(a2_proj, axis=-1, keepdims=True), _EPS
    )
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> 6D representation (..., 6).

    Inverse layout of :func:`rot6d_to_rotmat`: the first two columns,
    flattened row-major so that ``rot6d_to_rotmat(rotmat_to_rot6d(R)) == R``.
    (The reference's `matrix_to_rotation_6d` drops the last *row* instead —
    pocolib/utils/geometry.py:431-445 — which is the inverse of a row-based
    decoder; we keep the pair self-consistent with the column-based decoder
    that all reference heads actually use.)
    """
    return rot[..., :, :2].reshape(rot.shape[:-2] + (6,))


def flip_pose_rotmat(rot: jnp.ndarray) -> jnp.ndarray:
    """Horizontal-flip rule for an SMPL pose in rotmat form (B, 24, 3, 3).

    The rotmat form of the reference's axis-angle flip (swap left/right
    joints, negate the y/z components; pocolib/core/constants.py:104-114,
    applied in base_dataset.pose_processing): conjugation by
    S = diag(1, -1, -1) — a rotation by pi about x, so the result stays
    in SO(3) exactly — under the SMPL left/right joint permutation.
    An involution: flip(flip(R)) == R.
    """
    import jax

    from ..constants import SMPL_JOINTS_FLIP_PERM

    s = jnp.diag(jnp.asarray([1.0, -1.0, -1.0], rot.dtype))
    perm = jnp.asarray(SMPL_JOINTS_FLIP_PERM)
    return jnp.einsum(
        "ij,bnjk,kl->bnil", s, rot[:, perm], s,
        precision=jax.lax.Precision.HIGHEST,
    )


def average_rotmats(ra: jnp.ndarray, rb: jnp.ndarray) -> jnp.ndarray:
    """Chordal mean of two rotation batches (..., 3, 3) -> SO(3).

    Arithmetic mean projected back to SO(3) by batched SVD with the
    usual det sign fix — the Frobenius-nearest rotation to the mean,
    i.e. the chordal L2 rotation average. average(R, R) == R.
    """
    import jax

    hi = jax.lax.Precision.HIGHEST
    m = 0.5 * (ra + rb)
    u, _, vh = jnp.linalg.svd(m)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", u, vh, precision=hi))
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    return jnp.einsum("...ij,...j,...jk->...ik", u, d, vh, precision=hi)
