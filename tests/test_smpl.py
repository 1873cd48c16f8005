"""SMPL LBS tests against an independent per-sample numpy implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from poco_tpu.constants import JOINT_MAP_49, SMPL_PARENTS
from poco_tpu.ops.rotation import axis_angle_to_rotmat
from poco_tpu.smpl.assets import synthetic_smpl_model
from poco_tpu.smpl.lbs import smpl_forward
from poco_tpu.smpl.model import smpl_49, smpl_head, smplcam_head


def numpy_lbs_single(params, betas, rotmats):
    """Straightforward scalar-loop LBS for one sample (test oracle)."""
    v_template = np.asarray(params.v_template)
    shapedirs = np.asarray(params.shapedirs)
    posedirs = np.asarray(params.posedirs)
    j_reg = np.asarray(params.j_regressor)
    weights = np.asarray(params.lbs_weights)
    parents = params.parents

    v_shaped = v_template + shapedirs @ betas
    j_rest = j_reg @ v_shaped

    pose_feature = (rotmats[1:] - np.eye(3)).reshape(-1)
    v_posed = v_shaped + (pose_feature @ posedirs).reshape(-1, 3)

    num_joints = rotmats.shape[0]
    world = [None] * num_joints
    for j in range(num_joints):
        local = np.eye(4, dtype=np.float64)
        local[:3, :3] = rotmats[j]
        if j == 0:
            local[:3, 3] = j_rest[j]
            world[j] = local
        else:
            local[:3, 3] = j_rest[j] - j_rest[parents[j]]
            world[j] = world[parents[j]] @ local

    posed_joints = np.stack([w[:3, 3] for w in world])

    rel = []
    for j in range(num_joints):
        a = world[j].copy()
        a[:3, 3] -= a[:3, :3] @ j_rest[j]
        rel.append(a)
    rel = np.stack(rel)

    verts = np.zeros_like(v_posed)
    for v in range(v_posed.shape[0]):
        t = np.einsum("j,jxy->xy", weights[v], rel)
        verts[v] = t[:3, :3] @ v_posed[v] + t[:3, 3]
    return verts, posed_joints


class TestLbs:
    def test_matches_numpy_oracle(self):
        params = synthetic_smpl_model(num_verts=96, seed=0)
        rng = np.random.RandomState(1)
        betas = rng.randn(3, 10).astype(np.float32)
        aa = (0.4 * rng.randn(3, 24, 3)).astype(np.float32)
        rotmats = np.asarray(
            axis_angle_to_rotmat(jnp.asarray(aa).reshape(-1, 3))
        ).reshape(3, 24, 3, 3)

        out = smpl_forward(params, jnp.asarray(betas), jnp.asarray(rotmats))
        for i in range(3):
            ref_v, ref_j = numpy_lbs_single(params, betas[i], rotmats[i])
            np.testing.assert_allclose(
                np.asarray(out.vertices[i]), ref_v, atol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(out.joints_lbs[i]), ref_j, atol=1e-4
            )

    def test_identity_pose_zero_betas_is_template(self):
        params = synthetic_smpl_model(num_verts=64, seed=2)
        eye = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        out = smpl_forward(params, jnp.zeros((1, 10)), eye)
        np.testing.assert_allclose(
            np.asarray(out.vertices[0]), np.asarray(params.v_template), atol=1e-5
        )

    def test_global_rotation_rotates_everything(self):
        params = synthetic_smpl_model(num_verts=64, seed=3)
        eye = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        base = smpl_forward(params, jnp.zeros((1, 10)), eye)

        rot_z = np.asarray(
            axis_angle_to_rotmat(jnp.asarray([[0.0, 0.0, np.pi / 2]]))
        )[0]
        rm = np.broadcast_to(np.eye(3), (1, 24, 3, 3)).copy()
        rm[0, 0] = rot_z
        rotated = smpl_forward(params, jnp.zeros((1, 10)), jnp.asarray(rm))

        root = np.asarray(base.joints_lbs[0, 0])
        expect = (np.asarray(base.vertices[0]) - root) @ rot_z.T + root
        np.testing.assert_allclose(
            np.asarray(rotated.vertices[0]), expect, atol=1e-4
        )

    def test_joint_layout_54(self):
        params = synthetic_smpl_model(num_verts=64, seed=4)
        eye = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        out = smpl_forward(params, jnp.zeros((2, 10)), eye)
        assert out.joints.shape == (2, 54, 3)
        # Vertex-selected keypoints are actual mesh vertices.
        np.testing.assert_allclose(
            np.asarray(out.joints[:, 24:45]),
            np.asarray(out.vertices[:, np.asarray(params.vertex_joint_ids)]),
            atol=1e-6,
        )

    def test_jit_and_grad(self):
        params = synthetic_smpl_model(num_verts=64, seed=5)

        @jax.jit
        def loss(betas, rotmats):
            out = smpl_forward(params, betas, rotmats)
            return jnp.sum(out.vertices**2)

        rng = np.random.RandomState(6)
        betas = jnp.asarray(rng.randn(2, 10), jnp.float32)
        rotmats = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        g = jax.grad(loss)(betas, rotmats)
        assert np.all(np.isfinite(np.asarray(g)))


class TestSmpl49:
    def test_joint_map_gather(self):
        params = synthetic_smpl_model(num_verts=64, seed=7)
        eye = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        verts, j49 = smpl_49(params, jnp.zeros((1, 10)), eye)
        assert j49.shape == (1, 49, 3)
        full = smpl_forward(params, jnp.zeros((1, 10)), eye)
        np.testing.assert_allclose(
            np.asarray(j49), np.asarray(full.joints[:, JOINT_MAP_49]), atol=1e-6
        )

    def test_parents_table(self):
        assert SMPL_PARENTS[0] == -1
        assert len(SMPL_PARENTS) == 24
        # every child has a parent with smaller index (topological order)
        assert all(SMPL_PARENTS[j] < j for j in range(1, 24))


class TestSmplHeads:
    def test_weak_perspective_head(self):
        params = synthetic_smpl_model(num_verts=64, seed=8)
        rotmat = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        cam = jnp.asarray([[1.0, 0.0, 0.0], [0.8, 0.1, -0.1]])
        out = smpl_head(params, rotmat, jnp.zeros((2, 10)), cam)
        assert out.joints2d.shape == (2, 49, 2)
        assert out.cam_t.shape == (2, 3)
        assert np.all(np.isfinite(np.asarray(out.joints2d)))

    def test_normalized_joints2d(self):
        params = synthetic_smpl_model(num_verts=64, seed=8)
        rotmat = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        cam = jnp.asarray([[1.0, 0.0, 0.0]])
        a = smpl_head(params, rotmat, jnp.zeros((1, 10)), cam)
        b = smpl_head(
            params, rotmat, jnp.zeros((1, 10)), cam, normalize_joints2d=True
        )
        np.testing.assert_allclose(
            np.asarray(b.joints2d), np.asarray(a.joints2d) / 112.0, atol=1e-5
        )

    def test_cliff_head_fullimg_projection(self):
        params = synthetic_smpl_model(num_verts=64, seed=9)
        b = 2
        rotmat = jnp.broadcast_to(jnp.eye(3), (b, 24, 3, 3))
        out = smplcam_head(
            params,
            rotmat,
            jnp.zeros((b, 10)),
            cam=jnp.asarray([[1.0, 0.0, 0.0]] * b),
            focal_length=jnp.asarray([1118.0] * b),
            bbox_scale=jnp.asarray([1.2] * b),
            bbox_center=jnp.asarray([[500.0, 400.0]] * b),
            img_w=jnp.asarray([1000.0] * b),
            img_h=jnp.asarray([800.0] * b),
        )
        assert out.fullimg_cam_t is not None
        assert out.joints2d.shape == (b, 49, 2)
        assert np.all(np.isfinite(np.asarray(out.joints2d)))
        # Depth from the CLIFF formula: 2f / (r * res * s), r = 240/224.
        np.testing.assert_allclose(
            np.asarray(out.fullimg_cam_t[:, 2]),
            2 * 1118.0 / (1.2 * 200.0 / 224.0 * 224.0 * 1.0),
            rtol=1e-5,
        )


class TestPallasSkinning:
    def test_matches_einsum_path(self):
        """Interpret-mode Pallas skinning == XLA einsum skinning."""
        from poco_tpu.ops.pallas_lbs import skinning_pallas

        rng = np.random.RandomState(0)
        B, V, J = 2, 100, 24
        w = rng.rand(V, J).astype(np.float32)
        w /= w.sum(1, keepdims=True)
        tfms = np.broadcast_to(np.eye(4, dtype=np.float32), (B, J, 4, 4)).copy()
        tfms[:, :, :3, 3] = 0.1 * rng.randn(B, J, 3)
        aa = 0.3 * rng.randn(B * J, 3).astype(np.float32)
        tfms[:, :, :3, :3] = np.asarray(
            axis_angle_to_rotmat(jnp.asarray(aa))
        ).reshape(B, J, 3, 3)
        vp = rng.randn(B, V, 3).astype(np.float32)

        ref_flat = tfms.reshape(B, J, 16)
        vt = np.einsum("vj,bjk->bvk", w, ref_flat).reshape(B, V, 4, 4)
        ref = (
            np.einsum("bvxy,bvy->bvx", vt[:, :, :3, :3], vp)
            + vt[:, :, :3, 3]
        )

        out = np.asarray(
            skinning_pallas(
                jnp.asarray(w), jnp.asarray(tfms), jnp.asarray(vp),
                vertex_tile=32, interpret=True,
            )
        )
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_lbs_use_pallas_flag(self):
        from poco_tpu.smpl.lbs import lbs

        params = synthetic_smpl_model(num_verts=64, seed=11)
        rng = np.random.RandomState(1)
        betas = jnp.asarray(rng.randn(2, 10), jnp.float32)
        aa = (0.3 * rng.randn(2, 24, 3)).astype(np.float32)
        rotmats = np.asarray(
            axis_angle_to_rotmat(jnp.asarray(aa).reshape(-1, 3))
        ).reshape(2, 24, 3, 3)

        import unittest.mock as mock
        from poco_tpu.ops import pallas_lbs

        orig = pallas_lbs.skinning_pallas
        with mock.patch.object(
            pallas_lbs, "skinning_pallas",
            lambda w, t, v, **kw: orig(w, t, v, interpret=True, **kw),
        ):
            v_pallas, j_pallas = lbs(
                betas, jnp.asarray(rotmats), params, use_pallas=True
            )
        v_ref, j_ref = lbs(betas, jnp.asarray(rotmats), params)
        np.testing.assert_allclose(
            np.asarray(v_pallas), np.asarray(v_ref), atol=1e-4
        )
