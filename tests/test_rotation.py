"""Unit tests for rotation conversions: round trips, parity vs torch formulas."""

import jax.numpy as jnp
import numpy as np
import pytest

from poco_tpu.ops import rotation as R


def _random_rotmats(n, seed=0):
    rng = np.random.RandomState(seed)
    aa = rng.randn(n, 3).astype(np.float32)
    return np.asarray(R.axis_angle_to_rotmat(jnp.asarray(aa)))


def _assert_valid_rotation(rot, atol=1e-5):
    eye = np.eye(3, dtype=np.float32)
    np.testing.assert_allclose(
        rot @ np.swapaxes(rot, -1, -2), np.broadcast_to(eye, rot.shape),
        atol=atol,
    )
    np.testing.assert_allclose(np.linalg.det(rot), 1.0, atol=atol)


class TestAxisAngle:
    def test_rodrigues_identity(self):
        rot = R.axis_angle_to_rotmat(jnp.zeros((4, 3)))
        np.testing.assert_allclose(
            np.asarray(rot), np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-6
        )

    def test_rodrigues_known_90deg_z(self):
        aa = jnp.asarray([[0.0, 0.0, np.pi / 2]])
        rot = np.asarray(R.axis_angle_to_rotmat(aa))[0]
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(rot, expected, atol=1e-6)

    def test_round_trip_aa_rotmat(self):
        # Angles < pi round-trip exactly; larger angles map to the
        # equivalent canonical rotation, so compare matrices there.
        rng = np.random.RandomState(1)
        aa = rng.uniform(-1.0, 1.0, (64, 3)).astype(np.float32)
        rot = R.axis_angle_to_rotmat(jnp.asarray(aa))
        aa_back = np.asarray(R.rotmat_to_axis_angle(rot))
        np.testing.assert_allclose(aa_back, aa, atol=2e-4)

        aa_large = rng.uniform(-2.5, 2.5, (64, 3)).astype(np.float32)
        rot = R.axis_angle_to_rotmat(jnp.asarray(aa_large))
        rot_back = R.axis_angle_to_rotmat(R.rotmat_to_axis_angle(rot))
        np.testing.assert_allclose(
            np.asarray(rot_back), np.asarray(rot), atol=1e-4
        )

    def test_matches_torch_rodrigues(self):
        """Parity with the reference's batch_rodrigues formulation."""
        torch = pytest.importorskip("torch")

        def torch_batch_rodrigues(theta):
            l1norm = torch.norm(theta + 1e-8, p=2, dim=1)
            angle = torch.unsqueeze(l1norm, -1)
            normalized = torch.div(theta, angle)
            angle = angle * 0.5
            quat = torch.cat([torch.cos(angle), torch.sin(angle) * normalized], dim=1)
            q = quat / quat.norm(p=2, dim=1, keepdim=True)
            w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
            B = quat.size(0)
            w2, x2, y2, z2 = w**2, x**2, y**2, z**2
            wx, wy, wz = w * x, w * y, w * z
            xy, xz, yz = x * y, x * z, y * z
            return torch.stack(
                [w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
                 2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
                 2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2],
                dim=1,
            ).view(B, 3, 3)

        rng = np.random.RandomState(2)
        aa = rng.uniform(-2.0, 2.0, (32, 3)).astype(np.float32)
        ours = np.asarray(R.axis_angle_to_rotmat(jnp.asarray(aa)))
        theirs = torch_batch_rodrigues(torch.from_numpy(aa)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestRot6d:
    def test_valid_rotation_from_random_6d(self):
        rng = np.random.RandomState(3)
        x = rng.randn(16, 6).astype(np.float32)
        rot = np.asarray(R.rot6d_to_rotmat(jnp.asarray(x)))
        _assert_valid_rotation(rot)

    def test_round_trip(self):
        rot = _random_rotmats(32, seed=4)
        six = R.rotmat_to_rot6d(jnp.asarray(rot))
        rot_back = np.asarray(R.rot6d_to_rotmat(six))
        np.testing.assert_allclose(rot_back, rot, atol=1e-5)

    def test_matches_torch_convention(self):
        """Parity with the reference decoder (geometry.py:247-261)."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        def torch_rot6d(x):
            x = x.reshape(-1, 3, 2)
            a1, a2 = x[:, :, 0], x[:, :, 1]
            b1 = F.normalize(a1)
            b2 = F.normalize(a2 - torch.einsum("bi,bi->b", b1, a2).unsqueeze(-1) * b1)
            b3 = torch.cross(b1, b2, dim=-1)
            return torch.stack((b1, b2, b3), dim=-1)

        rng = np.random.RandomState(5)
        x = rng.randn(24 * 4, 6).astype(np.float32)
        ours = np.asarray(R.rot6d_to_rotmat(jnp.asarray(x)))
        theirs = torch_rot6d(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_flat_pose_vector_reshape(self):
        """A (B, 144) pose vector decodes to (B*24, 3, 3)."""
        rng = np.random.RandomState(6)
        x = rng.randn(4, 144).astype(np.float32)
        rot = np.asarray(R.rot6d_to_rotmat(jnp.asarray(x)))
        assert rot.shape == (96, 3, 3)
        _assert_valid_rotation(rot)


class TestQuat:
    def test_round_trip_quat(self):
        rot = _random_rotmats(48, seed=7)
        q = R.rotmat_to_quat(jnp.asarray(rot))
        rot_back = np.asarray(R.quat_to_rotmat(q))
        np.testing.assert_allclose(rot_back, rot, atol=1e-5)

    def test_aa_quat_round_trip(self):
        rng = np.random.RandomState(8)
        aa = rng.uniform(-2.0, 2.0, (40, 3)).astype(np.float32)
        q = R.axis_angle_to_quat(jnp.asarray(aa))
        aa_back = np.asarray(R.quat_to_axis_angle(q))
        np.testing.assert_allclose(aa_back, aa, atol=1e-5)

    def test_small_angle_stability(self):
        aa = jnp.asarray([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
        rot = np.asarray(R.axis_angle_to_rotmat(aa))
        assert np.all(np.isfinite(rot))
        _assert_valid_rotation(rot, atol=1e-5)

    def test_gradients_finite_at_identity(self):
        import jax

        g = jax.grad(lambda a: jnp.sum(R.axis_angle_to_rotmat(a)))(
            jnp.zeros((2, 3)) + 1e-4
        )
        assert np.all(np.isfinite(np.asarray(g)))


class TestFlipAndAverage:
    """flip_pose_rotmat / average_rotmats — the flip-TTA math
    (eval/runner.py flip_test; reference intended TTA via the broken
    TestAugDataset import, pocolib/core/trainer.py:24)."""

    def test_flip_matches_axis_angle_rule(self):
        from poco_tpu.constants import SMPL_JOINTS_FLIP_PERM
        from poco_tpu.ops.rotation import flip_pose_rotmat

        rng = np.random.RandomState(11)
        aa = rng.uniform(-1.5, 1.5, (3, 24, 3)).astype(np.float32)
        rot = np.asarray(
            R.axis_angle_to_rotmat(jnp.asarray(aa.reshape(-1, 3)))
        ).reshape(3, 24, 3, 3)
        # reference rule: swap L/R joints, negate y/z axis-angle comps
        aa_ref = aa[:, np.asarray(SMPL_JOINTS_FLIP_PERM)] * np.asarray(
            [1.0, -1.0, -1.0], np.float32
        )
        rot_ref = np.asarray(
            R.axis_angle_to_rotmat(jnp.asarray(aa_ref.reshape(-1, 3)))
        ).reshape(3, 24, 3, 3)
        np.testing.assert_allclose(
            np.asarray(flip_pose_rotmat(jnp.asarray(rot))), rot_ref,
            atol=1e-5,
        )

    def test_flip_is_involution_and_stays_so3(self):
        from poco_tpu.ops.rotation import flip_pose_rotmat

        rng = np.random.RandomState(12)
        aa = rng.uniform(-2.0, 2.0, (2, 24, 3)).astype(np.float32)
        rot = np.asarray(
            R.axis_angle_to_rotmat(jnp.asarray(aa.reshape(-1, 3)))
        ).reshape(2, 24, 3, 3)
        f = np.asarray(flip_pose_rotmat(jnp.asarray(rot)))
        ff = np.asarray(flip_pose_rotmat(jnp.asarray(f)))
        np.testing.assert_allclose(ff, rot, atol=1e-5)
        eye = np.einsum("bnij,bnkj->bnik", f, f)
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(3), f.shape), atol=1e-5
        )
        np.testing.assert_allclose(np.linalg.det(f), 1.0, atol=1e-5)

    def test_average_fixed_point_and_halfway(self):
        from poco_tpu.ops.rotation import average_rotmats

        rng = np.random.RandomState(13)
        aa = rng.uniform(-1.0, 1.0, (5, 3)).astype(np.float32)
        rot = np.asarray(R.axis_angle_to_rotmat(jnp.asarray(aa)))
        same = np.asarray(
            average_rotmats(jnp.asarray(rot), jnp.asarray(rot))
        )
        np.testing.assert_allclose(same, rot, atol=1e-5)

        # same axis, angles t1/t2 -> chordal mean is the (t1+t2)/2 rotation
        axis = np.asarray([0.0, 0.0, 1.0], np.float32)
        r1 = np.asarray(R.axis_angle_to_rotmat(jnp.asarray(0.3 * axis)[None]))
        r2 = np.asarray(R.axis_angle_to_rotmat(jnp.asarray(0.9 * axis)[None]))
        mid = np.asarray(R.axis_angle_to_rotmat(jnp.asarray(0.6 * axis)[None]))
        avg = np.asarray(average_rotmats(jnp.asarray(r1), jnp.asarray(r2)))
        np.testing.assert_allclose(avg, mid, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(avg), 1.0, atol=1e-5)
