"""Camera op tests: projections and batched translation estimation."""

import jax.numpy as jnp
import numpy as np

from poco_tpu.ops import camera as C


class TestWeakPerspective:
    def test_round_trip(self):
        rng = np.random.RandomState(0)
        cam = np.stack(
            [rng.uniform(0.5, 2.0, 8), rng.randn(8), rng.randn(8)], axis=-1
        ).astype(np.float32)
        t = C.weak_perspective_to_perspective(jnp.asarray(cam))
        cam_back = np.asarray(C.perspective_to_weak_perspective(t))
        np.testing.assert_allclose(cam_back, cam, rtol=1e-4, atol=1e-4)

    def test_scale_maps_to_depth(self):
        cam = jnp.asarray([[1.0, 0.0, 0.0]])
        t = np.asarray(C.weak_perspective_to_perspective(cam, 5000.0, 224))
        np.testing.assert_allclose(t[0, 2], 2 * 5000.0 / 224.0, rtol=1e-5)


class TestProjection:
    def test_center_point_projects_to_principal_point(self):
        pts = jnp.zeros((2, 5, 3))
        t = jnp.asarray([[0.0, 0.0, 5.0]] * 2)
        center = jnp.asarray([[112.0, 112.0]] * 2)
        proj = np.asarray(C.perspective_projection(pts, t, 5000.0, center))
        np.testing.assert_allclose(proj, 112.0, atol=1e-5)

    def test_similar_triangles(self):
        pts = jnp.asarray([[[1.0, 2.0, 0.0]]])
        t = jnp.asarray([[0.0, 0.0, 10.0]])
        proj = np.asarray(C.perspective_projection(pts, t, 1000.0))
        np.testing.assert_allclose(proj[0, 0], [100.0, 200.0], rtol=1e-5)

    def test_per_sample_focal(self):
        pts = jnp.asarray([[[1.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]]])
        t = jnp.asarray([[0.0, 0.0, 10.0]] * 2)
        f = jnp.asarray([1000.0, 2000.0])
        proj = np.asarray(C.perspective_projection(pts, t, f))
        np.testing.assert_allclose(proj[:, 0, 0], [100.0, 200.0], rtol=1e-5)


class TestCliffCam:
    def test_centered_bbox_keeps_translation(self):
        """A bbox centered in the image adds no principal-point offset."""
        cam = jnp.asarray([[1.0, 0.3, -0.2]])
        t = np.asarray(
            C.crop_cam_to_full_img_cam(
                cam,
                bbox_height=jnp.asarray([224.0]),
                bbox_center=jnp.asarray([[500.0, 400.0]]),
                img_w=jnp.asarray([1000.0]),
                img_h=jnp.asarray([800.0]),
                focal_length=jnp.asarray([1118.0]),
            )
        )
        np.testing.assert_allclose(t[0, :2], [0.3, -0.2], atol=1e-5)
        np.testing.assert_allclose(t[0, 2], 2 * 1118.0 / 224.0, rtol=1e-5)

    def test_offcenter_bbox_shifts(self):
        cam = jnp.asarray([[1.0, 0.0, 0.0]])
        t = np.asarray(
            C.crop_cam_to_full_img_cam(
                cam,
                bbox_height=jnp.asarray([200.0]),
                bbox_center=jnp.asarray([[600.0, 400.0]]),
                img_w=jnp.asarray([1000.0]),
                img_h=jnp.asarray([800.0]),
                focal_length=jnp.asarray([1000.0]),
            )
        )
        np.testing.assert_allclose(t[0, 0], 2 * 100.0 / 200.0, rtol=1e-5)
        np.testing.assert_allclose(t[0, 1], 0.0, atol=1e-6)


def _numpy_estimate_translation(S, joints_2d, conf, focal_length, img_size):
    """Independent per-sample reference (mirrors geometry.py:511-551)."""
    num_joints = S.shape[0]
    f = np.array([focal_length, focal_length])
    center = np.array([img_size / 2.0, img_size / 2.0])
    Z = np.reshape(np.tile(S[:, 2], (2, 1)).T, -1)
    XY = np.reshape(S[:, 0:2], -1)
    O = np.tile(center, num_joints)
    F = np.tile(f, num_joints)
    weight2 = np.reshape(np.tile(np.sqrt(conf), (2, 1)).T, -1)
    Q = np.array(
        [
            F * np.tile(np.array([1, 0]), num_joints),
            F * np.tile(np.array([0, 1]), num_joints),
            O - np.reshape(joints_2d, -1),
        ]
    ).T
    c = (np.reshape(joints_2d, -1) - O) * Z - F * XY
    W = np.diagflat(weight2)
    Q = W @ Q
    c = W @ c
    return np.linalg.solve(Q.T @ Q, Q.T @ c)


class TestEstimateTranslation:
    def test_matches_reference_least_squares(self):
        rng = np.random.RandomState(1)
        B, J = 6, 24
        j3d = rng.randn(B, J, 3).astype(np.float32)
        j3d[..., 2] += 0.5
        true_t = np.array([0.1, -0.2, 8.0], np.float32)
        f, size = 5000.0, 224.0
        pts = j3d + true_t
        j2d = pts[..., :2] / pts[..., 2:] * f + size / 2.0
        j2d += 0.5 * rng.randn(B, J, 2)
        conf = rng.uniform(0.3, 1.0, (B, J)).astype(np.float32)

        ours = np.asarray(
            C.estimate_translation(
                jnp.asarray(j3d), jnp.asarray(j2d), jnp.asarray(conf), f, size
            )
        )
        for i in range(B):
            ref = _numpy_estimate_translation(j3d[i], j2d[i], conf[i], f, size)
            np.testing.assert_allclose(ours[i], ref, rtol=1e-3, atol=1e-3)

    def test_recovers_exact_translation_noise_free(self):
        rng = np.random.RandomState(2)
        j3d = rng.randn(4, 24, 3).astype(np.float32)
        true_t = np.array([0.3, 0.1, 10.0], np.float32)
        pts = j3d + true_t
        j2d = pts[..., :2] / pts[..., 2:] * 5000.0 + 112.0
        conf = np.ones((4, 24), np.float32)
        t = np.asarray(
            C.estimate_translation(
                jnp.asarray(j3d), jnp.asarray(j2d), jnp.asarray(conf)
            )
        )
        np.testing.assert_allclose(t, np.broadcast_to(true_t, (4, 3)), atol=1e-2)

    def test_49_joint_wrapper_uses_gt_slice(self):
        rng = np.random.RandomState(3)
        j3d = rng.randn(2, 49, 3).astype(np.float32)
        true_t = np.array([0.0, 0.0, 9.0], np.float32)
        pts = j3d + true_t
        kp = np.concatenate(
            [
                pts[..., :2] / pts[..., 2:] * 5000.0 + 112.0,
                np.ones((2, 49, 1), np.float32),
            ],
            axis=-1,
        ).astype(np.float32)
        # Corrupt the OpenPose joints: the wrapper must ignore them.
        kp[:, :25, :2] = 1e4
        t = np.asarray(
            C.estimate_translation_from_49(jnp.asarray(j3d), jnp.asarray(kp))
        )
        np.testing.assert_allclose(t, np.broadcast_to(true_t, (2, 3)), atol=1e-2)
