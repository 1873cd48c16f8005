"""Head-level unit tests: CLIFF/HMR regressors, uncertainty MLP, RealNVP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poco_tpu.models.heads.cliff import CliffHead
from poco_tpu.models.heads.flow import (
    FlowHead,
    RealNVP,
    get_alter_masks,
    get_new_masks,
    get_old_masks,
)
from poco_tpu.models.heads.hmr import HmrHead
from poco_tpu.models.heads.poco_uncert import PocoUncertHead


def _valid_rotmats(rot, atol=1e-4):
    rot = np.asarray(rot)
    eye = np.broadcast_to(np.eye(3), rot.shape)
    np.testing.assert_allclose(rot @ np.swapaxes(rot, -1, -2), eye, atol=atol)


class TestCliffHead:
    def test_shapes_and_rotations(self):
        head = CliffHead(num_input_features=64)
        feats = jnp.ones((3, 64))
        bbox = jnp.zeros((3, 3))
        params = head.init(jax.random.PRNGKey(0), feats, bbox)
        out = head.apply(params, feats, bbox)
        assert out["pred_pose"].shape == (3, 24, 3, 3)
        assert out["pred_shape"].shape == (3, 10)
        assert out["pred_cam"].shape == (3, 3)
        assert out["pred_pose_6d"].shape == (3, 144)
        assert out["body_feat2"].shape == (3, 1024)
        _valid_rotmats(out["pred_pose"])

    def test_bbox_conditioning_changes_output(self):
        head = CliffHead(num_input_features=64)
        feats = jnp.ones((1, 64))
        params = head.init(jax.random.PRNGKey(0), feats, jnp.zeros((1, 3)))
        a = head.apply(params, feats, jnp.zeros((1, 3)))
        b = head.apply(params, feats, jnp.ones((1, 3)))
        assert not np.allclose(
            np.asarray(a["pred_cam"]), np.asarray(b["pred_cam"])
        )

    def test_feature_map_input_pooled(self):
        head = CliffHead(num_input_features=32)
        fmap = jnp.ones((2, 7, 7, 32))
        params = head.init(jax.random.PRNGKey(0), fmap, jnp.zeros((2, 3)))
        out = head.apply(params, fmap, jnp.zeros((2, 3)))
        assert out["uncert_feat"].shape == (2, 32)


class TestHmrHead:
    def test_shapes(self):
        head = HmrHead(num_input_features=32)
        fmap = jnp.ones((2, 7, 7, 32))
        params = head.init(jax.random.PRNGKey(0), fmap)
        out = head.apply(params, fmap)
        assert out["pred_pose"].shape == (2, 24, 3, 3)
        _valid_rotmats(out["pred_pose"])


class TestPocoUncertHead:
    def _run(self, inp_type, num_neurons=(216,)):
        head = PocoUncertHead(
            num_input_channels=128,
            num_neurons=num_neurons,
            uncert_inp_type=inp_type,
        )
        feats = jnp.ones((4, 128))
        pose = jnp.broadcast_to(jnp.eye(3), (4, 24, 3, 3))
        params = head.init(jax.random.PRNGKey(0), feats, pose)
        return head.apply(params, feats, pose)

    @pytest.mark.parametrize("inp_type", ["feat", "feat-pose", "feat-pose-net"])
    def test_output_shape_and_range(self, inp_type):
        out = self._run(inp_type)
        var = np.asarray(out["var_pose"])
        assert var.shape == (4, 24)
        # sigmoid activation bounds sigma in (0, 1)
        assert np.all(var > 0) and np.all(var < 1)

    def test_gt_pose_conditioning_substitutes_rows(self):
        head = PocoUncertHead(
            num_input_channels=16, num_neurons=(8,), uncert_inp_type="feat-pose"
        )
        rng = np.random.RandomState(0)
        feats = jnp.asarray(rng.randn(2, 16), jnp.float32)
        pred = jnp.asarray(rng.randn(2, 24, 3, 3), jnp.float32)
        gt = jnp.asarray(rng.randn(2, 24, 3, 3), jnp.float32)
        params = head.init(jax.random.PRNGKey(0), feats, pred)

        base = head.apply(params, feats, pred)
        cond = head.apply(
            params, feats, pred,
            gt_pose_rotmat=gt,
            gt_pose_cond_mask=jnp.asarray([True, False]),
        )
        # Row 0 conditioned on GT -> differs; row 1 unchanged.
        assert not np.allclose(
            np.asarray(base["var_pose"][0]), np.asarray(cond["var_pose"][0])
        )
        np.testing.assert_allclose(
            np.asarray(base["var_pose"][1]), np.asarray(cond["var_pose"][1]),
            atol=1e-6,
        )

    def test_exclude_idx_reduces_outputs(self):
        head = PocoUncertHead(
            num_input_channels=16,
            num_neurons=(8,),
            uncert_inp_type="feat",
            exclude_uncert_idx=(22, 23),
        )
        feats = jnp.ones((1, 16))
        pose = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        params = head.init(jax.random.PRNGKey(0), feats, pose)
        out = head.apply(params, feats, pose)
        assert out["var_pose"].shape == (1, 22)


class TestMasks:
    def test_alter(self):
        m = get_alter_masks(4, 1)
        assert m.shape == (2, 4)
        np.testing.assert_array_equal(m[0], [0, 1, 0, 1])
        np.testing.assert_array_equal(m[1], [0, 1, 0, 1])

    def test_new_old_split(self):
        assert get_new_masks(9, 1).shape == (2, 9)
        assert get_old_masks(9, 2).shape == (4, 9)
        # complementary halves
        m = get_old_masks(8, 1)
        np.testing.assert_array_equal(m[0], [0, 0, 0, 0, 1, 1, 1, 1])


class TestRealNVP:
    def _flow(self, cond_dim=None):
        flow = RealNVP(num_rv=9, num_coupling_layers=2)
        x = jnp.ones((3, 9))
        cond = None if cond_dim is None else jnp.ones((3, cond_dim))
        params = flow.init(jax.random.PRNGKey(0), x, cond)
        return flow, params, cond

    def test_invertibility(self):
        flow, params, _ = self._flow()
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(8, 9), jnp.float32)
        z, _ = flow.apply(params, x, method=flow.backward_p)
        x_back = flow.apply(params, z, method=flow.forward_p)
        np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-5)

    def test_log_det_consistency(self):
        """log|det J| from backward_p matches autodiff jacobian."""
        flow, params, _ = self._flow()
        x = jnp.asarray(np.random.RandomState(2).randn(1, 9), jnp.float32)

        def fwd_inv(xx):
            z, _ = flow.apply(params, xx[None], method=flow.backward_p)
            return z[0]

        jac = jax.jacfwd(fwd_inv)(x[0])
        _, log_det = flow.apply(params, x, method=flow.backward_p)
        sign, ref_logdet = np.linalg.slogdet(np.asarray(jac))
        np.testing.assert_allclose(float(log_det[0]), ref_logdet, atol=1e-4)

    def test_log_prob_integrates_like_density(self):
        """At init (near-identity flow) log_prob ~ standard normal."""
        flow, params, _ = self._flow()
        x = jnp.zeros((1, 9))
        lp = float(flow.apply(params, x, method=flow.log_prob)[0])
        expected = -0.5 * 9 * np.log(2 * np.pi)
        assert abs(lp - expected) < 2.0

    def test_conditioning_changes_log_prob(self):
        flow, params, cond = self._flow(cond_dim=5)
        x = jnp.ones((3, 9))
        lp1 = flow.apply(params, x, cond, method=flow.log_prob)
        lp2 = flow.apply(params, x, 2.0 * cond, method=flow.log_prob)
        assert not np.allclose(np.asarray(lp1), np.asarray(lp2))

    def test_sample_shape(self):
        flow, params, _ = self._flow()
        s = flow.apply(
            params, jax.random.PRNGKey(3), 16, method=flow.sample
        )
        assert s.shape == (16, 9)
        assert np.all(np.isfinite(np.asarray(s)))


class TestFlowHead:
    def test_log_phi_shape(self):
        head = FlowHead(num_nf_rv=9, num_flow_layers=1, context_dim=32)
        rng = np.random.RandomState(0)
        feats = jnp.asarray(rng.randn(2, 64), jnp.float32)
        pred = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        gt = jnp.asarray(rng.randn(2, 24, 3, 3), jnp.float32)
        var = jnp.full((2, 24), 0.5)
        params = head.init(jax.random.PRNGKey(0), feats, pred, gt, var)
        log_phi = head.apply(params, feats, pred, gt, var)
        # 24 joints x 9 dof / 9 rv = 24 parts
        assert log_phi.shape == (2, 24)
        assert np.all(np.isfinite(np.asarray(log_phi)))

    def test_rv24_mean_mode(self):
        head = FlowHead(
            num_nf_rv=24, num_flow_layers=1, cond_nflow=False, context_dim=0
        )
        pred = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
        gt = pred
        var = jnp.full((2, 24), 0.5)
        feats = jnp.zeros((2, 8))
        params = head.init(jax.random.PRNGKey(0), feats, pred, gt, var)
        log_phi = head.apply(params, feats, pred, gt, var)
        assert log_phi.shape == (2, 1)
