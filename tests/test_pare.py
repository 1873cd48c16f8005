"""PARE head and layer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poco_tpu.models.heads.pare import PareHead
from poco_tpu.models.layers import (
    PerPositionConv1x1,
    get_heatmap_preds,
    grid_sample_bilinear,
    keypoint_attention,
    softargmax2d,
)


class TestLayers:
    def test_per_position_conv_equals_per_joint_linear(self):
        """Each grid position gets its own (out, in) linear map."""
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 4, 1), jnp.float32)
        mod = PerPositionConv1x1(3, (4, 1))
        params = mod.init(jax.random.PRNGKey(0), x)
        y = np.asarray(mod.apply(params, x))
        w = np.asarray(params["params"]["weight"])  # (4, 1, 3, 8)
        for j in range(4):
            ref = np.asarray(x[:, :, j, 0]) @ w[j, 0].T
            np.testing.assert_allclose(y[:, :, j, 0], ref, atol=1e-5)

    def test_keypoint_attention_softmax_pools(self):
        """A delta heatmap pools exactly the feature at its peak."""
        feats = np.zeros((1, 3, 4, 4), np.float32)
        feats[0, :, 1, 2] = [1.0, 2.0, 3.0]
        hm = np.full((1, 2, 4, 4), -1e9, np.float32)
        hm[0, 0, 1, 2] = 0.0   # joint 0 attends position (1,2)
        hm[0, 1, 0, 0] = 0.0   # joint 1 attends position (0,0)
        out = np.asarray(
            keypoint_attention(jnp.asarray(feats), jnp.asarray(hm))
        )
        np.testing.assert_allclose(out[0, :, 0], [1, 2, 3], atol=1e-5)
        np.testing.assert_allclose(out[0, :, 1], [0, 0, 0], atol=1e-5)

    def test_softargmax2d_peak(self):
        hm = np.full((1, 1, 8, 8), -20.0, np.float32)
        hm[0, 0, 3, 5] = 20.0
        kp, norm = softargmax2d(jnp.asarray(hm), temperature=1.0)
        kp = np.asarray(kp)
        np.testing.assert_allclose(kp[0, 0, 0], 5 / 7 * 2 - 1, atol=1e-3)
        np.testing.assert_allclose(kp[0, 0, 1], 3 / 7 * 2 - 1, atol=1e-3)
        np.testing.assert_allclose(np.asarray(norm).sum(), 1.0, atol=1e-4)

    def test_hard_heatmap_preds(self):
        hm = np.zeros((1, 1, 8, 8), np.float32)
        hm[0, 0, 2, 6] = 5.0
        kp, conf = get_heatmap_preds(jnp.asarray(hm))
        np.testing.assert_allclose(
            np.asarray(kp)[0, 0], [6 / 7 * 2 - 1, 2 / 7 * 2 - 1], atol=1e-5
        )
        assert float(conf[0, 0, 0]) == 5.0

    def test_grid_sample_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.RandomState(1)
        feat = rng.randn(2, 3, 7, 9).astype(np.float32)
        uv = rng.uniform(-1.2, 1.2, (2, 5, 2)).astype(np.float32)
        ours = np.asarray(
            grid_sample_bilinear(jnp.asarray(feat), jnp.asarray(uv))
        )
        theirs = F.grid_sample(
            torch.from_numpy(feat),
            torch.from_numpy(uv).unsqueeze(2),
            align_corners=True,
        )[:, :, :, 0].numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)


class TestPareHead:
    def _feats(self, b=2, c=32):
        rng = np.random.RandomState(0)
        return jnp.asarray(rng.randn(b, 56, 56, c), jnp.float32)

    def test_default_part_segm_path(self):
        head = PareHead(num_input_features=32)
        f = self._feats()
        params = head.init(jax.random.PRNGKey(0), f)
        out = head.apply(params, f)
        assert out["pred_pose"].shape == (2, 24, 3, 3)
        assert out["pred_segm_mask"].shape == (2, 25, 56, 56)
        assert out["uncert_feat"].shape == (2, 24 * 128)
        rot = np.asarray(out["pred_pose"]).reshape(-1, 3, 3)
        np.testing.assert_allclose(
            rot @ np.swapaxes(rot, -1, -2),
            np.broadcast_to(np.eye(3), rot.shape), atol=1e-4,
        )

    @pytest.mark.parametrize("mode", ["hm", "hm_soft", "part_segm_pool"])
    def test_heatmap_modes(self, mode):
        head = PareHead(num_input_features=32, use_heatmaps=mode)
        f = self._feats()
        params = head.init(jax.random.PRNGKey(0), f)
        out = head.apply(params, f)
        assert out["pred_kp2d"].shape == (2, 24, 2)
        assert out["pred_pose"].shape == (2, 24, 3, 3)

    def test_interpolate_path(self):
        head = PareHead(
            num_input_features=32, use_heatmaps="hm_soft",
            use_keypoint_attention=False,
        )
        f = self._feats()
        params = head.init(jax.random.PRNGKey(0), f)
        out = head.apply(params, f)
        assert out["pred_pose"].shape == (2, 24, 3, 3)

    def test_hmr_regression_path(self):
        head = PareHead(num_input_features=32, use_hmr_regression=True)
        f = self._feats()
        params = head.init(jax.random.PRNGKey(0), f)
        out = head.apply(params, f)
        assert out["pred_pose"].shape == (2, 24, 3, 3)

    def test_iterative_regression_path(self):
        head = PareHead(
            num_input_features=32, iterative_regression=True, iter_residual=True
        )
        f = self._feats()
        params = head.init(jax.random.PRNGKey(0), f)
        out = head.apply(params, f)
        assert out["pred_pose"].shape == (2, 24, 3, 3)

    def test_same_branch_uncert(self):
        head = PareHead(num_input_features=32, uncert_layer="same_branch_v1")
        f = self._feats()
        params = head.init(jax.random.PRNGKey(0), f)
        out = head.apply(params, f)
        var = np.asarray(out["var_pose"])
        assert var.shape == (2, 24)
        assert np.all(var > 0) and np.all(var < 1)

    def test_lane_pad_exact_and_checkpoint_compatible(self):
        """lane_pad pads the 480-ch branch conv0 contraction to 512 with
        zeros: identical param tree (logical kernel shapes) and equal
        outputs for the same params, in eval AND train modes."""
        rng = np.random.RandomState(7)
        f = jnp.asarray(rng.randn(2, 56, 56, 480), jnp.float32)
        plain = PareHead(num_input_features=480, lane_pad=False)
        padded = PareHead(num_input_features=480, lane_pad=True)
        v_plain = plain.init(jax.random.PRNGKey(0), f)
        v_padded = padded.init(jax.random.PRNGKey(0), f)
        assert jax.tree_util.tree_structure(
            v_plain
        ) == jax.tree_util.tree_structure(v_padded)
        for a, b in zip(
            jax.tree_util.tree_leaves(v_plain),
            jax.tree_util.tree_leaves(v_padded),
        ):
            assert a.shape == b.shape
        out_p = plain.apply(v_plain, f)
        out_q = padded.apply(v_plain, f)
        assert set(out_p) == set(out_q)
        for k in out_p:
            np.testing.assert_allclose(
                np.asarray(out_q[k]), np.asarray(out_p[k]), atol=3e-5,
                err_msg=k,
            )
        # train mode: batch_stats updates must match too
        (out_pt, m_p) = plain.apply(
            v_plain, f, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        (out_qt, m_q) = padded.apply(
            v_plain, f, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        np.testing.assert_allclose(
            np.asarray(out_qt["pred_pose"]),
            np.asarray(out_pt["pred_pose"]), atol=3e-5,
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(m_p), jax.tree_util.tree_leaves(m_q)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5
            )


class TestPocoPare:
    @pytest.mark.slow
    def test_full_model_tiny_backbone(self):
        from poco_tpu.models.poco import build_poco_pare, init_poco, make_dummy_batch
        from poco_tpu.smpl.assets import synthetic_smpl_model

        model = build_poco_pare(backbone="tiny_pose-pare")
        smpl = synthetic_smpl_model(num_verts=96)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl)
        batch = make_dummy_batch(model.cfg, 2, include_gt=True)
        out, _ = model.apply(
            variables, batch, smpl, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        assert out["var_pose"].shape == (2, 24)
        assert out["log_phi"].shape == (2, 24)
        assert out["smpl_joints2d"].shape == (2, 49, 2)


class TestPareOptionalModes:
    def _feats(self, b=2, c=32):
        rng = np.random.RandomState(0)
        return jnp.asarray(rng.randn(b, 56, 56, c), jnp.float32)

    def test_coattention(self):
        head = PareHead(num_input_features=32, use_coattention=True)
        f = self._feats()
        params = head.init(jax.random.PRNGKey(0), f)
        out = head.apply(params, f)
        assert out["pred_pose"].shape == (2, 24, 3, 3)

    def test_branch_nonlocal(self):
        head = PareHead(num_input_features=32, use_branch_nonlocal=True)
        f = self._feats()
        params = head.init(jax.random.PRNGKey(0), f)
        out = head.apply(params, f)
        assert out["pred_pose"].shape == (2, 24, 3, 3)

    def test_final_nonlocal(self):
        head = PareHead(num_input_features=32, use_final_nonlocal=True)
        f = self._feats()
        params = head.init(jax.random.PRNGKey(0), f)
        out = head.apply(params, f)
        assert out["pred_pose"].shape == (2, 24, 3, 3)

    def test_branch_iteration(self):
        head = PareHead(num_input_features=32, num_branch_iteration=2)
        f = self._feats()
        params = head.init(jax.random.PRNGKey(0), f)
        out = head.apply(params, f)
        assert out["pred_pose"].shape == (2, 24, 3, 3)

    def test_soft_attention(self):
        head = PareHead(
            num_input_features=32, use_soft_attention=True,
            use_heatmaps="hm_soft",
        )
        f = self._feats()
        params = head.init(jax.random.PRNGKey(0), f)
        out = head.apply(params, f)
        assert out["pred_pose"].shape == (2, 24, 3, 3)

    def test_position_encodings(self):
        head = PareHead(num_input_features=32, use_position_encodings=True)
        f = self._feats()
        params = head.init(jax.random.PRNGKey(0), f)
        out = head.apply(params, f)
        assert out["pred_pose"].shape == (2, 24, 3, 3)


class TestAttentionModules:
    def test_coattention_shapes(self):
        from poco_tpu.models.attention import CoAttention

        rng = np.random.RandomState(0)
        a = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
        b = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
        mod = CoAttention(n_channel=16)
        params = mod.init(jax.random.PRNGKey(0), a, b)
        o1, o2 = mod.apply(params, a, b)
        assert o1.shape == a.shape and o2.shape == b.shape

    def test_nonlocal_identity_at_init(self):
        from poco_tpu.models.attention import NonLocalBlock

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 6, 6, 16), jnp.float32)
        mod = NonLocalBlock(16)
        params = mod.init(jax.random.PRNGKey(0), x)
        out = mod.apply(params, x)
        # zero-initialized residual projection -> identity at init
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)
