"""Model/loss configuration-variant coverage: every loss_ver and config
combination used by reference configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poco_tpu.config import (
    get_hparams_defaults,
    loss_config_from_hparams,
    model_config_from_hparams,
    update_hparams,
)
from poco_tpu.losses.losses import LossConfig, poco_loss, smpl_losses_uncertainty
from poco_tpu.models.poco import POCO, PocoConfig, init_poco, make_dummy_batch
from poco_tpu.smpl.assets import synthetic_smpl_model


def _run_model(cfg: PocoConfig, train=True, batch=2):
    model = POCO(cfg=cfg)
    smpl = synthetic_smpl_model(num_verts=96)
    variables = init_poco(model, jax.random.PRNGKey(0), smpl)
    b = make_dummy_batch(cfg, batch, include_gt=train)
    if train:
        out, _ = model.apply(
            variables, b, smpl, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
    else:
        out = model.apply(variables, b, smpl, train=False)
    return out


class TestModelVariants:
    @pytest.mark.slow
    def test_sigma_dim_9(self):
        cfg = PocoConfig(
            backbone="tiny-cliff", sigma_dim=9, num_neurons=(64,),
            uncert_inp_type="feat",
        )
        out = _run_model(cfg)
        assert out["var_pose"].shape == (2, 24, 3, 3)
        assert out["log_phi"].shape == (2, 24)

    @pytest.mark.slow
    def test_norm_flow_res_loss_ver(self):
        cfg = PocoConfig(
            backbone="tiny-cliff", loss_ver="norm_flow_res",
            num_neurons=(64,), uncert_inp_type="feat",
        )
        out = _run_model(cfg)
        assert out["log_phi"] is not None

    def test_rv24_flow(self):
        cfg = PocoConfig(
            backbone="tiny-cliff", num_nf_rv=24, num_neurons=(64,),
            uncert_inp_type="feat", cond_nflow=False,
        )
        out = _run_model(cfg)
        assert out["log_phi"].shape == (2, 1)

    @pytest.mark.slow
    def test_exclude_uncert_idx_flow(self):
        cfg = PocoConfig(
            backbone="tiny-cliff", exclude_uncert_idx=(22, 23),
            num_neurons=(64,), uncert_inp_type="feat",
        )
        out = _run_model(cfg)
        assert out["var_pose"].shape == (2, 22)
        assert out["log_phi"].shape == (2, 22)

    def test_mask_params_id(self):
        cfg = PocoConfig(
            backbone="tiny-cliff", mask_params_id=(0, 5),
            num_nf_rv=9, num_neurons=(64,), uncert_inp_type="feat",
        )
        out = _run_model(cfg)
        log_phi = np.asarray(out["log_phi"])
        assert log_phi[:, 0].sum() == 0.0 and log_phi[:, 5].sum() == 0.0
        assert log_phi[:, 1].sum() != 0.0

    def test_nflow_mask_types(self):
        for mtype in ("alter", "new", "old"):
            cfg = PocoConfig(
                backbone="tiny-cliff", nflow_mask_type=mtype,
                num_neurons=(64,), uncert_inp_type="feat",
            )
            out = _run_model(cfg)
            assert np.all(np.isfinite(np.asarray(out["log_phi"])))

    def test_hmr_baseline_no_uncert(self):
        cfg = PocoConfig(
            backbone="tiny-hmr", uncert_layer="", loss_ver="mse",
            gt_pose_cond=False,
        )
        out = _run_model(cfg)
        assert "var_pose" not in out
        assert out["log_phi"] is None

    def test_inference_no_gt(self):
        cfg = PocoConfig(backbone="tiny-cliff", num_neurons=(64,),
                         uncert_inp_type="feat")
        out = _run_model(cfg, train=False)
        assert out["log_phi"] is None
        assert out["var_pose"].shape == (2, 24)


class TestLossVariants:
    def _inputs(self, seed=0):
        rng = np.random.RandomState(seed)
        pred_rot = jnp.broadcast_to(jnp.eye(3), (4, 24, 3, 3))
        pred_betas = jnp.asarray(rng.randn(4, 10), jnp.float32)
        gt_pose = jnp.asarray(0.1 * rng.randn(4, 72), jnp.float32)
        gt_betas = jnp.asarray(rng.randn(4, 10), jnp.float32)
        has_smpl = jnp.ones(4)
        var = jnp.full((4, 24), 0.5)
        return pred_rot, pred_betas, gt_pose, gt_betas, has_smpl, var

    def test_gaus_variant_2d_sigma_is_plain_mse(self):
        # Reference parity: with SIGMA_DIM=1 (2-D var_pose) the pose term
        # is plain MSE — sigma does not enter (reference losses.py:477-496
        # fallthrough; see PARITY.md "Pose-loss sigma semantics").
        pr, pb, gp, gb, hs, var = self._inputs()
        cfg = LossConfig(loss_ver="norm_flow_res_gaus")
        loss_small, _ = smpl_losses_uncertainty(
            pr, pb, gp, gb, hs, None, var * 0.2, cfg
        )
        loss_large, _ = smpl_losses_uncertainty(
            pr, pb, gp, gb, hs, None, var, cfg
        )
        assert float(loss_small) == pytest.approx(float(loss_large))

    def test_gaus_variant_sigma1_nll_opt_in(self):
        # sigma1_nll=True applies the Gaussian NLL with broadcast sigma.
        pr, pb, gp, gb, hs, var = self._inputs()
        cfg = LossConfig(loss_ver="norm_flow_res_gaus", sigma1_nll=True)
        loss_small, _ = smpl_losses_uncertainty(
            pr, pb, gp, gb, hs, None, var * 0.2, cfg
        )
        loss_large, _ = smpl_losses_uncertainty(
            pr, pb, gp, gb, hs, None, var, cfg
        )
        assert float(loss_small) != float(loss_large)

    def test_gaus_variant_4d_sigma_weighted(self):
        # SIGMA_DIM=9 (4-D var_pose): the NLL branch runs in both modes.
        pr, pb, gp, gb, hs, var = self._inputs()
        var4 = jnp.broadcast_to(var[:, :, None, None], (4, 24, 3, 3))
        cfg = LossConfig(loss_ver="norm_flow_res_gaus")
        loss_small, _ = smpl_losses_uncertainty(
            pr, pb, gp, gb, hs, None, var4 * 0.2, cfg
        )
        loss_large, _ = smpl_losses_uncertainty(
            pr, pb, gp, gb, hs, None, var4, cfg
        )
        assert float(loss_small) != float(loss_large)

    def test_res_variant(self):
        pr, pb, gp, gb, hs, var = self._inputs()
        cfg = LossConfig(loss_ver="norm_flow_res")
        loss, betas = smpl_losses_uncertainty(
            pr, pb, gp, gb, hs, None, var, cfg
        )
        assert np.isfinite(float(loss)) and np.isfinite(float(betas))

    def test_gt_cond_rows_plain_mse_plus_reg(self):
        pr, pb, gp, gb, hs, var = self._inputs()
        cfg = LossConfig(loss_ver="norm_flow_res_gaus")
        mask = jnp.asarray([True, True, False, False])
        loss_cond, _ = smpl_losses_uncertainty(
            pr, pb, gp, gb, hs, mask, var, cfg
        )
        loss_plain, _ = smpl_losses_uncertainty(
            pr, pb, gp, gb, hs, None, var, cfg
        )
        assert float(loss_cond) != float(loss_plain)

    def test_excluded_sigma_joints_fall_back_to_mse(self):
        pr, pb, gp, gb, hs, _ = self._inputs()
        cfg = LossConfig(loss_ver="norm_flow_res_gaus")
        var22 = jnp.full((4, 22), 0.5)
        loss, _ = smpl_losses_uncertainty(pr, pb, gp, gb, hs, None, var22, cfg)
        assert np.isfinite(float(loss))

    def test_noncrop_keypoint_loss(self):
        """KEYPOINT_2D_NONCROP normalizes full-image keypoints by size."""
        cfg = LossConfig(keypoint2d_noncrop=True)
        rng = np.random.RandomState(1)
        pred = {
            "pred_pose": jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3)),
            "pred_shape": jnp.zeros((2, 10)),
            "pred_cam": jnp.asarray([[1.0, 0, 0]] * 2),
            "smpl_joints3d": jnp.asarray(rng.randn(2, 49, 3), jnp.float32),
            "smpl_vertices": jnp.zeros((2, 96, 3)),
            "smpl_joints2d": jnp.asarray(
                rng.rand(2, 49, 2) * 500, jnp.float32
            ),
        }
        gt = {
            "pose": jnp.zeros((2, 72)),
            "betas": jnp.zeros((2, 10)),
            "pose_3d": jnp.asarray(rng.randn(2, 24, 4), jnp.float32),
            "vertices": jnp.zeros((2, 96, 3)),
            "has_smpl": jnp.ones(2),
            "has_pose_3d": jnp.ones(2),
            "keypoints_fullimg": jnp.asarray(
                rng.rand(2, 49, 3) * 500, jnp.float32
            ),
            "orig_shape": jnp.asarray([[800.0, 1000.0]] * 2),
            "scale": jnp.asarray([1.2, 1.0]),
        }
        loss, loss_dict = poco_loss(pred, gt, cfg)
        assert np.isfinite(float(loss))
        assert float(loss_dict["loss/loss_keypoints"]) > 0


class TestConfigBridgeVariants:
    def test_pare_yaml_model(self):
        h = update_hparams("configs/poco_pare.yaml")
        cfg = model_config_from_hparams(h)
        assert cfg.head_name == "pare"
        assert cfg.num_neurons == (512,)
        assert cfg.uncert_inp_type == "feat-pose"
        lc = loss_config_from_hparams(h)
        assert lc.nf_loss_weight == 0.0001

    def test_spin_method_bridge(self):
        h = get_hparams_defaults()
        h.METHOD = "spin"
        lc = loss_config_from_hparams(h)
        assert lc.loss_ver == "mse" and lc.nf_loss_weight == 0.0
