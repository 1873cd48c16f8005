"""Golden-parity harness: converted reference checkpoints -> identical outputs.

The BASELINE.md accuracy gate ("3DPW MPJPE within 0.5mm of the PyTorch
reference on converted weights") needs license-gated assets that are not
shipped in this environment. This harness activates when they are
provided:

    POCO_TPU_SMPL_DIR        dir with SMPL_NEUTRAL.pkl etc.
    POCO_TPU_GOLDEN_CKPT     reference torch checkpoint (.pt)
    POCO_TPU_GOLDEN_REF      npz with reference outputs for a fixed input
                             (keys: img/bbox_info/... inputs +
                             smpl_vertices/smpl_joints3d/pred_pose/
                             var_pose expected outputs)

Run:  POCO_TPU_SMPL_DIR=... POCO_TPU_GOLDEN_CKPT=... \
      python -m pytest tests/test_golden.py -v
"""

import os

import numpy as np
import pytest

SMPL_DIR = os.environ.get("POCO_TPU_SMPL_DIR")
GOLDEN_CKPT = os.environ.get("POCO_TPU_GOLDEN_CKPT")
GOLDEN_REF = os.environ.get("POCO_TPU_GOLDEN_REF")

_HOWTO = (
    "; when the license-gated assets are available, run the whole gate "
    "with ONE command: python tools/golden_gate.py --smpl_dir ... "
    "--torch_ckpt ... --data_dir ...  (see README 'Golden gate')"
)

needs_smpl = pytest.mark.skipif(
    not SMPL_DIR,
    reason="POCO_TPU_SMPL_DIR not set (license-gated asset)" + _HOWTO,
)
needs_ckpt = pytest.mark.skipif(
    not (SMPL_DIR and GOLDEN_CKPT),
    reason="POCO_TPU_GOLDEN_CKPT not set" + _HOWTO,
)
needs_ref = pytest.mark.skipif(
    not (SMPL_DIR and GOLDEN_CKPT and GOLDEN_REF),
    reason="POCO_TPU_GOLDEN_REF not set" + _HOWTO,
)


@needs_smpl
class TestRealSmplAssets:
    def test_loads_real_model(self):
        from poco_tpu.smpl.assets import resolve_smpl_params

        params = resolve_smpl_params(SMPL_DIR, "neutral")
        assert params.v_template.shape == (6890, 3)
        assert params.posedirs.shape == (207, 6890 * 3)
        assert params.j_regressor.shape == (24, 6890)

    def test_smplx_parity_if_available(self):
        """vertices/joints match smplx on random pose/shape (SURVEY §7.2
        gate 1)."""
        smplx = pytest.importorskip("smplx")
        import jax.numpy as jnp
        import torch

        from poco_tpu.ops.rotation import axis_angle_to_rotmat
        from poco_tpu.smpl.assets import resolve_smpl_params
        from poco_tpu.smpl.lbs import smpl_forward

        params = resolve_smpl_params(SMPL_DIR, "neutral")
        ref = smplx.SMPL(SMPL_DIR, create_transl=False)
        rng = np.random.RandomState(0)
        betas = rng.randn(2, 10).astype(np.float32) * 0.5
        pose = rng.randn(2, 72).astype(np.float32) * 0.3

        rot = axis_angle_to_rotmat(jnp.asarray(pose.reshape(-1, 3)))
        out = smpl_forward(
            params, jnp.asarray(betas), rot.reshape(2, 24, 3, 3)
        )
        with torch.no_grad():
            ref_out = ref(
                betas=torch.from_numpy(betas),
                body_pose=torch.from_numpy(pose[:, 3:]),
                global_orient=torch.from_numpy(pose[:, :3]),
            )
        np.testing.assert_allclose(
            np.asarray(out.vertices), ref_out.vertices.numpy(), atol=5e-4
        )


@needs_ckpt
class TestConvertedCheckpoint:
    def test_full_conversion_coverage(self):
        """Every checkpoint tensor maps into the flax tree."""
        import jax

        from poco_tpu.config import model_config_from_hparams, update_hparams
        from poco_tpu.models.poco import POCO, init_poco
        from poco_tpu.smpl.assets import resolve_smpl_params
        from poco_tpu.utils.checkpoint_convert import (
            convert_state_dict,
            load_torch_checkpoint,
            merge_converted,
        )

        hparams = update_hparams("configs/poco_cliff.yaml")
        cfg = model_config_from_hparams(hparams)
        smpl = resolve_smpl_params(SMPL_DIR, "neutral")
        model = POCO(cfg=cfg)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl)

        sd = load_torch_checkpoint(GOLDEN_CKPT)
        converted = convert_state_dict(sd, head_type=cfg.head_name)
        assert not converted["unmatched"], converted["unmatched"]
        merged, stats = merge_converted(variables, converted)
        assert stats["skipped"] == 0, stats


@needs_ref
class TestGoldenOutputs:
    def test_forward_matches_reference_outputs(self):
        import jax
        import jax.numpy as jnp

        from eval import load_checkpoint_into
        from poco_tpu.config import model_config_from_hparams, update_hparams
        from poco_tpu.models.poco import POCO, init_poco
        from poco_tpu.smpl.assets import resolve_smpl_params

        golden = dict(np.load(GOLDEN_REF))
        hparams = update_hparams("configs/poco_cliff.yaml")
        cfg = model_config_from_hparams(hparams)
        smpl = resolve_smpl_params(SMPL_DIR, "neutral")
        model = POCO(cfg=cfg)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl)
        variables = load_checkpoint_into(variables, GOLDEN_CKPT, cfg)

        batch = {
            k: jnp.asarray(golden[k])
            for k in (
                "img", "bbox_info", "focal_length", "scale", "center",
                "orig_shape",
            )
        }
        out = model.apply(variables, batch, smpl, train=False)

        # 0.5mm vertex budget (BASELINE.md).
        np.testing.assert_allclose(
            np.asarray(out["smpl_vertices"]), golden["smpl_vertices"],
            atol=5e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["smpl_joints3d"]), golden["smpl_joints3d"],
            atol=5e-4,
        )
        if "var_pose" in golden:
            np.testing.assert_allclose(
                np.asarray(out["var_pose"]), golden["var_pose"], atol=1e-3
            )
