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


class TestGoldenGateSelfCheck:
    """Execute tools/golden_gate.py END TO END, no licensed assets.

    Synthetic stand-ins in the REAL formats: SMPL npz files in the
    distribution layout (neutral + DISTINCT male/female geometry, so the
    gendered-GT path is exercised), a reference-format full-width torch
    checkpoint built from the actual /root/reference modules, and the
    committed smoke dataset. Both sides share the same SMPL assets, so
    the measured JAX-vs-torch MPJPE delta isolates conversion +
    torch-vs-XLA fp32 noise and the gate must PASS well inside its
    0.5 mm budget. This guards the gate SCRIPT itself — protocol
    symmetry between eval_jax and eval_torch_reference (gendered GT,
    neutral predictions, same J14 selection) — which would otherwise
    execute for the first time in the field.
    """

    def _write_smpl_npz(self, path, seed):
        from poco_tpu.constants import SMPL_PARENTS
        from poco_tpu.smpl.assets import synthetic_smpl_model

        p = synthetic_smpl_model(num_verts=512, seed=seed)
        kintree = np.stack([
            np.asarray(SMPL_PARENTS, np.int64),
            np.arange(24, dtype=np.int64),
        ])
        np.savez(
            path,
            v_template=np.asarray(p.v_template),
            shapedirs=np.asarray(p.shapedirs),
            posedirs=np.asarray(p.posedirs),
            J_regressor=np.asarray(p.j_regressor),
            weights=np.asarray(p.lbs_weights),
            kintree_table=kintree,
            f=np.asarray(p.faces),
        )

    @pytest.mark.slow
    def test_gate_passes_on_synthetic_assets(self, tmp_path, monkeypatch,
                                             capsys):
        import json
        import runpy
        import sys as _sys

        import torch

        _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from ref_torch import (
            calibrate_bn,
            import_reference_modules,
            randomize_bn_stats,
        )

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

        smpl_dir = tmp_path / "smpl"
        smpl_dir.mkdir()
        for gender, seed in (("NEUTRAL", 0), ("MALE", 1), ("FEMALE", 2)):
            self._write_smpl_npz(str(smpl_dir / f"SMPL_{gender}.npz"), seed)

        ref = import_reference_modules(tmp_path)
        torch.manual_seed(0)
        backbone = ref.hrnet_w48_cls()
        head = ref.cliff_head(2048, "diff_branch", "sigmoid")
        uncert = ref.poco_head(
            2048, [216], 1, "sigmoid", True, "diff_branch", [],
            "norm_flow_res_gaus", "pose", "feat-pose-net",
            True, "h36m", 0.25,
        )
        flow = ref.nf_head("pose", 1, "", "alter", [], 9, True, 2048, 512)
        randomize_bn_stats(backbone, seed=1)
        # Uncalibrated random BN stats compound over the 70-layer net and
        # blow activations (and thus predicted betas/pose) to 1e8-scale;
        # calibrate so outputs sit in the O(1) regime the mm budget is
        # written for (same protocol as tests/test_fullwidth_parity.py).
        backbone.eval()
        calibrate_bn(
            backbone,
            torch.randn(4, 3, 224, 224,
                        generator=torch.Generator().manual_seed(5)),
        )
        sd = {}
        for prefix, mod in (
            ("backbone", backbone), ("head", head),
            ("uncert_head", uncert), ("flow_head", flow),
        ):
            sd.update(
                {f"{prefix}.{k}": v for k, v in mod.state_dict().items()}
            )
        ckpt = str(tmp_path / "ref_poco_cliff.pt")
        torch.save({"model": sd}, ckpt)

        monkeypatch.setattr(_sys, "argv", [
            "golden_gate.py",
            "--smpl_dir", str(smpl_dir),
            "--torch_ckpt", ckpt,
            "--data_dir", os.path.join(repo, "data"),
            "--dataset", "smoke",
            "--batch_size", "8",
        ])
        monkeypatch.chdir(repo)
        with pytest.raises(SystemExit) as exc:
            runpy.run_path(
                os.path.join(repo, "tools", "golden_gate.py"),
                run_name="__main__",
            )
        out = capsys.readouterr().out
        verdict = json.loads(out.strip().splitlines()[-1])
        assert exc.value.code == 0, verdict
        assert verdict["pass"] is True
        assert verdict["delta_mm"] <= 0.5
        # both sides produced a real, nonzero error measurement
        assert verdict["mpjpe_jax_mm"] > 0.1
