"""Config system tests: YAML merge, grid search, typed-config bridges."""

import os

import numpy as np
import yaml

from poco_tpu.config import (
    get_grid_search_configs,
    get_hparams_defaults,
    loss_config_from_hparams,
    model_config_from_hparams,
    parse_freeze_params,
    parse_module_lr,
    run_grid_search_experiments,
    update_hparams,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestDefaults:
    def test_tree_structure(self):
        h = get_hparams_defaults()
        assert h.METHOD == "spin"  # reference default (config.py:89)
        # reference default VERBATIM incl. the extra "s" (config.py:223);
        # the recognized value is set explicitly by shipped configs
        assert h.POCO.LOSS_VER == "norm_flow_res_gauss"
        assert h.OPTIMIZER.LR == 0.0001
        assert h.DATASET.IMG_RES == 224

    def test_clone_isolated(self):
        a = get_hparams_defaults()
        b = a.clone()
        b.POCO.SIGMA_DIM = 99
        assert a.POCO.SIGMA_DIM == 9


class TestYamlMerge:
    def test_cliff_config(self):
        h = update_hparams(os.path.join(REPO, "configs", "poco_cliff.yaml"))
        assert h.POCO.BACKBONE == "hrnet_w48_cls-cliff"
        assert h.POCO.NUM_NEURONS == "216-"
        assert h.POCO.GT_POSE_COND is True
        assert h.POCO.NUM_FLOW_LAYERS == 1
        # untouched defaults survive
        assert h.OPTIMIZER.TYPE == "adam"

    def test_pare_config(self):
        h = update_hparams(os.path.join(REPO, "configs", "poco_pare.yaml"))
        assert h.POCO.BACKBONE == "hrnet_w32-pare"
        assert h.POCO.UNCERT_INP_TYPE == "feat-pose"
        assert h.POCO.NF_LOSS_WEIGHT == 0.0001


class TestGridSearch:
    def test_list_leaves_become_axes(self):
        cfg = {
            "POCO": {"SIGMA_DIM": [1, 9], "NUM_NF_RV": 9},
            "OPTIMIZER": {"LR": [1e-4, 1e-5, 1e-6]},
        }
        exps, axes = get_grid_search_configs(cfg)
        assert len(exps) == 6
        assert set(axes) == {"POCO/SIGMA_DIM", "OPTIMIZER/LR"}
        sigmas = sorted(
            {e["POCO"]["SIGMA_DIM"] for e in exps}
        )
        assert sigmas == [1, 9]

    def test_no_lists_single_experiment(self):
        exps, axes = get_grid_search_configs({"METHOD": "poco"})
        assert len(exps) == 1 and axes == []

    def test_run_grid_search_selects_and_names(self, tmp_path):
        cfg_file = tmp_path / "sweep.yaml"
        yaml.safe_dump(
            {
                "EXP_NAME": "sweep_test",
                "LOG_DIR": str(tmp_path / "logs"),
                "OPTIMIZER": {"LR": [1e-4, 1e-5]},
            },
            open(cfg_file, "w"),
        )
        cfg0 = run_grid_search_experiments(str(cfg_file), cfg_id=0)
        cfg1 = run_grid_search_experiments(str(cfg_file), cfg_id=1)
        assert cfg0.OPTIMIZER.LR == 1e-4
        assert cfg1.OPTIMIZER.LR == 1e-5
        assert "optimizer.lr" in cfg0.LOG_DIR
        assert os.path.exists(os.path.join(cfg0.LOG_DIR, "config_to_run.yaml"))


class TestBridges:
    def test_model_config_cliff(self):
        h = update_hparams(os.path.join(REPO, "configs", "poco_cliff.yaml"))
        mc = model_config_from_hparams(h)
        assert mc.backbone == "hrnet_w48_cls-cliff"
        assert mc.num_neurons == (216,)
        assert mc.has_flow_head and mc.has_uncert_head
        assert mc.gt_pose_cond

    def test_model_config_spin(self):
        h = get_hparams_defaults()
        h.METHOD = "spin"
        mc = model_config_from_hparams(h)
        assert mc.backbone == "resnet50-hmr"
        assert not mc.has_uncert_head and not mc.has_flow_head

    def test_loss_config(self):
        h = update_hparams(os.path.join(REPO, "configs", "poco_cliff.yaml"))
        lc = loss_config_from_hparams(h)
        assert lc.nf_loss_weight == 0.01
        assert lc.keypoint2d_noncrop is True
        # pose weight multiplied by uncert weight
        np.testing.assert_allclose(lc.effective_pose_weight, 0.01)

    def test_parse_module_lr(self):
        assert parse_module_lr("0.1_0.1_1.0_1.0") == {
            "backbone_net": 0.1, "head": 0.1,
            "uncert_head": 1.0, "flow_head": 1.0,
        }
        assert parse_module_lr("") == {}

    def test_parse_freeze_params(self):
        out = parse_freeze_params("0-backbone-head,1-flow_head")
        assert out == {0: ["backbone_net", "head"], 1: ["flow_head"]}
