"""End-to-end training tests: loss goes down, freeze schedules, ckpt/resume."""

import os

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poco_tpu.config import get_hparams_defaults
from poco_tpu.losses.losses import LossConfig, masked_mean, poco_loss
from poco_tpu.models.poco import build_poco_cliff, init_poco, make_dummy_batch
from poco_tpu.smpl.assets import synthetic_smpl_model
from poco_tpu.train.state import create_train_state, make_optimizer, module_label_tree
from poco_tpu.train.step import make_train_step, prepare_gt
from poco_tpu.train.trainer import Trainer, select_gt_pose_cond


def _train_batch(b=4, seed=0):
    rng = np.random.RandomState(seed)
    batch = make_dummy_batch(build_poco_cliff().cfg, b, include_gt=True)
    batch = {k: v for k, v in batch.items() if k != "gt_pose_rotmat"}
    batch.update(
        img=jnp.asarray(rng.randn(b, 224, 224, 3), jnp.float32),
        pose=jnp.asarray(0.2 * rng.randn(b, 72), jnp.float32),
        betas=jnp.asarray(0.5 * rng.randn(b, 10), jnp.float32),
        has_smpl=jnp.ones((b,), jnp.float32),
        has_pose_3d=jnp.ones((b,), jnp.float32),
        keypoints=jnp.asarray(rng.rand(b, 49, 3), jnp.float32),
        gt_pose_cond_mask=jnp.zeros((b,), bool),
    )
    return batch


class TestLosses:
    def test_masked_mean_empty_mask_is_zero(self):
        x = jnp.ones((4, 3))
        assert float(masked_mean(x, jnp.zeros(4))) == 0.0

    def test_masked_mean_selects_rows(self):
        x = jnp.asarray([[1.0], [3.0], [5.0], [7.0]])
        m = jnp.asarray([1.0, 0.0, 1.0, 0.0])
        assert float(masked_mean(x, m)) == 3.0

    def test_poco_loss_finite_and_structured(self):
        model = build_poco_cliff(backbone="tiny-cliff")
        smpl = synthetic_smpl_model(num_verts=96)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl)
        batch = _train_batch()
        gt = prepare_gt(batch, smpl)
        out, _ = model.apply(
            variables, {**batch, "gt_pose_rotmat": gt["gt_pose_rotmat"]},
            smpl, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        loss, loss_dict = poco_loss(out, gt, LossConfig())
        assert np.isfinite(float(loss))
        for key in (
            "loss/loss_keypoints", "loss/loss_keypoints_3d",
            "loss/loss_regr_pose", "loss/loss_regr_betas",
            "loss/loss_cam", "loss/loss_nf", "loss/total_loss",
        ):
            assert key in loss_dict and np.isfinite(float(loss_dict[key]))

    def test_no_smpl_rows_zero_pose_loss(self):
        model = build_poco_cliff(backbone="tiny-cliff")
        smpl = synthetic_smpl_model(num_verts=96)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl)
        batch = _train_batch()
        batch["has_smpl"] = jnp.zeros((4,), jnp.float32)
        gt = prepare_gt(batch, smpl)
        out, _ = model.apply(
            variables, {**batch, "gt_pose_rotmat": gt["gt_pose_rotmat"]},
            smpl, train=True, rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        _, loss_dict = poco_loss(out, gt, LossConfig())
        assert float(loss_dict["loss/loss_regr_betas"]) == 0.0


class TestOptimizer:
    def test_module_labels(self):
        model = build_poco_cliff(backbone="tiny-cliff")
        smpl = synthetic_smpl_model(num_verts=96)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl)
        labels = module_label_tree(variables["params"])
        flat = jax.tree.leaves(labels)
        assert set(flat) <= {
            "backbone_net", "head", "uncert_head", "flow_head", "other"
        }

    def test_frozen_module_gets_no_update(self):
        model = build_poco_cliff(backbone="tiny-cliff")
        smpl = synthetic_smpl_model(num_verts=96)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl)
        tx = make_optimizer(lr=1e-3, frozen_modules=("backbone_net",))
        state = create_train_state(model, variables, tx)
        step = make_train_step(model, LossConfig(), donate=False)
        batch = _train_batch()
        new_state, _ = step(state, batch, smpl, jax.random.PRNGKey(2))

        old_bb = jax.tree.leaves(state.params["backbone_net"])
        new_bb = jax.tree.leaves(new_state.params["backbone_net"])
        for a, b in zip(old_bb, new_bb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # head moved
        old_h = jax.tree.leaves(state.params["head"])
        new_h = jax.tree.leaves(new_state.params["head"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(old_h, new_h)
        )

    @pytest.mark.parametrize(
        "kwargs",
        [
            {},
            {"module_lr": {"backbone_net": 0.1, "head": 0.5}},
            {"frozen_modules": ("flow_head",)},
            {"grad_clip": 0.05},
            {"weight_decay": 1e-2},
            {
                "module_lr": {"backbone_net": 0.1},
                "frozen_modules": ("uncert_head",),
                "grad_clip": 1.0,
                "weight_decay": 1e-3,
            },
        ],
    )
    @pytest.mark.slow
    def test_fused_matches_optax(self, kwargs):
        """The flat-buffer fused Adam reproduces the optax
        multi_transform reference update-for-update."""
        model = build_poco_cliff(backbone="tiny-cliff")
        smpl = synthetic_smpl_model(num_verts=96)
        params = init_poco(model, jax.random.PRNGKey(0), smpl)["params"]
        tx_ref = make_optimizer(lr=1e-3, fused=False, **kwargs)
        tx_fused = make_optimizer(lr=1e-3, fused=True, **kwargs)
        s_ref, s_fused = tx_ref.init(params), tx_fused.init(params)
        p_ref = p_fused = params
        rng = jax.random.PRNGKey(1)
        for step_i in range(3):
            rng, k = jax.random.split(rng)
            keys = jax.random.split(
                k, len(jax.tree_util.tree_leaves(params))
            )
            it = iter(keys)
            grads = jax.tree_util.tree_map(
                lambda p: 0.1 * jax.random.normal(next(it), p.shape, p.dtype),
                params,
            )
            u_ref, s_ref = tx_ref.update(grads, s_ref, p_ref)
            u_fused, s_fused = tx_fused.update(grads, s_fused, p_fused)
            import optax

            p_ref = optax.apply_updates(p_ref, u_ref)
            p_fused = optax.apply_updates(p_fused, u_fused)
            for a, b in zip(
                jax.tree_util.tree_leaves(p_ref),
                jax.tree_util.tree_leaves(p_fused),
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5,
                    err_msg=f"step {step_i} kwargs {kwargs}",
                )


class TestTrainStep:
    def test_loss_decreases_overfitting_one_batch(self):
        model = build_poco_cliff(backbone="tiny-cliff")
        smpl = synthetic_smpl_model(num_verts=96)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl)
        tx = make_optimizer(lr=3e-4)
        state = create_train_state(model, variables, tx)
        step = make_train_step(model, LossConfig(), donate=False)
        batch = _train_batch()
        losses = []
        rng = jax.random.PRNGKey(0)
        for i in range(8):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, smpl, sub)
            losses.append(float(metrics["loss/total_loss"]))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()


class TestGtPoseCond:
    def test_ratio_selection(self):
        names = ["h36m"] * 8 + ["coco"] * 4
        mask = select_gt_pose_cond(names, "h36m", 0.25)
        assert mask.sum() == 2
        assert mask[:2].all() and not mask[8:].any()

    def test_all_mode(self):
        assert select_gt_pose_cond(["a", "b"], "all", 0.1).all()


class _ArrayDataset:
    """In-memory dataset with the PocoDataset item contract."""

    def __init__(self, n=8, seed=0):
        self.n = n
        self.rng = np.random.RandomState(seed)
        self.items = []
        for i in range(n):
            self.items.append(
                {
                    "img": self.rng.rand(224, 224, 3).astype(np.float32) * 255,
                    "pose": (0.2 * self.rng.randn(72)).astype(np.float32),
                    "betas": (0.5 * self.rng.randn(10)).astype(np.float32),
                    "pose_3d": self.rng.randn(24, 4).astype(np.float32),
                    "keypoints": self.rng.rand(49, 3).astype(np.float32),
                    "keypoints_fullimg": self.rng.rand(49, 3).astype(np.float32) * 500,
                    "has_smpl": np.float32(1.0),
                    "has_pose_3d": np.float32(1.0),
                    "scale": np.float32(1.0),
                    "center": np.array([500.0, 400.0], np.float32),
                    "orig_shape": np.array([800.0, 1000.0], np.float32),
                    "focal_length": np.float32(1280.0),
                    "bbox_info": self.rng.randn(3).astype(np.float32),
                    "gender": np.int32(i % 2),
                    "sample_index": np.int32(i),
                    "dataset_name": "h36m",
                    "imgname": f"img_{i}.jpg",
                }
            )

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.items[i]


class TestTrainerEndToEnd:
    def test_fit_validate_checkpoint_resume(self, tmp_path):
        h = get_hparams_defaults()
        h.LOG_DIR = str(tmp_path)
        h.METHOD = "poco"
        h.POCO.BACKBONE = "tiny-cliff"
        h.POCO.NUM_NEURONS = "216-"
        h.POCO.SIGMA_DIM = 1
        h.POCO.UNCERT_INP_TYPE = "feat-pose-net"
        h.POCO.COND_NFLOW = True
        h.POCO.CONTEXT_DIM = 64
        h.POCO.NUM_FLOW_LAYERS = 1
        h.POCO.GT_POSE_COND = True
        h.DATASET.BATCH_SIZE = 8
        h.TRAINING.MAX_EPOCHS = 1
        h.TRAINING.LOG_SAVE_INTERVAL = 1
        h.TRAINING.FREEZE_PARAMS = "0-backbone"
        h.TESTING.SAVE_RESULTS = True

        smpl = synthetic_smpl_model(num_verts=96)
        ds = _ArrayDataset(n=16)
        trainer = Trainer(
            h, smpl,
            train_dataset_fn=lambda epoch: ds,
            val_dataset=_ArrayDataset(n=8, seed=1),
        )
        summary = trainer.fit(max_epochs=1)
        assert "best_model_metric" in summary
        assert os.path.exists(os.path.join(h.LOG_DIR, "val_accuracy.json"))
        assert os.path.exists(os.path.join(h.LOG_DIR, "metrics.jsonl"))
        assert os.path.exists(
            os.path.join(h.LOG_DIR, "evaluation_results_3dpw.pkl")
        )
        assert os.path.exists(os.path.join(h.LOG_DIR, "best_model"))

        # Resume: load the checkpoint into a fresh trainer.
        trainer2 = Trainer(
            h, smpl, train_dataset_fn=lambda e: ds, val_dataset=None
        )
        trainer2.load_checkpoint(os.path.join(h.LOG_DIR, "best_model"))
        a = jax.tree.leaves(trainer.state.params)
        b = jax.tree.leaves(trainer2.state.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # Sidecar restored the best tracker (the best_model sidecar is
        # written at selection time, before top-k retention appends the
        # epoch snapshot — 'last' is the canonical resume point).
        assert trainer2.best_metric == trainer.best_metric

    def _small_hparams(self, logdir):
        h = get_hparams_defaults()
        h.LOG_DIR = str(logdir)
        h.METHOD = "poco"
        h.POCO.BACKBONE = "tiny-cliff"
        h.POCO.NUM_NEURONS = "216-"
        h.POCO.SIGMA_DIM = 1
        h.POCO.UNCERT_INP_TYPE = "feat-pose-net"
        h.POCO.COND_NFLOW = True
        h.POCO.CONTEXT_DIM = 64
        h.POCO.NUM_FLOW_LAYERS = 1
        h.POCO.GT_POSE_COND = True
        h.DATASET.BATCH_SIZE = 8
        h.TRAINING.LOG_SAVE_INTERVAL = 1
        h.TESTING.SAVE_RESULTS = False
        return h

    @pytest.mark.slow
    def test_kill_and_resume_reproduces_trajectory(self, tmp_path):
        """A run killed after 2 epochs and resumed from 'last' must
        reproduce the uninterrupted 4-epoch run exactly: same params,
        same val history, same best trackers (VERDICT: complete resume —
        epoch counter, best_metric/corr, topk, plateau LR, rng)."""
        smpl = synthetic_smpl_model(num_verts=96)
        ds = _ArrayDataset(n=16)
        val = _ArrayDataset(n=8, seed=1)

        # Uninterrupted 4-epoch run.
        h_a = self._small_hparams(tmp_path / "a")
        trainer_a = Trainer(
            h_a, smpl, train_dataset_fn=lambda e: ds, val_dataset=val
        )
        trainer_a.fit(max_epochs=4)

        # Killed after 2 epochs, fresh process, resume from 'last'.
        h_b = self._small_hparams(tmp_path / "b")
        trainer_b = Trainer(
            h_b, smpl, train_dataset_fn=lambda e: ds, val_dataset=val
        )
        trainer_b.fit(max_epochs=2)
        del trainer_b
        trainer_b2 = Trainer(
            self._small_hparams(tmp_path / "b"), smpl,
            train_dataset_fn=lambda e: ds, val_dataset=val,
        )
        trainer_b2.load_checkpoint(str(tmp_path / "b" / "last"))
        assert trainer_b2.epoch == 2  # resumes at the next epoch
        trainer_b2.fit(max_epochs=4)

        for x, y in zip(
            jax.tree.leaves(trainer_a.state.params),
            jax.tree.leaves(trainer_b2.state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=0, atol=0
            )
        assert trainer_b2.best_metric == pytest.approx(trainer_a.best_metric)
        assert trainer_b2.best_mpjpe_var == pytest.approx(
            trainer_a.best_mpjpe_var
        )
        hist_a = [
            {k: v for k, v in h.items()} for h in trainer_a.val_history
        ]
        hist_b = [
            {k: v for k, v in h.items()} for h in trainer_b2.val_history
        ]
        assert len(hist_a) == len(hist_b) == 4
        for ha, hb in zip(hist_a, hist_b):
            assert ha["epoch"] == hb["epoch"]
            assert ha["mpjpe"] == pytest.approx(hb["mpjpe"], rel=1e-5)
        # top-k retention list survived the restart
        assert [n for _, n in trainer_b2._topk] == [
            n for _, n in trainer_a._topk
        ]
        # var-mpjpe best checkpoint exists (dangling reference contract,
        # now honored).
        assert os.path.exists(str(tmp_path / "a" / "best_model_mpjpe_var"))

    @pytest.mark.slow
    def test_resume_tolerates_legacy_opt_state_layouts(self, tmp_path):
        """Checkpoints written before the traced lr_scale existed (or
        before opt_state was saved at all) must still resume: the
        restore merges into the freshly-initialized state, keeping
        defaults for whatever the payload lacks. Regression: a fixed
        restore template rejected BOTH directions of mismatch
        (opt_state missing a key, then opt_state missing from the
        template) with orbax tree-structure errors."""
        import shutil

        import orbax.checkpoint as ocp

        smpl = synthetic_smpl_model(num_verts=96)
        ds = _ArrayDataset(n=16)
        h = self._small_hparams(tmp_path / "run")
        trainer = Trainer(
            h, smpl, train_dataset_fn=lambda e: ds, val_dataset=None
        )
        trainer.fit(max_epochs=1)
        last = str(tmp_path / "run" / "last")

        ckptr = ocp.StandardCheckpointer()
        payload = ckptr.restore(os.path.abspath(last))

        def _rewrite(name, payload):
            path = str(tmp_path / name)
            ckptr.save(os.path.abspath(path), payload, force=True)
            ckptr.wait_until_finished()
            shutil.copy(last + ".trainer.json", path + ".trainer.json")
            return path

        legacy = dict(payload)
        legacy["opt_state"] = {
            k: v for k, v in payload["opt_state"].items() if k != "lr_scale"
        }
        no_opt = {k: v for k, v in payload.items() if k != "opt_state"}

        for name, p in (("no_lr_scale", legacy), ("no_opt_state", no_opt)):
            path = _rewrite(name, p)
            t2 = Trainer(
                self._small_hparams(tmp_path / f"resume_{name}"), smpl,
                train_dataset_fn=lambda e: ds, val_dataset=None,
            )
            t2.load_checkpoint(path)
            for x, y in zip(
                jax.tree.leaves(trainer.state.params),
                jax.tree.leaves(t2.state.params),
            ):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
            # missing pieces keep their initialized defaults
            assert "lr_scale" in t2.state.opt_state
            t2.fit(max_epochs=2)  # and training continues

        # But MODEL-state mismatch is fatal, not silent: a checkpoint
        # from a different model config must not "resume" with part of
        # the tree left at fresh init.
        bad = dict(payload)
        bad["params"] = {
            k: v for k, v in payload["params"].items()
            if k != sorted(payload["params"])[0]
        }
        path = _rewrite("missing_param_module", bad)
        t3 = Trainer(
            self._small_hparams(tmp_path / "resume_bad"), smpl,
            train_dataset_fn=lambda e: ds, val_dataset=None,
        )
        with pytest.raises(ValueError, match="does not match the model"):
            t3.load_checkpoint(path)


class TestTrainerVizAndStats:
    @pytest.mark.slow
    def test_save_images_and_uncert_stats(self, tmp_path):
        h = get_hparams_defaults()
        h.METHOD = "poco"
        h.LOG_DIR = str(tmp_path)
        h.POCO.BACKBONE = "tiny-cliff"
        h.POCO.NUM_NEURONS = "216-"
        h.POCO.SIGMA_DIM = 1
        h.POCO.UNCERT_INP_TYPE = "feat-pose-net"
        h.POCO.COND_NFLOW = True
        h.POCO.CONTEXT_DIM = 64
        h.POCO.NUM_FLOW_LAYERS = 1
        h.DATASET.BATCH_SIZE = 8
        h.TRAINING.LOG_SAVE_INTERVAL = 1
        h.TRAINING.SAVE_IMAGES = True

        smpl = synthetic_smpl_model(num_verts=96)
        ds = _ArrayDataset(n=8)
        trainer = Trainer(
            h, smpl, train_dataset_fn=lambda e: ds, val_dataset=None
        )
        trainer.fit(max_epochs=1)
        imgs = os.listdir(os.path.join(h.LOG_DIR, "images"))
        assert any(f.startswith("train_e0") for f in imgs)
        assert os.path.exists(
            os.path.join(h.LOG_DIR, "uncert_stats_train_e0.json")
        )


class TestUncertStatsTracker:
    def test_accumulates_and_dumps(self, tmp_path):
        from poco_tpu.eval.uncert_stats import UncertStatsTracker

        tracker = UncertStatsTracker()
        rng = np.random.RandomState(0)
        for _ in range(3):
            tracker.update(
                rng.rand(8, 24).astype(np.float32), keep_histogram=True
            )
        summary = tracker.summary()
        assert len(summary["uncert_mean"]) == 24
        assert 0.3 < summary["uncert_mean"]["pelvis"] < 0.7
        path = tracker.dump(str(tmp_path), "val")
        import json

        payload = json.load(open(path))
        assert "histograms" in payload
        assert sum(payload["histograms"]["pelvis"]) == 24


class TestWarmStart:
    @pytest.mark.slow
    def test_orbax_warm_start(self, tmp_path):
        """TRAINING.PRETRAINED warm start loads a prior checkpoint."""
        h = get_hparams_defaults()
        h.LOG_DIR = str(tmp_path / "run1")
        h.POCO.BACKBONE = "tiny-cliff"
        h.POCO.NUM_NEURONS = "216-"
        h.POCO.SIGMA_DIM = 1
        h.POCO.UNCERT_INP_TYPE = "feat-pose-net"
        h.POCO.COND_NFLOW = True
        h.POCO.CONTEXT_DIM = 64
        h.POCO.NUM_FLOW_LAYERS = 1
        h.DATASET.BATCH_SIZE = 8

        smpl = synthetic_smpl_model(num_verts=96)
        ds = _ArrayDataset(n=8)
        t1 = Trainer(h, smpl, train_dataset_fn=lambda e: ds)
        t1.save_checkpoint("best_model")

        h2 = h.clone()
        h2.LOG_DIR = str(tmp_path / "run2")
        h2.TRAINING.PRETRAINED = os.path.join(
            str(tmp_path / "run1"), "best_model"
        )
        t2 = Trainer(h2, smpl, train_dataset_fn=lambda e: ds)
        a = jax.tree.leaves(t1.state.params)
        b = jax.tree.leaves(t2.state.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_param_count_and_finite_check(self):
        from poco_tpu.train.state import check_finite, count_params

        model = build_poco_cliff(backbone="tiny-cliff")
        smpl = synthetic_smpl_model(num_verts=96)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl)
        counts = count_params(variables["params"])
        assert counts["total"] > 0
        assert "backbone_net" in counts and "flow_head" in counts
        check_finite(variables["params"])  # no raise
        bad = {"x": np.array([1.0, np.nan])}
        with pytest.raises(FloatingPointError):
            check_finite(bad)


class TestUnevenBatchSharding:
    @pytest.mark.slow
    def test_batch_smaller_than_mesh_pads(self, tmp_path):
        """batch_size 4 on an 8-device mesh: cyclic padding keeps SPMD valid."""
        h = get_hparams_defaults()
        h.LOG_DIR = str(tmp_path)
        h.POCO.BACKBONE = "tiny-cliff"
        h.POCO.NUM_NEURONS = "216-"
        h.POCO.SIGMA_DIM = 1
        h.POCO.UNCERT_INP_TYPE = "feat-pose-net"
        h.POCO.COND_NFLOW = True
        h.POCO.CONTEXT_DIM = 64
        h.POCO.NUM_FLOW_LAYERS = 1
        h.DATASET.BATCH_SIZE = 4  # < 8 devices
        h.TRAINING.LOG_SAVE_INTERVAL = 1

        smpl = synthetic_smpl_model(num_verts=96)
        ds = _ArrayDataset(n=8)
        trainer = Trainer(h, smpl, train_dataset_fn=lambda e: ds)
        metrics = trainer.train_epoch(0)
        assert np.isfinite(metrics["loss/total_loss"])


class TestSpmdEquivalence:
    @pytest.mark.slow
    def test_train_step_identical_1_vs_8_devices(self):
        """One SPMD program = global-batch semantics: params, loss and BN
        running stats after a step are identical on 1 and 8 devices
        (torch DDP needs SyncBN for this; XLA gives it for free)."""
        from poco_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch

        model = build_poco_cliff(backbone="tiny-cliff")
        smpl = synthetic_smpl_model(num_verts=96)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl)
        batch = _train_batch(b=8)
        rng = jax.random.PRNGKey(7)

        results = []
        for n_dev in (1, 8):
            tx = make_optimizer(lr=1e-3)
            state = create_train_state(model, variables, tx)
            step = make_train_step(model, LossConfig(), donate=False)
            mesh = make_mesh(n_devices=n_dev)
            with mesh:
                st = replicate_tree(state, mesh)
                sm = replicate_tree(smpl, mesh)
                sharded = shard_batch(dict(batch), mesh)
                new_state, metrics = step(st, sharded, sm, rng)
            results.append((new_state, float(metrics["loss/total_loss"])))

        (s1, l1), (s8, l8) = results
        np.testing.assert_allclose(l1, l8, rtol=1e-5)
        # Adam normalizes near-zero gradients, so a reduction-order float
        # difference can flip an update's sign; each step moves a weight
        # by at most ~lr, so 3*lr bounds any legitimate divergence.
        for a, b in zip(
            jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-3
            )
        for a, b in zip(
            jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s8.batch_stats)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )


class TestRenderSegmLosses:
    @pytest.mark.slow
    def test_render_and_segm_losses_active_in_step(self):
        """use_smpl_render_loss / use_smpl_segm_loss flags work end to end
        (PARE head produces pred_segm_mask, soft rasterizer the rest)."""
        from poco_tpu.models.poco import build_poco_pare

        model = build_poco_pare(backbone="tiny_pose-pare")
        smpl = synthetic_smpl_model(num_verts=96)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl)
        cfg = LossConfig(
            use_smpl_render_loss=True, use_smpl_segm_loss=True
        )
        tx = make_optimizer(lr=1e-4)
        state = create_train_state(model, variables, tx)
        step = make_train_step(model, cfg, donate=False)
        batch = _train_batch()
        new_state, metrics = step(state, batch, smpl, jax.random.PRNGKey(1))
        assert "loss/loss_smpl_render" in metrics
        assert "loss/loss_smpl_segm" in metrics
        assert np.isfinite(float(metrics["loss/loss_smpl_render"]))
        assert np.isfinite(float(metrics["loss/loss_smpl_segm"]))


class TestBf16Precision:
    @pytest.mark.slow
    def test_precision_16_trains(self, tmp_path):
        h = get_hparams_defaults()
        h.LOG_DIR = str(tmp_path)
        h.POCO.BACKBONE = "tiny-cliff"
        h.POCO.NUM_NEURONS = "216-"
        h.POCO.SIGMA_DIM = 1
        h.POCO.UNCERT_INP_TYPE = "feat-pose-net"
        h.POCO.COND_NFLOW = True
        h.POCO.CONTEXT_DIM = 64
        h.POCO.NUM_FLOW_LAYERS = 1
        h.DATASET.BATCH_SIZE = 8
        h.TRAINING.PRECISION = 16

        smpl = synthetic_smpl_model(num_verts=96)
        trainer = Trainer(
            h, smpl, train_dataset_fn=lambda e: _ArrayDataset(n=8)
        )
        assert trainer.model.dtype == jnp.bfloat16
        metrics = trainer.train_epoch(0)
        assert np.isfinite(metrics["loss/total_loss"])
        # params remain fp32 (mixed precision: bf16 compute, fp32 state)
        leaf = jax.tree.leaves(trainer.state.params)[0]
        assert leaf.dtype == jnp.float32


class TestTensorboardLogging:
    @pytest.mark.slow
    def test_tb_events_written(self, tmp_path):
        pytest.importorskip("torch.utils.tensorboard")
        h = get_hparams_defaults()
        h.LOG_DIR = str(tmp_path)
        h.PREF_LOGGER = "tensorboard"
        h.POCO.BACKBONE = "tiny-cliff"
        h.POCO.NUM_NEURONS = "216-"
        h.POCO.SIGMA_DIM = 1
        h.POCO.UNCERT_INP_TYPE = "feat-pose-net"
        h.POCO.COND_NFLOW = True
        h.POCO.CONTEXT_DIM = 64
        h.POCO.NUM_FLOW_LAYERS = 1
        h.DATASET.BATCH_SIZE = 8
        h.TRAINING.LOG_SAVE_INTERVAL = 1

        smpl = synthetic_smpl_model(num_verts=96)
        trainer = Trainer(
            h, smpl, train_dataset_fn=lambda e: _ArrayDataset(n=8)
        )
        trainer.train_epoch(0)
        events = [
            f for f in os.listdir(h.LOG_DIR)
            if f.startswith("events.out.tfevents")
        ]
        assert events, os.listdir(h.LOG_DIR)


class TestLrPlateau:
    def test_lr_halves_after_patience(self, tmp_path):
        h = get_hparams_defaults()
        h.LOG_DIR = str(tmp_path)
        h.POCO.BACKBONE = "tiny-cliff"
        h.POCO.NUM_NEURONS = "216-"
        h.POCO.SIGMA_DIM = 1
        h.POCO.UNCERT_INP_TYPE = "feat-pose-net"
        h.POCO.COND_NFLOW = True
        h.POCO.CONTEXT_DIM = 64
        h.POCO.NUM_FLOW_LAYERS = 1
        h.OPTIMIZER.LR_PLATEAU_PATIENCE = 2

        smpl = synthetic_smpl_model(num_verts=96)
        trainer = Trainer(h, smpl, train_dataset_fn=lambda e: _ArrayDataset())
        trainer._maybe_reduce_lr_on_plateau(10.0)   # new best
        assert trainer._current_lr == h.OPTIMIZER.LR
        trainer._maybe_reduce_lr_on_plateau(11.0)   # worse x1
        trainer._maybe_reduce_lr_on_plateau(11.0)   # worse x2 -> reduce
        assert trainer._current_lr == h.OPTIMIZER.LR * 0.5
        trainer._maybe_reduce_lr_on_plateau(9.0)    # improves, no change
        assert trainer._current_lr == h.OPTIMIZER.LR * 0.5

    @pytest.mark.slow
    def test_plateau_updates_lr_scale_without_tx_rebuild(self, tmp_path):
        """The fused optimizer's traced lr_scale lets the plateau
        scheduler change the LR without swapping the transformation —
        a tx swap is a static-structure change that forces the jitted
        train step to recompile (minutes over the tunnel)."""
        h = get_hparams_defaults()
        h.LOG_DIR = str(tmp_path)
        h.POCO.BACKBONE = "tiny-cliff"
        h.POCO.NUM_NEURONS = "216-"
        h.POCO.SIGMA_DIM = 1
        h.POCO.UNCERT_INP_TYPE = "feat-pose-net"
        h.POCO.COND_NFLOW = True
        h.POCO.CONTEXT_DIM = 64
        h.POCO.NUM_FLOW_LAYERS = 1
        h.OPTIMIZER.LR_PLATEAU_PATIENCE = 1

        smpl = synthetic_smpl_model(num_verts=96)
        trainer = Trainer(h, smpl, train_dataset_fn=lambda e: _ArrayDataset())
        tx0 = trainer.state.tx
        trainer._maybe_reduce_lr_on_plateau(10.0)
        trainer._maybe_reduce_lr_on_plateau(11.0)  # worse -> reduce
        assert trainer._current_lr == h.OPTIMIZER.LR * 0.5
        assert trainer.state.tx is tx0  # NOT rebuilt
        assert float(trainer.state.opt_state["lr_scale"]) == 0.5

        # the scaled state really halves the applied update
        params = trainer.state.params
        grads = jax.tree.map(jnp.ones_like, params)
        upd_half, _ = tx0.update(grads, trainer.state.opt_state, params)
        base_state = tx0.init(params)
        upd_full, _ = tx0.update(grads, base_state, params)
        a = jax.tree.leaves(upd_half)[0]
        b = jax.tree.leaves(upd_full)[0]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b) * 0.5, rtol=1e-6
        )


class TestTopKRetention:
    def test_keeps_best_k(self, tmp_path):
        h = get_hparams_defaults()
        h.LOG_DIR = str(tmp_path)
        h.POCO.BACKBONE = "tiny-cliff"
        h.POCO.NUM_NEURONS = "216-"
        h.POCO.SIGMA_DIM = 1
        h.POCO.UNCERT_INP_TYPE = "feat-pose-net"
        h.POCO.COND_NFLOW = True
        h.POCO.CONTEXT_DIM = 64
        h.POCO.NUM_FLOW_LAYERS = 1

        smpl = synthetic_smpl_model(num_verts=96)
        trainer = Trainer(h, smpl, train_dataset_fn=lambda e: _ArrayDataset())
        for epoch, metric in enumerate([50.0, 40.0, 60.0, 30.0]):
            trainer._retain_top_k(epoch, metric, k=2)
        kept = sorted(
            d for d in os.listdir(h.LOG_DIR)
            if d.startswith("epoch_")
            and os.path.isdir(os.path.join(h.LOG_DIR, d))
        )
        assert kept == ["epoch_001", "epoch_003"]  # the two best metrics
        # pruned checkpoints take their trainer-state sidecars with them
        sidecars = sorted(
            d for d in os.listdir(h.LOG_DIR) if d.endswith(".trainer.json")
        )
        assert sidecars == [
            "epoch_001.trainer.json", "epoch_003.trainer.json",
        ]


class TestSpinMethodTraining:
    @pytest.mark.slow
    def test_hmr_baseline_trains_and_validates(self, tmp_path):
        """METHOD=spin: HMR model + mse loss (no uncertainty/flow) through
        the full Trainer (reference METHOD=spin path)."""
        h = get_hparams_defaults()
        h.LOG_DIR = str(tmp_path)
        h.METHOD = "spin"
        h.SPIN.BACKBONE = "tiny"
        h.DATASET.BATCH_SIZE = 8
        h.TRAINING.LOG_SAVE_INTERVAL = 1

        smpl = synthetic_smpl_model(num_verts=96)
        trainer = Trainer(
            h, smpl,
            train_dataset_fn=lambda e: _ArrayDataset(n=8),
            val_dataset=_ArrayDataset(n=8, seed=1),
        )
        summary = trainer.fit(max_epochs=1)
        assert np.isfinite(summary["mpjpe"])
        # no uncertainty head in the spin baseline
        assert "uncert_head" not in trainer.state.params
        assert "uncert_mpjpe_corr" not in summary


class TestCheckpointInterop:
    def _h(self, tmp_path):
        h = get_hparams_defaults()
        h.LOG_DIR = str(tmp_path)
        h.POCO.BACKBONE = "tiny-cliff"
        h.POCO.NUM_NEURONS = "216-"
        h.POCO.SIGMA_DIM = 1
        h.POCO.UNCERT_INP_TYPE = "feat-pose-net"
        h.POCO.COND_NFLOW = True
        h.POCO.CONTEXT_DIM = 64
        h.POCO.NUM_FLOW_LAYERS = 1
        h.DATASET.BATCH_SIZE = 8
        return h

    def test_eval_loads_resume_payload_checkpoint(self, tmp_path):
        """Checkpoints carrying the complete-resume payload (opt_state,
        step, rng) must load through eval.py's load_checkpoint_into
        (regression: template-based orbax restore rejected the extra
        entries with a tree-structure mismatch)."""
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from eval import load_checkpoint_into

        h = self._h(tmp_path / "run")
        smpl = synthetic_smpl_model(num_verts=96)
        trainer = Trainer(h, smpl, train_dataset_fn=lambda e: _ArrayDataset())
        trainer.save_checkpoint("best_model")

        from poco_tpu.config import model_config_from_hparams
        from poco_tpu.models.poco import POCO, init_poco

        model = POCO(cfg=model_config_from_hparams(h))
        variables = init_poco(model, jax.random.PRNGKey(7), smpl)
        loaded = load_checkpoint_into(
            variables,
            os.path.join(str(tmp_path / "run"), "best_model"),
            model.cfg,
        )
        for x, y in zip(
            jax.tree.leaves(trainer.state.params),
            jax.tree.leaves(loaded["params"]),
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestCsvLogger:
    def test_header_grows_with_new_metric_keys(self, tmp_path):
        """The first logged record (params counts) must not freeze the
        CSV column set — later loss/val metrics get columns too."""
        h = get_hparams_defaults()
        h.LOG_DIR = str(tmp_path)
        h.PREF_LOGGER = "csv"
        h.POCO.BACKBONE = "tiny-cliff"
        h.POCO.NUM_NEURONS = "216-"
        h.POCO.SIGMA_DIM = 1
        h.POCO.UNCERT_INP_TYPE = "feat-pose-net"
        h.POCO.COND_NFLOW = True
        h.POCO.CONTEXT_DIM = 64
        h.POCO.NUM_FLOW_LAYERS = 1

        smpl = synthetic_smpl_model(num_verts=96)
        trainer = Trainer(h, smpl, train_dataset_fn=lambda e: _ArrayDataset())
        trainer._log({"loss/total_loss": 1.25, "loss/keypoint": 0.5})
        trainer._log({"mpjpe": 77.0})
        with open(os.path.join(trainer.logdir, "metrics.csv")) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        header = lines[0].split(",")
        assert "loss/total_loss" in header
        assert "mpjpe" in header
        # the loss row carries its value under the right column
        row = dict(zip(header, lines[-2].split(",")))
        assert row["loss/total_loss"] == "1.25"
        row2 = dict(zip(header, lines[-1].split(",")))
        assert row2["mpjpe"] == "77.0"
