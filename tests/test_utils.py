"""Utility tests: kp format conversion, OKS, code snapshot, CLI smoke."""

import os
import subprocess
import sys

import numpy as np

from poco_tpu.utils.kp_utils import (
    AverageMeter,
    COMMON_JOINT_KAPPAS,
    compute_oks,
    convert_kps,
    get_joint_names,
    get_perm_idxs,
    get_smpl_neighbor_triplets,
    get_smpl_skeleton,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestKpUtils:
    def test_convert_spin_to_common(self):
        kp = np.random.RandomState(0).rand(2, 49, 3)
        out = convert_kps(kp, "spin", "common")
        assert out.shape == (2, 14, 3)
        # 'rankle' is spin idx 25, common idx 0
        np.testing.assert_array_equal(out[:, 0], kp[:, 25])

    def test_convert_coco_to_spin_missing_joints_zero(self):
        kp = np.ones((1, 17, 3))
        out = convert_kps(kp, "coco", "spin")
        assert out.shape == (1, 49, 3)
        names = get_joint_names("spin")
        assert out[0, names.index("headtop")].sum() == 0  # not in coco
        assert out[0, names.index("nose")].sum() == 3

    def test_perm_idxs_h36m_common(self):
        idxs = get_perm_idxs("h36m", "common")
        assert len(idxs) == 14
        h36m = get_joint_names("h36m")
        assert h36m[idxs[0]] == "rankle"

    def test_smpl_skeleton_matches_parents(self):
        edges = get_smpl_skeleton()
        assert edges.shape == (23, 2)
        assert all(p < c for p, c in edges)

    def test_neighbor_triplets(self):
        trips = get_smpl_neighbor_triplets()
        assert len(trips) == 24
        assert all(len(t) == 3 for t in trips)
        assert trips[0][0] == 0

    def test_oks_perfect_match(self):
        kp = np.random.RandomState(1).rand(3, 14, 2) * 100
        scale = np.full(3, 50.0)
        oks = compute_oks(kp, kp, scale)
        np.testing.assert_allclose(oks, 1.0, atol=1e-6)

    def test_oks_decreases_with_error(self):
        kp = np.random.RandomState(2).rand(1, 14, 2) * 100
        scale = np.full(1, 50.0)
        a = compute_oks(kp + 1.0, kp, scale)[0]
        b = compute_oks(kp + 10.0, kp, scale)[0]
        assert 0 < b < a < 1

    def test_kappas_length(self):
        assert len(COMMON_JOINT_KAPPAS) == 14

    def test_average_meter(self):
        m = AverageMeter()
        for v in (1.0, 3.0, 5.0):
            m.update(v)
        assert m.avg == 3.0 and m.min == 1.0 and m.max == 5.0


class TestOsUtils:
    def test_copy_code_snapshot(self, tmp_path):
        from poco_tpu.utils.os_utils import copy_code

        dst = copy_code(str(tmp_path))
        assert os.path.exists(os.path.join(dst, "poco_tpu", "config.py"))
        assert os.path.exists(os.path.join(dst, "train.py"))


class TestCliSmoke:
    def test_cli_help(self):
        """All three CLIs parse --help without importing jax-heavy paths."""
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        for script in ("train.py", "eval.py", "demo.py"):
            r = subprocess.run(
                [sys.executable, os.path.join(REPO, script), "--help"],
                capture_output=True, timeout=120, env=env,
            )
            assert r.returncode == 0, r.stderr.decode()[-500:]


class TestCluster:
    def test_bash_launcher(self, tmp_path):
        import yaml
        from poco_tpu.utils.cluster import num_experiments, write_launcher

        cfg = tmp_path / "sweep.yaml"
        yaml.safe_dump({"OPTIMIZER": {"LR": [1e-4, 1e-5]}}, open(cfg, "w"))
        assert num_experiments(str(cfg)) == 2
        path = write_launcher(str(cfg), out_dir=str(tmp_path))
        body = open(path).read()
        assert "seq 0 1" in body and "--cfg_id" in body

    def test_slurm_launcher(self, tmp_path):
        import yaml
        from poco_tpu.utils.cluster import write_launcher

        cfg = tmp_path / "one.yaml"
        yaml.safe_dump({"METHOD": "poco"}, open(cfg, "w"))
        path = write_launcher(str(cfg), out_dir=str(tmp_path), scheduler="slurm")
        assert "#SBATCH --array=0-0" in open(path).read()

    def test_multihost_launcher(self, tmp_path):
        import yaml
        from poco_tpu.utils.cluster import write_multihost_launcher

        cfg = tmp_path / "one.yaml"
        yaml.safe_dump({"METHOD": "poco"}, open(cfg, "w"))
        path = write_multihost_launcher(
            str(cfg), num_hosts=4, out_dir=str(tmp_path)
        )
        body = open(path).read()
        assert "POCO_NUM_PROCESSES=4" in body
        assert "POCO_COORDINATOR" in body and "POCO_PROCESS_ID" in body
        assert os.access(path, os.X_OK)


class TestPoseTracker:
    def test_read_posetrack_json(self, tmp_path):
        import json
        from poco_tpu.utils.pose_tracker import read_posetrack_keypoints

        for frame in range(3):
            data = {
                "people": [
                    {
                        "person_id": [7],
                        "pose_keypoints_2d": [10.0, 20.0, 0.9] * 21,
                    }
                ]
            }
            json.dump(
                data, open(tmp_path / f"{frame:06d}_keypoints.json", "w")
            )
        tracks = read_posetrack_keypoints(str(tmp_path))
        assert 7 in tracks
        assert tracks[7]["joints2d"].shape == (3, 21, 3)
        assert list(tracks[7]["frames"]) == [0, 1, 2]


class TestResumableSampler:
    def test_resume_continues_permutation(self):
        from poco_tpu.data.dataset import ResumableSampler

        s = ResumableSampler(10, seed=3)
        first = s.take(4)
        state = s.state_dict()

        s2 = ResumableSampler(10, seed=99)  # different seed, overridden
        s2.load_state_dict(state)
        rest = s2.take(6)
        combined = np.concatenate([first, rest])
        assert sorted(combined.tolist()) == list(range(10))

    def test_next_epoch_reshuffles(self):
        from poco_tpu.data.dataset import ResumableSampler

        s = ResumableSampler(50, seed=0)
        a = s.take(50).copy()
        s.next_epoch()
        b = s.take(50).copy()
        assert not np.array_equal(a, b)
        assert sorted(b.tolist()) == list(range(50))


class TestSegmentationLosses:
    def test_part_segm_ce_perfect_prediction_low(self):
        import jax.numpy as jnp
        from poco_tpu.losses.segmentation import part_segmentation_loss

        gt = np.random.RandomState(0).randint(0, 5, (2, 8, 8))
        logits = np.full((2, 5, 8, 8), -10.0, np.float32)
        for b in range(2):
            for i in range(8):
                for j in range(8):
                    logits[b, gt[b, i, j], i, j] = 10.0
        loss = float(
            part_segmentation_loss(jnp.asarray(logits), jnp.asarray(gt))
        )
        assert loss < 1e-3

    def test_neg_iou(self):
        import jax.numpy as jnp
        from poco_tpu.losses.segmentation import neg_iou_loss

        a = jnp.ones((1, 8, 8))
        assert float(neg_iou_loss(a, a)) < 1e-5
        assert float(neg_iou_loss(a, 1 - a)) > 0.99


class TestExtraKpFormats:
    def test_registry_covers_reference_formats(self):
        from poco_tpu.utils.kp_utils import JOINT_NAME_REGISTRY, convert_kps

        for fmt in (
            "spin", "h36m", "coco", "mpii", "common", "3dpw", "smpl",
            "mpii3d", "mpii3d_test", "posetrack", "pennaction",
        ):
            assert fmt in JOINT_NAME_REGISTRY
        kp = np.random.RandomState(0).rand(2, 28, 3)
        out = convert_kps(kp, "mpii3d", "spin")
        assert out.shape == (2, 49, 3)

    def test_posetrack_to_common(self):
        from poco_tpu.utils.kp_utils import convert_kps

        kp = np.ones((1, 17, 3))
        out = convert_kps(kp, "posetrack", "common")
        assert out.shape == (1, 14, 3)
        assert out.sum() > 0


class TestGetModelPath:
    def test_best_and_fallback(self, tmp_path):
        from poco_tpu.utils.checkpoint_convert import get_model_path

        best = tmp_path / "best_model"
        best.mkdir()
        assert get_model_path(str(tmp_path), "best") == str(best)
        # unknown kind -> newest checkpoint-like entry
        (tmp_path / "epoch_3.ckpt").touch()
        got = get_model_path(str(tmp_path), "latest")
        assert got.endswith("epoch_3.ckpt") or got == str(best)

    def test_cam_snapshot(self, tmp_path):
        from poco_tpu.utils.checkpoint_convert import get_model_path

        cam = tmp_path / "best_model_cam"
        cam.mkdir()
        assert get_model_path(str(tmp_path), "cam") == str(cam)
        assert get_model_path(str(tmp_path), "best_cam") == str(cam)


class TestToolsClis:
    def test_compute_error_cli(self, tmp_path):
        import joblib

        payload = {
            "imgname": ["downtown_bar_00/a.jpg", "courtyard_golf/b.jpg"],
            "mpjpe": np.array([50.0, 70.0]),
            "pampjpe": np.array([30.0, 40.0]),
            "v2v": np.array([60.0, 80.0]),
            "uncert": None,
            "epoch": 0,
        }
        pkl = tmp_path / "evaluation_results_3dpw.pkl"
        joblib.dump(payload, pkl)
        out = tmp_path / "report.json"
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "compute_error.py"),
             "--result_file", str(pkl), "--out", str(out)],
            capture_output=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr.decode()[-400:]
        import json

        report = json.load(open(out))
        assert report["all"]["mpjpe"] == 60.0
        assert report["test_seq"]["mpjpe"] == 50.0
        assert report["occluded_seq"]["mpjpe"] == 70.0

    def test_convert_checkpoint_cli(self, tmp_path):
        """torch .pt -> orbax conversion via the CLI (tiny model)."""
        import torch

        # minimal state dict: just the cliff head decoders
        sd = {
            "head.fc1.weight": torch.randn(1024, 2048 + 3 + 144 + 13),
            "head.fc1.bias": torch.randn(1024),
        }
        pt = tmp_path / "ckpt.pt"
        torch.save(sd, pt)
        out = tmp_path / "orbax_ckpt"
        cfg = os.path.join(REPO, "configs", "tiny_smoke.yaml")
        env = dict(os.environ, JAX_PLATFORM_NAME="cpu")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "convert_checkpoint.py"),
             "--torch_ckpt", str(pt), "--cfg", cfg, "--out", str(out)],
            capture_output=True, timeout=600, env=env, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr.decode()[-600:]
        assert out.exists()
        assert b"loaded" in r.stdout
