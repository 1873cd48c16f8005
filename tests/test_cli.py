"""CLI entry-point integration tests (main() functions, in-process).

The three CLIs are the reference's user surface (demo.py / train.py /
eval.py); unit tests cover their machinery but the argument wiring and
import graph of the entry points themselves were uncovered (a missing
import in train.py main shipped in round 2 because of exactly that).
These run each main() on the tiny smoke config, CPU, in-process.
"""

import os
import runpy
import sys

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(script: str, argv: list[str], monkeypatch):
    monkeypatch.setattr(sys, "argv", [script] + argv)
    monkeypatch.chdir(REPO)
    runpy.run_path(os.path.join(REPO, script), run_name="__main__")


@pytest.fixture(scope="module")
def smoke_data():
    """The committed smoke dataset generator, into the repo data dir."""
    import subprocess

    if not os.path.exists(
        os.path.join(REPO, "data", "dataset_extras", "smoke_train.npz")
    ):
        subprocess.run(
            [sys.executable, "tools/make_smoke_data.py", "--n", "8"],
            cwd=REPO, check=True,
        )
    return os.path.join(REPO, "data")


class TestTrainCli:
    @pytest.mark.slow
    def test_train_main_one_epoch(self, smoke_data, monkeypatch, tmp_path):
        _run_cli(
            "train.py",
            ["--cfg", "configs/tiny_smoke.yaml", "--max_epochs", "1"],
            monkeypatch,
        )


class TestEvalCli:
    def test_eval_main_smoke(self, smoke_data, monkeypatch, tmp_path):
        out = str(tmp_path / "report.json")
        _run_cli(
            "eval.py",
            ["--cfg", "configs/tiny_smoke.yaml", "--dataset", "smoke",
             "--batch_size", "8", "--out", out],
            monkeypatch,
        )
        import json

        with open(out) as f:
            rep = json.load(f)
        assert np.isfinite(rep["summary"]["mpjpe"])


class TestDemoCli:
    def test_demo_main_folder(self, monkeypatch, tmp_path):
        folder = tmp_path / "imgs"
        folder.mkdir()
        rng = np.random.RandomState(0)
        for i in range(2):
            cv2.imwrite(
                str(folder / f"{i}.png"),
                rng.randint(0, 255, (96, 96, 3), dtype=np.uint8),
            )
        _run_cli(
            "demo.py",
            ["--cfg", "configs/tiny_smoke.yaml", "--mode", "folder",
             "--image_folder", str(folder),
             "--output_folder", str(tmp_path / "out"),
             "--detector", "full_frame"],
            monkeypatch,
        )
        assert (tmp_path / "out").exists()
