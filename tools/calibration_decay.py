"""Adjudicate a convergence run's calibration-vs-epoch trend.

BENCHMARKS.md (round 4) explains PARE's falling `uncert_pose_corr`
(0.708 at epoch 19 -> 0.284 at epoch 89 while MPJPE improves) as
residual homogenization: overfitting drives every joint's rotation
error toward the same small floor, so there is progressively less
across-joint heterogeneity for the per-joint Pearson to rank. This
tool measures that claim instead of leaving it a narrative: it
evaluates the epoch checkpoints a convergence logdir retains and
reports, per checkpoint, the gate correlation alongside the
across-joint coefficient of variation (std/mean) of the per-joint
mean rotation distance (`pose_dist_cov`, the heterogeneity available
to rank) and of the per-joint mean sigma (`sigma_cov`, the spread the
head actually predicts). The claim holds iff pose_dist_cov falls with
the correlation while MPJPE improves.

Counterpart quantities in the reference: the per-joint uncertainty /
error meters of POCOUtils (pocolib/utils/poco_utils.py:97-294), which
it only renders as TensorBoard histograms — it never closes the loop
on WHY its logged correlation moves.

Usage:
    python tools/calibration_decay.py --logdir logs/experiments/poco/\
        convergence_pare/convergence_pare_ID00_... [--ckpts epoch_049,epoch_089]

Runs each eval in a subprocess (eval.py --out) so checkpoints never
share a process; defaults to the host platform so a live TPU training
run is never contended (override with --platform tpu).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import os.path as osp
import subprocess
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def discover_ckpts(logdir: str) -> list[str]:
    out = []
    for d in sorted(glob.glob(osp.join(logdir, "epoch_*"))):
        if osp.isdir(d):
            out.append(osp.basename(d))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", required=True,
                    help="a convergence run logdir (contains "
                         "config_to_run.yaml and epoch_* checkpoints)")
    ap.add_argument("--ckpts", default=None,
                    help="comma-separated checkpoint dir names inside "
                         "the logdir (default: every epoch_*)")
    ap.add_argument("--root", default="data")
    ap.add_argument("--dataset", default="conv")
    ap.add_argument("--batch_size", type=int, default=50)
    ap.add_argument("--platform", default="cpu",
                    help="POCO_TPU_PLATFORM for the eval subprocesses "
                         "(cpu default: do not contend with a live TPU "
                         "training run)")
    args = ap.parse_args()

    logdir = osp.abspath(args.logdir)
    cfg = osp.join(logdir, "config_to_run.yaml")
    if not osp.exists(cfg):
        raise SystemExit(f"no config_to_run.yaml in {logdir}")
    names = (
        args.ckpts.split(",") if args.ckpts else discover_ckpts(logdir)
    )
    if not names:
        raise SystemExit(f"no epoch_* checkpoints in {logdir}")

    env = dict(os.environ)
    if args.platform:
        env["POCO_TPU_PLATFORM"] = args.platform

    rows = []
    for name in names:
        ckpt = osp.join(logdir, name)
        report = f"/tmp/calib_decay_{name}.json"
        r = subprocess.run(
            [sys.executable, "eval.py", "--cfg", cfg, "--ckpt", ckpt,
             "--dataset", args.dataset, "--data_dir", args.root,
             "--batch_size", str(args.batch_size), "--out", report],
            cwd=REPO, env=env,
        )
        if r.returncode != 0:
            raise SystemExit(f"eval.py failed for {name} ({r.returncode})")
        with open(report) as f:
            rep = json.load(f)
        s, pj = rep["summary"], rep.get("per_joint") or {}
        rows.append({
            "ckpt": name,
            "mpjpe": round(float(s["mpjpe"]), 2),
            "uncert_pose_corr": round(float(s["uncert_pose_corr"]), 4),
            "pose_dist_cov": pj.get("pose_dist_cov"),
            "sigma_cov": pj.get("sigma_cov"),
        })
        print(json.dumps(rows[-1]), file=sys.stderr)

    # The adjudication: does residual heterogeneity fall with the corr?
    verdict = None
    if len(rows) >= 2 and all(
        r["pose_dist_cov"] is not None for r in rows
    ):
        first, last = rows[0], rows[-1]
        verdict = bool(
            last["uncert_pose_corr"] < first["uncert_pose_corr"]
            and last["pose_dist_cov"] < first["pose_dist_cov"]
            and last["mpjpe"] < first["mpjpe"]
        )
    print(json.dumps({
        "benchmark": "calibration_decay",
        "logdir": logdir,
        "rows": rows,
        "homogenization_confirmed": verdict,
    }))


if __name__ == "__main__":
    main()
