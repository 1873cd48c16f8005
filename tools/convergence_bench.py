"""Synthetic convergence benchmark: prove the training stack LEARNS.

Generates a LEARNABLE 500-sample synthetic dataset — poses drawn from
the synthetic SMPL, each image showing the 24 GT joints as
color-coded blobs (so the image fully determines the pose), half the
samples with 12 joints occluded (so per-sample difficulty varies and a
calibrated uncertainty can emerge) — then runs the REAL recipe
(configs/convergence.yaml: full-width HRNet-W48 + CLIFF + flow, fp32,
two-phase freeze via FREEZE_PARAMS) through the real train.py / eval.py
CLIs and asserts:

  * val MPJPE  <= --mpjpe_thresh  (default 120 mm; random-init model
    starts ~an order of magnitude above — see BENCHMARKS.md)
  * the reference's calibration Pearson (per-joint sigma vs per-joint
    rotation distance, trainer.py:380-383) >= --corr_thresh (default
    0.2); the stricter per-sample sigma-vs-MPJPE Pearson is reported
    alongside

Reference anchor: pocolib/core/trainer.py:365-465 (the best-model /
validation machinery this validates end to end).

Usage:
    python tools/convergence_bench.py [--epochs 40] [--root data]
        [--skip_train] [--mpjpe_thresh 120] [--corr_thresh 0.2]

Prints one JSON line with the measured numbers and pass/fail.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_TRAIN = 500
N_TEST = 100
IMG = 256
SCALE_PX = 90.0  # orthographic projection scale (3D meters -> pixels)


def _joint_colors(n: int = 24) -> np.ndarray:
    """n maximally-distinct RGB colors (HSV wheel, 2 value rings)."""
    import colorsys

    cols = []
    for i in range(n):
        h = (i % 12) / 12.0
        v = 1.0 if i < 12 else 0.55
        cols.append(colorsys.hsv_to_rgb(h, 1.0, v))
    return (np.asarray(cols) * 255).astype(np.uint8)


def make_split(
    root: str, split: str, n: int, seed: int, hetero: bool = False
) -> str:
    """Write {root}/dataset_extras/conv_{split}.npz + JPEG images.

    GT follows the reference npz schema (base_dataset.py:52-149); the
    24 'part'/'S' joints use the model's own 49-joint convention rows
    25:49 (smpl_49), so 2D/3D keypoint losses supervise the matching
    predicted joints.

    hetero=True writes convhet_{split}.npz with BUILT-IN per-joint
    difficulty heterogeneity: joint j's blob is occluded with a fixed
    probability ramping 0 -> 0.9 across the 24 joints (instead of the
    homogeneous "half the samples lose 12 random joints"). High-ramp
    joints carry persistently less image evidence, so their residuals
    CANNOT homogenize at convergence — the regime where per-joint
    calibration must persist if the BENCHMARKS.md round-4 decay
    explanation is right (the claim this set exists to measure).
    """
    import cv2
    import jax
    import jax.numpy as jnp

    from poco_tpu.ops.rotation import axis_angle_to_rotmat
    from poco_tpu.smpl.assets import synthetic_smpl_model
    from poco_tpu.smpl.model import smpl_49

    rng = np.random.RandomState(seed)
    ds = "convhet" if hetero else "conv"
    img_dir = os.path.join(root, "dataset_folders", ds)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "dataset_extras"), exist_ok=True)

    pose = (0.35 * rng.randn(n, 72)).astype(np.float32)
    pose[:, :3] *= 0.3  # keep global orientation mild
    shape = (0.5 * rng.randn(n, 10)).astype(np.float32)

    smpl = synthetic_smpl_model()  # the SAME model the trainer resolves
    rotmats = np.asarray(
        axis_angle_to_rotmat(jnp.asarray(pose.reshape(-1, 3)))
    ).reshape(n, 24, 3, 3)
    _, joints49 = jax.jit(smpl_49)(
        smpl, jnp.asarray(shape), jnp.asarray(rotmats)
    )
    j24 = np.asarray(joints49)[:, 25:]  # (n, 24, 3) GT convention rows

    colors = _joint_colors()
    imgnames, parts = [], []
    occluded = np.zeros(n, bool)
    for i in range(n):
        px = IMG / 2.0 + SCALE_PX * j24[i, :, 0]
        py = IMG / 2.0 + SCALE_PX * j24[i, :, 1]
        img = np.full((IMG, IMG, 3), 32, np.uint8)
        img += (8 * rng.rand(IMG, IMG, 3)).astype(np.uint8)
        conf = np.ones(24, np.float32)
        hide = np.zeros(24, bool)
        if hetero:
            # fixed per-joint occlusion ramp: joint j hidden w.p.
            # 0.9*j/23 on every sample — persistent per-joint difficulty
            hide = rng.rand(24) < 0.9 * np.arange(24) / 23.0
            occluded[i] = bool(hide.any())
        elif i % 2 == 1:
            hide[rng.choice(24, 12, replace=False)] = True
            occluded[i] = True
        for jid in range(24):
            if hide[jid]:
                conf[jid] = 0.0
                continue
            cv2.circle(
                img, (int(round(px[jid])), int(round(py[jid]))), 6,
                colors[jid].tolist(), -1,
            )
        name = f"{split}_{i:04d}.jpg"
        cv2.imwrite(
            os.path.join(img_dir, name), img[:, :, ::-1],
            [cv2.IMWRITE_JPEG_QUALITY, 95],
        )
        imgnames.append(f"dataset_folders/{ds}/{name}")
        parts.append(
            np.concatenate([px[:, None], py[:, None], conf[:, None]], 1)
        )

    S = np.concatenate([j24, np.ones((n, 24, 1))], axis=-1).astype(np.float32)
    out = os.path.join(root, "dataset_extras", f"{ds}_{split}.npz")
    np.savez(
        out,
        imgname=np.array(imgnames),
        center=np.full((n, 2), IMG / 2.0, np.float32),
        scale=np.full((n,), 1.1, np.float32),
        pose=pose,
        shape=shape,
        S=S,
        part=np.asarray(parts, np.float32),
        openpose=np.zeros((n, 25, 3), np.float32),
        gender=np.array(["n"] * n),
        occluded=occluded,  # extra key, ignored by the loader
    )
    return out


def main():
    # Data generation is tiny — keep it off the (possibly tunneled) TPU;
    # the train.py / eval.py subprocesses pick their own devices.
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data")
    ap.add_argument("--which", default="cliff",
                    choices=["cliff", "pare", "pare_hetero"],
                    help="recipe: configs/convergence.yaml (CLIFF), "
                         "configs/convergence_pare.yaml (PARE part-"
                         "attention family), or the heterogeneous-"
                         "difficulty PARE study (per-joint occlusion "
                         "ramp; measures whether calibration persists "
                         "at best-MPJPE when residuals cannot "
                         "homogenize)")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--mpjpe_thresh", type=float, default=120.0)
    ap.add_argument("--corr_thresh", type=float, default=0.2)
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse the existing logdir checkpoint")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore any resumable run and start a new one")
    ap.add_argument("--make_data_only", action="store_true")
    args = ap.parse_args()

    hetero = args.which == "pare_hetero"
    ds = "convhet" if hetero else "conv"
    train_npz = os.path.join(
        args.root, "dataset_extras", f"{ds}_train.npz"
    )
    if not os.path.exists(train_npz):
        for split, n, seed in (("train", N_TRAIN, 0), ("test", N_TEST, 1)):
            path = make_split(args.root, split, n, seed, hetero=hetero)
            print(f"wrote {path}", file=sys.stderr)
    if args.make_data_only:
        return

    cfg = {
        "cliff": "configs/convergence.yaml",
        "pare": "configs/convergence_pare.yaml",
        "pare_hetero": "configs/convergence_pare_hetero.yaml",
    }[args.which]
    exp_name = {
        "cliff": "convergence",
        "pare": "convergence_pare",
        "pare_hetero": "convergence_pare_het",
    }[args.which]

    # Session-death-proof training: the trainer already checkpoints
    # "last" + a full host-state sidecar every epoch, so the benchmark
    # resumes the newest unfinished run instead of restarting its
    # trajectory — a killed session costs at most one epoch, not the
    # run. (--fresh opts out; --skip_train skips training entirely.)
    import glob

    # Newest by mtime: the dir names embed %d-%m-%Y timestamps, which do
    # NOT sort chronologically as strings (day field first).
    cands = glob.glob(
        os.path.join(REPO, "logs", "**", f"{exp_name}_ID*"), recursive=True
    )
    resumable = None
    if cands and not args.fresh:
        newest = max(cands, key=os.path.getmtime)
        sidecar = os.path.join(newest, "last.trainer.json")
        try:
            # The trainer removes and rewrites this sidecar every epoch
            # (non-atomically), so a live writer can race this read —
            # a torn/missing read IS a liveness signal, not a crash.
            with open(sidecar) as f:
                done = int(json.load(f)["next_epoch"])
            resumable = (newest, done)
        except FileNotFoundError:
            done = None
        except (json.JSONDecodeError, KeyError, ValueError) as e:
            done = None
            if not args.skip_train:
                raise SystemExit(
                    f"{sidecar} is unreadable mid-rewrite ({e}) — a "
                    "training process is likely writing this logdir; "
                    "wait for it (or pass --fresh to start a new run)"
                )
        if resumable is not None and not args.skip_train:
            # Liveness guard: a fresh metrics.jsonl means a writer may
            # still be training this logdir (e.g. a run that outlived
            # its session). Resuming under a live writer races orbax's
            # delete-and-rewrite of "last"; refuse instead. Scoped to
            # the resume-training path: --skip_train is a read-only
            # evaluation and must keep working under a live writer
            # (it reads best_model, which is only replaced atomically
            # between validations). A FINISHED run is safe regardless.
            import time as _time

            metrics = os.path.join(newest, "metrics.jsonl")
            if (
                done < args.epochs
                and os.path.exists(metrics)
                and _time.time() - os.path.getmtime(metrics) < 180
            ):
                raise SystemExit(
                    f"{newest} was written <180 s ago — a training "
                    "process may still be running it; wait for it (or "
                    "pass --fresh to start a new run)"
                )

    env = dict(os.environ)
    if not args.skip_train:
        train_cmd = [
            sys.executable, "train.py", "--cfg", cfg,
            "--data_dir", args.root, "--max_epochs", str(args.epochs),
        ]
        if resumable is not None:
            logdir, done = resumable
            if done >= args.epochs:
                print(
                    f"resume: {logdir} already at epoch {done} >= "
                    f"{args.epochs}, skipping training", file=sys.stderr,
                )
                train_cmd = None
            else:
                print(
                    f"resume: {logdir} from epoch {done}/{args.epochs}",
                    file=sys.stderr,
                )
                train_cmd += [
                    "--resume", os.path.join(logdir, "last"),
                    "--logdir", logdir,
                ]
        if train_cmd is not None:
            r = subprocess.run(train_cmd, cwd=REPO, env=env)
            if r.returncode != 0:
                raise SystemExit(f"train.py failed ({r.returncode})")

    if resumable is not None:
        logdir = resumable[0]
    else:
        cands = glob.glob(
            os.path.join(REPO, "logs", "**", f"{exp_name}_ID*"),
            recursive=True,
        )
        if not cands:
            raise SystemExit(f"no {exp_name} logdir found")
        logdir = max(cands, key=os.path.getmtime)

    def eval_ckpt(ckpt: str, tag: str) -> dict:
        report = f"/tmp/convergence_eval_{args.which}_{tag}.json"
        r = subprocess.run(
            [sys.executable, "eval.py", "--cfg", cfg,
             "--ckpt", ckpt, "--dataset", ds, "--data_dir", args.root,
             "--batch_size", "50", "--out", report],
            cwd=REPO, env=env,
        )
        if r.returncode != 0:
            raise SystemExit(f"eval.py failed ({r.returncode})")
        with open(report) as f:
            return json.load(f)["summary"]

    summary = eval_ckpt(os.path.join(logdir, "best_model"), "best")

    # Both selection policies in the artifact (reference
    # trainer.py:407-442 tie-breaks best-model on uncert correlation;
    # train_utils.py:132-133 exposes best_mpjpe_var): the best-MPJPE row
    # gates, the best-calibration row preserves the calibrated
    # checkpoint's evidence instead of discarding it.
    mpjpe_var_summary = None
    mv_ckpt = os.path.join(logdir, "best_model_mpjpe_var")
    if os.path.exists(mv_ckpt):
        mpjpe_var_summary = eval_ckpt(mv_ckpt, "mpjpe_var")

    mpjpe = float(summary.get("mpjpe", float("nan")))
    corr = float(summary.get("uncert_pose_corr", float("nan")))
    sample_corr = float(summary.get("uncert_mpjpe_corr", float("nan")))

    # Calibration trajectory (corr / mpjpe vs epoch) from the trainer's
    # validation history — the curve BENCHMARKS.md trends to show the
    # gate margin is a plateau property, not a lucky final epoch.
    curve = []
    val_hist = os.path.join(logdir, "val_accuracy.json")
    if os.path.exists(val_hist):
        with open(val_hist) as f:
            for rec in json.load(f):
                curve.append({
                    "epoch": rec.get("epoch"),
                    "mpjpe": round(float(rec.get("mpjpe", float("nan"))), 2),
                    "uncert_pose_corr": round(
                        float(rec.get("uncert_pose_corr", float("nan"))), 4
                    ),
                })

    ok = mpjpe <= args.mpjpe_thresh and corr >= args.corr_thresh
    out = {
        "benchmark": "synthetic_convergence",
        "which": args.which,
        "curve": curve,
        "epochs": args.epochs,
        "val_mpjpe_mm": round(mpjpe, 2),
        "uncert_pose_corr": round(corr, 4),
        "uncert_mpjpe_corr": round(sample_corr, 4),
        "mpjpe_thresh": args.mpjpe_thresh,
        "corr_thresh": args.corr_thresh,
        "pass": bool(ok),
        "logdir": logdir,
    }
    if mpjpe_var_summary is not None:
        out["best_mpjpe_var"] = {
            "val_mpjpe_mm": round(
                float(mpjpe_var_summary.get("mpjpe", float("nan"))), 2
            ),
            "uncert_pose_corr": round(
                float(mpjpe_var_summary.get(
                    "uncert_pose_corr", float("nan")
                )), 4
            ),
            "mpjpe_var": round(
                float(mpjpe_var_summary.get(
                    "mpjpe_var", float("nan")
                )), 2
            ),
        }
    print(json.dumps(out))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
