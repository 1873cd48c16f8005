"""Generate a synthetic smoke dataset for CLI end-to-end runs.

Writes data/dataset_extras/smoke_{train,val}.npz (reference npz schema,
pocolib/dataset/base_dataset.py:52-149: imgname/center/scale/pose/shape/
S/part/openpose/gender) plus matching JPEG images, so
`python train.py --cfg configs/tiny_smoke.yaml` and
`python eval.py --cfg configs/tiny_smoke.yaml` run with zero assets.

Usage:
    python tools/make_smoke_data.py [--n 16] [--root data]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_split(root: str, split: str, n: int, seed: int) -> str:
    import cv2

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "dataset_folders", "smoke")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "dataset_extras"), exist_ok=True)

    imgnames = []
    for i in range(n):
        name = f"{split}_{i:04d}.jpg"
        img = (rng.rand(256, 256, 3) * 255).astype(np.uint8)
        # a blob so crops aren't pure noise
        cv2.circle(img, (128, 128), 60, (200, 180, 160), -1)
        cv2.imwrite(os.path.join(img_dir, name), img)
        # imgname is relative to DATASET.DATA_DIR (train.py joins it
        # directly with data_dir, mirroring the reference's path scheme).
        imgnames.append(f"dataset_folders/smoke/{name}")

    pose = (0.2 * rng.randn(n, 72)).astype(np.float32)
    shape = (0.5 * rng.randn(n, 10)).astype(np.float32)
    # 24 GT 3D joints + validity, roughly human-scaled (meters)
    S = np.concatenate(
        [0.3 * rng.randn(n, 24, 3), np.ones((n, 24, 1))], axis=-1
    ).astype(np.float32)
    # 2D keypoints in pixels + confidence
    part = np.concatenate(
        [128 + 40 * rng.randn(n, 24, 2), np.ones((n, 24, 1))], axis=-1
    ).astype(np.float32)
    openpose = np.zeros((n, 25, 3), np.float32)
    gender = np.array(["m" if i % 2 == 0 else "f" for i in range(n)])

    out = os.path.join(root, "dataset_extras", f"smoke_{split}.npz")
    np.savez(
        out,
        imgname=np.array(imgnames),
        center=np.full((n, 2), 128.0, np.float32),
        scale=np.full((n,), 0.9, np.float32),
        pose=pose,
        shape=shape,
        S=S,
        part=part,
        openpose=openpose,
        gender=gender,
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--root", default="data")
    args = ap.parse_args()
    # train split for DATASETS_AND_RATIOS, test split for VAL_DS
    # (train.py resolves {name}_train.npz / {name}_test.npz).
    for split, seed in (("train", 0), ("test", 1)):
        path = make_split(args.root, split, args.n, seed)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
