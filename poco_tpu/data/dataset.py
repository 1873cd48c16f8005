"""npz-annotation dataset and batching (host side).

Reference contract: pocolib/dataset/base_dataset.py. The npz schema is
unchanged — imgname, center, scale, and optionally pose (72), shape (10),
S (24,4), part (24,3), openpose (25,3), gender, has_smpl, person_id,
var — so existing annotation files work as-is.

TPU-first redesign:
  * items stay numpy; images are HWC uint8-range float (NHWC batches);
    normalization and GT mesh generation happen on device inside the
    jitted train/eval step (no per-item torch SMPL calls as in
    base_dataset.py:341-379);
  * batches are fixed-size (padded + masked via parallel.mesh helpers),
    so XLA never recompiles;
  * a lightweight background-thread prefetcher replaces torch DataLoader
    workers.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Any, Iterator

import cv2
import numpy as np

from ..constants import IMG_RES
from .transforms import (
    AugmentParams,
    convert_crop_coords_to_orig_img,
    process_image,
    process_keypoints_2d,
    process_keypoints_3d,
    process_pose,
    sample_augment_params,
)


def calculate_bbox_info_np(center, scale, orig_shape):
    img_h, img_w = float(orig_shape[0]), float(orig_shape[1])
    focal = np.sqrt(img_h**2 + img_w**2)
    b = scale * 200.0
    return np.array(
        [
            (center[0] - img_w / 2.0) / focal * 2.8,
            (center[1] - img_h / 2.0) / focal * 2.8,
            (b - 0.24 * focal) / (0.06 * focal),
        ],
        np.float32,
    )


def get_confident_frames(var: np.ndarray, threshold: float) -> np.ndarray:
    """Select frames whose root uncertainty is below threshold.

    Reference: train_utils.py:31-45 (global uncertainty = joint 0).
    """
    global_var = np.asarray(var)[:, 0]
    return np.nonzero(global_var < threshold)[0]


class PocoDataset:
    """BaseDataset equivalent over an npz annotation file.

    Args:
        npz_file: annotation archive (schema above).
        img_dir: image root joined with each imgname.
        is_train: enables augmentation and training keys.
        options: dict of augmentation knobs (FLIP, NOISE_FACTOR,
            ROT_FACTOR, SCALE_FACTOR, USE_SYNTHETIC_OCCLUSION,
            UNCERT_THRESHOLD, IMG_RES), defaults mirror config.py.
        occluders: optional list of RGBA occluder patches for synthetic
            occlusion augmentation.
    """

    def __init__(
        self,
        npz_file: str,
        img_dir: str = "",
        dataset_name: str = "",
        is_train: bool = True,
        use_augmentation: bool = True,
        ignore_3d: bool = False,
        num_images: int = 0,
        options: dict | None = None,
        occluders: list | None = None,
        seed: int = 0,
    ):
        self.img_dir = img_dir
        self.dataset_name = dataset_name or os.path.basename(npz_file).split(".")[0]
        self.is_train = is_train
        self.use_augmentation = use_augmentation
        self.options = dict(
            FLIP=True, NOISE_FACTOR=0.4, ROT_FACTOR=30.0, SCALE_FACTOR=0.25,
            IMG_RES=IMG_RES, UNCERT_THRESHOLD=0.3,  # config.py:98 / reference :125
            TEST_ROT=0.0, TEST_SCALE=1.0,
        )
        self.options.update(options or {})
        self.occluders = occluders
        self.rng = np.random.RandomState(seed)
        # Occlusion augmentation draws from its own stream so the
        # per-item and native whole-batch paths consume the main RNG in
        # the same order (get_batch draws all augment params up front;
        # interleaved occlusion draws would desynchronize the streams).
        self.occ_rng = np.random.RandomState(
            None if seed is None else seed + 77_003
        )

        data = dict(np.load(npz_file, allow_pickle=True))
        n = len(data["imgname"])

        # Confident-frame subselection for POCO-labeled data
        # (base_dataset.py:60-71).
        if "var" in data:
            sel = get_confident_frames(
                data["var"], self.options["UNCERT_THRESHOLD"]
            )
            data = {k: v[sel] for k, v in data.items()}
            n = len(data["imgname"])
        if num_images > 0:
            sel = self.rng.randint(0, n, size=num_images)
            data = {k: v[sel] for k, v in data.items()}
            n = num_images

        self.imgname = data["imgname"]
        self.center = data["center"].astype(np.float32)
        self.scale = data["scale"].astype(np.float32)

        if "pose" in data and not ignore_3d:
            self.pose = data["pose"].astype(np.float32)
            self.betas = data["shape"].astype(np.float32)
            self.has_smpl = data.get(
                "has_smpl", np.ones(n, np.float32)
            ).astype(np.float32)
        else:
            self.pose = np.zeros((n, 72), np.float32)
            self.betas = np.zeros((n, 10), np.float32)
            self.has_smpl = np.zeros(n, np.float32)

        if "S" in data and not ignore_3d:
            self.pose_3d = data["S"].astype(np.float32)
            self.has_pose_3d = 1.0
        else:
            self.pose_3d = np.zeros((n, 24, 4), np.float32)
            self.has_pose_3d = 0.0

        kp_gt = data.get("part", np.zeros((n, 24, 3))).astype(np.float32)
        kp_op = data.get("openpose", np.zeros((n, 25, 3))).astype(np.float32)
        self.keypoints = np.concatenate([kp_op, kp_gt], axis=1)

        gender = data.get("gender")
        if gender is not None:
            # m -> male, f -> female (the reference's two values,
            # base_dataset.py:101-104); anything else (e.g. the
            # synthetic sets' "n") -> -1 = neutral GT, NOT female.
            self.gender = np.array(
                [
                    0 if str(g) == "m" else (1 if str(g) == "f" else -1)
                    for g in gender
                ],
                np.int32,
            )
        else:
            self.gender = -1 * np.ones(n, np.int32)
        self.person_id = data.get("person_id", -1 * np.ones(n, np.int32))

    def __len__(self) -> int:
        return len(self.imgname)

    def _load_image(self, index: int) -> np.ndarray:
        path = os.path.join(self.img_dir, str(self.imgname[index]))
        # Native fast path: threaded C++ JPEG/PNG decode
        # (poco_tpu/runtime/loader.py). Same default and opt-out
        # (POCO_TPU_NATIVE_LOADER=0) as the whole-batch path.
        if os.environ.get("POCO_TPU_NATIVE_LOADER", "1") != "0":
            from ..runtime import loader as native_loader

            if path.lower().endswith(native_loader.native_exts()):
                try:
                    return native_loader.decode_image(path).astype(np.float32)
                except (ValueError, OSError):
                    # unsupported content, oversize, or EXIF-rotated file:
                    # fall through to cv2 (which applies EXIF)
                    pass
        img = cv2.imread(path)
        if img is None:
            # Transient-FS retry (reference base_dataset.py:276-283 sleeps
            # 500-1000s for NFS hiccups; bounded here). Sleep duration
            # comes from the occlusion stream, NOT self.rng: a flaky read
            # must not desynchronize the augmentation draws that keep the
            # per-item and whole-batch paths in lockstep.
            import time

            time.sleep(self.occ_rng.uniform(0.5, 1.0))
            img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        return img[:, :, ::-1].astype(np.float32)

    def _sample_aug(self):
        if self.is_train and self.use_augmentation:
            return sample_augment_params(
                self.rng,
                noise_factor=self.options["NOISE_FACTOR"],
                rot_factor=self.options["ROT_FACTOR"],
                scale_factor=self.options["SCALE_FACTOR"],
                use_flip=self.options["FLIP"],
            )
        # Eval-time fixed augmentation for robustness studies
        # (TESTING.TEST_ROT / TEST_SCALE; the reference's
        # TestAugDataset is missing as shipped — SURVEY §2.1).
        return AugmentParams(
            rot=float(self.options.get("TEST_ROT", 0.0)),
            scale=float(self.options.get("TEST_SCALE", 1.0)),
        )

    def _finish_item(
        self, index: int, aug, crop: np.ndarray, orig_shape: np.ndarray
    ) -> dict[str, Any]:
        """Assemble the non-image fields for one sample (shared between
        the per-item path and the native whole-batch path)."""
        center = self.center[index].copy()
        scale = float(self.scale[index])
        keypoints = self.keypoints[index].copy()

        kp2d = process_keypoints_2d(
            keypoints, center, scale, aug, self.options["IMG_RES"]
        )
        bbox = np.array([[center[0], center[1], aug.scale * scale * 200.0]])
        kp_fullimg = convert_crop_coords_to_orig_img(
            bbox, kp2d[None].copy(), self.options["IMG_RES"]
        )[0]

        if (
            self.occluders is not None
            and self.is_train
            and self.options.get("USE_SYNTHETIC_OCCLUSION")
        ):
            occ_ds = str(self.options.get("OCC_AUG_DATASET", "pascal"))
            if occ_ds == "coco":
                # COCO-statistics occlusion (reference occlusion.py:178-245);
                # occluders is the stats dict from load_coco_occluders.
                from .occlusion import occlude_with_coco_objects

                crop = occlude_with_coco_objects(
                    crop, kp2d, self.occluders, self.occ_rng,
                    img_size=self.options["IMG_RES"],
                )
            elif occ_ds == "pascal_random":
                # Non-keypoint paste (occlude_with_pascal_objects,
                # occlusion.py:152-176).
                from .occlusion import occlude_with_objects

                crop = occlude_with_objects(crop, self.occluders, self.occ_rng)
            else:
                from .occlusion import occlude_with_objects_kp

                crop = occlude_with_objects_kp(
                    crop, kp2d, scale, self.occluders, self.occ_rng
                )

        return {
            "img": crop,  # (R, R, 3) float32 [0,255]; normalize on device
            "pose": process_pose(self.pose[index], aug),
            "betas": self.betas[index].copy(),
            "pose_3d": process_keypoints_3d(self.pose_3d[index], aug),
            "keypoints": kp2d,
            "keypoints_fullimg": kp_fullimg,
            "has_smpl": np.float32(self.has_smpl[index]),
            "has_pose_3d": np.float32(self.has_pose_3d),
            "scale": np.float32(aug.scale * scale),
            "center": center.astype(np.float32),
            "orig_shape": orig_shape,
            "focal_length": np.float32(
                np.sqrt(orig_shape[0] ** 2 + orig_shape[1] ** 2)
            ),
            "bbox_info": calculate_bbox_info_np(
                center, aug.scale * scale, orig_shape
            ),
            "is_flipped": np.float32(aug.flip),
            "rot_angle": np.float32(aug.rot),
            "gender": np.int32(self.gender[index]),
            "sample_index": np.int32(index),
            "dataset_name": self.dataset_name,
            "imgname": str(self.imgname[index]),
        }

    def _item_cv2(self, index: int, aug) -> dict[str, Any]:
        img = self._load_image(index)
        orig_shape = np.array(img.shape[:2], np.float32)
        center = self.center[index]
        scale = float(self.scale[index])
        crop = process_image(
            img, center, aug.scale * scale, aug, self.options["IMG_RES"]
        )
        return self._finish_item(index, aug, crop, orig_shape)

    def __getitem__(self, index: int) -> dict[str, Any]:
        return self._item_cv2(index, self._sample_aug())

    def _native_batch_enabled(self) -> bool:
        if os.environ.get("POCO_TPU_NATIVE_LOADER", "1") == "0":
            return False
        from ..runtime import loader as native_loader

        return native_loader.native_available()

    def get_batch(self, indices, keep=None) -> dict[str, np.ndarray]:
        """Whole-batch fast path: threaded C++ decode + affine warp.

        Default when the native library builds and it handles every
        image's format (JPEG always; PNG when libpng was present);
        falls back to the per-item cv2 path otherwise (or per item on a
        decode failure). Augmentation parameters are drawn from the same
        RNG in the same order as the per-item path, and the warp matrix
        is built with the identical cv2-convention math
        (transforms.affine_output_to_source), so both paths produce the
        same samples.

        keep: optional positions (slice or index list) of the rows to
        materialize. Per-row randomness (the augmentation draws) is
        consumed for EVERY index first, so a sharded multi-process
        loader that passes the GLOBAL batch indices with
        keep=slice(lo, hi) reproduces exactly the rows a
        single-process run assigns to that shard — instead of each
        process consuming an identical RNG stream on different rows
        (correlated augmentation across shards). When keep is given
        the result carries '_global_row_names' (dataset_name per
        GLOBAL row) for batch-composition policies that must be
        decided globally (trainer GT-pose conditioning).
        """
        indices = [int(i) for i in indices]
        augs = [self._sample_aug() for _ in indices]
        gnames = None
        if keep is not None:
            gnames = [self.dataset_name] * len(indices)
            sel = (
                list(range(len(indices)))[keep]
                if isinstance(keep, slice)
                else [int(k) for k in keep]
            )
            indices = [indices[k] for k in sel]
            augs = [augs[k] for k in sel]
            if not indices:  # RNG consumed; nothing to materialize
                return {"_global_row_names": gnames}
        batch = self._materialize_batch(indices, augs)
        if gnames is not None:
            batch["_global_row_names"] = gnames
        return batch

    def _materialize_batch(
        self, indices: list[int], augs: list
    ) -> dict[str, np.ndarray]:
        from .transforms import affine_output_to_source

        paths = [
            os.path.join(self.img_dir, str(self.imgname[i])) for i in indices
        ]
        if not self._native_batch_enabled():
            return collate(
                [self._item_cv2(i, a) for i, a in zip(indices, augs)]
            )
        from ..runtime import loader as _nl

        if not all(p.lower().endswith(_nl.native_exts()) for p in paths):
            return collate(
                [self._item_cv2(i, a) for i, a in zip(indices, augs)]
            )

        from ..runtime import loader as native_loader

        res = self.options["IMG_RES"]
        affines = np.stack(
            [
                affine_output_to_source(
                    self.center[i],
                    a.scale * float(self.scale[i]) * 200.0,
                    res, a.rot, a.flip,
                )
                for i, a in zip(indices, augs)
            ]
        )
        gains = np.stack([a.pixel_noise for a in augs])
        crops, statuses, dims = native_loader.batch_decode_affine(
            paths, affines, gains, res
        )
        items = []
        for k, (i, a) in enumerate(zip(indices, augs)):
            if statuses[k] != 0:
                items.append(self._item_cv2(i, a))  # same aug, cv2 retry
            else:
                items.append(
                    self._finish_item(
                        i, a, crops[k], dims[k].astype(np.float32)
                    )
                )
        return collate(items)


def collate(items: list[dict[str, Any]]) -> dict[str, np.ndarray]:
    """Stack item dicts into a numpy batch (strings become lists)."""
    batch: dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], str):
            batch[key] = vals
        else:
            batch[key] = np.stack(vals)
    return batch


class ResumableSampler:
    """Mid-epoch-resumable shuffled index sampler.

    Stores the epoch permutation and a cursor so a checkpointed run can
    continue from the exact batch it stopped at (reference
    pocolib/utils/dataloader.py:7-64, CheckpointDataLoader samplers).

    NOT wired into the product Trainer/DataLoader — deliberately, for
    parity: the reference's CheckpointDataLoader is equally unused by
    its training loop (SURVEY §2.3 "vestigial"), and the Trainer resumes
    at epoch granularity (DataLoader(seed=epoch) is deterministic).
    Kept as a tested utility for users who shard/restart manually.
    """

    def __init__(self, n: int, shuffle: bool = True, seed: int = 0):
        self.n = n
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.cursor = 0
        self._perm = self._make_perm()

    def _make_perm(self) -> np.ndarray:
        rng = np.random.RandomState(self.seed + self.epoch)
        order = np.arange(self.n)
        if self.shuffle:
            rng.shuffle(order)
        return order

    def state_dict(self) -> dict:
        return {
            "epoch": self.epoch, "cursor": self.cursor,
            "seed": self.seed, "perm": self._perm.tolist(),
        }

    def load_state_dict(self, state: dict) -> None:
        self.epoch = state["epoch"]
        self.cursor = state["cursor"]
        self.seed = state["seed"]
        self._perm = np.asarray(state["perm"])

    def next_epoch(self) -> None:
        self.epoch += 1
        self.cursor = 0
        self._perm = self._make_perm()

    def take(self, k: int) -> np.ndarray:
        idx = self._perm[self.cursor : self.cursor + k]
        self.cursor += len(idx)
        return idx

    @property
    def remaining(self) -> int:
        return self.n - self.cursor


class DataLoader:
    """Minimal single-host loader with background-thread prefetch.

    Multi-process sharding: with `num_shards`/`shard_index` set (one
    shard per JAX process), every process draws the SAME global batch
    order (same seed) and yields only its contiguous row slice of each
    global batch — the rows its local devices own once the trainer
    assembles the global sharded array. `batch_size` stays the GLOBAL
    batch size, so step count and batch composition are identical to a
    single-process run.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        prefetch: int = 2,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        if batch_size % num_shards:
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"{num_shards} loader shards"
            )
        if num_shards > 1 and not drop_last:
            raise ValueError(
                "sharded loading requires drop_last=True (a short final "
                "batch cannot be split evenly across processes)"
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.rng = np.random.RandomState(seed)
        self.num_shards = num_shards
        self.shard_index = shard_index

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        n_batches = len(self)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)

        # Whole-batch fast path (native threaded decode+warp) when the
        # dataset provides it; per-item otherwise.
        get_batch = getattr(self.dataset, "get_batch", None)
        supports_keep = False
        if get_batch is not None:
            import inspect

            supports_keep = "keep" in inspect.signature(get_batch).parameters
        if self.num_shards > 1 and not supports_keep:
            # Fallback shard-by-slicing: every process consumes an
            # IDENTICAL augmentation RNG stream on different rows, so
            # augmentations are correlated across shards and the run is
            # not augmentation-equivalent to single-process semantics
            # (and '_global_row_names' policies like GT_POSE_COND are
            # unavailable). Custom datasets get exactness by providing
            # get_batch(idxs, keep=...).
            if not getattr(type(self), "_warned_keepless_shard", False):
                type(self)._warned_keepless_shard = True
                import warnings

                warnings.warn(
                    f"{type(self.dataset).__name__} has no "
                    "get_batch(..., keep=...): sharded loading falls "
                    "back to index slicing with a shared augmentation "
                    "RNG stream — augmentations will be correlated "
                    "across processes and differ from a single-process "
                    "run", stacklevel=2,
                )

        lo = self.shard_index * (self.batch_size // self.num_shards)
        hi = lo + self.batch_size // self.num_shards

        def producer():
            try:
                for b in range(n_batches):
                    idxs = order[b * self.batch_size : (b + 1) * self.batch_size]
                    if self.num_shards > 1 and supports_keep:
                        # Global indices + local keep window: the dataset
                        # consumes per-row randomness for the WHOLE
                        # global batch (identical on every process) and
                        # materializes only this shard's rows — exact
                        # single-process batch semantics, de-correlated
                        # shards, and '_global_row_names' for global
                        # batch-composition policies.
                        q.put(get_batch(idxs, keep=slice(lo, hi)))
                        continue
                    if self.num_shards > 1:
                        idxs = idxs[lo:hi]
                    if get_batch is not None:
                        q.put(get_batch(idxs))
                    else:
                        q.put(collate([self.dataset[int(i)] for i in idxs]))
            except Exception as e:  # surface loader errors to the consumer
                q.put(e)
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                raise item
            yield item
