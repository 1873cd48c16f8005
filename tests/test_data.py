"""Data pipeline tests: npz dataset, transforms, mixing, occlusion."""

import os

import cv2
import numpy as np
import pytest

from poco_tpu.data.dataset import (
    DataLoader,
    PocoDataset,
    collate,
    get_confident_frames,
)
from poco_tpu.data.mixed import (
    RatioMixedDataset,
    parse_datasets_and_ratios,
    parse_stage_datasets,
    spin_mixed_partition,
    stage_for_epoch,
)
from poco_tpu.data.occlusion import (
    occlude_with_objects_kp,
    paste_over,
    synthetic_occluders,
)
from poco_tpu.data.transforms import (
    AugmentParams,
    flip_keypoints,
    flip_pose,
    process_keypoints_2d,
    process_pose,
    rotate_axis_angle,
)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """A 6-image synthetic dataset with the reference npz schema."""
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.RandomState(0)
    n = 6
    names = []
    for i in range(n):
        img = rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)
        name = f"img_{i}.jpg"
        cv2.imwrite(str(root / name), img)
        names.append(name)
    npz = root / "ann.npz"
    np.savez(
        npz,
        imgname=np.array(names),
        center=np.tile([64.0, 48.0], (n, 1)),
        scale=np.full(n, 0.4),
        pose=rng.uniform(-0.3, 0.3, (n, 72)),
        shape=rng.uniform(-1, 1, (n, 10)),
        S=rng.randn(n, 24, 4).astype(np.float32),
        part=rng.rand(n, 24, 3).astype(np.float32) * 90,
        openpose=np.zeros((n, 25, 3), np.float32),
        gender=np.array(["m", "f", "m", "f", "m", "f"]),
        has_smpl=np.ones(n),
    )
    return str(npz), str(root)


class TestPocoDataset:
    def test_item_schema(self, tiny_dataset):
        npz, root = tiny_dataset
        ds = PocoDataset(npz, img_dir=root, is_train=True)
        assert len(ds) == 6
        item = ds[0]
        assert item["img"].shape == (224, 224, 3)
        assert item["pose"].shape == (72,)
        assert item["betas"].shape == (10,)
        assert item["pose_3d"].shape == (24, 4)
        assert item["keypoints"].shape == (49, 3)
        assert item["keypoints_fullimg"].shape == (49, 3)
        assert item["bbox_info"].shape == (3,)
        assert item["has_smpl"] == 1.0
        assert 0 <= item["img"].min() and item["img"].max() <= 255.0

    def test_gender_mapping(self, tiny_dataset):
        """m -> 0, f -> 1, anything else (synthetic 'n') -> -1 neutral —
        the eval runner treats -1 as neutral GT; 'n' must NOT map to
        female (regression: gendered-GT selection on synthetic sets)."""
        npz, root = tiny_dataset
        ds = PocoDataset(npz, img_dir=root, is_train=False)
        np.testing.assert_array_equal(ds.gender, [0, 1, 0, 1, 0, 1])
        import numpy as _np

        d = dict(_np.load(npz, allow_pickle=True))
        d["gender"] = _np.array(["n"] * 6)
        alt = npz.replace("ann.npz", "ann_n.npz")
        _np.savez(alt, **d)
        ds_n = PocoDataset(alt, img_dir=root, is_train=False)
        np.testing.assert_array_equal(ds_n.gender, [-1] * 6)

    def test_eval_mode_no_augmentation(self, tiny_dataset):
        npz, root = tiny_dataset
        ds = PocoDataset(npz, img_dir=root, is_train=False)
        a = ds[1]
        b = ds[1]
        np.testing.assert_array_equal(a["img"], b["img"])
        assert a["is_flipped"] == 0.0
        assert a["rot_angle"] == 0.0

    def test_collate_and_loader(self, tiny_dataset):
        npz, root = tiny_dataset
        ds = PocoDataset(npz, img_dir=root, is_train=False)
        loader = DataLoader(ds, batch_size=3, shuffle=True, seed=1)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["img"].shape == (3, 224, 224, 3)
        assert batches[0]["pose"].shape == (3, 72)
        assert isinstance(batches[0]["dataset_name"], list)

    def test_confident_frames(self):
        var = np.zeros((10, 24), np.float32)
        var[:, 0] = np.linspace(0, 1, 10)
        sel = get_confident_frames(var, threshold=0.35)
        assert list(sel) == [0, 1, 2, 3]

    def test_ignore_3d(self, tiny_dataset):
        npz, root = tiny_dataset
        ds = PocoDataset(npz, img_dir=root, is_train=True, ignore_3d=True)
        item = ds[0]
        assert item["has_smpl"] == 0.0
        assert item["has_pose_3d"] == 0.0


class TestTransforms:
    def test_flip_keypoints_swaps_left_right(self):
        kp = np.zeros((24, 3), np.float32)
        kp[2] = [0.5, 0.1, 1.0]   # Right Hip (J24 idx 2)
        flipped = flip_keypoints(kp.copy())
        # J24_FLIP_PERM maps idx 3 (Left Hip) <- idx 2, x negated
        np.testing.assert_allclose(flipped[3], [-0.5, 0.1, 1.0])

    def test_flip_pose_identity_twice(self):
        rng = np.random.RandomState(0)
        pose = rng.randn(72).astype(np.float32)
        np.testing.assert_allclose(
            flip_pose(flip_pose(pose.copy())), pose, atol=1e-6
        )

    def test_rotate_axis_angle_matches_rotmat(self):
        aa = np.array([0.3, -0.2, 0.5])
        out = rotate_axis_angle(aa, 40.0)
        r_in, _ = cv2.Rodrigues(aa)
        rad = np.deg2rad(-40.0)
        rz = np.array(
            [[np.cos(rad), -np.sin(rad), 0],
             [np.sin(rad), np.cos(rad), 0], [0, 0, 1]]
        )
        r_out, _ = cv2.Rodrigues(out.astype(np.float64))
        np.testing.assert_allclose(r_out, rz @ r_in, atol=1e-6)

    def test_j2d_processing_normalized_range(self):
        rng = np.random.RandomState(1)
        kp = np.concatenate(
            [rng.rand(49, 2) * 200, np.ones((49, 1))], axis=1
        ).astype(np.float32)
        out = process_keypoints_2d(
            kp, np.array([100.0, 100.0]), 1.0, AugmentParams()
        )
        assert out.shape == (49, 3)
        # center point maps to crop center -> 0 in normalized coords
        mid = process_keypoints_2d(
            np.array([[100.0, 100.0, 1.0]]),
            np.array([100.0, 100.0]), 1.0, AugmentParams(),
        )
        np.testing.assert_allclose(mid[0, :2], [0.0, 0.0], atol=0.02)

    def test_process_pose_flip_only_perm(self):
        pose = np.zeros(72, np.float32)
        pose[3 * 1] = 1.0  # left hip x-rotation
        out = process_pose(pose, AugmentParams(flip=True))
        assert out[3 * 2] == 1.0  # moved to right hip


class TestMixed:
    def test_parse_ratios(self):
        names, ratios = parse_datasets_and_ratios("h36m_coco_0.6_0.4")
        assert names == ["h36m", "coco"]
        assert ratios == [0.6, 0.4]

    def test_stage_parsing(self):
        stages = parse_stage_datasets("0+h36m_1.0,10+h36m_coco_0.5_0.5")
        assert stages == {0: "h36m_1.0", 10: "h36m_coco_0.5_0.5"}
        assert stage_for_epoch(stages, 5) == "h36m_1.0"
        assert stage_for_epoch(stages, 10) == "h36m_coco_0.5_0.5"
        assert stage_for_epoch(stages, 50) == "h36m_coco_0.5_0.5"

    def test_ratio_sampling(self):
        class Stub:
            def __init__(self, tag, n):
                self.tag, self.n = tag, n

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                return self.tag

        ds = RatioMixedDataset([Stub("a", 10), Stub("b", 20)], [0.8, 0.2], seed=0)
        assert len(ds) == 20
        draws = [ds[i] for i in range(500)]
        frac_a = draws.count("a") / len(draws)
        assert 0.7 < frac_a < 0.9

    def test_spin_partition_sums_to_one(self):
        part = spin_mixed_partition([100, 10, 20, 30, 40, 50])
        np.testing.assert_allclose(sum(part), 1.0, atol=1e-9)


class TestShardedKeep:
    """get_batch(global, keep=shard) — the multi-process loader contract:
    per-row randomness is consumed for the WHOLE global batch, so
    sharded loading reproduces single-process rows exactly (and shards
    don't draw correlated augmentations from identical RNG states)."""

    def _mk(self, tiny_dataset, seed=5):
        npz, root = tiny_dataset
        return PocoDataset(
            npz, img_dir=root, dataset_name="tiny", is_train=True,
            use_augmentation=True, options={"IMG_RES": 64}, seed=seed,
        )

    def test_keep_matches_full_batch_rows(self, tiny_dataset):
        idx = [0, 1, 2, 3, 4, 5]
        full = self._mk(tiny_dataset).get_batch(idx)
        lo = self._mk(tiny_dataset).get_batch(idx, keep=slice(0, 3))
        hi = self._mk(tiny_dataset).get_batch(idx, keep=slice(3, 6))
        assert lo["_global_row_names"] == ["tiny"] * 6
        assert hi["_global_row_names"] == ["tiny"] * 6
        for k in ("img", "pose", "keypoints", "is_flipped", "rot_angle"):
            np.testing.assert_array_equal(
                np.concatenate([lo[k], hi[k]]), full[k], err_msg=k
            )
        assert lo["imgname"] + hi["imgname"] == full["imgname"]

    def test_keep_empty_consumes_rng(self, tiny_dataset):
        """A shard with no kept rows still advances the RNG stream."""
        ds = self._mk(tiny_dataset)
        out = ds.get_batch([0, 1, 2], keep=[])
        assert list(out) == ["_global_row_names"]
        # next draw must match a fresh dataset that materialized them
        nxt = ds.get_batch([3], keep=[0])
        ref_ds = self._mk(tiny_dataset)
        ref_ds.get_batch([0, 1, 2])
        ref = ref_ds.get_batch([3])
        np.testing.assert_array_equal(nxt["img"], ref["img"])

    def test_sharded_loader_matches_single(self, tiny_dataset):
        """DataLoader shards reassemble to the single-process batch,
        augmentation ON."""
        single = next(iter(DataLoader(
            self._mk(tiny_dataset, seed=9), 6, shuffle=True, seed=11,
        )))
        shards = [
            next(iter(DataLoader(
                self._mk(tiny_dataset, seed=9), 6, shuffle=True, seed=11,
                num_shards=2, shard_index=i,
            )))
            for i in range(2)
        ]
        assert shards[0]["_global_row_names"] == ["tiny"] * 6
        for k in ("img", "pose", "is_flipped"):
            np.testing.assert_array_equal(
                np.concatenate([s[k] for s in shards]), single[k],
                err_msg=k,
            )

    def test_mixed_keep_global_picks(self):
        """Dataset picks are drawn over the GLOBAL batch: two shard
        'processes' (separate instances, same seed) agree on the global
        composition, which equals the unsharded one."""

        class _Stub:
            def __init__(self, tag, n):
                self.dataset_name, self.n = tag, n

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                return {"x": np.float32(i), "tag": self.dataset_name}

        def mk():
            return RatioMixedDataset(
                [_Stub("a", 5), _Stub("b", 3)], [0.5, 0.5], seed=3
            )

        idx = [0, 1, 2, 3, 6, 7]
        full = mk().get_batch(idx)
        sh0 = mk().get_batch(idx, keep=slice(0, 3))
        sh1 = mk().get_batch(idx, keep=slice(3, 6))
        assert sh0["_global_row_names"] == sh1["_global_row_names"]
        assert sh0["_global_row_names"] == list(full["tag"])
        assert list(sh0["tag"]) + list(sh1["tag"]) == list(full["tag"])
        assert list(sh0["x"]) + list(sh1["x"]) == list(full["x"])

    def test_mixed_forwards_keep_to_members(self):
        """A member supporting keep= gets its FULL global share plus the
        kept ranks, so its per-row RNG stream is consumed globally."""
        calls = []

        class _Fast:
            dataset_name = "f"

            def __len__(self):
                return 10

            def get_batch(self, local, keep=None):
                calls.append((list(local), keep))
                kept = (
                    list(range(len(local)))[keep]
                    if isinstance(keep, slice)
                    else [int(k) for k in (keep if keep is not None
                                           else range(len(local)))]
                )
                out = collate([{"x": np.float32(local[k])} for k in kept])
                if keep is not None:
                    out["_global_row_names"] = ["f"] * len(local)
                return out

        ds = RatioMixedDataset([_Fast()], [1.0], seed=0)
        batch = ds.get_batch([4, 5, 6, 7], keep=slice(1, 3))
        assert calls == [([4, 5, 6, 7], [1, 2])]
        assert list(batch["x"]) == [5.0, 6.0]
        assert batch["_global_row_names"] == ["f"] * 4


class TestOcclusion:
    def test_paste_over_blends(self):
        dst = np.zeros((20, 20, 3), np.float32)
        src = np.zeros((6, 6, 4), np.uint8)
        src[..., 0] = 200
        src[..., 3] = 255
        paste_over(src, dst, (10, 10))
        assert dst[10, 10, 0] == 200.0
        assert dst[0, 0, 0] == 0.0

    def test_paste_partial_out_of_bounds(self):
        dst = np.zeros((20, 20, 3), np.float32)
        src = np.full((8, 8, 4), 255, np.uint8)
        paste_over(src, dst, (0, 0))  # mostly off-image
        assert dst[0, 0, 0] == 255.0

    def test_occlude_with_keypoints(self):
        rng = np.random.RandomState(0)
        img = np.full((224, 224, 3), 100.0, np.float32)
        kp = np.zeros((49, 3), np.float32)
        kp[30] = [0.0, 0.0, 1.0]  # visible GT joint at crop center
        occluders = synthetic_occluders(4, seed=1)
        out = occlude_with_objects_kp(img, kp, 1.0, occluders, rng)
        assert out.shape == img.shape
        assert not np.allclose(out, img)  # something was pasted

    def test_occlude_random_position(self):
        """Non-keypoint paste variant (reference occlusion.py:152-176)."""
        from poco_tpu.data.occlusion import occlude_with_objects

        rng = np.random.RandomState(0)
        img = np.full((224, 224, 3), 100.0, np.float32)
        out = occlude_with_objects(img, synthetic_occluders(4, seed=1), rng)
        assert out.shape == img.shape
        assert not np.allclose(out, img)

    def test_occlude_with_coco_stats(self):
        """COCO-statistics variant (reference occlusion.py:178-245):
        joint picked by occlusion frequency, occluder by class stats."""
        from poco_tpu.data.occlusion import (
            occlude_with_coco_objects,
            synthetic_coco_occluders,
        )

        rng = np.random.RandomState(1)
        img = np.full((224, 224, 3), 100.0, np.float32)
        kp = np.zeros((49, 3), np.float32)
        kp[25:, 2] = 1.0  # all GT joints visible, at crop center
        occ = synthetic_coco_occluders(n=8, seed=2)
        changed = False
        for seed in range(5):  # count can draw 0; try a few seeds
            out = occlude_with_coco_objects(
                img, kp, occ, np.random.RandomState(seed)
            )
            assert out.shape == img.shape
            changed = changed or not np.allclose(out, img)
        assert changed

    def test_coco_occluders_roundtrip(self, tmp_path):
        """load_coco_occluders reads the reference pkl contract."""
        import joblib

        from poco_tpu.data.occlusion import (
            load_coco_occluders,
            synthetic_coco_occluders,
        )

        occ = synthetic_coco_occluders(n=4, seed=0)
        occ.pop("joint_occ_freq")
        p = tmp_path / "coco_occluders.pkl"
        joblib.dump(occ, p)
        loaded = load_coco_occluders(str(p))
        assert "joint_occ_freq" in loaded
        np.testing.assert_allclose(loaded["joint_occ_freq"].sum(), 1.0)


class TestEvalTimeAugmentation:
    def test_test_rot_scale_applied(self, tiny_dataset):
        npz, root = tiny_dataset
        base = PocoDataset(npz, img_dir=root, is_train=False)
        rot = PocoDataset(
            npz, img_dir=root, is_train=False,
            options={"TEST_ROT": 30.0, "TEST_SCALE": 1.2},
        )
        a, b = base[0], rot[0]
        assert not np.allclose(a["img"], b["img"])
        assert b["rot_angle"] == 30.0
        np.testing.assert_allclose(b["scale"], a["scale"] * 1.2, rtol=1e-5)


class TestMixedBatchPath:
    def test_get_batch_matches_per_item(self, tmp_path):
        """RatioMixedDataset.get_batch reproduces the per-item path
        (same seed): identical dataset picks and identical samples."""
        from poco_tpu.data.mixed import RatioMixedDataset

        class _Stub:
            def __init__(self, tag, n):
                self.tag, self.n = tag, n

            def __len__(self):
                return self.n

            def __getitem__(self, i):
                return {"x": np.float32(i), "tag": f"{self.tag}"}

        a = RatioMixedDataset([_Stub("a", 5), _Stub("b", 3)], [0.5, 0.5], seed=3)
        b = RatioMixedDataset([_Stub("a", 5), _Stub("b", 3)], [0.5, 0.5], seed=3)
        idx = [0, 1, 2, 3, 6, 7]
        batch = a.get_batch(idx)
        items = [b[i] for i in idx]
        assert list(batch["x"]) == [it["x"] for it in items]
        assert list(batch["tag"]) == [it["tag"] for it in items]

    def test_get_batch_uses_member_fast_path(self):
        from poco_tpu.data.mixed import RatioMixedDataset

        calls = []

        class _Fast:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                raise AssertionError("per-item path should not be used")

            def get_batch(self, local):
                calls.append(list(local))
                from poco_tpu.data.dataset import collate

                return collate(
                    [{"x": np.float32(i)} for i in local]
                )

        ds = RatioMixedDataset([_Fast()], [1.0], seed=0)
        batch = ds.get_batch([0, 1, 5])
        assert calls == [[0, 1, 1]]
        assert list(batch["x"]) == [0.0, 1.0, 1.0]
