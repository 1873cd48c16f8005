"""Device preprocessing tests: crop parity vs cv2, bbox_info formulas."""

import cv2
import jax.numpy as jnp
import numpy as np

from poco_tpu.ops.preprocess import (
    calculate_bbox_info,
    calculate_focal_length,
    crop_and_resize,
    normalize_image,
    preprocess_crops,
)


def _cv2_crop(img, cx, cy, bb, res, rot=0.0):
    """Reference host crop (mirrors vibe_image_utils.py:58-107)."""

    def rotate_2d(pt, rad):
        sn, cs = np.sin(rad), np.cos(rad)
        return np.array([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs])

    rot_rad = np.pi * rot / 180
    src_down = rotate_2d(np.array([0, bb * 0.5]), rot_rad)
    src_right = rotate_2d(np.array([bb * 0.5, 0]), rot_rad)
    src = np.stack(
        [[cx, cy], [cx, cy] + src_down, [cx, cy] + src_right]
    ).astype(np.float32)
    dst = np.array(
        [[res / 2, res / 2], [res / 2, res], [res, res / 2]], np.float32
    )
    trans = cv2.getAffineTransform(src, dst)
    return cv2.warpAffine(
        img, trans, (res, res), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT,
    )


class TestCrop:
    def test_matches_cv2_interior(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (120, 160, 3)).astype(np.float32)
        cx, cy, bb, res = 80.0, 60.0, 64.0, 32
        ref = _cv2_crop(img, cx, cy, bb, res)
        ours = np.asarray(
            crop_and_resize(
                jnp.asarray(img),
                jnp.asarray([[cx, cy]]),
                jnp.asarray([bb]),
                out_res=res,
            )
        )[0]
        # Interior pixels should match cv2 bilinear closely.
        np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=1.0)

    def test_matches_cv2_with_rotation(self):
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (100, 100, 3)).astype(np.float32)
        cx, cy, bb, res, rot = 50.0, 50.0, 60.0, 32, 30.0
        ref = _cv2_crop(img, cx, cy, bb, res, rot)
        ours = np.asarray(
            crop_and_resize(
                jnp.asarray(img),
                jnp.asarray([[cx, cy]]),
                jnp.asarray([bb]),
                rot_deg=jnp.asarray([rot]),
                out_res=res,
            )
        )[0]
        diff = np.abs(ours[4:-4, 4:-4] - ref[4:-4, 4:-4])
        assert np.median(diff) < 1.0

    def test_out_of_bounds_zero_padded(self):
        img = jnp.ones((50, 50, 3)) * 200.0
        out = np.asarray(
            crop_and_resize(
                img, jnp.asarray([[0.0, 0.0]]), jnp.asarray([60.0]), out_res=16
            )
        )[0]
        # Top-left crop hangs off the image: corners must be zero.
        assert out[0, 0].sum() == 0.0
        assert out[-1, -1].sum() > 0.0

    def test_multiple_crops_one_gather(self):
        rng = np.random.RandomState(2)
        img = rng.rand(64, 64, 3).astype(np.float32)
        centers = jnp.asarray([[32.0, 32.0], [16.0, 16.0], [48.0, 48.0]])
        sizes = jnp.asarray([32.0, 20.0, 24.0])
        out = crop_and_resize(jnp.asarray(img), centers, sizes, out_res=16)
        assert out.shape == (3, 16, 16, 3)
        for i in range(3):
            ref = _cv2_crop(
                img, float(centers[i, 0]), float(centers[i, 1]),
                float(sizes[i]), 16,
            )
            np.testing.assert_allclose(
                np.asarray(out[i])[1:-1, 1:-1], ref[1:-1, 1:-1], atol=0.02
            )


class TestNormalize:
    def test_imagenet_stats(self):
        crops = jnp.full((1, 4, 4, 3), 255.0)
        out = np.asarray(normalize_image(crops))
        expected = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.229, 0.224, 0.225]
        )
        np.testing.assert_allclose(out[0, 0, 0], expected, atol=1e-5)


class TestBboxInfo:
    def test_formulas(self):
        """Parity with image_utils.py:171-187."""
        center = jnp.asarray([[300.0, 200.0]])
        scale = jnp.asarray([1.5])
        orig = jnp.asarray([[480.0, 640.0]])
        out = np.asarray(calculate_bbox_info(center, scale, orig))[0]
        focal = np.sqrt(480.0**2 + 640.0**2)
        np.testing.assert_allclose(
            out[0], (300.0 - 320.0) / focal * 2.8, rtol=1e-5
        )
        np.testing.assert_allclose(
            out[1], (200.0 - 240.0) / focal * 2.8, rtol=1e-5
        )
        np.testing.assert_allclose(
            out[2], (300.0 - 0.24 * focal) / (0.06 * focal), rtol=1e-5
        )

    def test_focal_length(self):
        f = float(calculate_focal_length(480.0, 640.0))
        np.testing.assert_allclose(f, 800.0, rtol=1e-6)


class TestFusedPipeline:
    def test_produces_model_batch(self):
        import jax

        rng = np.random.RandomState(3)
        img = rng.randint(0, 255, (240, 320, 3)).astype(np.uint8)
        centers = jnp.asarray([[160.0, 120.0], [100.0, 100.0]])
        scales = jnp.asarray([1.0, 0.8])
        batch = jax.jit(preprocess_crops, static_argnames="out_res")(
            jnp.asarray(img), centers, scales, out_res=224
        )
        assert batch["img"].shape == (2, 224, 224, 3)
        assert batch["bbox_info"].shape == (2, 3)
        assert batch["focal_length"].shape == (2,)
        np.testing.assert_allclose(
            np.asarray(batch["orig_shape"][0]), [240.0, 320.0]
        )
        assert np.all(np.isfinite(np.asarray(batch["img"])))


class TestMxuCrop:
    def test_matches_gather_formulation(self):
        from poco_tpu.ops.preprocess import crop_and_resize_mxu

        rng = np.random.RandomState(5)
        img = rng.randint(0, 255, (96, 128, 3)).astype(np.float32)
        centers = jnp.asarray([[64.0, 48.0], [30.0, 20.0]])
        sizes = jnp.asarray([60.0, 40.0])
        a = np.asarray(
            crop_and_resize(jnp.asarray(img), centers, sizes, out_res=32)
        )
        b = np.asarray(
            crop_and_resize_mxu(jnp.asarray(img), centers, sizes, out_res=32)
        )
        np.testing.assert_allclose(a, b, atol=1e-2)

    def test_zero_padding_out_of_bounds(self):
        from poco_tpu.ops.preprocess import crop_and_resize_mxu

        img = jnp.ones((50, 50, 3)) * 100.0
        out = np.asarray(
            crop_and_resize_mxu(
                img, jnp.asarray([[0.0, 0.0]]), jnp.asarray([60.0]),
                out_res=16,
            )
        )[0]
        assert out[0, 0].sum() == 0.0
        assert out[-1, -1].sum() > 0.0
