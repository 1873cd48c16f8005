"""Native C++ loader tests: JPEG decode + crop parity with cv2."""

import cv2
import numpy as np
import pytest

from poco_tpu.runtime import loader

pytestmark = pytest.mark.skipif(
    not loader.native_available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def jpeg_file(tmp_path_factory):
    root = tmp_path_factory.mktemp("jpg")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (120, 160, 3), dtype=np.uint8)
    # Smooth it so jpeg compression error stays small.
    img = cv2.GaussianBlur(img, (11, 11), 5)
    path = str(root / "test.jpg")
    cv2.imwrite(path, img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
    return path


class TestDecode:
    def test_decode_matches_cv2(self, jpeg_file):
        ours = loader.decode_jpeg(jpeg_file)
        ref = cv2.imread(jpeg_file)[:, :, ::-1]
        assert ours.shape == ref.shape
        # Different IDCT implementations: allow small per-pixel diffs.
        assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 2.0

    def test_decode_bytes(self, jpeg_file):
        with open(jpeg_file, "rb") as f:
            data = f.read()
        out = loader.decode_jpeg(data)
        assert out.shape == (120, 160, 3)

    def test_invalid_data_raises(self):
        with pytest.raises(ValueError):
            loader.decode_jpeg(b"not a jpeg")


class TestCrop:
    def test_crop_matches_python_reference(self, jpeg_file):
        from poco_tpu.data.transforms import crop_image

        img = loader.decode_jpeg(jpeg_file)
        center, bbox, res = (80.0, 60.0), 64.0, 32
        ours = loader.affine_crop(img, center, bbox, res)
        ref = crop_image(
            img.astype(np.float32), np.asarray(center), bbox / 200.0, res
        )
        np.testing.assert_allclose(
            ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=1.0
        )

    def test_out_of_bounds_zero(self, jpeg_file):
        img = loader.decode_jpeg(jpeg_file)
        out = loader.affine_crop(img, (0.0, 0.0), 80.0, 16)
        assert out[0, 0].sum() == 0.0


class TestBatch:
    def test_batch_decode_crop(self, jpeg_file):
        paths = [jpeg_file] * 6
        centers = np.tile([80.0, 60.0], (6, 1))
        sizes = np.full(6, 64.0)
        crops, statuses = loader.batch_decode_crop(
            paths, centers, sizes, out_res=32, num_threads=2
        )
        assert crops.shape == (6, 32, 32, 3)
        assert (statuses == 0).all()
        # all items identical
        np.testing.assert_allclose(crops[0], crops[5])

    def test_bad_path_status(self, jpeg_file):
        paths = [jpeg_file, "/nonexistent.jpg"]
        crops, statuses = loader.batch_decode_crop(
            paths, np.tile([80.0, 60.0], (2, 1)), np.full(2, 64.0), 32
        )
        assert statuses[0] == 0 and statuses[1] != 0
