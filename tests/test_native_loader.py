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


class TestBatchAffine:
    def test_affine_matches_cv2_process_image(self, jpeg_file):
        """Rotation + flip + channel noise via the native whole-batch
        warp must match the per-item cv2 path (process_image)."""
        from poco_tpu.data.transforms import (
            AugmentParams,
            affine_output_to_source,
            process_image,
        )

        img = loader.decode_jpeg(jpeg_file)
        center, scale, res = np.array([80.0, 60.0]), 0.4, 32
        cases = [
            AugmentParams(),
            AugmentParams(rot=25.0),
            AugmentParams(flip=True),
            AugmentParams(
                rot=-40.0, flip=True, scale=1.2,
                pixel_noise=np.array([0.7, 1.0, 1.3], np.float32),
            ),
        ]
        paths = [jpeg_file] * len(cases)
        affines = np.stack(
            [
                affine_output_to_source(
                    center, a.scale * scale * 200.0, res, a.rot, a.flip
                )
                for a in cases
            ]
        )
        gains = np.stack([a.pixel_noise for a in cases])
        crops, statuses, dims = loader.batch_decode_affine(
            paths, affines, gains, res, num_threads=2
        )
        assert (statuses == 0).all()
        assert (dims == [120, 160]).all()
        for k, a in enumerate(cases):
            ref = process_image(
                img.astype(np.float32), center, a.scale * scale, a, res
            )
            # interior only: border pixels differ by cv2's fixed-point
            # rounding at the zero-padding boundary
            np.testing.assert_allclose(
                crops[k][2:-2, 2:-2], ref[2:-2, 2:-2], atol=1.5,
                err_msg=f"case {k}",
            )

    def test_dataset_get_batch_matches_per_item(self, tmp_path):
        """PocoDataset.get_batch (native path) == per-item path with the
        same RNG seed: identical aug params, near-identical crops."""
        import cv2 as _cv2

        from poco_tpu.data.dataset import PocoDataset, collate

        rng = np.random.RandomState(3)
        n = 6
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        names = []
        for i in range(n):
            img = _cv2.GaussianBlur(
                rng.randint(0, 255, (128, 128, 3), dtype=np.uint8),
                (11, 11), 5,
            )
            _cv2.imwrite(str(img_dir / f"i{i}.jpg"), img)
            names.append(f"imgs/i{i}.jpg")
        np.savez(
            tmp_path / "ann.npz",
            imgname=np.array(names),
            center=np.full((n, 2), 64.0, np.float32),
            scale=np.full((n,), 0.45, np.float32),
            pose=(0.2 * rng.randn(n, 72)).astype(np.float32),
            shape=rng.randn(n, 10).astype(np.float32),
            S=rng.randn(n, 24, 4).astype(np.float32),
            part=np.concatenate(
                [64 + 20 * rng.randn(n, 24, 2), np.ones((n, 24, 1))], axis=-1
            ).astype(np.float32),
        )

        def build():
            return PocoDataset(
                str(tmp_path / "ann.npz"), img_dir=str(tmp_path),
                is_train=True, seed=7,
            )

        ds_a, ds_b = build(), build()
        batch_native = ds_a.get_batch(range(n))
        batch_items = collate([ds_b[i] for i in range(n)])
        assert set(batch_native) == set(batch_items)
        for key in batch_items:
            if key in ("imgname", "dataset_name"):
                assert batch_native[key] == batch_items[key]
            elif key == "img":
                diff = np.abs(
                    batch_native["img"][:, 2:-2, 2:-2]
                    - batch_items["img"][:, 2:-2, 2:-2]
                )
                assert diff.mean() < 1.0, diff.mean()
            else:
                np.testing.assert_allclose(
                    batch_native[key], batch_items[key], atol=1e-5,
                    err_msg=key,
                )


class TestExifHandling:
    def test_exif_rotated_jpeg_falls_back(self, tmp_path):
        """JPEGs with EXIF Orientation != 1 must NOT decode natively
        (libjpeg ignores EXIF; cv2 applies it): the native decoder
        rejects them and the dataset path falls back to cv2."""
        from poco_tpu.runtime import loader as native_loader

        if not native_loader.native_available():
            pytest.skip("no native toolchain")
        img = (np.random.RandomState(0).rand(32, 48, 3) * 255).astype(
            np.uint8
        )
        ok, enc = cv2.imencode(".jpg", img)
        assert ok
        data = enc.tobytes()
        # splice a minimal EXIF APP1 with Orientation=6 after SOI
        tiff = (
            b"II*\x00\x08\x00\x00\x00"          # TIFF header, IFD at 8
            + b"\x01\x00"                        # 1 entry
            + b"\x12\x01\x03\x00\x01\x00\x00\x00\x06\x00\x00\x00"
            + b"\x00\x00\x00\x00"                # next IFD
        )
        payload = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
        exif_jpeg = data[:2] + app1 + data[2:]

        with pytest.raises(ValueError):
            native_loader.decode_jpeg(exif_jpeg)
        # plain (orientation-free) jpeg still decodes natively
        out = native_loader.decode_jpeg(data)
        assert out.shape == (32, 48, 3)

    def test_dataset_load_image_survives_native_reject(
        self, tmp_path, monkeypatch
    ):
        """_load_image falls back to cv2 when native decode rejects
        (e.g. PNG content behind a .jpg extension)."""
        from poco_tpu.data.dataset import PocoDataset

        img = (np.random.RandomState(1).rand(20, 24, 3) * 255).astype(
            np.uint8
        )
        # PNG bytes with a .jpg name: native decode errors, cv2 decodes
        path = tmp_path / "fake.jpg"
        ok, enc = cv2.imencode(".png", img)
        path.write_bytes(enc.tobytes())
        np.savez(
            tmp_path / "ann.npz",
            imgname=np.array(["fake.jpg"]),
            center=np.array([[12.0, 10.0]], np.float32),
            scale=np.array([0.2], np.float32),
        )
        monkeypatch.setenv("POCO_TPU_NATIVE_LOADER", "1")
        ds = PocoDataset(
            str(tmp_path / "ann.npz"), img_dir=str(tmp_path),
            is_train=False,
        )
        out = ds._load_image(0)
        assert out.shape == (20, 24, 3)


class TestPngDecode:
    """Native PNG decode (libpng, poco_loader.cpp decode_png_vec) must be
    pixel-exact vs the cv2 fallback it replaces for every 8-bit PNG
    variant; 16-bit PNGs are rejected to the cv2 path (status -5)
    because libpng's linear-light 16->8 differs from cv2's scaling."""

    def _skip_unless_png(self):
        if not loader.png_available():
            pytest.skip("libpng not available at build time")

    def test_rgb_png_exact(self, tmp_path):
        self._skip_unless_png()
        img = (np.random.RandomState(0).rand(37, 53, 3) * 255).astype(
            np.uint8
        )
        p = str(tmp_path / "a.png")
        cv2.imwrite(p, img[:, :, ::-1])
        np.testing.assert_array_equal(loader.decode_image(p), img)
        np.testing.assert_array_equal(loader.read_image_rgb(p), img)

    def test_rgba_png_drops_alpha_like_cv2(self, tmp_path):
        self._skip_unless_png()
        rgba = (np.random.RandomState(1).rand(21, 33, 4) * 255).astype(
            np.uint8
        )
        p = str(tmp_path / "b.png")
        cv2.imwrite(p, rgba)
        ref = cv2.imread(p)[:, :, ::-1]
        np.testing.assert_array_equal(loader.decode_image(p), ref)

    def test_gray_png_exact(self, tmp_path):
        self._skip_unless_png()
        g = (np.random.RandomState(2).rand(15, 19) * 255).astype(np.uint8)
        p = str(tmp_path / "c.png")
        cv2.imwrite(p, g)
        ref = cv2.imread(p)[:, :, ::-1]
        np.testing.assert_array_equal(loader.decode_image(p), ref)

    def test_16bit_png_rejected_to_cv2(self, tmp_path):
        self._skip_unless_png()
        g16 = (np.random.RandomState(3).rand(9, 11) * 65535).astype(
            np.uint16
        )
        p = str(tmp_path / "d.png")
        cv2.imwrite(p, g16)
        with pytest.raises(ValueError):
            loader.decode_image(p)
        # the read_image_rgb entry point transparently falls back
        ref = cv2.imread(p)[:, :, ::-1]
        np.testing.assert_array_equal(loader.read_image_rgb(p), ref)

    def test_batch_decode_crop_mixed_formats(self, tmp_path, jpeg_file):
        self._skip_unless_png()
        img = (np.random.RandomState(4).rand(48, 64, 3) * 255).astype(
            np.uint8
        )
        png_path = str(tmp_path / "e.png")
        cv2.imwrite(png_path, img[:, :, ::-1])
        paths = [jpeg_file, png_path]
        centers = np.array([[32.0, 24.0], [32.0, 24.0]], np.float32)
        sizes = np.array([40.0, 40.0], np.float32)
        crops, statuses = loader.batch_decode_crop(
            paths, centers, sizes, out_res=16
        )
        assert statuses.tolist() == [0, 0]
        # PNG crop must equal the single-image affine_crop of the same
        # pixels (crop math is shared; only the decoder differs)
        expect = loader.affine_crop(img, (32.0, 24.0), 40.0, 16)
        np.testing.assert_allclose(crops[1], expect, atol=1e-5)

    def test_png_content_with_jpg_name_decodes_native(self, tmp_path):
        self._skip_unless_png()
        img = (np.random.RandomState(5).rand(20, 24, 3) * 255).astype(
            np.uint8
        )
        ok, enc = cv2.imencode(".png", img[:, :, ::-1])
        p = str(tmp_path / "lies.jpg")
        with open(p, "wb") as f:
            f.write(enc.tobytes())
        # magic-byte sniffing, not the extension, picks the decoder
        np.testing.assert_array_equal(loader.decode_image(p), img)

    def test_gamma_tagged_png_matches_cv2(self, tmp_path):
        """gAMA/cHRM chunks must be IGNORED (cv2 ignores them; libpng's
        simplified API would gamma-convert to sRGB and diverge — the
        reference demo asset skating.png is such a file)."""
        self._skip_unless_png()
        img = (np.random.RandomState(6).rand(24, 31, 3) * 255).astype(
            np.uint8
        )
        ok, enc = cv2.imencode(".png", img[:, :, ::-1])
        raw = enc.tobytes()
        # splice a gAMA chunk (gamma 1/2.2) right after IHDR
        import struct, zlib

        ihdr_end = 8 + 4 + 4 + 13 + 4
        body = struct.pack(">I", 45455)
        chunk = (
            struct.pack(">I", 4) + b"gAMA" + body
            + struct.pack(">I", zlib.crc32(b"gAMA" + body) & 0xFFFFFFFF)
        )
        tagged = raw[:ihdr_end] + chunk + raw[ihdr_end:]
        p = str(tmp_path / "gamma.png")
        with open(p, "wb") as f:
            f.write(tagged)
        ref = cv2.imread(p)[:, :, ::-1]
        np.testing.assert_array_equal(ref, img)  # cv2 ignores gAMA
        np.testing.assert_array_equal(loader.decode_image(p), img)
