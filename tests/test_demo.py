"""Demo pipeline tests: tracker, tester folder/video paths, renderer."""

import os

import cv2
import jax
import numpy as np
import pytest

from poco_tpu.config import get_hparams_defaults
from poco_tpu.demo.tracker import IouTracker, full_frame_detector, run_tracking
from poco_tpu.smpl.assets import synthetic_smpl_model
from poco_tpu.utils.demo_utils import (
    convert_crop_cam_to_orig_img,
    convert_crop_coords_to_orig_img,
    prepare_rendering_results,
)
from poco_tpu.utils.one_euro import OneEuroFilter
from poco_tpu.utils.smooth_bbox import get_all_bbox_params, get_smooth_bbox_params
from poco_tpu.viz.renderer import Renderer, get_vertex_colors, jet_colormap, save_obj


@pytest.fixture(scope="module")
def frame_folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("frames")
    rng = np.random.RandomState(0)
    for i in range(4):
        img = rng.randint(40, 200, (120, 160, 3), dtype=np.uint8)
        cv2.imwrite(str(root / f"{i:06d}.png"), img)
    return str(root)


def _tiny_tester(batch_size=8):
    from poco_tpu.demo.tester import PocoTester

    h = get_hparams_defaults()
    h.METHOD = "poco"
    h.POCO.BACKBONE = "tiny-cliff"
    h.POCO.NUM_NEURONS = "216-"
    h.POCO.SIGMA_DIM = 1
    h.POCO.UNCERT_INP_TYPE = "feat-pose-net"
    h.POCO.COND_NFLOW = True
    h.POCO.CONTEXT_DIM = 64
    h.POCO.NUM_FLOW_LAYERS = 1
    smpl = synthetic_smpl_model(num_verts=96)
    return PocoTester(h, smpl, batch_size=batch_size)


class TestTracker:
    def test_single_stable_track(self):
        dets = [np.array([[50.0, 50.0, 40.0, 80.0]])] * 5
        tracks = IouTracker().track(dets)
        assert len(tracks) == 1
        tid = list(tracks)[0]
        assert len(tracks[tid]["frames"]) == 5

    def test_two_people_two_tracks(self):
        dets = [
            np.array([[30.0, 50.0, 30.0, 60.0], [120.0, 50.0, 30.0, 60.0]])
        ] * 4
        tracks = IouTracker().track(dets)
        assert len(tracks) == 2

    def test_moving_person_followed(self):
        dets = [
            np.array([[30.0 + 5 * t, 50.0, 40.0, 80.0]]) for t in range(6)
        ]
        tracks = IouTracker().track(dets)
        assert len(tracks) == 1

    def test_gap_exceeding_max_age_splits(self):
        dets = (
            [np.array([[50.0, 50.0, 40.0, 80.0]])] * 2
            + [np.zeros((0, 4))] * 15
            + [np.array([[50.0, 50.0, 40.0, 80.0]])] * 2
        )
        tracks = IouTracker(max_age=3).track(dets)
        assert len(tracks) == 2

    def test_run_tracking_contract(self, frame_folder):
        tracks = run_tracking(
            sorted(
                os.path.join(frame_folder, f)
                for f in os.listdir(frame_folder)
            ),
            full_frame_detector,
        )
        assert len(tracks) == 1
        tr = tracks[list(tracks)[0]]
        assert tr["bbox"].shape == (4, 4)
        assert list(tr["frames"]) == [0, 1, 2, 3]


class TestConversions:
    def test_crop_cam_round_scale(self):
        cam = np.array([[1.0, 0.1, -0.2]])
        bbox = np.array([[320.0, 240.0, 240.0]])
        out = convert_crop_cam_to_orig_img(cam, bbox, 640, 480)
        assert out.shape == (1, 4)
        np.testing.assert_allclose(out[0, 0], 240.0 / 640.0, rtol=1e-6)
        np.testing.assert_allclose(out[0, 1], 240.0 / 480.0, rtol=1e-6)
        # centered bbox -> translation = cam translation
        np.testing.assert_allclose(out[0, 2], 0.1, atol=1e-6)

    def test_crop_coords_center_maps_to_bbox_center(self):
        bbox = np.array([[100.0, 80.0, 60.0]])
        kp = np.zeros((1, 5, 2))
        out = convert_crop_coords_to_orig_img(bbox, kp.copy(), 224)
        np.testing.assert_allclose(out[0, :, 0], 100.0)
        np.testing.assert_allclose(out[0, :, 1], 80.0)

    def test_prepare_rendering_depth_sort(self):
        results = {
            0: {
                "verts": np.zeros((1, 9, 3)),
                "orig_cam": np.array([[0.5, 0.9, 0, 0]]),
                "frame_ids": [0],
            },
            1: {
                "verts": np.zeros((1, 9, 3)),
                "orig_cam": np.array([[0.5, 0.2, 0, 0]]),
                "frame_ids": [0],
            },
        }
        frames = prepare_rendering_results(results, 1)
        # person 1 (smaller y-scale = farther) must be drawn first
        assert list(frames[0].keys()) == [1, 0]


class TestSmoothing:
    def test_one_euro_reduces_jitter(self):
        rng = np.random.RandomState(0)
        t = np.arange(100, dtype=np.float64)
        clean = np.sin(t / 10)
        noisy = clean + 0.2 * rng.randn(100)
        f = OneEuroFilter(0.0, noisy[0], min_cutoff=0.05, beta=0.0)
        smoothed = [noisy[0]]
        for i in range(1, 100):
            smoothed.append(f(float(i), noisy[i]))
        smoothed = np.asarray(smoothed)
        assert np.std(np.diff(smoothed)) < np.std(np.diff(noisy))

    def test_one_euro_track_matches_streaming(self):
        """Whole-track API == streaming wrapper, all channels at once."""
        from poco_tpu.utils.one_euro import one_euro_track

        rng = np.random.RandomState(2)
        xs = rng.randn(50, 4, 3).astype(np.float32)
        track = one_euro_track(xs, min_cutoff=0.3, beta=0.5)
        f = OneEuroFilter(0.0, xs[0], min_cutoff=0.3, beta=0.5)
        stream = np.stack(
            [xs[0].astype(np.float64)]
            + [f(float(i), xs[i]) for i in range(1, 50)]
        )
        np.testing.assert_allclose(track, stream.astype(np.float32), atol=1e-6)
        assert track.dtype == xs.dtype

    def test_bbox_params_interpolate_gaps(self):
        kp = np.zeros((13, 3))
        kp[:, 2] = 1.0
        kp[:4, :2] = [[0, 0], [0, 100], [50, 0], [50, 100]]
        kps = [kp * 1.0, None, None, kp * 1.0]
        params, start, end = get_all_bbox_params(kps, vis_thresh=0.5)
        assert start == 0 and end == 3
        assert params.shape == (4, 3)
        np.testing.assert_allclose(params[1], params[0], rtol=1e-5)

    def test_smooth_pose_runs(self):
        from poco_tpu.utils.smooth_pose import smooth_pose

        smpl = synthetic_smpl_model(num_verts=64)
        T = 5
        pose = np.broadcast_to(np.eye(3), (T, 24, 3, 3)).copy()
        betas = np.zeros((T, 10), np.float32)
        verts, pose_hat, joints = smooth_pose(pose, betas, smpl)
        assert verts.shape == (T, 64, 3)
        assert joints.shape == (T, 49, 3)
        assert np.all(np.isfinite(verts))


class TestRenderer:
    def test_jet_colormap_ends(self):
        lo = jet_colormap(np.array(0.0))
        hi = jet_colormap(np.array(1.0))
        assert lo[2] > 0.4 and lo[0] == 0.0   # blue end
        assert hi[0] > 0.4 and hi[2] == 0.0   # red end

    def test_vertex_colors_cliff_global(self):
        smpl = synthetic_smpl_model(num_verts=64)
        var = np.full(24, 0.2, np.float32)
        var[0] = 0.3
        colors = get_vertex_colors(
            var, np.asarray(smpl.lbs_weights), backbone="hrnet_w48_cls-cliff"
        )
        assert colors.shape == (64, 4)
        # cliff: every part colored by the root value -> single color
        assert len(np.unique(colors[:, 0].round(4))) == 1

    def test_render_draws_mesh(self):
        smpl = synthetic_smpl_model(num_verts=64)
        r = Renderer(np.asarray(smpl.faces), 64, 64)
        verts = np.asarray(smpl.v_template) * 0.5
        img = r.render(
            np.zeros((64, 64, 3), np.uint8), verts,
            np.array([1.0, 0.0, 0.0]),
        )
        assert img.shape == (64, 64, 3)
        assert img.sum() > 0  # something was drawn

    def test_save_obj(self, tmp_path):
        path = str(tmp_path / "mesh.obj")
        save_obj(path, np.zeros((3, 3)), np.array([[0, 1, 2]]))
        content = open(path).read()
        assert content.count("v ") == 3 and "f 1 2 3" in content


class TestTesterFolder:
    def test_image_folder_end_to_end(self, frame_folder, tmp_path):
        tester = _tiny_tester()
        out_dir = str(tmp_path / "out")
        results = tester.run_on_image_folder(
            frame_folder, output_folder=out_dir, render=True, sideview=True
        )
        assert len(results) == 4
        r = results[0]
        assert r["verts"].shape[0] == 1          # one detection per image
        assert r["orig_cam"].shape == (1, 4)
        assert r["var"].shape == (1, 24)
        assert r["var_global"].shape == (1,)
        rendered = [f for f in os.listdir(out_dir) if f.endswith(".png")]
        assert len(rendered) >= 4
        assert tester.last_fps > 0

    def test_video_end_to_end(self, frame_folder, tmp_path):
        tester = _tiny_tester()
        cache = str(tmp_path / "tracks.pkl")
        tracks = tester.run_tracking(frame_folder, cache_file=cache)
        assert os.path.exists(cache)
        results = tester.run_on_video(frame_folder, tracks=tracks)
        assert len(results) == 1
        person = results[list(results)[0]]
        assert person["verts"].shape == (4, 96, 3)
        assert person["orig_cam"].shape == (4, 4)

        render_dir = str(tmp_path / "render")
        tester.render_results(
            results, frame_folder, render_dir,
            uncert_log=str(tmp_path / "uncert.log"),
        )
        assert len(os.listdir(render_dir)) == 4
        assert os.path.exists(str(tmp_path / "uncert.log"))

    def test_video_with_smoothing(self, frame_folder):
        tester = _tiny_tester()
        results = tester.run_on_video(frame_folder, smooth=True)
        person = results[list(results)[0]]
        assert np.all(np.isfinite(person["verts"]))


@pytest.fixture(scope="module")
def jpeg_frame_folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("jpeg_frames")
    rng = np.random.RandomState(3)
    for i in range(4):
        img = rng.randint(40, 200, (120, 160, 3), dtype=np.uint8)
        cv2.imwrite(str(root / f"{i:06d}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
    return str(root)


class TestSideview:
    """Reference sideview contract: side canvas concatenated to the
    right of each output frame (tester.py:274,348 folder / 511,567-570
    video, incl. the 'Other View' caption)."""

    def test_folder_sideview_concatenates(self, frame_folder, tmp_path):
        tester = _tiny_tester()
        out_dir = str(tmp_path / "out")
        tester.run_on_image_folder(
            frame_folder, output_folder=out_dir, render=True, sideview=True
        )
        rendered = sorted(
            f for f in os.listdir(out_dir) if f.endswith(".png")
        )
        assert rendered
        img = cv2.imread(os.path.join(out_dir, rendered[0]))
        assert img.shape[1] == 2 * 160  # [frame | white sideview]
        # the right half must contain the white canvas background
        assert img[:, 160:].max() == 255

    def test_video_sideview_overlay(self, frame_folder, tmp_path):
        tester = _tiny_tester()
        results = tester.run_on_video(frame_folder)
        render_dir = str(tmp_path / "render")
        tester.render_results(
            results, frame_folder, render_dir, sideview=True
        )
        img = cv2.imread(os.path.join(render_dir, "000000.png"))
        assert img.shape[1] == 2 * 160
        # "Other View" caption: white text box on the black side canvas
        assert (img[:, 160:] == 255).any()

    def test_overlay_text_draws(self):
        from poco_tpu.viz.renderer import overlay_text

        img = np.zeros((120, 160, 3), np.uint8)
        out = overlay_text(img, "Other View")
        assert (out == 255).any()  # white text box
        assert (out[..., 0] == 255).sum() > (out[..., 2] == 255).sum()  # red text (RGB)


class TestNativeVideoPath:
    def test_load_all_matches_per_item(self, jpeg_frame_folder):
        from poco_tpu.data.inference import InferenceDataset
        from poco_tpu.runtime.loader import native_available

        ds = InferenceDataset(
            jpeg_frame_folder,
            frames=[0, 1, 2, 3],
            bboxes=np.array([[80, 60, 60, 90]] * 4, np.float32),
        )
        batch = ds.load_all()
        if not native_available():
            assert batch is None
            pytest.skip("native loader unavailable")
        items = [ds[i] for i in range(len(ds))]
        for k in ("scale", "center", "orig_shape", "focal_length",
                  "bbox_info"):
            np.testing.assert_allclose(
                batch[k], np.stack([it[k] for it in items]), rtol=1e-6,
                err_msg=k,
            )
        crops = np.stack([it["img"] for it in items])
        # same decoded pixels, same affine: the native path is bit-close
        assert np.abs(batch["img"] - crops).max() <= 2.0
        np.testing.assert_array_equal(batch["frame_id"], [0, 1, 2, 3])

    def test_image_size_header_probe(self, tmp_path):
        from poco_tpu.runtime.loader import image_size

        rng = np.random.RandomState(7)
        for ext, shape in ((".jpg", (130, 90)), (".png", (75, 211))):
            img = rng.randint(0, 255, (*shape, 3), dtype=np.uint8)
            p = str(tmp_path / f"probe{ext}")
            cv2.imwrite(p, img)
            assert image_size(p) == shape

    def test_load_all_mixed_frame_sizes(self, tmp_path):
        """Per-frame CLIFF conditioning (orig_shape/focal/bbox_info)
        must match the per-item path even when frame sizes differ
        mid-tracklet (arbitrary image folders)."""
        from poco_tpu.data.inference import InferenceDataset
        from poco_tpu.runtime.loader import native_available

        rng = np.random.RandomState(11)
        for i, (h, w) in enumerate([(120, 160), (96, 128), (150, 200)]):
            img = rng.randint(40, 200, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(str(tmp_path / f"{i:06d}.jpg"), img,
                        [cv2.IMWRITE_JPEG_QUALITY, 95])
        ds = InferenceDataset(
            str(tmp_path), frames=[0, 1, 2],
            bboxes=np.array([[80, 60, 60, 90]] * 3, np.float32),
        )
        batch = ds.load_all()
        if not native_available():
            assert batch is None
            pytest.skip("native loader unavailable")
        items = [ds[i] for i in range(3)]
        for k in ("orig_shape", "focal_length", "bbox_info"):
            np.testing.assert_allclose(
                batch[k], np.stack([it[k] for it in items]), rtol=1e-6,
                err_msg=k,
            )
        # the three frames really do have distinct conditioning
        assert len({tuple(r) for r in batch["orig_shape"]}) == 3

    def test_load_all_png_native_or_fallback(self, frame_folder):
        """PNG tracklets take the native whole-batch path when the lib
        was built with libpng (matching the per-item crops); on a
        libpng-less build load_all returns None (per-item fallback)."""
        from poco_tpu.data.inference import InferenceDataset
        from poco_tpu.runtime import loader as native_loader

        ds = InferenceDataset(
            frame_folder, frames=[0, 1],
            bboxes=np.array([[80, 60, 60, 90]] * 2, np.float32),
        )
        batch = ds.load_all()
        if not native_loader.png_available():
            assert batch is None
            return
        items = [ds[i] for i in range(2)]
        crops = np.stack([it["img"] for it in items])
        assert np.abs(batch["img"] - crops).max() <= 2.0

    def test_video_end_to_end_jpeg(self, jpeg_frame_folder):
        tester = _tiny_tester()
        results = tester.run_on_video(jpeg_frame_folder)
        person = results[list(results)[0]]
        assert person["verts"].shape == (4, 96, 3)
        assert np.all(np.isfinite(person["verts"]))
        assert person["verts"].dtype == np.float32

    def test_read_image_rgb_matches_cv2(self, jpeg_frame_folder, frame_folder):
        from poco_tpu.runtime.loader import read_image_rgb, read_images_rgb

        for folder in (jpeg_frame_folder, frame_folder):
            files = sorted(
                os.path.join(folder, f) for f in os.listdir(folder)
            )
            want = cv2.imread(files[0])[:, :, ::-1]
            got = read_image_rgb(files[0])
            assert np.abs(
                got.astype(np.int16) - want.astype(np.int16)
            ).max() <= 1  # libjpeg vs cv2 rounding
            many = read_images_rgb(files)
            assert len(many) == len(files)
            assert many[0].shape == want.shape


class TestMaskRcnnOption:
    def test_unavailable_returns_none(self):
        from poco_tpu.demo.tracker import make_maskrcnn_detector

        try:
            import torchvision  # noqa: F401
        except ImportError:
            assert make_maskrcnn_detector() is None


class TestKeypointRefineDetector:
    def test_bbox_from_kp2d_square_and_padded(self):
        from poco_tpu.demo.tracker import bbox_from_kp2d

        kp = np.array([[10.0, 20.0], [50.0, 100.0]])
        bb = bbox_from_kp2d(kp)
        np.testing.assert_allclose(bb[:2], [30.0, 60.0])
        assert bb[2] == bb[3] == pytest.approx(80.0 * 1.1)

    def test_refine_uses_model_keypoints(self):
        """Proposals get replaced by keypoint-derived boxes; degenerate
        keypoint sets keep the proposal."""
        from poco_tpu.demo.tracker import make_keypoint_refine_detector

        base = lambda img: np.array(
            [[100.0, 100.0, 180.0, 180.0], [30.0, 30.0, 50.0, 50.0]],
            np.float32,
        )

        def fake_kp(img, boxes):
            out = []
            for b in boxes:
                if b[0] > 50:  # person found near first proposal
                    out.append(
                        np.array([[80.0, 60.0], [120.0, 160.0]], np.float32)
                    )
                else:  # collapsed keypoints -> keep proposal
                    out.append(np.zeros((2, 2), np.float32))
            return out

        det = make_keypoint_refine_detector(base, fake_kp)
        img = np.zeros((200, 200, 3), np.uint8)
        boxes = det(img)
        assert boxes.shape == (2, 4)
        np.testing.assert_allclose(boxes[0][:2], [100.0, 110.0])
        assert boxes[0][2] == pytest.approx(100.0 * 1.1)
        np.testing.assert_allclose(boxes[1], base(img)[1])

    def test_tester_refined_detector_end_to_end(self, frame_folder):
        tester = _tiny_tester()
        refined = tester.make_refined_detector()
        img = cv2.imread(
            os.path.join(frame_folder, sorted(os.listdir(frame_folder))[0])
        )[:, :, ::-1]
        boxes = refined(img)
        assert boxes.ndim == 2 and boxes.shape[1] == 4
        assert np.isfinite(boxes).all()

    def test_tester_uncert_detector_end_to_end(self, frame_folder):
        tester = _tiny_tester()
        det = tester.make_uncert_detector(max_people=3)
        img = cv2.imread(
            os.path.join(frame_folder, sorted(os.listdir(frame_folder))[0])
        )[:, :, ::-1]
        boxes = det(img)
        assert boxes.ndim == 2 and boxes.shape[1] == 4
        assert 1 <= len(boxes) <= 3
        assert np.isfinite(boxes).all()

    def test_window_proposals_and_nms(self):
        from poco_tpu.demo.tracker import nms_cxcywh, tiled_window_proposals

        img = np.zeros((240, 320, 3), np.uint8)
        props = tiled_window_proposals(img)
        assert props.ndim == 2 and props.shape[1] == 4
        assert (props[:, 2] > 0).all()
        boxes = np.array(
            [[50, 50, 40, 40], [52, 52, 40, 40], [150, 150, 40, 40]],
            np.float32,
        )
        keep = nms_cxcywh(boxes, np.array([0.9, 0.8, 0.7]))
        assert list(keep) == [0, 2]


class TestVideoIO:
    def test_video_roundtrip_cv2(self, tmp_path):
        """video_to_images / images_to_video with the cv2 fallback."""
        from poco_tpu.utils.demo_utils import images_to_video, video_to_images

        src_dir = tmp_path / "src"
        src_dir.mkdir()
        rng = np.random.RandomState(0)
        for i in range(5):
            cv2.imwrite(
                str(src_dir / f"{i + 1:06d}.png"),
                rng.randint(0, 255, (64, 80, 3), dtype=np.uint8),
            )
        vid = str(tmp_path / "clip.mp4")
        images_to_video(str(src_dir), vid, fps=5)
        assert os.path.getsize(vid) > 0

        out_dir, n, shape = video_to_images(
            vid, str(tmp_path / "frames"), return_info=True
        )
        assert n == 5
        assert shape[:2] == (64, 80)


class TestPartLabels:
    def test_labels_render_and_range(self):
        from poco_tpu.viz.part_labels import generate_part_labels

        smpl = synthetic_smpl_model(num_verts=128)
        verts = np.asarray(smpl.v_template)[None] * 0.5
        cams = np.array([[1.0, 0.0, 0.0]])
        labels = generate_part_labels(
            verts, np.asarray(smpl.faces), cams,
            np.asarray(smpl.lbs_weights), out_res=56,
        )
        assert labels.shape == (1, 56, 56)
        assert labels.max() <= 24 and labels.min() == 0
        assert (labels > 0).sum() > 50  # body covers some pixels

    def test_labels_feed_segmentation_loss(self):
        import jax.numpy as jnp

        from poco_tpu.losses.segmentation import part_segmentation_loss
        from poco_tpu.viz.part_labels import generate_part_labels

        smpl = synthetic_smpl_model(num_verts=128)
        verts = np.asarray(smpl.v_template)[None] * 0.5
        labels = generate_part_labels(
            verts, np.asarray(smpl.faces), np.array([[1.0, 0, 0]]),
            np.asarray(smpl.lbs_weights), out_res=56,
        )
        logits = jnp.asarray(
            np.random.RandomState(0).randn(1, 25, 56, 56), jnp.float32
        )
        loss = part_segmentation_loss(logits, jnp.asarray(labels))
        assert np.isfinite(float(loss))


class TestVideoChunking:
    def test_chunks_cover_track(self):
        from poco_tpu.utils.demo_utils import split_into_chunks

        chunks = split_into_chunks(list(range(10)), seqlen=4, stride=4)
        assert chunks == [(0, 4), (4, 8), (6, 10)]
        covered = set()
        for a, b in chunks:
            covered.update(range(a, b))
        assert covered == set(range(10))

    def test_short_track_single_chunk(self):
        from poco_tpu.utils.demo_utils import split_into_chunks

        assert split_into_chunks([0, 1], seqlen=8, stride=4) == [(0, 2)]
        assert split_into_chunks([], seqlen=8, stride=4) == []


class TestFolderFlags:
    def test_skip_frame_and_render_crop(self, frame_folder, tmp_path):
        tester = _tiny_tester()
        out_dir = str(tmp_path / "out_crop")
        results = tester.run_on_image_folder(
            frame_folder, output_folder=out_dir, render=True,
            skip_frame=2, render_crop=True,
        )
        assert len(results) == 2  # every 2nd of 4 frames
        rendered = [f for f in os.listdir(out_dir) if f.endswith(".png")]
        assert len(rendered) == 2
        # render_crop output is the 224px crop, not the 120x160 original
        img = cv2.imread(os.path.join(out_dir, rendered[0]))
        assert img.shape[:2] == (224, 224)

    def test_kinematic_uncert_from_hparams(self):
        from poco_tpu.eval.uncertainty import kinematic_uncert

        tester = _tiny_tester()
        assert tester.kinematic_uncert is False
        tester.kinematic_uncert = True
        var = np.abs(np.random.RandomState(0).rand(2, 24, 3, 3)) * 0.1
        v_kin, _ = tester._prep_uncert({"var_pose": var})
        tester.kinematic_uncert = False
        v_plain, _ = tester._prep_uncert({"var_pose": var})
        # kinematic accumulation can only increase (pre-clip) uncertainty
        assert (v_kin >= v_plain - 1e-7).all()
        assert v_kin.sum() > v_plain.sum()


class TestNativeRaster:
    def _sphere(self, n=40):
        phi = np.linspace(0, np.pi, n)
        theta = np.linspace(0, 2 * np.pi, n)
        P, T = np.meshgrid(phi, theta, indexing="ij")
        verts = np.stack(
            [np.sin(P) * np.cos(T), np.sin(P) * np.sin(T), np.cos(P)], -1
        ).reshape(-1, 3) * 0.8
        faces = []
        for i in range(n - 1):
            for j in range(n - 1):
                a = i * n + j
                faces.append([a, a + 1, a + n])
                faces.append([a + 1, a + n + 1, a + n])
        return verts.astype(np.float32), np.asarray(faces, np.int64)

    def test_matches_python_painter(self, monkeypatch):
        from poco_tpu.runtime.raster import native_available
        from poco_tpu.viz.renderer import Renderer

        if not native_available():
            pytest.skip("no native toolchain")
        verts, faces = self._sphere()
        r = Renderer(faces)
        img = (np.random.RandomState(3).rand(192, 256, 3) * 255).astype(
            np.uint8
        )
        cam = np.array([0.8, 0.8, 0.0, 0.0], np.float32)
        out_fast = r.render(img, verts, cam)

        import poco_tpu.runtime.raster as rr

        monkeypatch.setenv("POCO_TPU_NATIVE_RASTER", "0")
        monkeypatch.setattr(rr, "_LIB", None)
        out_slow = r.render(img, verts, cam)

        # identical up to triangle-edge pixels (different fill
        # conventions): a small fraction of pixels may differ
        diff = (
            np.abs(out_fast.astype(np.int32) - out_slow.astype(np.int32))
            .max(-1) > 8
        )
        assert diff.mean() < 0.03
        # and the mesh is actually drawn
        changed = (
            np.abs(out_slow.astype(np.int32) - img.astype(np.int32))
            .max(-1) > 8
        )
        assert changed.mean() > 0.1


class TestBatchedRefineDetector:
    def test_detect_batch_matches_per_frame(self, frame_folder):
        """The frame-batched refine path produces the same boxes as the
        per-frame path on identical frames (real tiny model)."""
        import glob

        tester = _tiny_tester()
        det = tester.make_refined_detector()
        assert hasattr(det, "detect_batch")
        frames = [
            cv2.imread(p)[:, :, ::-1]
            for p in sorted(glob.glob(os.path.join(frame_folder, "*.png")))
        ]
        batched = det.detect_batch(frames)
        single = [det(im) for im in frames]
        assert len(batched) == len(single) == len(frames)
        for b, s in zip(batched, single):
            np.testing.assert_allclose(b, s, atol=1e-3)

    def test_detect_batch_downscales_for_detection(self):
        """Large frames are downscaled for the detection pass and the
        refined boxes are mapped back to original coordinates."""
        from poco_tpu.demo.tracker import make_keypoint_refine_detector

        frames = [np.zeros((600, 800, 3), np.uint8) for _ in range(3)]
        base = lambda img: np.array(
            [[img.shape[1] / 2.0, img.shape[0] / 2.0, 100.0, 100.0]],
            np.float32,
        )
        seen_shapes = []

        def fake_batch(imgs, boxes_list):
            seen_shapes.extend(im.shape for im in imgs)
            # keypoints spanning (40,30)-(120,90) in small coords
            kp = np.array([[40.0, 30.0], [120.0, 90.0]], np.float32)
            return [kp[None] for _ in imgs]

        det = make_keypoint_refine_detector(
            base, None, infer_keypoints_batch=fake_batch, detect_size=400
        )
        out = det.detect_batch(frames)
        # detection ran at 400px long side (ds = 0.5)
        assert seen_shapes[0] == (300, 400, 3)
        # kp box in small coords: center (80, 60), size 88; orig = x2
        np.testing.assert_allclose(out[0][0], [160.0, 120.0, 176.0, 176.0])

    def test_run_tracking_uses_batch_path(self, frame_folder):
        tester = _tiny_tester()
        tester.detector = tester.make_refined_detector()
        tracks = tester.run_tracking(frame_folder)
        assert len(tracks) >= 1
        for tr in tracks.values():
            assert tr["bbox"].shape[1] == 4


class TestBatchedUncertDetector:
    def test_detect_batch_matches_per_frame(self, frame_folder):
        import glob

        tester = _tiny_tester()
        det = tester.make_uncert_detector()
        assert hasattr(det, "detect_batch")
        frames = [
            cv2.imread(p)[:, :, ::-1]
            for p in sorted(glob.glob(os.path.join(frame_folder, "*.png")))
        ]
        batched = det.detect_batch(frames)
        single = [det(im) for im in frames]
        assert len(batched) == len(single) == len(frames)
        for b, s in zip(batched, single):
            assert b.shape == s.shape
            np.testing.assert_allclose(b, s, atol=1e-2)


class TestPoseTrackVideo:
    def test_run_on_video_with_joints2d_tracks(self, frame_folder):
        """Pose-tracking tracks carry joints2d + frames but NO bbox
        (pose_tracker contract); run_on_video must derive bboxes and
        keep result rows aligned with the frames the dataset kept."""
        tester = _tiny_tester()
        rng = np.random.RandomState(0)
        n_frames = 4
        # visible keypoints around a moving center
        joints2d = np.zeros((n_frames, 12, 3), np.float32)
        for t in range(n_frames):
            c = np.array([60.0 + 5 * t, 50.0])
            joints2d[t, :, :2] = c + rng.randn(12, 2) * 12
            joints2d[t, :, 2] = 1.0
        tracks = {
            0: {
                "joints2d": joints2d,
                "frames": np.arange(n_frames, dtype=np.int64),
            }
        }
        results = tester.run_on_video(frame_folder, tracks=tracks)
        assert 0 in results
        r = results[0]
        n = len(r["frame_ids"])
        assert r["verts"].shape[0] == n
        assert r["bboxes"].shape == (n, 4)
        assert np.isfinite(r["bboxes"]).all()


class TestStreamMode:
    """Webcam/streaming mode (poco_tpu/demo/stream.py) — beyond
    reference: /root/reference/demo.py:103-105 raises
    NotImplementedError for --mode webcam."""

    def test_directory_source_streams_in_order(self, frame_folder):
        from poco_tpu.demo.stream import DirectoryFrameSource

        src = DirectoryFrameSource(frame_folder)
        frames = []
        while True:
            f = src.read()
            if f is None:
                break
            frames.append(f)
        assert len(frames) == 4
        assert frames[0].shape == (120, 160, 3)
        # max_frames bounds the stream
        src2 = DirectoryFrameSource(frame_folder, max_frames=2)
        assert src2.read() is not None and src2.read() is not None
        assert src2.read() is None

    def test_run_stream_end_to_end(self, frame_folder, tmp_path):
        from poco_tpu.demo.stream import DirectoryFrameSource, run_stream

        tester = _tiny_tester()
        out_dir = str(tmp_path / "stream")
        stats = run_stream(
            tester, DirectoryFrameSource(frame_folder),
            output_folder=out_dir, smooth=True,
        )
        assert stats["frames"] == 4
        assert stats["detections"] >= 4
        assert stats["e2e_ms_p50"] > 0 and stats["model_ms_p50"] > 0
        rendered = [f for f in os.listdir(out_dir)
                    if f.startswith("stream_")]
        assert len(rendered) == 4

    def test_pipelined_stream_matches_sequential(self, frame_folder,
                                                 tmp_path):
        """The depth-1 dispatch-ahead pipeline must be invisible in the
        outputs: frames are finalized in order, so smoothing state and
        rendered pngs are bit-identical to the sequential path."""
        from poco_tpu.demo.stream import DirectoryFrameSource, run_stream

        tester = _tiny_tester()
        outs = {}
        for mode, pipe in (("seq", False), ("pipe", True)):
            out_dir = tmp_path / mode
            stats = run_stream(
                tester, DirectoryFrameSource(frame_folder),
                output_folder=str(out_dir), smooth=True, pipeline=pipe,
            )
            assert stats["frames"] == 4
            assert stats["pipelined"] is pipe
            outs[mode] = {
                f: (out_dir / f).read_bytes()
                for f in sorted(os.listdir(out_dir))
            }
        assert list(outs["seq"]) == list(outs["pipe"])
        for f in outs["seq"]:
            assert outs["seq"][f] == outs["pipe"][f], f"{f} differs"

    def test_stream_smoothing_reduces_jitter(self, tmp_path):
        """The primary person's vertices through the streaming filter
        must be temporally smoother than the raw predictions on a
        jittering input."""
        from poco_tpu.demo.stream import DirectoryFrameSource, run_stream

        rng = np.random.RandomState(3)
        folder = tmp_path / "jitter"
        folder.mkdir()
        base = rng.randint(40, 200, (120, 160, 3), dtype=np.uint8)
        for i in range(6):
            noisy = np.clip(
                base.astype(int) + rng.randint(-25, 25, base.shape), 0, 255
            ).astype(np.uint8)
            cv2.imwrite(str(folder / f"{i:06d}.png"), noisy)

        tester = _tiny_tester()
        src = DirectoryFrameSource(str(folder))
        raw_verts = []
        frame = src.read()
        while frame is not None:
            r = tester.infer_frame(frame, tester.detector(frame))
            raw_verts.append(r["verts"][0])
            frame = src.read()

        # Streaming filter over the same per-frame predictions (the
        # exact update run_stream applies to the primary person).
        from poco_tpu.utils.one_euro import OneEuroFilter

        f = None
        smooth_verts = []
        for t, v in enumerate(raw_verts):
            if f is None:
                f = OneEuroFilter(t, v, min_cutoff=0.004, beta=1.5)
                smooth_verts.append(v)
            else:
                smooth_verts.append(np.asarray(f(t, v)))

        raw_jit = np.mean([
            np.abs(raw_verts[i + 1] - raw_verts[i]).mean()
            for i in range(len(raw_verts) - 1)
        ])
        smooth_jit = np.mean([
            np.abs(smooth_verts[i + 1] - smooth_verts[i]).mean()
            for i in range(len(smooth_verts) - 1)
        ])
        assert smooth_jit < raw_jit

    def test_demo_cli_webcam_replay(self, frame_folder, tmp_path):
        """`demo.py --mode webcam` against a directory source (the CI
        stand-in for a camera) runs end to end and reports latency."""
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env["POCO_TPU_PLATFORM"] = "cpu"
        r = subprocess.run(
            [sys.executable, "demo.py", "--mode", "webcam",
             "--webcam_source", frame_folder,
             "--cfg", "configs/tiny_smoke.yaml",
             "--output_folder", str(tmp_path / "cli_stream"),
             "--max_frames", "2", "--smooth"],
            cwd=repo, env=env, capture_output=True, text=True, timeout=900,
        )
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        assert "poco stream:" in r.stdout
        assert "fps" in r.stdout
