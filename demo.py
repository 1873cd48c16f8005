"""Demo CLI: folder / video / directory modes with uncertainty rendering.

Reference contract: demo.py:40-313 — the same mode set and flags
(webcam, which the reference also leaves unimplemented, reports an error):

    video:     --vid_file in.mp4  -> tracked multi-person overlay video
    folder:    --image_folder dir -> per-image overlays
    directory: --image_folder parent_dir --dir_chunk i/--dir_chunk_size n
               -> chunked batch over many folders

Stage caching: tracking results are pickled next to the output and
reused on rerun (reference demo.py:125-131).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import time


def build_tester(args):
    import jax

    from poco_tpu.utils.comp_cache import enable_compilation_cache

    enable_compilation_cache()

    from poco_tpu.config import update_hparams
    from poco_tpu.demo.tester import PocoTester
    from poco_tpu.demo.tracker import full_frame_detector, hog_person_detector
    from poco_tpu.smpl.assets import resolve_smpl_params

    hparams = update_hparams(args.cfg)
    # Reference tester.py:59: the demo forces KINEMATIC_UNCERT from the
    # --no_kinematic_uncert store_false flag (True unless the flag given).
    hparams.POCO.KINEMATIC_UNCERT = bool(args.no_kinematic_uncert)
    smpl = resolve_smpl_params(args.smpl_dir, "neutral")

    variables = None
    if args.ckpt:
        from eval import load_checkpoint_into
        from poco_tpu.config import model_config_from_hparams
        from poco_tpu.models.poco import POCO, init_poco

        model_cfg = model_config_from_hparams(hparams)
        model = POCO(cfg=model_cfg)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl)
        variables = load_checkpoint_into(
            variables, args.ckpt, model_cfg, inf_model=args.inf_model
        )

    maskrcnn = None
    if args.detector == "maskrcnn":
        # Reference demo.py:258 accepts yolo|maskrcnn (the torchvision
        # Mask R-CNN inside its multi-person-tracker). torchvision is a
        # GPU-era dependency this rebuild treats as optional: use it if
        # importable with reachable weights, otherwise fall back to the
        # TPU-native detector chain with a notice (documented
        # divergence; see tracker.make_maskrcnn_detector).
        from poco_tpu.demo.tracker import make_maskrcnn_detector

        maskrcnn = make_maskrcnn_detector()
        if maskrcnn is None:
            print(
                "--detector maskrcnn: torchvision (or its pretrained "
                "weights) is unavailable in this environment; falling "
                "back to --detector yolo (TPU-native)."
            )
            args.detector = "yolo"
    detector = (
        hog_person_detector
        if args.detector in ("hog", "refine")
        else full_frame_detector
    )
    if maskrcnn is not None:
        detector = maskrcnn
    if args.detector == "yolo":
        from poco_tpu.demo.yolo import make_yolo_detector

        yolo = make_yolo_detector(
            args.yolo_weights,
            img_size=args.yolo_img_size,
            batch_size=args.tracker_batch_size,
        )
        if yolo is None:
            print(
                "yolov3.weights not found (--yolo_weights / "
                "$POCO_TPU_YOLO_WEIGHTS / data/detector/) — falling back "
                "to --detector refine"
            )
            args.detector = "refine"
            detector = hog_person_detector
        else:
            detector = yolo
    tester = PocoTester(
        hparams, smpl, variables=variables, detector=detector,
        batch_size=args.batch_size,
    )
    if args.detector == "refine":
        # Model-in-the-loop refinement: proposals re-boxed from the
        # model's predicted keypoints (see tracker.py).
        tester.detector = tester.make_refined_detector(detector)
    elif args.detector == "uncert":
        tester.detector = tester.make_uncert_detector()
    return tester


def run_video(args, tester):
    from poco_tpu.utils.demo_utils import images_to_video, video_to_images

    out_dir = args.output_folder
    os.makedirs(out_dir, exist_ok=True)
    vid_file = args.vid_file
    if not vid_file:
        raise SystemExit("--mode video requires --vid_file")
    if vid_file.startswith(("https://www.youtube.com", "https://youtu.be")):
        # Reference demo.py:47-55: optional YouTube ingestion.
        from poco_tpu.utils.demo_utils import download_youtube_clip

        print(f"downloading YouTube video {vid_file}")
        vid_file = download_youtube_clip(
            vid_file, osp.join(out_dir, "video_downloads")
        )
        if vid_file is None:
            raise SystemExit(
                "YouTube download failed (install pytube or yt-dlp, "
                "and check the url)"
            )
    # per-video frame dir: reusing one "frames" dir across videos would
    # leave stale frames from a longer previous video in the sequence
    stem = osp.splitext(osp.basename(vid_file))[0]
    # Queue the device warmup (weight upload + executable load) BEFORE
    # frame extraction so it overlaps the host-side ffmpeg work: the
    # dispatches are async and the shapes only need the probe frame.
    import cv2 as _cv2

    cap = _cv2.VideoCapture(vid_file)
    fh = int(cap.get(_cv2.CAP_PROP_FRAME_HEIGHT)) or 256
    fw = int(cap.get(_cv2.CAP_PROP_FRAME_WIDTH)) or 256
    cap.release()
    tester.warmup((fh, fw))
    img_folder, n_frames, _ = video_to_images(
        vid_file, osp.join(out_dir, f"frames_{stem}"), return_info=True
    )
    t0 = time.time()
    if args.tracking_method == "pose":
        from poco_tpu.utils.pose_tracker import run_posetracker

        tracks = run_posetracker(
            img_folder, staf_folder=args.staf_dir,
            posetrack_output_folder=osp.join(out_dir, "posetrack"),
        )
    else:
        tracks = tester.run_tracking(
            img_folder, cache_file=osp.join(out_dir, "tracking_results.pkl")
        )
    results = tester.run_on_video(
        img_folder, tracks=tracks, smooth=args.smooth,
        min_cutoff=args.min_cutoff, beta=args.beta,
    )
    fps = n_frames / max(time.time() - t0, 1e-9)
    print(f"poco FPS: {fps:.2f}")
    if not args.no_render:
        render_dir = osp.join(out_dir, "rendered")
        tester.render_results(
            results, img_folder, render_dir,
            uncert_color=not args.no_uncert_color,
            wireframe=args.wireframe,
            uncert_log=osp.join(out_dir, "uncertainty.log"),
            display=args.display,
            sideview=args.sideview,
        )
        tag = f"_{args.exp}" if args.exp else ""
        # name from the LOCAL file (vid_file may have been downloaded
        # from a URL); guarantee an .mp4 result name either way
        stem = osp.splitext(osp.basename(vid_file))[0]
        images_to_video(
            render_dir, osp.join(out_dir, f"{stem}{tag}_poco.mp4")
        )


def run_folder(args, tester):
    t0 = time.time()
    results = tester.run_on_image_folder(
        args.image_folder,
        output_folder=args.output_folder,
        render=not args.no_render,
        sideview=args.sideview,
        save_obj=args.save_obj,
        uncert_color=not args.no_uncert_color,
        draw_keypoints=args.draw_keypoints,
        skip_frame=args.skip_frame,
        render_crop=args.render_crop,
        display=args.display,
    )
    n = sum(len(r.get("bboxes", [])) for r in results)
    print(f"poco FPS: {n / max(time.time() - t0, 1e-9):.2f} ({n} crops)")


def run_webcam(args, tester):
    """Streaming mode (beyond reference: /root/reference/demo.py:103-105
    raises NotImplementedError). --webcam_source takes a camera index,
    a stream URL, or a DIRECTORY (replay mode — the CI path)."""
    from poco_tpu.demo.stream import open_source, run_stream

    source = open_source(args.webcam_source, max_frames=args.max_frames)
    stats = run_stream(
        tester, source,
        output_folder=None if args.no_render else args.output_folder,
        smooth=args.smooth, min_cutoff=args.min_cutoff, beta=args.beta,
        uncert_color=not args.no_uncert_color,
        display=args.display, render=not args.no_render,
        max_frames=args.max_frames,
        pipeline=not args.stream_sequential,
    )
    print(
        f"poco stream: {stats['frames']} frames, "
        f"e2e p50 {stats['e2e_ms_p50']} ms (p90 {stats['e2e_ms_p90']}), "
        f"model p50 {stats['model_ms_p50']} ms, {stats['fps']} fps"
    )
    return stats


def run_directory(args, tester):
    subdirs = sorted(
        d for d in os.listdir(args.image_folder)
        if osp.isdir(osp.join(args.image_folder, d))
    )
    if args.dir_chunk_size > 0:
        s = args.dir_chunk * args.dir_chunk_size
        subdirs = subdirs[s : s + args.dir_chunk_size]
    for d in subdirs:
        sub_args = argparse.Namespace(**vars(args))
        sub_args.image_folder = osp.join(args.image_folder, d)
        sub_args.output_folder = osp.join(args.output_folder, d)
        run_folder(sub_args, tester)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default="configs/poco_cliff.yaml")
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--inf_model", default="best",
                        help="checkpoint selection inside a logdir "
                             "(best / best_mpjpe_var / latest)")
    parser.add_argument("--smpl_dir", default=None)
    parser.add_argument(
        "--mode", default="folder",
        choices=["video", "folder", "directory", "webcam"],
    )
    parser.add_argument("--vid_file", default=None)
    parser.add_argument("--image_folder", default="demo_data/images")
    parser.add_argument("--output_folder", default="out/demo")
    parser.add_argument(
        "--detector", default="refine",
        choices=["yolo", "maskrcnn", "full_frame", "hog", "refine", "uncert"],
        help="yolo: TPU-native YOLOv3 (needs the pretrained "
             "yolov3.weights file — the reference's detector, "
             "tester.py:113-151); maskrcnn: host-side torchvision Mask "
             "R-CNN when installed (reference demo.py:258 parity; falls "
             "back to yolo with a notice otherwise); "
             "refine (default): proposals (HOG when "
             "the cv2 build ships it, else full-frame) refined by the "
             "model's own predicted keypoints (pose-tracking-quality "
             "boxes); uncert: confidence-guided multi-person detection "
             "(tiled windows scored by predicted uncertainty, no "
             "detector weights); hog: raw OpenCV HOG+SVM; full_frame: "
             "one whole-frame box",
    )
    parser.add_argument(
        "--yolo_weights", default=None,
        help="path to Darknet yolov3.weights (default: "
             "$POCO_TPU_YOLO_WEIGHTS or data/detector/yolov3.weights)",
    )
    parser.add_argument("--yolo_img_size", type=int, default=416,
                        help="input image size for the yolo detector")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--tracker_batch_size", type=int, default=12)
    parser.add_argument("--exp", default="",
                        help="short experiment tag appended to output "
                             "names (reference demo.py:60-87)")
    parser.add_argument("--skip_frame", type=int, default=1,
                        help="process every Nth image in folder mode")
    parser.add_argument(
        "--no_kinematic_uncert", action="store_false",
        help="disable kinematic-chain uncertainty accumulation (matches "
             "the reference quirk: the demo forces KINEMATIC_UNCERT on "
             "unless this flag is given, tester.py:59)",
    )
    parser.add_argument("--display", action="store_true",
                        help="show rendered frames in a cv2 window")
    parser.add_argument("--tracking_method", default="bbox",
                        choices=["bbox", "pose"])
    parser.add_argument("--staf_dir", default=None,
                        help="STAF/OpenPose build dir for pose tracking")
    # smoothing
    parser.add_argument("--smooth", action="store_true")
    parser.add_argument("--min_cutoff", type=float, default=0.004)
    parser.add_argument("--beta", type=float, default=0.7)
    # rendering
    parser.add_argument("--no_render", action="store_true")
    # webcam/streaming mode
    parser.add_argument("--webcam_source", default="0",
                        help="camera index, stream URL, or a directory "
                             "(replay mode) for --mode webcam")
    parser.add_argument("--max_frames", type=int, default=None,
                        help="stop the webcam stream after N frames")
    parser.add_argument("--stream_sequential", action="store_true",
                        help="disable the depth-1 dispatch-ahead stream "
                             "pipeline (debug/attribution; outputs are "
                             "bit-identical either way)")
    parser.add_argument("--render_crop", action="store_true",
                        help="render the overlay on the 224px crop "
                             "instead of the original frame")
    parser.add_argument("--no_uncert_color", action="store_true")
    parser.add_argument("--sideview", action="store_true")
    parser.add_argument("--wireframe", action="store_true")
    parser.add_argument("--save_obj", action="store_true")
    parser.add_argument("--draw_keypoints", action="store_true")
    # directory mode chunking
    parser.add_argument("--dir_chunk_size", type=int, default=-1)
    parser.add_argument("--dir_chunk", type=int, default=0)
    args = parser.parse_args()
    if args.exp:
        # reference demo.py:60-87: experiment tag folds into output paths
        args.output_folder = args.output_folder.rstrip("/") + "_" + args.exp

    tester = build_tester(args)
    if args.mode == "webcam":
        run_webcam(args, tester)
    elif args.mode == "video":
        run_video(args, tester)
    elif args.mode == "folder":
        run_folder(args, tester)
    else:
        run_directory(args, tester)


if __name__ == "__main__":
    main()
