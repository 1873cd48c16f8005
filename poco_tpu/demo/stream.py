"""Streaming / webcam demo mode.

The reference leaves webcam mode unimplemented
(/root/reference/demo.py:103-105 raises NotImplementedError); this is a
beyond-reference surface built on the same fused crop->forward XLA
program as the folder demo (tester.infer_frame): a frame source feeds
one frame at a time, detections and SMPL outputs stream back with a
measured per-frame latency, and the streaming `OneEuroFilter`
(utils/one_euro.py) temporally smooths the primary person.

Frame sources:
  * `DirectoryFrameSource` — a directory of images consumed in sorted
    order; the CI/test source (and a poor man's "camera replay").
  * `VideoCaptureFrameSource` — cv2.VideoCapture over a device index or
    stream URL, used when a camera is actually present.
  * `open_source(spec)` picks one from a CLI string.

Smoothing note: the offline path smooths pose rotations and re-runs
SMPL per frame (utils/smooth_pose.py, reference smooth_pose.py:25-71).
Streaming instead filters the rendered quantities (vertices, camera,
2D joints) directly — visually equivalent, and it costs zero extra
device dispatches per frame, which is what a live loop cares about.
"""

from __future__ import annotations

import os
import os.path as osp
import time
from typing import Any

import numpy as np


class DirectoryFrameSource:
    """Sorted images of a directory as a frame stream (test source)."""

    def __init__(self, folder: str, loop: bool = False,
                 max_frames: int | None = None):
        from ..data.inference import images_in_folder

        self.files = images_in_folder(folder)
        if not self.files:
            raise ValueError(f"no images in {folder}")
        if max_frames is not None:
            self.files = self.files[:max_frames]
        self.loop = loop
        self._i = 0

    def read(self) -> np.ndarray | None:
        from ..runtime.loader import read_image_rgb

        if self._i >= len(self.files):
            if not self.loop:
                return None
            self._i = 0
        path = self.files[self._i]
        self._i += 1
        return read_image_rgb(path)

    def close(self) -> None:
        pass


class VideoCaptureFrameSource:
    """cv2.VideoCapture wrapper (webcam index or stream URL)."""

    def __init__(self, device: int | str = 0):
        import cv2

        self.cap = cv2.VideoCapture(device)
        if not self.cap.isOpened():
            raise RuntimeError(
                f"cannot open video capture {device!r} (no camera in "
                "this environment? use a directory path as the source "
                "for replay mode)"
            )

    def read(self) -> np.ndarray | None:
        ok, frame = self.cap.read()
        if not ok:
            return None
        return frame[:, :, ::-1].copy()  # BGR -> RGB

    def close(self) -> None:
        self.cap.release()


def open_source(spec: str, max_frames: int | None = None):
    """'0' / '1' / 'webcam:N' -> VideoCapture; a directory -> replay."""
    if os.path.isdir(spec):
        return DirectoryFrameSource(spec, max_frames=max_frames)
    if spec.startswith("webcam:"):
        spec = spec.split(":", 1)[1]
    if spec.isdigit():
        return VideoCaptureFrameSource(int(spec))
    return VideoCaptureFrameSource(spec)


def run_stream(
    tester,
    source,
    output_folder: str | None = None,
    smooth: bool = True,
    min_cutoff: float = 0.004,
    beta: float = 1.5,
    uncert_color: bool = True,
    display: bool = False,
    render: bool = True,
    max_frames: int | None = None,
    pipeline: bool = True,
) -> dict[str, Any]:
    """Drive the fused per-frame pipeline over a frame source.

    With `pipeline=True` (default) the loop runs a depth-1 dispatch-
    ahead pipeline — the same pattern as the serving MicroBatcher:
    frame N's device leg (upload + forward + fetch, which over the
    remote-TPU tunnel is RTT-dominated) overlaps frame N+1's detection
    and frame N-1's render, so throughput approaches
    max(device leg, host work) instead of their sum. Results are
    finalized strictly in frame order, so smoothing and rendering are
    bit-identical to the sequential path (pipeline=False).

    Returns latency statistics in milliseconds: per-frame end-to-end
    (detect-start to render-done — under pipelining this spans one
    pipeline slot) and model-only (dispatch to fetch-complete), plus
    `fps` = frames / total wall time (the throughput the pipeline
    improves).
    """
    from ..viz.renderer import get_vertex_colors

    if output_folder:
        os.makedirs(output_folder, exist_ok=True)

    frame = source.read()
    if frame is None:
        raise ValueError("empty frame source")

    def _bucket_for(h: int, w: int) -> tuple[int, int]:
        return (-(-h // 256) * 256, -(-w // 256) * 256)

    bucket_hw = _bucket_for(*frame.shape[:2])
    tester.warmup(frame.shape[:2])
    lbs_weights = np.asarray(tester.smpl.lbs_weights)

    filters: dict[str, Any] = {}
    lat_e2e: list[float] = []
    lat_model: list[float] = []
    n_frames = 0
    n_detections = 0

    def _smooth(key: str, t: float, x: np.ndarray) -> np.ndarray:
        from ..utils.one_euro import OneEuroFilter

        f = filters.get(key)
        if f is None:
            filters[key] = OneEuroFilter(
                t, x, min_cutoff=min_cutoff, beta=beta
            )
            return x
        return np.asarray(f(t, x), x.dtype)

    def _process(st: dict[str, Any]) -> None:
        """Finalize one dispatched frame: fetch, smooth, render, log."""
        nonlocal n_detections
        result = tester.infer_frame_finalize(st["handle"])
        t_fetched = time.perf_counter()
        if result:
            n_detections += len(result["bboxes"])
            if smooth:
                # Primary person (first detection): streaming OneEuro on
                # the rendered quantities. A re-detected stream has no
                # stable track ids, so only the primary is filtered.
                # Frames are finalized strictly in order, so the filter
                # state sequence is identical to the sequential path.
                t = st["idx"]  # frame index as filter time base
                for key in ("verts", "orig_cam", "smpl_joints2d"):
                    sm = _smooth(key, t, result[key][0])
                    result[key] = np.concatenate(
                        [sm[None], result[key][1:]], axis=0
                    )
            if render and (output_folder or display):
                canvas = st["frame"].copy()
                var = result["var"]
                for pi in range(len(result["bboxes"])):
                    vc = None
                    if uncert_color and var is not None:
                        vc = get_vertex_colors(
                            var[pi].copy(),
                            lbs_weights,
                            backbone=tester.backbone,
                        )
                    canvas = tester.renderer.render(
                        canvas, result["verts"][pi],
                        result["orig_cam"][pi], vertex_colors=vc,
                    )
                if output_folder:
                    import cv2

                    cv2.imwrite(
                        osp.join(output_folder, f"stream_{st['idx']:06d}.png"),
                        canvas[:, :, ::-1],
                    )
                if display:
                    tester._display_frame(canvas)
        t_done = time.perf_counter()
        lat_model.append((t_fetched - st["t_disp"]) * 1e3)
        lat_e2e.append((t_done - st["t0"]) * 1e3)

    pend: dict[str, Any] | None = None
    wall_t0 = time.perf_counter()
    while frame is not None:
        if max_frames is not None and n_frames >= max_frames:
            break
        t0 = time.perf_counter()
        # A later frame may be larger than the first (mixed-size replay
        # directories, stream resolution changes): grow the upload
        # bucket — one extra compile for the new bucket, and the stream
        # survives instead of crashing on the pad write.
        bh, bw = _bucket_for(*frame.shape[:2])
        bucket_hw = (max(bucket_hw[0], bh), max(bucket_hw[1], bw))
        dets = tester.detector(frame)
        t_disp = time.perf_counter()
        handle = tester.infer_frame_dispatch(frame, dets, bucket_hw)
        cur = {"handle": handle, "frame": frame, "idx": n_frames,
               "t0": t0, "t_disp": t_disp}
        if pipeline:
            # Flush frame N-1 AFTER dispatching N: N's device leg now
            # overlaps N-1's fetch+render and (next loop) N+1's detect.
            if pend is not None:
                _process(pend)
            pend = cur
        else:
            _process(cur)
        n_frames += 1
        frame = source.read()
    if pend is not None:
        _process(pend)
    wall = time.perf_counter() - wall_t0

    source.close()
    e2e = np.asarray(lat_e2e) if lat_e2e else np.asarray([np.nan])
    mdl = np.asarray(lat_model) if lat_model else np.asarray([np.nan])
    return {
        "frames": n_frames,
        "detections": n_detections,
        "pipelined": bool(pipeline),
        "e2e_ms_p50": round(float(np.percentile(e2e, 50)), 1),
        "e2e_ms_p90": round(float(np.percentile(e2e, 90)), 1),
        "model_ms_p50": round(float(np.percentile(mdl, 50)), 1),
        "model_ms_p90": round(float(np.percentile(mdl, 90)), 1),
        "fps": round(n_frames / max(wall, 1e-9), 2),
    }
