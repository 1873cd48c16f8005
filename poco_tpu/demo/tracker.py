"""Person detection + multi-person bbox tracking for the demo pipeline.

The reference shells out to external packages (yolov3-pytorch +
multi-person-tracker, pocolib/core/tester.py:113-151). Here the
*contract* is preserved — `dict[person_id] -> {'bbox': (T, 4) cxcywh,
'frames': [frame_ids]}` — with a pluggable detector interface and a
self-contained greedy-IoU tracker, so any detector producing cxcywh
boxes (including an external YOLO service) drops in.
"""

from __future__ import annotations

from typing import Callable, Protocol

import cv2
import numpy as np

Detector = Callable[[np.ndarray], np.ndarray]
"""(H, W, 3) RGB image -> (N, 4) cxcywh person boxes."""


def full_frame_detector(img: np.ndarray) -> np.ndarray:
    """Fallback detector: one box covering the whole frame.

    Matches the demo behavior when detection is unavailable — the subject
    is assumed framed (reference single-person fallback).
    """
    h, w = img.shape[:2]
    size = max(h, w) * 0.95
    return np.array([[w / 2.0, h / 2.0, size, size]], np.float32)


def hog_person_detector(img: np.ndarray) -> np.ndarray:
    """Pure-OpenCV person detector (HOG+SVM) — dependency-free default."""
    hog = cv2.HOGDescriptor()
    hog.setSVMDetector(cv2.HOGDescriptor_getDefaultPeopleDetector())
    rects, _ = hog.detectMultiScale(
        cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2GRAY),
        winStride=(8, 8), padding=(8, 8), scale=1.05,
    )
    if len(rects) == 0:
        return full_frame_detector(img)
    boxes = []
    for x, y, w, h in rects:
        boxes.append([x + w / 2.0, y + h / 2.0, w * 1.2, h * 1.1])
    return np.asarray(boxes, np.float32)


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    """IoU of two cxcywh boxes."""
    ax0, ay0 = a[0] - a[2] / 2, a[1] - a[3] / 2
    ax1, ay1 = a[0] + a[2] / 2, a[1] + a[3] / 2
    bx0, by0 = b[0] - b[2] / 2, b[1] - b[3] / 2
    bx1, by1 = b[0] + b[2] / 2, b[1] + b[3] / 2
    ix = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    iy = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = ix * iy
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union > 0 else 0.0


class IouTracker:
    """Greedy IoU association tracker over per-frame detections."""

    def __init__(self, iou_threshold: float = 0.3, max_age: int = 10):
        self.iou_threshold = iou_threshold
        self.max_age = max_age

    def track(
        self, detections_per_frame: list[np.ndarray]
    ) -> dict[int, dict]:
        """Associate detections into tracklets.

        Args:
            detections_per_frame: list over frames of (N_i, 4) cxcywh.
        Returns:
            dict[person_id] -> {'bbox': (T, 4), 'frames': (T,) int array}
            (the reference MPT output contract, tester.py:126-137).
        """
        next_id = 0
        active: dict[int, dict] = {}   # id -> {box, age}
        tracks: dict[int, dict] = {}

        for frame_id, dets in enumerate(detections_per_frame):
            dets = np.atleast_2d(np.asarray(dets, np.float32))
            if dets.size == 0:
                dets = np.zeros((0, 4), np.float32)
            unmatched = list(range(len(dets)))
            # age out stale tracks
            for tid in list(active):
                active[tid]["age"] += 1
                if active[tid]["age"] > self.max_age:
                    del active[tid]
            # greedy match by IoU
            pairs = []
            for tid, tr in active.items():
                for di in unmatched:
                    pairs.append((_iou(tr["box"], dets[di]), tid, di))
            pairs.sort(reverse=True)
            used_t, used_d = set(), set()
            for iou, tid, di in pairs:
                if iou < self.iou_threshold:
                    break
                if tid in used_t or di in used_d:
                    continue
                used_t.add(tid)
                used_d.add(di)
                active[tid].update(box=dets[di], age=0)
                tracks[tid]["bbox"].append(dets[di])
                tracks[tid]["frames"].append(frame_id)
            # new tracks
            for di in unmatched:
                if di in used_d:
                    continue
                tid = next_id
                next_id += 1
                active[tid] = {"box": dets[di], "age": 0}
                tracks[tid] = {"bbox": [dets[di]], "frames": [frame_id]}

        return {
            tid: {
                "bbox": np.asarray(tr["bbox"], np.float32),
                "frames": np.asarray(tr["frames"], np.int64),
            }
            for tid, tr in tracks.items()
            if len(tr["frames"]) > 0
        }


def run_tracking(
    image_files: list[str],
    detector: Detector = full_frame_detector,
    min_num_frames: int = 1,
) -> dict[int, dict]:
    """Detect + track across an extracted frame folder.

    Mirrors POCOTester.run_tracking (tester.py:113-138) including the
    minimum tracklet length filter.
    """
    dets = []
    for path in image_files:
        img = cv2.imread(path)[:, :, ::-1]
        dets.append(detector(img))
    tracks = IouTracker().track(dets)
    return {
        tid: tr for tid, tr in tracks.items()
        if len(tr["frames"]) >= min_num_frames
    }
