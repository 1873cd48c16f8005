"""Demo-time datasets: per-tracklet video crops and image folders.

Reference contract: pocolib/dataset/inference.py:31-197. Items carry the
full CLIFF input set (crop, bbox_info, focal_length, scale, center,
orig_shape). Crops are produced host-side with the cv2-parity transform;
the folder demo path can instead use the fused on-device preprocessing
(poco_tpu.ops.preprocess.preprocess_crops).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Sequence

import cv2
import numpy as np

from ..constants import IMG_RES
from .dataset import calculate_bbox_info_np
from .transforms import crop_image
from ..utils.smooth_bbox import get_smooth_bbox_params


def images_in_folder(folder: str) -> list[str]:
    exts = (".png", ".jpg", ".jpeg")
    return sorted(
        osp.join(folder, f)
        for f in os.listdir(folder)
        if f.lower().endswith(exts)
    )


class InferenceDataset:
    """One person tracklet over video frames.

    Args:
        image_folder: extracted frame directory.
        frames: frame indices where the person is present.
        bboxes: (T, 4) cxcywh person boxes, or None when `joints2d` given.
        joints2d: optional (T, K, 3) keypoint track — bboxes are derived
            and smoothed from it (reference inference.py:58-67).
        scale_factor: bbox enlargement (reference default 1.1).
    """

    def __init__(
        self,
        image_folder: str,
        frames: Sequence[int],
        bboxes: np.ndarray | None = None,
        joints2d: np.ndarray | None = None,
        scale_factor: float = 1.1,
        crop_size: int = IMG_RES,
    ):
        self.image_files = np.array(images_in_folder(image_folder))
        self.frames = np.asarray(frames)
        self.joints2d = joints2d
        self.scale_factor = scale_factor
        self.crop_size = crop_size

        if bboxes is None and joints2d is not None:
            params, start, end = get_smooth_bbox_params(
                list(joints2d), vis_thresh=0.3
            )
            # params covers frames 0..end (zero-padded before `start`);
            # keep only frames with a real smoothed bbox — keypoints can
            # become invisible before the tracklet's last frame, and a
            # zero scale row would divide to inf below.
            valid = params[:, 2] > 0
            params = params[valid]
            cxcy = params[:, :2]
            # scale param is 150/person_height -> bbox edge
            size = 150.0 / params[:, 2:3] * 1.2
            bboxes = np.concatenate([cxcy, size, size], axis=1)
            self.frames = self.frames[np.nonzero(valid)[0]]
        self.bboxes = np.asarray(bboxes, np.float32)
        assert len(self.bboxes) == len(self.frames), (
            f"bbox/frame mismatch: {len(self.bboxes)} vs {len(self.frames)}"
        )

    def __len__(self) -> int:
        return len(self.frames)

    def load_all(self, num_threads: int = 0) -> dict | None:
        """Whole-tracklet batch through the native parallel decode+crop.

        One C++ thread-pool call decodes and crops every JPEG/PNG frame
        of the tracklet (the per-item path decodes each frame in Python,
        the round-2 video-demo profile's 2 s hot spot). Returns the same
        stacked dict the per-item path produces, or None when the native
        path does not apply (unsupported formats, native lib
        unavailable) — the caller falls back to per-item loading.
        """
        from ..runtime import loader as native_loader

        paths = [str(self.image_files[f]) for f in self.frames]
        if (
            not paths
            or not all(p.lower().endswith(native_loader.native_exts())
                       for p in paths)
        ):
            return None
        # Per-frame dims via header probes (no pixel decode): CLIFF's
        # orig_shape / focal_length / bbox_info conditioning must match
        # the per-item path even when frame sizes differ mid-tracklet
        # (arbitrary image folders, not just uniform ffmpeg extracts).
        orig_shapes = np.array(
            [native_loader.image_size(p) for p in paths], np.float32
        )
        centers = np.ascontiguousarray(self.bboxes[:, :2], np.float32)
        bbox_sizes = (
            np.maximum(self.bboxes[:, 2], self.bboxes[:, 3])
            * self.scale_factor
        ).astype(np.float32)
        crops, statuses = native_loader.batch_decode_crop(
            paths, centers, bbox_sizes, self.crop_size, num_threads
        )
        if statuses.any():
            return None
        scales = bbox_sizes / 200.0
        return {
            "img": crops,
            "scale": scales,
            "center": centers,
            "orig_shape": orig_shapes,
            "focal_length": np.sqrt(
                orig_shapes[:, 0] ** 2 + orig_shapes[:, 1] ** 2
            ).astype(np.float32),
            "bbox_info": np.stack(
                [
                    calculate_bbox_info_np(c, s, o)
                    for c, s, o in zip(centers, scales, orig_shapes)
                ]
            ),
            "frame_id": self.frames.astype(np.int32),
        }

    def __getitem__(self, idx: int) -> dict:
        from ..runtime.loader import read_image_rgb

        img = read_image_rgb(self.image_files[self.frames[idx]])
        orig_shape = np.array(img.shape[:2], np.float32)

        bbox = self.bboxes[idx]
        center = bbox[:2].astype(np.float32)
        bbox_size = max(bbox[2], bbox[3]) * self.scale_factor
        scale = np.float32(bbox_size / 200.0)

        crop = crop_image(
            img.astype(np.float32), center, float(scale), self.crop_size
        )
        return {
            "img": crop.astype(np.float32),
            "scale": scale,
            "center": center,
            "orig_shape": orig_shape,
            "focal_length": np.float32(
                np.sqrt(orig_shape[0] ** 2 + orig_shape[1] ** 2)
            ),
            "bbox_info": calculate_bbox_info_np(center, scale, orig_shape),
            "frame_id": np.int32(self.frames[idx]),
        }


class ImageFolderDataset:
    """All detections across an image folder (reference inference.py:138-197).

    Args:
        detections: list (per image) of (N_i, 4) cxcywh boxes.
    """

    def __init__(
        self,
        image_folder: str,
        detections: list[np.ndarray],
        scale_factor: float = 1.0,
        crop_size: int = IMG_RES,
    ):
        self.image_files = images_in_folder(image_folder)
        self.crop_size = crop_size
        self.scale_factor = scale_factor
        self.index: list[tuple[int, np.ndarray]] = []
        for img_idx, dets in enumerate(detections):
            for det in np.atleast_2d(np.asarray(dets, np.float32)):
                if det.size:
                    self.index.append((img_idx, det))

    def __len__(self) -> int:
        return len(self.index)

    def __getitem__(self, idx: int) -> dict:
        img_idx, bbox = self.index[idx]
        img = cv2.imread(self.image_files[img_idx])[:, :, ::-1]
        orig_shape = np.array(img.shape[:2], np.float32)
        center = bbox[:2].astype(np.float32)
        bbox_size = max(bbox[2], bbox[3]) * self.scale_factor
        scale = np.float32(bbox_size / 200.0)
        crop = crop_image(
            img.astype(np.float32), center, float(scale), self.crop_size
        )
        return {
            "img": crop.astype(np.float32),
            "scale": scale,
            "center": center,
            "orig_shape": orig_shape,
            "focal_length": np.float32(
                np.sqrt(orig_shape[0] ** 2 + orig_shape[1] ** 2)
            ),
            "bbox_info": calculate_bbox_info_np(center, scale, orig_shape),
            "img_idx": np.int32(img_idx),
        }
