"""Synthetic occlusion augmentation: keypoint-targeted occluder pasting.

Reference contract: pocolib/dataset/occlusion.py:43-150. Occluder patches
are RGBA numpy arrays (alpha-blended paste). `load_pascal_occluders`
extracts segmented non-person objects from a Pascal VOC root when one is
available; `synthetic_occluders` generates simple random patches so the
augmentation path stays exercisable without the VOC download.
"""

from __future__ import annotations

import os

import cv2
import numpy as np


def paste_over(im_src: np.ndarray, im_dst: np.ndarray, center) -> None:
    """Alpha-blend `im_src` (RGBA) onto `im_dst` (RGB) in place at center.

    Reference: occlusion.py paste_over.
    """
    w_src, h_src = im_src.shape[1], im_src.shape[0]
    w_dst, h_dst = im_dst.shape[1], im_dst.shape[0]
    center = np.round(np.asarray(center)).astype(np.int32)
    raw_start = center - np.array([w_src // 2, h_src // 2])
    raw_end = raw_start + np.array([w_src, h_src])
    start = np.clip(raw_start, 0, [w_dst, h_dst])
    end = np.clip(raw_end, 0, [w_dst, h_dst])
    region = im_dst[start[1]:end[1], start[0]:end[0]]
    src_start = start - raw_start
    src_end = src_start + (end - start)
    src = im_src[src_start[1]:src_end[1], src_start[0]:src_end[0]]
    if src.size == 0 or region.size == 0:
        return
    rgb = src[..., :3]
    alpha = (src[..., 3:4].astype(np.float32) / 255.0)
    im_dst[start[1]:end[1], start[0]:end[0]] = (
        alpha * rgb + (1.0 - alpha) * region
    )


def resize_by_factor(im: np.ndarray, factor: float) -> np.ndarray:
    new_size = tuple(
        np.maximum(np.round(np.array([im.shape[1], im.shape[0]]) * factor), 1)
        .astype(int)
    )
    interp = cv2.INTER_LINEAR if factor > 1.0 else cv2.INTER_AREA
    return cv2.resize(im, new_size, fx=factor, fy=factor, interpolation=interp)


def occlude_with_objects_kp(
    im: np.ndarray,
    kp2d_norm: np.ndarray,
    scale: float,
    occluders: list[np.ndarray],
    rng: np.random.RandomState,
    img_size: int = 224,
) -> np.ndarray:
    """Paste 1-7 occluders near visible GT keypoints.

    Reference: occlude_with_pascal_objects_kp (occlusion.py:108-148):
    pick random visible joints of the 24 GT keypoints, jitter the paste
    center by 0.1*scale, scale occluders by a random factor relative to
    the 256px reference size.

    Args:
        im: (H, W, 3) crop, float [0, 255].
        kp2d_norm: (49, 3) keypoints in [-1, 1] crop coords + confidence.
        scale: bbox scale (height/200).
    """
    result = im.copy()
    im_w, im_h = im.shape[1], im.shape[0]
    im_scale_factor = min(im_w, im_h) / 256.0
    count = rng.randint(1, 8)

    kp = kp2d_norm[25:].copy()
    kp[:, :2] = 0.5 * img_size * (kp[:, :2] + 1.0)
    visible = kp[kp[:, 2] > 0.3]
    if len(visible) == 0 or len(occluders) == 0:
        return result

    for _ in range(count):
        occ = occluders[rng.randint(len(occluders))]
        x, y = visible[rng.randint(len(visible))][:2]
        x = int(np.clip(x + rng.randn() * 0.1 * scale, 0, im_w))
        y = int(np.clip(y + rng.randn() * 0.1 * scale, 0, im_h))
        factor = rng.uniform(0.2, 1.0) * im_scale_factor + 1e-8
        occ = resize_by_factor(occ, factor)
        paste_over(occ, result, (x, y))
    return result


def occlude_with_objects(
    im: np.ndarray,
    occluders: list[np.ndarray],
    rng: np.random.RandomState,
) -> np.ndarray:
    """Paste 1-7 occluders at uniformly random positions (the reference's
    non-keypoint variant, occlusion.py occlude_with_pascal_objects:152-176)."""
    result = im.copy()
    width_height = np.asarray([im.shape[1], im.shape[0]])
    im_scale_factor = min(width_height) / 256.0
    count = rng.randint(1, 8)
    if len(occluders) == 0:
        return result
    for _ in range(count):
        occ = occluders[rng.randint(len(occluders))]
        center = rng.uniform([0, 0], width_height)
        factor = rng.uniform(0.2, 1.0) * im_scale_factor + 1e-8
        occ = resize_by_factor(occ, factor)
        paste_over(occ, result, center)
    return result


def load_coco_occluders(path: str) -> dict:
    """Load the COCO occluder archive (reference occlusion.py:100-106).

    The pkl holds {'stats': {joint_name: [(obj_class, h, scale), ...]},
    'obj_class': array of class names, 'object_with_mask': list of RGBA
    patches}; per-joint occlusion frequency is derived from stats.
    """
    import joblib

    occluders = joblib.load(path)
    # Per-joint frequency aligned by JOINT NAME to the SPIN 24-joint
    # order (index order of the stats dict is not a contract: a stats
    # key order differing from the registry would silently address the
    # wrong joints' visibility/positions downstream).
    from ..utils.kp_utils import JOINT_NAME_REGISTRY

    joint_names = JOINT_NAME_REGISTRY["spin"][25:]
    stats = occluders["stats"]
    freq = np.array(
        [len(stats.get(name, ())) for name in joint_names], np.float64
    )
    if freq.sum() == 0:
        # unknown naming scheme: fall back to uniform over 24 joints
        freq = np.ones(len(joint_names), np.float64)
    occluders["joint_occ_freq"] = freq / freq.sum()
    return occluders


def occlude_with_coco_objects(
    im: np.ndarray,
    kp2d_norm: np.ndarray,
    occluders: dict,
    rng: np.random.RandomState,
    img_size: int = 224,
    max_n_objects: int = 4,
) -> np.ndarray:
    """COCO-statistics occlusion: joints are occluded with the empirical
    per-joint frequency and class statistics from COCO annotations.

    Reference: occlusion.py occlude_with_coco_objects:178-245.
    """
    from ..utils.kp_utils import JOINT_NAME_REGISTRY

    result = im.copy()
    kp = kp2d_norm[25:].copy()
    kp[:, :-1] = 0.5 * img_size * (kp[:, :-1] + 1.0)
    joint_names = JOINT_NAME_REGISTRY["spin"][25:]

    count = rng.randint(0, max_n_objects)
    if count == 0 or not np.any(kp[:, 2] >= 0.5):
        return result

    j_occ_prob = np.asarray(occluders["joint_occ_freq"], np.float64).copy()
    j_occ_prob = j_occ_prob / j_occ_prob.sum()
    obj_class = np.asarray(occluders["obj_class"])

    for _ in range(count):
        # rejection-sample a visible joint by occlusion frequency
        # (reference: multinomial + nonvis retry loop, bounded here)
        jid = None
        for _ in range(50):
            cand = int(rng.multinomial(1, j_occ_prob).argmax())
            if kp[cand, 2] >= 0.5:
                jid = cand
                break
        if jid is None:
            continue
        center = kp[jid, :2]
        stats = occluders["stats"].get(joint_names[jid], [])
        if not stats:
            continue
        occluder_info = stats[rng.randint(len(stats))]
        matches = np.argwhere(obj_class == occluder_info[0])
        if len(matches) == 0:
            continue
        occ_id = int(matches[rng.randint(len(matches))][0])
        mask = occluders["object_with_mask"][occ_id]
        factor = (
            1.0 / (mask.shape[0] / img_size) * rng.uniform(0.05, 0.7)
        )
        mask = resize_by_factor(mask, factor)
        paste_over(mask, result, center)
    return result


def synthetic_coco_occluders(n: int = 12, seed: int = 0) -> dict:
    """A structurally-faithful stand-in for the COCO occluder archive so
    the COCO path stays exercisable without the license-gated pkl."""
    from ..utils.kp_utils import JOINT_NAME_REGISTRY

    rng = np.random.RandomState(seed)
    patches = synthetic_occluders(n=n, seed=seed)
    classes = np.array([f"class_{i % 4}" for i in range(n)])
    joint_names = JOINT_NAME_REGISTRY["spin"][25:]
    stats = {
        name: [
            (classes[rng.randint(n)], 64, 2.0)
            for _ in range(rng.randint(1, 5))
        ]
        for name in joint_names
    }
    occ = {
        "stats": stats,
        "obj_class": classes,
        "object_with_mask": patches,
    }
    freq = np.array([len(v) for v in stats.values()], np.float64)
    occ["joint_occ_freq"] = freq / freq.sum()
    return occ


def load_pascal_occluders(pascal_voc_root_path: str) -> list[np.ndarray]:
    """Extract segmented non-person occluder patches from a VOC root.

    Reference: occlusion.py:43-98. Requires the VOC2012 layout
    (Annotations/, SegmentationObject/, JPEGImages/).
    """
    import glob
    import xml.etree.ElementTree as ET

    occluders = []
    seg_dir = os.path.join(pascal_voc_root_path, "SegmentationObject")
    ann_dir = os.path.join(pascal_voc_root_path, "Annotations")
    img_dir = os.path.join(pascal_voc_root_path, "JPEGImages")
    structuring_element = np.ones((8, 8), np.uint8)

    for ann_path in sorted(glob.glob(os.path.join(ann_dir, "*.xml"))):
        root = ET.parse(ann_path).getroot()
        is_segmented = root.find("segmented")
        if is_segmented is None or is_segmented.text != "1":
            continue
        boxes = []
        for i_obj, obj in enumerate(root.findall("object")):
            name = obj.find("name").text
            difficult = obj.find("difficult")
            if name == "person" or (
                difficult is not None and difficult.text == "1"
            ):
                continue
            bb = obj.find("bndbox")
            boxes.append(
                (
                    i_obj,
                    [
                        int(bb.find("xmin").text), int(bb.find("ymin").text),
                        int(bb.find("xmax").text), int(bb.find("ymax").text),
                    ],
                )
            )
        if not boxes:
            continue
        stem = os.path.splitext(os.path.basename(ann_path))[0]
        seg_path = os.path.join(seg_dir, stem + ".png")
        jpg_path = os.path.join(img_dir, stem + ".jpg")
        seg = cv2.imread(seg_path, cv2.IMREAD_GRAYSCALE)
        img = cv2.imread(jpg_path)
        if seg is None or img is None:
            continue
        img = img[:, :, ::-1]
        for i_obj, (xmin, ymin, xmax, ymax) in boxes:
            mask = (seg[ymin:ymax, xmin:xmax] == i_obj + 1).astype(np.uint8) * 255
            if mask.size == 0:
                continue
            eroded = cv2.erode(mask, structuring_element)
            if eroded.mean() < 0.20 * 255:  # too thin / noisy
                continue
            patch = img[ymin:ymax, xmin:xmax]
            rgba = np.concatenate([patch, eroded[..., None]], axis=-1)
            occluders.append(rgba.astype(np.uint8))
    return occluders


def synthetic_occluders(
    n: int = 32, seed: int = 0, max_size: int = 80
) -> list[np.ndarray]:
    """Random colored elliptical patches — a stand-in occluder set that
    keeps the augmentation path testable without VOC data."""
    rng = np.random.RandomState(seed)
    occluders = []
    for _ in range(n):
        h = rng.randint(16, max_size)
        w = rng.randint(16, max_size)
        patch = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        alpha = np.zeros((h, w), np.uint8)
        cv2.ellipse(
            alpha, (w // 2, h // 2), (w // 2 - 1, h // 2 - 1), 0, 0, 360,
            255, -1,
        )
        occluders.append(np.dstack([patch, alpha]))
    return occluders
