"""Demo pipeline utilities: video IO, camera/keypoint coordinate
conversions, depth-sorted render preparation.

Reference contract: pocolib/utils/demo_utils.py:183-315. ffmpeg stays a
host subprocess; the coordinate conversions are pure numpy.
"""

from __future__ import annotations

import os
import os.path as osp
import subprocess
from collections import OrderedDict

import numpy as np


def _has_ffmpeg() -> bool:
    import shutil

    return shutil.which("ffmpeg") is not None


def download_youtube_clip(url: str, download_folder: str) -> str | None:
    """Download a YouTube video for the video demo.

    Reference contract: demo_utils.py:86-88 (pytube). Tries pytube if
    installed, then the yt-dlp binary; returns the downloaded file path
    or None when neither backend is available / the download fails.
    """
    import shutil

    os.makedirs(download_folder, exist_ok=True)
    try:
        from pytube import YouTube  # optional dependency

        stream = YouTube(url).streams.get_highest_resolution()
        return stream.download(output_path=download_folder)
    except ImportError:
        pass
    except Exception:
        return None
    if shutil.which("yt-dlp"):
        out_tpl = osp.join(download_folder, "%(id)s.%(ext)s")
        try:
            r = subprocess.run(
                ["yt-dlp", "-f", "best[ext=mp4]/best", "-o", out_tpl,
                 "--print", "after_move:filepath", url],
                capture_output=True, text=True, check=True,
            )
            path = r.stdout.strip().splitlines()[-1]
            return path if osp.exists(path) else None
        except (subprocess.CalledProcessError, IndexError):
            return None
    return None


def video_to_images(
    vid_file: str, img_folder: str | None = None, return_info: bool = False,
    ext: str = "jpg",
):
    """Extract frames: ffmpeg when available (reference
    demo_utils.py:183-208), cv2.VideoCapture otherwise.

    Frames are extracted as high-quality JPEG by default (qscale 2) so
    the native C++ JPEG loader can decode them on the hot path; pass
    ext="png" for lossless frames (the reference's choice, at ~10x the
    decode cost)."""
    import cv2

    if img_folder is None:
        img_folder = osp.join(
            "/tmp", osp.basename(vid_file).replace(".", "_")
        )
    os.makedirs(img_folder, exist_ok=True)
    # stale frames from a previous (possibly longer / other-format)
    # extraction would interleave with the new ones in sorted order
    for f in os.listdir(img_folder):
        if f.lower().endswith((".png", ".jpg", ".jpeg")):
            os.remove(osp.join(img_folder, f))
    if _has_ffmpeg():
        command = ["ffmpeg", "-i", vid_file, "-f", "image2", "-v", "error"]
        if ext == "jpg":
            command += ["-qscale:v", "2"]
        command += [f"{img_folder}/%06d.{ext}"]
        subprocess.run(command, check=True)
    else:
        cap = cv2.VideoCapture(vid_file)
        idx = 1
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            cv2.imwrite(
                osp.join(img_folder, f"{idx:06d}.{ext}"), frame,
                [cv2.IMWRITE_JPEG_QUALITY, 95] if ext == "jpg" else [],
            )
            idx += 1
        cap.release()
    if return_info:
        first = sorted(os.listdir(img_folder))[0]
        img_shape = cv2.imread(osp.join(img_folder, first)).shape
        return img_folder, len(os.listdir(img_folder)), img_shape
    return img_folder


def images_to_video(
    img_folder: str, output_vid_file: str, fps: int = 30,
    pattern: str = "%06d.png",
):
    """Assemble frames into an mp4 (reference demo_utils.py:237-246);
    cv2.VideoWriter fallback when ffmpeg is unavailable."""
    import cv2

    os.makedirs(osp.dirname(output_vid_file) or ".", exist_ok=True)
    if _has_ffmpeg():
        command = [
            "ffmpeg", "-y", "-framerate", str(fps), "-threads", "16", "-i",
            f"{img_folder}/{pattern}", "-profile:v", "baseline", "-level",
            "3.0", "-c:v", "libx264", "-pix_fmt", "yuv420p", "-an", "-v",
            "error", output_vid_file,
        ]
        subprocess.run(command, check=True)
        return
    frames = sorted(
        f for f in os.listdir(img_folder) if f.endswith((".png", ".jpg"))
    )
    if not frames:
        raise FileNotFoundError(f"no frames in {img_folder}")
    first = cv2.imread(osp.join(img_folder, frames[0]))
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(
        output_vid_file, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for f in frames:
        writer.write(cv2.imread(osp.join(img_folder, f)))
    writer.release()


def convert_crop_cam_to_orig_img(
    cam: np.ndarray, bbox: np.ndarray, img_width: float, img_height: float
) -> np.ndarray:
    """Weak-perspective crop camera -> original-image ortho camera.

    Reference: demo_utils.py:249-266.

    Args:
        cam: (N, 3) [s, tx, ty] in crop coords.
        bbox: (N, 3+) rows (cx, cy, h).
    Returns:
        (N, 4) [sx, sy, tx, ty] in original-image coords.
    """
    cx, cy, h = bbox[:, 0], bbox[:, 1], bbox[:, 2]
    hw, hh = img_width / 2.0, img_height / 2.0
    sx = cam[:, 0] * (1.0 / (img_width / h))
    sy = cam[:, 0] * (1.0 / (img_height / h))
    tx = ((cx - hw) / hw / sx) + cam[:, 1]
    ty = ((cy - hh) / hh / sy) + cam[:, 2]
    return np.stack([sx, sy, tx, ty]).T


def convert_crop_coords_to_orig_img(
    bbox: np.ndarray, keypoints: np.ndarray, crop_size: int
) -> np.ndarray:
    """Normalized crop keypoints -> original-image pixels
    (reference demo_utils.py:268-281)."""
    cx, cy, h = bbox[:, 0], bbox[:, 1], bbox[:, 2]
    kp = 0.5 * crop_size * (keypoints + 1.0)
    kp = kp * (h[..., None, None] / crop_size)
    kp[..., 0] = (cx - h / 2)[..., None] + kp[..., 0]
    kp[..., 1] = (cy - h / 2)[..., None] + kp[..., 1]
    return kp


def split_into_chunks(frame_ids, seqlen: int, stride: int) -> list:
    """Split a frame-index track into overlapping temporal chunks.

    Reference contract: vibe_image_utils.py:354-371 — used to batch video
    tracklets into fixed-length windows.

    Returns a list of (start_index, end_index) pairs into `frame_ids`.
    """
    import numpy as np

    frame_ids = list(frame_ids)
    if len(frame_ids) < seqlen:
        return [(0, len(frame_ids))] if frame_ids else []
    chunks = []
    start = 0
    while start + seqlen <= len(frame_ids):
        chunks.append((start, start + seqlen))
        start += stride
    if chunks and chunks[-1][1] < len(frame_ids):
        chunks.append((len(frame_ids) - seqlen, len(frame_ids)))
    return chunks


def prepare_rendering_results(results: dict, nframes: int) -> list:
    """Per-frame, depth-ordered person render list.

    Reference: demo_utils.py:283-315 — people sorted by the y-scale of
    the original-image weak-perspective camera (far to near).

    Args:
        results: dict[person_id] with arrays 'verts', 'orig_cam',
            'frame_ids', optional 'smpl_joints2d', 'var', 'var_global'.
    """
    frame_results = [{} for _ in range(nframes)]
    for person_id, person_data in results.items():
        for idx, frame_id in enumerate(person_data["frame_ids"]):
            entry = {
                "verts": person_data["verts"][idx],
                "cam": person_data["orig_cam"][idx],
            }
            if "smpl_joints2d" in person_data:
                entry["joints2d"] = person_data["smpl_joints2d"][idx]
            for key in ("var", "var_global"):
                val = person_data.get(key)
                entry[key] = (
                    val[idx] if val is not None and len(val) > 1 else None
                )
            frame_results[frame_id][person_id] = entry

    for frame_id, frame_data in enumerate(frame_results):
        keys = list(frame_data.keys())
        sort_idx = np.argsort([frame_data[k]["cam"][1] for k in keys])
        frame_results[frame_id] = OrderedDict(
            (keys[i], frame_data[keys[i]]) for i in sort_idx
        )
    return frame_results
