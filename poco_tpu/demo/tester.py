"""Demo runtime: image-folder and video inference with rendering.

Reference contract: pocolib/core/tester.py:54-580 (POCOTester). TPU-first
redesign:

  * the folder path runs detection host-side, then crops, normalization
    and the POCO forward execute as one jitted XLA program per padded
    batch (fused preprocessing — BASELINE.json north star — replacing
    tester.py:171-212's per-detection numpy/torch hops);
  * batches are padded to a fixed size so varying person counts never
    recompile (SURVEY.md §7.3);
  * stage caching (detections/tracklets) is preserved so reruns skip
    straight to inference (reference demo.py:125-131).
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
import time
from typing import Any

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..config import CfgNode, model_config_from_hparams
from ..constants import IMG_RES
from ..models.poco import POCO, init_poco
from ..ops.preprocess import normalize_image, preprocess_crops
from ..smpl.lbs import SmplParams
from ..utils.demo_utils import (
    convert_crop_cam_to_orig_img,
    convert_crop_coords_to_orig_img,
    prepare_rendering_results,
)
from ..eval.uncertainty import global_uncert, prepare_uncert
from ..viz.renderer import Renderer, get_vertex_colors
from .tracker import Detector, full_frame_detector, run_tracking
from ..data.inference import InferenceDataset, images_in_folder


def draw_keypoints_2d(
    frame: np.ndarray, joints2d: np.ndarray, radius: int = 3
) -> np.ndarray:
    """Overlay projected 2D joints (reference --draw_keypoints flag,
    demo.py:279-281)."""
    out = np.ascontiguousarray(frame)
    for person in np.atleast_3d(joints2d):
        for x, y in person[:, :2]:
            if np.isfinite(x) and np.isfinite(y):
                cv2.circle(
                    out, (int(x), int(y)), radius, (0, 255, 0), -1,
                    cv2.LINE_AA,
                )
    return out


class PocoTester:
    """Folder/video demo driver.

    Args:
        hparams: config tree (config.update_hparams output).
        smpl: SMPL weights.
        variables: model variables (e.g. restored checkpoint); if None a
            fresh initialization is used (random weights — for pipeline
            testing).
        detector: person detector callable; defaults to the full-frame
            fallback (see demo.tracker for the contract).
        batch_size: padded batch size for inference.
    """

    def __init__(
        self,
        hparams: CfgNode,
        smpl: SmplParams,
        variables: dict | None = None,
        detector: Detector = full_frame_detector,
        batch_size: int = 32,
    ):
        self.hparams = hparams
        self.smpl = smpl
        self.detector = detector
        self.batch_size = batch_size
        self.model = POCO(cfg=model_config_from_hparams(hparams))
        if variables is None:
            variables = init_poco(self.model, jax.random.PRNGKey(0), smpl)
        self.variables = variables
        self.renderer = Renderer(np.asarray(smpl.faces))
        self.backbone = self.model.cfg.backbone
        self.loss_ver = self.model.cfg.loss_ver
        # Kinematic-chain uncertainty accumulation for rendering/logs
        # (reference tester.py:59 forces it from --no_kinematic_uncert).
        try:
            self.kinematic_uncert = bool(hparams.POCO.KINEMATIC_UNCERT)
        except Exception:
            self.kinematic_uncert = False

        model = self.model

        @jax.jit
        def _forward(variables, batch, smpl_params):
            return model.apply(variables, batch, smpl_params, train=False)

        self._forward = _forward

        # Compact-fetch variant for the video path: the big per-vertex /
        # per-joint outputs are cast to fp16 ON DEVICE so the host fetch
        # moves half the bytes. Over the axon tunnel the fetch is the
        # video demo's dominant cost (round-2 profile: 4.1 s of a 7.3 s
        # inference wall was fp32 vertex buffers); fp16 quantization is
        # <=1 mm at body scale — rendering-grade, and pose/shape/cam
        # stay fp32 for the saved outputs.
        @jax.jit
        def _forward_compact(variables, batch, smpl_params):
            out = dict(model.apply(variables, batch, smpl_params, train=False))
            for k in ("smpl_vertices", "smpl_joints3d", "smpl_joints2d"):
                if out.get(k) is not None:
                    out[k] = out[k].astype(jnp.float16)
            return out

        self._forward_compact = _forward_compact

        # Fused preprocessing + forward: crop -> resize -> normalize ->
        # backbone -> head -> SMPL -> uncertainty as ONE XLA program
        # (one device dispatch per image).
        from functools import partial

        @partial(jax.jit, static_argnames=())
        def _detect_forward(
            variables, image, true_hw, centers, scales, smpl_params
        ):
            batch = preprocess_crops(
                image, centers, scales, true_hw=true_hw
            )
            return model.apply(variables, batch, smpl_params, train=False)

        self._detect_forward = _detect_forward

        # Streaming compact stage: slice the 8-padded outputs to the
        # n real detections and fp16-cast the heavy per-vertex arrays
        # ON DEVICE, so the per-frame host fetch moves ~50 KB instead
        # of ~1.5 MB (the tunnel fetch dominates per-frame latency,
        # same finding as the video path's _forward_compact). n is
        # static: this tiny slice program compiles per detection
        # count, while the expensive _detect_forward stays shared
        # across counts via the pad-to-8 scheme.
        fetch_keys = self._FETCH_KEYS
        from functools import partial as _partial

        @_partial(jax.jit, static_argnames=("n",))
        def _compact_stream(out, n):
            keep = {}
            for k in fetch_keys:
                v = out.get(k)
                if v is None:
                    continue
                v = v[:n]
                # fp16 only for METRIC-space outputs (<=1 mm at body
                # scale). smpl_joints2d stays fp32: CLIFF returns it in
                # full-image PIXELS, where fp16 ulp at x~3000 (a 4K
                # frame) is 2 px — visible overlay jitter.
                if k in ("smpl_vertices", "smpl_joints3d"):
                    v = v.astype(jnp.float16)
                keep[k] = v
            return keep

        self._compact_stream = _compact_stream

        # Frame-batched variant: M same-size frames x B boxes in ONE
        # dispatch (vmap the fused crop over frames, flatten crops into
        # the model batch). Batches the per-frame refine/tracking cost
        # the way the reference batches its detector (MPT batch_size).
        @jax.jit
        def _detect_forward_frames(
            variables, images, true_hw, centers, scales, smpl_params
        ):
            def prep(im, c, s):
                return preprocess_crops(im, c, s, true_hw=true_hw)

            batch = jax.vmap(prep)(images, centers, scales)
            flat = jax.tree_util.tree_map(
                lambda v: v.reshape((-1,) + v.shape[2:]), batch
            )
            return model.apply(variables, flat, smpl_params, train=False)

        self._detect_forward_frames = _detect_forward_frames

    # ------------------------------------------------------------------
    _FETCH_KEYS = (
        "smpl_vertices", "smpl_joints3d", "smpl_joints2d",
        "pred_pose", "pred_shape", "pred_cam", "var_pose",
    )

    def _run_batches(self, batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        """Forward a host batch in fixed-size padded chunks.

        All chunks are DISPATCHED first and fetched afterwards, so
        device compute for chunk k+1 overlaps the (tunnel-bound) host
        fetch of chunk k; each chunk is fetched as one device_get (one
        round trip, not one per output key), with the heavy outputs
        fp16-compacted on device (_forward_compact).
        """
        n = batch["img"].shape[0]
        pending: list[tuple[int, dict]] = []
        for s in range(0, n, self.batch_size):
            chunk = {k: v[s : s + self.batch_size] for k, v in batch.items()}
            valid = chunk["img"].shape[0]
            if valid < self.batch_size:
                pad = self.batch_size - valid
                chunk = {
                    k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                    for k, v in chunk.items()
                }
            dev = {k: jnp.asarray(v) for k, v in chunk.items()}
            dev["img"] = normalize_image(dev["img"])
            out = self._forward_compact(self.variables, dev, self.smpl)
            pending.append(
                (valid, {k: out[k] for k in self._FETCH_KEYS
                         if out.get(k) is not None})
            )
        outs: dict[str, list] = {}
        for valid, dev_out in pending:
            host = jax.device_get(dev_out)
            for k, v in host.items():
                outs.setdefault(k, []).append(
                    np.asarray(v, np.float32)[:valid]
                )
        return {k: np.concatenate(v) for k, v in outs.items()}

    def _prep_uncert(self, out: dict) -> tuple[np.ndarray | None, np.ndarray | None]:
        if "var_pose" not in out:
            return None, None
        var = prepare_uncert(
            out["var_pose"], loss_ver=self.loss_ver,
            kinematic=self.kinematic_uncert,
        )
        var = np.clip(var, 0.0, 1.0)
        gvar = global_uncert(var.copy(), backbone=self.backbone)
        return var, gvar

    def _display_frame(self, frame: np.ndarray) -> None:
        """Show a rendered frame (reference tester.py:352, --display);
        no-op with a one-time notice when no GUI backend is available."""
        try:
            cv2.imshow("poco", frame[:, :, ::-1])
            cv2.waitKey(1)
        except cv2.error:
            if not getattr(self, "_display_warned", False):
                print("--display requested but no GUI backend; skipping")
                self._display_warned = True

    # ------------------------------------------------------------------
    def warmup(self, frame_hw: tuple[int, int] | None = None) -> None:
        """Dispatch every device program once, asynchronously (no fetch).

        The first dispatch of a process pays the weight upload (~300 MB
        over the axon tunnel) plus compiled-executable load serially
        (~9 s measured); dispatching dummy batches at build time queues
        that work so it overlaps host-side startup (frame extraction,
        file reads) instead of the first measured frame. No result is
        fetched — this returns immediately after enqueueing.
        """
        h0, w0 = frame_hw or (256, 256)
        bucket_h = -(-h0 // 256) * 256
        bucket_w = -(-w0 // 256) * 256
        # the tracking detect pass runs on 512px-long-side downscaled
        # frames (tracker.make_keypoint_refine_detector) — warm that
        # bucket too
        ds = min(1.0, 512.0 / max(h0, w0))
        hs, ws = int(round(h0 * ds)), int(round(w0 * ds))
        buckets = {(bucket_h, bucket_w, h0, w0),
                   (-(-hs // 256) * 256, -(-ws // 256) * 256, hs, ws)}
        try:
            # frame-batched fused crop+forward (tracking + video path)
            F, Bx = 8, 4
            for bh, bw, th, tw in buckets:
                self._detect_forward_frames(
                    self.variables,
                    jnp.zeros((F, bh, bw, 3), jnp.uint8),
                    jnp.asarray([th, tw], np.float32),
                    jnp.full((F, Bx, 2), 100.0, jnp.float32),
                    jnp.full((F, Bx), 1.0, jnp.float32),
                    self.smpl,
                )
            # padded-chunk forward (run_on_video path)
            dummy = {
                "img": jnp.zeros(
                    (self.batch_size, IMG_RES, IMG_RES, 3), jnp.float32
                ),
                "bbox_info": jnp.zeros((self.batch_size, 3), jnp.float32),
                "focal_length": jnp.full(
                    (self.batch_size,), 1000.0, jnp.float32
                ),
                "scale": jnp.full((self.batch_size,), 1.0, jnp.float32),
                "center": jnp.full((self.batch_size, 2), 100.0, jnp.float32),
                "orig_shape": jnp.full(
                    (self.batch_size, 2), float(h0), jnp.float32
                ),
            }
            self._forward_compact(self.variables, dummy, self.smpl)
            # single-frame fused program + compact slice (folder demo /
            # streaming path; pad-to-8 detections, n=1 primary person)
            out1 = self._detect_forward(
                self.variables,
                jnp.zeros((bucket_h, bucket_w, 3), jnp.uint8),
                jnp.asarray([h0, w0], np.float32),
                jnp.full((8, 2), 100.0, jnp.float32),
                jnp.full((8,), 1.0, jnp.float32),
                self.smpl,
            )
            self._compact_stream(dict(out1), n=1)
            if hasattr(self.detector, "warmup"):
                self.detector.warmup((h0, w0))
        except Exception as e:  # warmup is best-effort
            print(f"warmup skipped: {e}")

    def run_detector(self, image_files: list[str]) -> list[np.ndarray]:
        """Per-image detections (reference tester.py:140-151)."""
        from ..runtime.loader import read_image_rgb, read_images_rgb

        if hasattr(self.detector, "detect_batch"):
            # bounded chunks: don't hold every frame in RAM at once
            out: list[np.ndarray] = []
            CHUNK = 64
            for start in range(0, len(image_files), CHUNK):
                imgs = read_images_rgb(image_files[start:start + CHUNK])
                out.extend(self.detector.detect_batch(imgs))
            return out
        return [self.detector(read_image_rgb(p)) for p in image_files]

    def infer_keypoints(
        self, img: np.ndarray, boxes: np.ndarray
    ) -> np.ndarray:
        """Predicted 2D keypoints (original-image pixels) for each box —
        one fused crop+forward dispatch; feeds the model-in-the-loop
        detector refinement (tracker.make_keypoint_refine_detector)."""
        dets = np.atleast_2d(np.asarray(boxes, np.float32))
        centers = dets[:, :2]
        scales = np.maximum(dets[:, 2], dets[:, 3]) / 200.0
        n = len(dets)
        n_pad = -(-n // 8) * 8
        centers_p = np.concatenate(
            [centers, np.repeat(centers[-1:], n_pad - n, axis=0)]
        )
        scales_p = np.concatenate([scales, np.repeat(scales[-1:], n_pad - n)])
        h0, w0 = img.shape[:2]
        bucket_h = -(-h0 // 256) * 256
        bucket_w = -(-w0 // 256) * 256
        img_p = np.zeros((bucket_h, bucket_w, 3), img.dtype)
        img_p[:h0, :w0] = img
        out = self._detect_forward(
            self.variables,
            jnp.asarray(img_p),
            jnp.asarray([h0, w0], np.float32),
            jnp.asarray(centers_p),
            jnp.asarray(scales_p),
            self.smpl,
        )
        j2d = np.asarray(out["smpl_joints2d"])[:n]
        if "cliff" not in self.backbone:
            bbox_chw = np.concatenate(
                [centers, (scales * 200.0)[:, None]], axis=1
            )
            j2d = convert_crop_coords_to_orig_img(bbox_chw, j2d, IMG_RES)
        return j2d

    def infer_keypoints_batch(
        self,
        imgs: list[np.ndarray],
        boxes_list: list[np.ndarray],
        frames_per_dispatch: int = 8,
        return_uncert: bool = False,
    ) -> list[np.ndarray] | tuple[list[np.ndarray], list[np.ndarray]]:
        """infer_keypoints over many same-size frames, batched on device.

        Returns one (n_i, J, 2) array per frame (plus one (n_i,) global
        uncertainty per frame when return_uncert). Frames must share one
        shape (video frames do); per-frame box counts are padded to a
        common width and frame chunks to `frames_per_dispatch` so every
        chunk reuses a single compiled program.
        """
        M = len(imgs)
        h0, w0 = imgs[0].shape[:2]
        bucket_h = -(-h0 // 256) * 256
        bucket_w = -(-w0 // 256) * 256

        def _norm_boxes(b):
            b = np.asarray(b, np.float32).reshape(-1, 4)
            return b

        boxes_list = [_norm_boxes(b) for b in boxes_list]
        counts = [len(b) for b in boxes_list]
        B = max(1, -(-max(counts, default=0) // 4) * 4)

        # frames with no detections get a whole-frame dummy box for the
        # padded dispatch; their result slice is empty (the per-frame
        # path's boxes.size == 0 contract)
        dummy = np.array(
            [w0 / 2.0, h0 / 2.0, min(h0, w0), min(h0, w0)], np.float32
        )
        centers = np.zeros((M, B, 2), np.float32)
        scales = np.full((M, B), 1.0, np.float32)
        for i, b in enumerate(boxes_list):
            n = len(b)
            if n == 0:
                centers[i] = dummy[:2]
                scales[i] = max(dummy[2], dummy[3]) / 200.0
                continue
            idx = np.minimum(np.arange(B), n - 1)
            centers[i] = b[idx, :2]
            scales[i] = np.maximum(b[idx, 2], b[idx, 3]) / 200.0

        out_j2d = []
        out_gvar = []
        F = frames_per_dispatch
        for start in range(0, M, F):
            sel = list(range(start, min(start + F, M)))
            pad_sel = sel + [sel[-1]] * (F - len(sel))
            stack = np.zeros((F, bucket_h, bucket_w, 3), imgs[0].dtype)
            for k, fi in enumerate(pad_sel):
                stack[k, :h0, :w0] = imgs[fi]
            out = self._detect_forward_frames(
                self.variables,
                jnp.asarray(stack),
                jnp.asarray([h0, w0], np.float32),
                jnp.asarray(centers[pad_sel]),
                jnp.asarray(scales[pad_sel]),
                self.smpl,
            )
            j2d = np.asarray(out["smpl_joints2d"])
            j2d = j2d.reshape(F, B, *j2d.shape[1:])
            gvar = None
            if return_uncert:
                _, gflat = self._prep_uncert(
                    {k: np.asarray(v) for k, v in out.items()
                     if k == "var_pose" and v is not None}
                )
                gvar = (
                    gflat.reshape(F, B)
                    if gflat is not None
                    else np.zeros((F, B), np.float32)
                )
            for k, fi in enumerate(sel):
                ji = j2d[k, : counts[fi]]
                if "cliff" not in self.backbone:
                    b = np.atleast_2d(
                        np.asarray(boxes_list[fi], np.float32)
                    )
                    bbox_chw = np.concatenate(
                        [b[:, :2], np.maximum(b[:, 2], b[:, 3])[:, None]],
                        axis=1,
                    )
                    ji = convert_crop_coords_to_orig_img(
                        bbox_chw, ji, IMG_RES
                    )
                out_j2d.append(ji)
                if return_uncert:
                    out_gvar.append(gvar[k, : counts[fi]])
        if return_uncert:
            return out_j2d, out_gvar
        return out_j2d

    def make_refined_detector(self, base: Detector | None = None, iters: int = 1):
        """Proposals (default: the current detector) refined by the
        model's own predicted keypoints — the quality default when a
        trained checkpoint is loaded."""
        from .tracker import make_keypoint_refine_detector

        return make_keypoint_refine_detector(
            base or self.detector, self.infer_keypoints, iters=iters,
            infer_keypoints_batch=self.infer_keypoints_batch,
        )

    def infer_keypoints_with_uncert(
        self, img: np.ndarray, boxes: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Keypoints + per-box global uncertainty for the
        confidence-guided window detector (tracker.py)."""
        dets = np.atleast_2d(np.asarray(boxes, np.float32))
        centers = dets[:, :2]
        scales = np.maximum(dets[:, 2], dets[:, 3]) / 200.0
        n = len(dets)
        n_pad = -(-n // 8) * 8
        centers_p = np.concatenate(
            [centers, np.repeat(centers[-1:], n_pad - n, axis=0)]
        )
        scales_p = np.concatenate([scales, np.repeat(scales[-1:], n_pad - n)])
        h0, w0 = img.shape[:2]
        bucket_h = -(-h0 // 256) * 256
        bucket_w = -(-w0 // 256) * 256
        img_p = np.zeros((bucket_h, bucket_w, 3), img.dtype)
        img_p[:h0, :w0] = img
        out_dev = self._detect_forward(
            self.variables,
            jnp.asarray(img_p),
            jnp.asarray([h0, w0], np.float32),
            jnp.asarray(centers_p),
            jnp.asarray(scales_p),
            self.smpl,
        )
        out = {
            k: np.asarray(v)[:n]
            for k, v in out_dev.items()
            if v is not None and hasattr(v, "shape")
        }
        j2d = out["smpl_joints2d"]
        if "cliff" not in self.backbone:
            bbox_chw = np.concatenate(
                [centers, (scales * 200.0)[:, None]], axis=1
            )
            j2d = convert_crop_coords_to_orig_img(bbox_chw, j2d, IMG_RES)
        _, gvar = self._prep_uncert(out)
        if gvar is None:
            gvar = np.zeros(n, np.float32)
        return j2d, gvar

    def make_uncert_detector(self, **kwargs):
        """Confidence-guided multi-person detector (no external weights):
        tiled proposals -> keypoint boxes -> uncertainty-scored NMS."""
        from .tracker import make_uncert_window_detector

        return make_uncert_window_detector(
            self.infer_keypoints_with_uncert,
            infer_batch=self.infer_keypoints_batch, **kwargs
        )

    def infer_frame_dispatch(
        self,
        img: np.ndarray,
        dets: np.ndarray,
        bucket_hw: tuple[int, int] | None = None,
    ) -> dict[str, Any] | None:
        """Dispatch one frame's fused crop->forward program WITHOUT
        fetching the outputs.

        jax enqueues the upload + launch asynchronously and returns
        device refs, so the caller can overlap host work (the next
        frame's detection, the previous frame's render) with this
        frame's device leg — the same depth-1 dispatch-ahead pattern
        the serving MicroBatcher uses (runtime/server.py). Pass the
        result to `infer_frame_finalize`. Returns None when there are
        no detections.
        """
        dets = np.atleast_2d(np.asarray(dets, np.float32))
        if dets.size == 0:
            return None
        h0, w0 = img.shape[:2]
        if bucket_hw is None:
            bucket_hw = (-(-h0 // 256) * 256, -(-w0 // 256) * 256)
        centers = dets[:, :2]
        scales = np.maximum(dets[:, 2], dets[:, 3]) * 1.0 / 200.0
        n = len(dets)

        # Pad the detection count to a multiple of 8 so varying
        # person counts reuse the same compiled program.
        n_pad = -(-n // 8) * 8
        centers_p = np.concatenate(
            [centers, np.repeat(centers[-1:], n_pad - n, axis=0)]
        )
        scales_p = np.concatenate(
            [scales, np.repeat(scales[-1:], n_pad - n)]
        )

        # Fused on-device preprocessing + forward: one dispatch.
        # Bucket-pad the upload so different image sizes share
        # compiled programs (true shape drives the camera model).
        img_p = np.zeros((bucket_hw[0], bucket_hw[1], 3), img.dtype)
        img_p[:h0, :w0] = img
        out_dev = self._detect_forward(
            self.variables,
            jnp.asarray(img_p),
            jnp.asarray([h0, w0], np.float32),
            jnp.asarray(centers_p),
            jnp.asarray(scales_p),
            self.smpl,
        )
        compact = self._compact_stream(dict(out_dev), n=n)
        return {
            "out_dev": compact, "dets": dets, "centers": centers,
            "scales": scales, "h0": h0, "w0": w0, "n": n,
        }

    def infer_frame_finalize(
        self, pending: dict[str, Any] | None
    ) -> dict[str, Any]:
        """Fetch a dispatched frame's outputs and build the result dict
        (cam conversion, uncertainty prep). Blocks on the device leg.
        One device_get round trip of the compact (sliced, fp16-heavy)
        outputs — not one fetch per key."""
        if pending is None:
            return {}
        dets = pending["dets"]
        centers, scales = pending["centers"], pending["scales"]
        h0, w0 = pending["h0"], pending["w0"]
        host = jax.device_get(pending["out_dev"])
        out = {k: np.asarray(v, np.float32) for k, v in host.items()}

        var, gvar = self._prep_uncert(out)
        bbox_chw = np.concatenate(
            [centers, (scales * 200.0)[:, None]], axis=1
        )
        orig_cam = convert_crop_cam_to_orig_img(
            out["pred_cam"], bbox_chw, w0, h0
        )
        # CLIFF joints2d are already full-image pixel coords
        # (tester.py:216-233 skips the conversion for cliff heads).
        if "cliff" in self.backbone:
            joints2d_orig = out["smpl_joints2d"]
        else:
            joints2d_orig = convert_crop_coords_to_orig_img(
                bbox_chw, out["smpl_joints2d"], IMG_RES
            )

        return {
            "verts": out["smpl_vertices"],
            "pred_cam": out["pred_cam"],
            "orig_cam": orig_cam,
            "pose": out["pred_pose"],
            "betas": out["pred_shape"],
            "joints3d": out["smpl_joints3d"],
            "smpl_joints2d": joints2d_orig,
            "bboxes": dets,
            "var": var,
            "var_global": gvar,
        }

    def infer_frame(
        self,
        img: np.ndarray,
        dets: np.ndarray,
        bucket_hw: tuple[int, int] | None = None,
    ) -> dict[str, Any]:
        """One frame through the fused crop->forward XLA program.

        The per-frame core of the folder demo (reference
        tester.py:171-233) and of the streaming/webcam mode: detections
        are padded to a multiple of 8 and the image upload to
        `bucket_hw` so consecutive frames share one compiled program.
        Returns {} when there are no detections. Dispatch+fetch in one
        call; the streaming mode uses the split halves to pipeline.
        Heavy per-vertex outputs ride the device-side fp16 compact
        fetch (<=1 mm at body scale — the same rendering-grade
        trade the video path made in round 3, _forward_compact).
        """
        return self.infer_frame_finalize(
            self.infer_frame_dispatch(img, dets, bucket_hw)
        )

    def run_on_image_folder(
        self,
        image_folder: str,
        output_folder: str | None = None,
        detections: list[np.ndarray] | None = None,
        render: bool = True,
        sideview: bool = False,
        save_obj: bool = False,
        uncert_color: bool = True,
        draw_keypoints: bool = False,
        skip_frame: int = 1,
        render_crop: bool = False,
        display: bool = False,
    ) -> list[dict[str, Any]]:
        """Folder demo (reference tester.py:153-360).

        For each image: detect people, run the fused crop->forward XLA
        program over all detections at once, convert cameras/keypoints to
        original-image coords, optionally render overlays. skip_frame=N
        processes every Nth image (tester.py:167); render_crop renders
        onto the 224px crop with the crop camera instead of the original
        frame (tester.py:256-280); display shows each rendered frame in
        a cv2 window when a GUI is available (tester.py:352).
        """
        image_files = images_in_folder(image_folder)[:: max(skip_frame, 1)]
        if detections is None:
            detections = self.run_detector(image_files)
        if output_folder:
            os.makedirs(output_folder, exist_ok=True)

        from ..runtime.loader import read_image_rgb

        # One padded-size bucket for the whole folder: every image shares
        # a single compiled program regardless of its true size.
        sizes = [read_image_rgb(p).shape[:2] for p in image_files]
        max_h = max(s[0] for s in sizes) if sizes else 0
        max_w = max(s[1] for s in sizes) if sizes else 0
        bucket_h = -(-max_h // 256) * 256
        bucket_w = -(-max_w // 256) * 256

        results = []
        t0 = time.perf_counter()
        n_crops = 0
        for img_path, dets in zip(image_files, detections):
            img = read_image_rgb(img_path)
            result = self.infer_frame(img, dets, (bucket_h, bucket_w))
            results.append(result)
            if not result:
                continue
            n = len(result["bboxes"])
            n_crops += n
            dets = result["bboxes"]
            centers = dets[:, :2]
            scales = np.maximum(dets[:, 2], dets[:, 3]) * 1.0 / 200.0
            out = result
            orig_cam = result["orig_cam"]
            var = result["var"]

            if render and output_folder:
                if render_crop:
                    # reference tester.py:256-280: overlay on the 224px
                    # crop of the first detection, crop-space camera
                    from ..data.transforms import crop_image

                    frame = crop_image(img, centers[0], scales[0])
                else:
                    frame = img.copy()
                # White sideview canvas, concatenated after the person
                # loop (reference tester.py:274,348).
                side_frame = (
                    np.ones_like(frame) * 255 if sideview else None
                )
                for pi in range(n):
                    vc = None
                    if uncert_color and var is not None:
                        vc = get_vertex_colors(
                            var[pi].copy(),
                            np.asarray(self.smpl.lbs_weights),
                            backbone=self.backbone,
                        )
                    if not render_crop or pi == 0:
                        # render_crop: one crop = one person overlay,
                        # but obj export still covers every person
                        cam_pi = (
                            out["pred_cam"][pi] if render_crop
                            else orig_cam[pi]
                        )
                        frame = self.renderer.render(
                            frame, result["verts"][pi], cam_pi,
                            vertex_colors=vc,
                        )
                        if side_frame is not None:
                            # same camera, mesh rotated 270deg about y
                            # (reference tester.py:336-346)
                            side_frame = self.renderer.render(
                                side_frame, result["verts"][pi], cam_pi,
                                vertex_colors=vc,
                                angle=270.0, axis=(0, 1, 0),
                            )
                    if save_obj:
                        from ..viz.renderer import save_obj as _save_obj

                        _save_obj(
                            osp.join(
                                output_folder,
                                f"{osp.basename(img_path)}_{pi}.obj",
                            ),
                            result["verts"][pi],
                            np.asarray(self.smpl.faces),
                        )
                if draw_keypoints:
                    frame = draw_keypoints_2d(
                        frame, result["smpl_joints2d"]
                    )
                if side_frame is not None:
                    # side-by-side output file (reference tester.py:348)
                    frame = np.concatenate([frame, side_frame], axis=1)
                out_path = osp.join(output_folder, osp.basename(img_path))
                cv2.imwrite(out_path, frame[:, :, ::-1])
                if display:
                    self._display_frame(frame)
        dt = time.perf_counter() - t0
        if n_crops:
            self.last_fps = n_crops / dt
        return results

    # ------------------------------------------------------------------
    def run_tracking(
        self, image_folder: str, cache_file: str | None = None
    ) -> dict[int, dict]:
        """Track people across frames, with pkl stage caching
        (reference demo.py:125-131)."""
        if cache_file and osp.exists(cache_file):
            with open(cache_file, "rb") as f:
                return pickle.load(f)
        tracks = run_tracking(
            images_in_folder(image_folder), self.detector
        )
        if cache_file:
            with open(cache_file, "wb") as f:
                pickle.dump(tracks, f)
        return tracks

    def run_on_video(
        self,
        image_folder: str,
        tracks: dict[int, dict] | None = None,
        smooth: bool = False,
        min_cutoff: float = 0.004,
        beta: float = 0.7,
    ) -> dict[int, dict]:
        """Video demo over extracted frames (reference tester.py:362-480).

        Returns dict[person_id] with per-frame arrays verts/pose/betas/
        cams/joints/uncertainty, ready for `render_results`.
        """
        if tracks is None:
            tracks = self.run_tracking(image_folder)
        image_files = images_in_folder(image_folder)
        if not image_files:
            return {}
        from ..runtime.loader import read_image_rgb

        h, w = read_image_rgb(image_files[0]).shape[:2]

        results: dict[int, dict] = {}
        for person_id, track in tracks.items():
            # Bbox tracklets (IoU tracker) or keypoint tracklets
            # (pose tracking, reference tester.py:369-377): derive and
            # smooth bboxes from joints2d when no bbox track exists.
            dataset = InferenceDataset(
                image_folder,
                frames=track["frames"],
                bboxes=track.get("bbox"),
                joints2d=track.get("joints2d"),
            )
            batch = dataset.load_all()  # native parallel decode+crop
            if batch is not None:
                batch.pop("frame_id", None)
            else:
                items = [dataset[i] for i in range(len(dataset))]
                if not items:
                    continue
                batch = {
                    k: np.stack([it[k] for it in items])
                    for k in items[0]
                    if k != "frame_id"
                }
            if not len(batch["img"]):
                continue
            out = self._run_batches(batch)
            var, gvar = self._prep_uncert(out)

            if smooth:
                from ..utils.smooth_pose import smooth_pose

                verts, pose_hat, joints3d = smooth_pose(
                    out["pred_pose"], out["pred_shape"], self.smpl,
                    min_cutoff=min_cutoff, beta=beta,
                )
                out["smpl_vertices"] = verts
                out["pred_pose"] = pose_hat
                out["smpl_joints3d"] = joints3d

            bbox_chw = np.concatenate(
                [batch["center"], (batch["scale"] * 200.0)[:, None]], axis=1
            )
            orig_cam = convert_crop_cam_to_orig_img(
                out["pred_cam"], bbox_chw, w, h
            )
            if "cliff" in self.backbone:
                joints2d_orig = out["smpl_joints2d"]
            else:
                joints2d_orig = convert_crop_coords_to_orig_img(
                    bbox_chw, out["smpl_joints2d"], IMG_RES
                )

            results[person_id] = {
                "verts": out["smpl_vertices"],
                "pose": out["pred_pose"],
                "betas": out["pred_shape"],
                "pred_cam": out["pred_cam"],
                "orig_cam": orig_cam,
                "joints3d": out["smpl_joints3d"],
                "smpl_joints2d": joints2d_orig,
                # the dataset's frames/bboxes, NOT the raw track's:
                # pose tracks have no 'bbox' (posetracker contract) and
                # InferenceDataset drops frames without a valid smoothed
                # bbox — result rows must stay aligned with frame ids
                "frame_ids": np.asarray(dataset.frames),
                "bboxes": dataset.bboxes,
                "var": var if var is not None else np.zeros(1),
                "var_global": gvar if gvar is not None else np.zeros(1),
            }
        return results

    def render_results(
        self,
        results: dict[int, dict],
        image_folder: str,
        output_folder: str,
        uncert_color: bool = True,
        wireframe: bool = False,
        uncert_log: str | None = None,
        display: bool = False,
        sideview: bool = False,
    ) -> None:
        """Depth-sorted per-frame rendering (reference tester.py:482-580).

        sideview: render a 270deg-rotated view on a black canvas with the
        "Other View" caption and concatenate it to the right of each
        frame (reference tester.py:511,557-570).
        """
        image_files = images_in_folder(image_folder)
        os.makedirs(output_folder, exist_ok=True)
        frame_results = prepare_rendering_results(results, len(image_files))
        log_lines = []

        from ..runtime.loader import read_image_rgb
        from ..viz.renderer import overlay_text

        for frame_id, img_path in enumerate(image_files):
            frame = np.ascontiguousarray(read_image_rgb(img_path))
            side_frame = np.zeros_like(frame) if sideview else None
            for person_id, data in frame_results[frame_id].items():
                vc = None
                if uncert_color and data.get("var") is not None:
                    vc = get_vertex_colors(
                        np.array(data["var"], copy=True),
                        np.asarray(self.smpl.lbs_weights),
                        backbone=self.backbone,
                    )
                frame = self.renderer.render(
                    frame, data["verts"], data["cam"],
                    vertex_colors=vc, wireframe=wireframe,
                )
                if side_frame is not None:
                    side_frame = self.renderer.render(
                        side_frame, data["verts"], data["cam"],
                        vertex_colors=vc, wireframe=wireframe,
                        angle=270.0, axis=(0, 1, 0),
                    )
                if data.get("var_global") is not None:
                    log_lines.append(
                        f"{frame_id} {person_id} {float(data['var_global']):.4f}"
                    )
            if side_frame is not None:
                side_frame = overlay_text(side_frame, "Other View")
                frame = np.concatenate([frame, side_frame], axis=1)
            cv2.imwrite(
                osp.join(output_folder, f"{frame_id:06d}.png"),
                frame[:, :, ::-1],
            )
            if display:
                self._display_frame(frame)
        if uncert_log:
            with open(uncert_log, "w") as f:
                f.write("\n".join(log_lines))
