"""YOLOv3 person detector (flax/NHWC) with a Darknet `.weights` loader.

The reference delegates person detection to the external `yolov3-pytorch`
package through `multi-person-tracker` (pocolib/core/tester.py:113-151;
demo flags `--detector yolo --yolo_img_size 416`, demo.py:260-273). Here
the detector is first-class and TPU-native: letterboxed batches run
through one jitted XLA program (Darknet-53 -> 3-scale heads -> box
decode); only thresholding + NMS stay on host. Pretrained weights load
directly from the official Darknet binary format (`yolov3.weights`), so
the exact detector the reference uses drops in without torch.

No code is derived from the reference (it contains none — YOLO is an
external pip dep there); the architecture follows the public YOLOv3
paper/cfg (Redmon & Farhadi, 2018).
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Standard YOLOv3 anchors (pixels, relative to the 416 training input),
# grouped coarse -> fine to match the order detection maps are emitted.
YOLO_ANCHORS: tuple[tuple[tuple[float, float], ...], ...] = (
    ((116, 90), (156, 198), (373, 326)),  # stride 32
    ((30, 61), (62, 45), (59, 119)),      # stride 16
    ((10, 13), (16, 30), (33, 23)),       # stride 8
)

PERSON_CLASS = 0  # COCO class index used by the reference demo


class YoloV3(nn.Module):
    """Darknet-53 + 3-scale YOLOv3 detection heads.

    Convolutions are created (and therefore named ``conv0..conv74`` /
    ``bn0..bn73``) in the exact order of the official Darknet cfg, which
    is also the serialization order of ``yolov3.weights`` — the loader
    below walks the same order.

    Attributes:
        width: base filter count (32 for the real network; tests shrink it).
        num_classes: detection classes (80 for COCO weights).
    """

    width: int = 32
    num_classes: int = 80
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
        w = self.width
        counter = iter(range(1000))

        def cb(y, filters, kernel, stride):
            """conv + BN + LeakyReLU(0.1), darknet-style symmetric pad."""
            i = next(counter)
            pad = (kernel - 1) // 2
            y = nn.Conv(
                filters, (kernel, kernel), (stride, stride),
                padding=[(pad, pad), (pad, pad)], use_bias=False,
                name=f"conv{i}", dtype=self.dtype,
            )(y)
            y = nn.BatchNorm(
                use_running_average=True, momentum=0.9, epsilon=1e-5,
                name=f"bn{i}", dtype=self.dtype,
            )(y)
            return nn.leaky_relu(y, 0.1)

        def detect_conv(y):
            """Final 1x1 linear conv (bias, no BN)."""
            i = next(counter)
            return nn.Conv(
                3 * (5 + self.num_classes), (1, 1), (1, 1), padding="VALID",
                use_bias=True, name=f"conv{i}", dtype=self.dtype,
            )(y)

        def res(y, filters):
            z = cb(y, filters, 1, 1)
            z = cb(z, filters * 2, 3, 1)
            return y + z

        # ---- Darknet-53 backbone (52 convs) ----
        y = cb(x, w, 3, 1)
        y = cb(y, 2 * w, 3, 2)
        y = res(y, w)
        y = cb(y, 4 * w, 3, 2)
        for _ in range(2):
            y = res(y, 2 * w)
        y = cb(y, 8 * w, 3, 2)
        for _ in range(8):
            y = res(y, 4 * w)
        route36 = y                      # stride-8 features
        y = cb(y, 16 * w, 3, 2)
        for _ in range(8):
            y = res(y, 8 * w)
        route61 = y                      # stride-16 features
        y = cb(y, 32 * w, 3, 2)
        for _ in range(4):
            y = res(y, 16 * w)

        # ---- Scale 0 head (stride 32) ----
        for _ in range(2):
            y = cb(y, 16 * w, 1, 1)
            y = cb(y, 32 * w, 3, 1)
        y = cb(y, 16 * w, 1, 1)
        branch0 = y
        y = cb(y, 32 * w, 3, 1)
        p0 = detect_conv(y)

        # ---- Scale 1 head (stride 16) ----
        y = cb(branch0, 8 * w, 1, 1)
        y = jnp.concatenate(
            [jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2), route61],
            axis=-1,
        )
        for _ in range(2):
            y = cb(y, 8 * w, 1, 1)
            y = cb(y, 16 * w, 3, 1)
        y = cb(y, 8 * w, 1, 1)
        branch1 = y
        y = cb(y, 16 * w, 3, 1)
        p1 = detect_conv(y)

        # ---- Scale 2 head (stride 8) ----
        y = cb(branch1, 4 * w, 1, 1)
        y = jnp.concatenate(
            [jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2), route36],
            axis=-1,
        )
        for _ in range(2):
            y = cb(y, 4 * w, 1, 1)
            y = cb(y, 8 * w, 3, 1)
        y = cb(y, 4 * w, 1, 1)
        y = cb(y, 8 * w, 3, 1)
        p2 = detect_conv(y)

        return p0, p1, p2


# Conv indices of the three detection convs (bias, no BN) in cfg order.
DETECT_CONV_IDS = (58, 66, 74)
NUM_CONVS = 75


def load_darknet_weights(path: str, variables: dict) -> dict:
    """Load an official Darknet `.weights` file into initialized variables.

    Binary layout: header of 3 int32 (major, minor, revision) then a
    "seen" counter (int64 when major*10+minor >= 2, else int32), followed
    by raw float32 params in cfg order — for each BN conv:
    [bn_bias, bn_scale, bn_mean, bn_var, conv_kernel(OIHW)]; for each
    linear detect conv: [bias, conv_kernel(OIHW)].
    """
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    with open(path, "rb") as f:
        major, minor, _rev = np.fromfile(f, np.int32, 3)
        if int(major) * 10 + int(minor) >= 2:
            np.fromfile(f, np.int64, 1)
        else:
            np.fromfile(f, np.int32, 1)
        buf = np.fromfile(f, np.float32)

    pos = 0

    def take(n):
        nonlocal pos
        out = buf[pos:pos + n]
        if out.size != n:
            raise ValueError(
                f"darknet weights file truncated: need {n} floats at "
                f"offset {pos}, have {buf.size - pos}"
            )
        pos += n
        return out

    new_params = {k: dict(v) for k, v in params.items()}
    new_stats = {k: dict(v) for k, v in stats.items()}
    for i in range(NUM_CONVS):
        kname = f"conv{i}"
        kernel = params[kname]["kernel"]          # HWIO
        kh, kw, cin, cout = kernel.shape
        if i in DETECT_CONV_IDS:
            new_params[kname] = dict(params[kname])
            new_params[kname]["bias"] = take(cout)
        else:
            bname = f"bn{i}"
            bn_bias = take(cout)
            bn_scale = take(cout)
            bn_mean = take(cout)
            bn_var = take(cout)
            new_params[bname] = {"bias": bn_bias, "scale": bn_scale}
            new_stats[bname] = {"mean": bn_mean, "var": bn_var}
        oihw = take(cout * cin * kh * kw).reshape(cout, cin, kh, kw)
        new_params[kname] = dict(new_params.get(kname, {}))
        new_params[kname]["kernel"] = oihw.transpose(2, 3, 1, 0)  # -> HWIO
    if pos != buf.size:
        raise ValueError(
            f"darknet weights file has {buf.size - pos} unread floats — "
            "architecture/width mismatch"
        )
    return {"params": new_params, "batch_stats": new_stats}


def decode_predictions(
    p: jnp.ndarray,
    anchors: Sequence[tuple[float, float]],
    stride: int,
    num_classes: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Raw (B, H, W, 3*(5+C)) map -> (boxes cxcywh px, person score).

    Standard YOLOv3 decode: xy = (sigmoid(t_xy) + cell) * stride,
    wh = anchor * exp(t_wh), score = sigmoid(obj) * sigmoid(cls).
    Returns boxes (B, H*W*3, 4) and person scores (B, H*W*3).
    """
    b, h, w, _ = p.shape
    p = p.reshape(b, h, w, 3, 5 + num_classes)
    cy, cx = jnp.meshgrid(
        jnp.arange(h, dtype=p.dtype), jnp.arange(w, dtype=p.dtype),
        indexing="ij",
    )
    anc = jnp.asarray(anchors, p.dtype)  # (3, 2) in input pixels
    xy = (jax.nn.sigmoid(p[..., 0:2])
          + jnp.stack([cx, cy], axis=-1)[:, :, None, :]) * stride
    wh = anc[None, None, None, :, :] * jnp.exp(
        jnp.clip(p[..., 2:4], -10.0, 10.0)
    )
    obj = jax.nn.sigmoid(p[..., 4])
    cls = jax.nn.sigmoid(p[..., 5 + PERSON_CLASS])
    boxes = jnp.concatenate([xy, wh], axis=-1).reshape(b, -1, 4)
    scores = (obj * cls).reshape(b, -1)
    return boxes, scores


def letterbox(
    img: np.ndarray, size: int, fill: float = 0.5
) -> tuple[np.ndarray, float, float, float]:
    """Aspect-preserving resize + pad to (size, size) in [0, 1] RGB.

    Returns (canvas, scale, pad_x, pad_y) so detections map back via
    orig = (net - pad) / scale.
    """
    import cv2

    h, w = img.shape[:2]
    scale = size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    canvas = np.full((size, size, 3), fill, np.float32)
    pad_y, pad_x = (size - nh) // 2, (size - nw) // 2
    canvas[pad_y:pad_y + nh, pad_x:pad_x + nw] = (
        resized.astype(np.float32) / 255.0
    )
    return canvas, scale, float(pad_x), float(pad_y)


class YoloDetector:
    """TPU person detector honoring the tracker `Detector` contract.

    One jitted program covers the whole batch: forward + 3-scale decode.
    Host side: letterbox, confidence threshold, NMS, un-letterboxing.
    """

    def __init__(
        self,
        weights_path: str,
        img_size: int = 416,
        conf_threshold: float = 0.5,
        nms_threshold: float = 0.45,
        batch_size: int = 12,
        width: int = 32,
        num_classes: int = 80,
        pre_nms_topk: int = 200,
        dtype: Any = jnp.float32,
    ):
        if img_size % 32 != 0:
            raise ValueError("yolo_img_size must be a multiple of 32")
        self.img_size = img_size
        self.conf_threshold = conf_threshold
        self.nms_threshold = nms_threshold
        self.batch_size = batch_size
        self.pre_nms_topk = pre_nms_topk  # cap the O(n^2) host NMS
        self.model = YoloV3(width=width, num_classes=num_classes, dtype=dtype)
        dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
        variables = self.model.init(jax.random.PRNGKey(0), dummy)
        self.variables = load_darknet_weights(weights_path, variables)

        model, num_classes = self.model, self.model.num_classes

        @jax.jit
        def forward(variables, imgs):
            maps = model.apply(variables, imgs)
            boxes, scores = [], []
            for si, p in enumerate(maps):
                bx, sc = decode_predictions(
                    p, YOLO_ANCHORS[si], 32 // (2 ** si), num_classes
                )
                boxes.append(bx)
                scores.append(sc)
            return (
                jnp.concatenate(boxes, axis=1),
                jnp.concatenate(scores, axis=1),
            )

        self._forward = forward

    def detect_batch(self, imgs: list[np.ndarray]) -> list[np.ndarray]:
        """RGB uint8 images -> list of (N_i, 4) cxcywh person boxes."""
        from .tracker import nms_cxcywh

        out: list[np.ndarray] = []
        for start in range(0, len(imgs), self.batch_size):
            chunk = imgs[start:start + self.batch_size]
            metas, canvases = [], []
            for img in chunk:
                canvas, scale, px, py = letterbox(img, self.img_size)
                canvases.append(canvas)
                metas.append((scale, px, py))
            # pad the tail chunk to the compiled batch size
            n_valid = len(canvases)
            while len(canvases) < self.batch_size:
                canvases.append(canvases[-1])
            batch = jnp.asarray(np.stack(canvases), jnp.float32)
            boxes, scores = self._forward(self.variables, batch)
            boxes = np.asarray(boxes[:n_valid], np.float32)
            scores = np.asarray(scores[:n_valid], np.float32)
            for bi in range(n_valid):
                scale, px, py = metas[bi]
                keep = scores[bi] >= self.conf_threshold
                bx, sc = boxes[bi][keep], scores[bi][keep]
                if bx.size == 0:
                    out.append(np.zeros((0, 4), np.float32))
                    continue
                if len(sc) > self.pre_nms_topk:
                    top = np.argpartition(-sc, self.pre_nms_topk)
                    top = top[: self.pre_nms_topk]
                    bx, sc = bx[top], sc[top]
                bx[:, 0] = (bx[:, 0] - px) / scale
                bx[:, 1] = (bx[:, 1] - py) / scale
                bx[:, 2:] /= scale
                idx = nms_cxcywh(bx, sc, self.nms_threshold)
                out.append(bx[idx])
        return out

    def __call__(self, img: np.ndarray) -> np.ndarray:
        return self.detect_batch([img])[0]


def make_yolo_detector(
    weights_path: str | None = None, **kwargs
) -> YoloDetector | None:
    """Build the YOLO detector if a weights file is available, else None.

    Default search path: $POCO_TPU_YOLO_WEIGHTS, then
    data/detector/yolov3.weights (the official pretrained file —
    license-gated asset, same policy as the SMPL pkl).
    """
    candidates = [
        weights_path,
        os.environ.get("POCO_TPU_YOLO_WEIGHTS"),
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            "data", "detector", "yolov3.weights",
        ),
    ]
    for cand in candidates:
        if cand and os.path.isfile(cand):
            return YoloDetector(cand, **kwargs)
    return None
