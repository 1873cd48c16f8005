"""YOLOv3 detector tests: torch-clone parity through the Darknet binary
format, decode math, letterbox round-trip, and the Detector contract.

The torch clone below mirrors the official Darknet cfg order (the same
order `yolov3.weights` serializes and poco_tpu.demo.yolo loads), so the
test validates architecture wiring AND the weights parser jointly: torch
params are written to a real `.weights` buffer, loaded into flax, and
the raw detection maps must match.
"""

from __future__ import annotations

import io
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp
from torch import nn as tnn

from poco_tpu.demo.yolo import (
    DETECT_CONV_IDS,
    NUM_CONVS,
    YOLO_ANCHORS,
    YoloV3,
    decode_predictions,
    letterbox,
    load_darknet_weights,
)

WIDTH = 4
NUM_CLASSES = 3
IMG = 64


class TorchYolo(tnn.Module):
    """Minimal torch YOLOv3 in exact Darknet cfg order."""

    def __init__(self, w=WIDTH, num_classes=NUM_CLASSES):
        super().__init__()
        self.convs = tnn.ModuleList()
        self.bns = tnn.ModuleList()
        self.detect_ids = set(DETECT_CONV_IDS)
        self.num_classes = num_classes
        self._w = w
        # build conv defs in cfg order: (in, out, k, s, bn)
        defs = []

        def cb(cin, cout, k, s):
            defs.append((cin, cout, k, s, True))
            return cout

        def res(c):
            cb(c, c // 2, 1, 1)
            cb(c // 2, c, 3, 1)

        c = cb(3, w, 3, 1)
        c = cb(c, 2 * w, 3, 2)
        res(c)
        c = cb(c, 4 * w, 3, 2)
        for _ in range(2):
            res(c)
        c = cb(c, 8 * w, 3, 2)
        for _ in range(8):
            res(c)
        c = cb(c, 16 * w, 3, 2)
        for _ in range(8):
            res(c)
        c = cb(c, 32 * w, 3, 2)
        for _ in range(4):
            res(c)
        dout = 3 * (5 + num_classes)
        # scale 0
        c = cb(32 * w, 16 * w, 1, 1)
        c = cb(c, 32 * w, 3, 1)
        c = cb(c, 16 * w, 1, 1)
        c = cb(c, 32 * w, 3, 1)
        c = cb(c, 16 * w, 1, 1)
        c = cb(c, 32 * w, 3, 1)
        defs.append((32 * w, dout, 1, 1, False))
        # route
        cb(16 * w, 8 * w, 1, 1)
        # scale 1 (concat 8w + 16w)
        c = cb(24 * w, 8 * w, 1, 1)
        c = cb(c, 16 * w, 3, 1)
        c = cb(c, 8 * w, 1, 1)
        c = cb(c, 16 * w, 3, 1)
        c = cb(c, 8 * w, 1, 1)
        c = cb(c, 16 * w, 3, 1)
        defs.append((16 * w, dout, 1, 1, False))
        # route
        cb(8 * w, 4 * w, 1, 1)
        # scale 2 (concat 4w + 8w)
        c = cb(12 * w, 4 * w, 1, 1)
        c = cb(c, 8 * w, 3, 1)
        c = cb(c, 4 * w, 1, 1)
        c = cb(c, 8 * w, 3, 1)
        c = cb(c, 4 * w, 1, 1)
        c = cb(c, 8 * w, 3, 1)
        defs.append((8 * w, dout, 1, 1, False))

        assert len(defs) == NUM_CONVS
        for i, (cin, cout, k, s, bn) in enumerate(defs):
            self.convs.append(
                tnn.Conv2d(cin, cout, k, s, (k - 1) // 2, bias=not bn)
            )
            self.bns.append(tnn.BatchNorm2d(cout) if bn else tnn.Identity())

    def _cb(self, x, i):
        y = self.bns[i](self.convs[i](x))
        return tnn.functional.leaky_relu(y, 0.1)

    def forward(self, x):
        i = 0

        def cb(y):
            nonlocal i
            out = self._cb(y, i)
            i += 1
            return out

        def detect(y):
            nonlocal i
            out = self.convs[i](y)
            i += 1
            return out

        def res(y):
            return y + cb(cb(y))

        y = cb(cb(x))
        y = res(y)
        y = cb(y)
        for _ in range(2):
            y = res(y)
        y = cb(y)
        for _ in range(8):
            y = res(y)
        route36 = y
        y = cb(y)
        for _ in range(8):
            y = res(y)
        route61 = y
        y = cb(y)
        for _ in range(4):
            y = res(y)
        for _ in range(5):
            y = cb(y)
        branch0 = y  # after the 5th head conv
        # NOTE: branch comes after conv index (5 convs): replicate flax
        p0 = detect(cb(y))
        y = cb(branch0)
        y = torch.cat(
            [tnn.functional.interpolate(y, scale_factor=2, mode="nearest"),
             route61], dim=1,
        )
        for _ in range(5):
            y = cb(y)
        branch1 = y
        p1 = detect(cb(y))
        y = cb(branch1)
        y = torch.cat(
            [tnn.functional.interpolate(y, scale_factor=2, mode="nearest"),
             route36], dim=1,
        )
        for _ in range(6):
            y = cb(y)
        p2 = detect(y)
        return p0, p1, p2


def serialize_darknet(model: TorchYolo) -> bytes:
    """Write torch params in the official .weights binary layout."""
    buf = io.BytesIO()
    buf.write(np.array([0, 2, 0], np.int32).tobytes())  # version 0.2.0
    buf.write(np.array([0], np.int64).tobytes())  # seen (int64 for >= 0.2)
    for i in range(NUM_CONVS):
        conv = model.convs[i]
        if i in model.detect_ids:
            buf.write(np.ascontiguousarray(conv.bias.detach().numpy().astype(np.float32)).tobytes())
        else:
            bn = model.bns[i]
            buf.write(np.ascontiguousarray(bn.bias.detach().numpy().astype(np.float32)).tobytes())
            buf.write(np.ascontiguousarray(bn.weight.detach().numpy().astype(np.float32)).tobytes())
            buf.write(np.ascontiguousarray(bn.running_mean.numpy().astype(np.float32)).tobytes())
            buf.write(np.ascontiguousarray(bn.running_var.numpy().astype(np.float32)).tobytes())
        buf.write(np.ascontiguousarray(conv.weight.detach().numpy().astype(np.float32)).tobytes())
    return buf.getvalue()


@pytest.fixture(scope="module")
def torch_and_flax(tmp_path_factory):
    torch.manual_seed(0)
    tm = TorchYolo().eval()
    # randomize BN stats so parity exercises them
    with torch.no_grad():
        for bn in tm.bns:
            if isinstance(bn, tnn.BatchNorm2d):
                bn.running_mean.uniform_(-0.5, 0.5)
                bn.running_var.uniform_(0.5, 1.5)
    path = tmp_path_factory.mktemp("yolo") / "tiny.weights"
    path.write_bytes(serialize_darknet(tm))

    fm = YoloV3(width=WIDTH, num_classes=NUM_CLASSES)
    variables = fm.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    )
    variables = load_darknet_weights(str(path), variables)
    return tm, fm, variables


@pytest.mark.slow
class TestParity:
    def test_raw_maps_match_torch(self, torch_and_flax):
        tm, fm, variables = torch_and_flax
        x = np.random.RandomState(1).rand(2, IMG, IMG, 3).astype(np.float32)
        with torch.no_grad():
            t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        f_out = fm.apply(variables, jnp.asarray(x))
        assert len(t_out) == len(f_out) == 3
        for t, f in zip(t_out, f_out):
            t = t.numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(np.asarray(f), t, atol=2e-5)

    def test_loader_rejects_wrong_width(self, torch_and_flax, tmp_path):
        tm, _, _ = torch_and_flax
        path = tmp_path / "tiny.weights"
        path.write_bytes(serialize_darknet(tm))
        fm = YoloV3(width=8, num_classes=NUM_CLASSES)
        variables = fm.init(
            jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32)
        )
        with pytest.raises(ValueError):
            load_darknet_weights(str(path), variables)


class TestDecode:
    def test_known_cell(self):
        num_classes = NUM_CLASSES
        h = w = 2
        stride = 32
        p = np.full((1, h, w, 3, 5 + num_classes), -20.0, np.float32)
        # one hot prediction: cell (1, 0), anchor 1, centered, wh = anchor
        p[0, 1, 0, 1, 0:2] = 0.0       # sigmoid -> 0.5
        p[0, 1, 0, 1, 2:4] = 0.0       # exp -> 1 -> wh = anchor
        p[0, 1, 0, 1, 4] = 20.0        # obj ~ 1
        p[0, 1, 0, 1, 5] = 20.0        # person ~ 1
        anchors = YOLO_ANCHORS[0]
        boxes, scores = decode_predictions(
            jnp.asarray(p.reshape(1, h, w, -1)), anchors, stride, num_classes
        )
        boxes, scores = np.asarray(boxes)[0], np.asarray(scores)[0]
        i = int(scores.argmax())
        assert scores[i] > 0.99
        np.testing.assert_allclose(
            boxes[i],
            [0.5 * stride, 1.5 * stride, anchors[1][0], anchors[1][1]],
            rtol=1e-5,
        )
        # everything else suppressed
        assert np.sort(scores)[-2] < 1e-6

    def test_letterbox_roundtrip(self):
        img = (np.random.RandomState(0).rand(48, 96, 3) * 255).astype(
            np.uint8
        )
        canvas, scale, px, py = letterbox(img, 64)
        assert canvas.shape == (64, 64, 3)
        assert canvas.min() >= 0.0 and canvas.max() <= 1.0
        # a point at original (x=96, y=48) maps inside the canvas
        x_net, y_net = 96 * scale + px, 48 * scale + py
        assert 0 <= x_net <= 64 and 0 <= y_net <= 64
        # inverse mapping recovers original coords
        np.testing.assert_allclose((x_net - px) / scale, 96, rtol=1e-6)
        np.testing.assert_allclose((y_net - py) / scale, 48, rtol=1e-6)


class TestDetectorContract:
    def test_detect_returns_cxcywh(self, torch_and_flax, tmp_path):
        tm, _, _ = torch_and_flax
        path = tmp_path / "tiny.weights"
        path.write_bytes(serialize_darknet(tm))
        from poco_tpu.demo.yolo import YoloDetector

        det = YoloDetector(
            str(path), img_size=IMG, conf_threshold=0.0, batch_size=2,
            width=WIDTH, num_classes=NUM_CLASSES,
        )
        imgs = [
            (np.random.RandomState(s).rand(50, 70, 3) * 255).astype(np.uint8)
            for s in range(3)
        ]
        out = det.detect_batch(imgs)
        assert len(out) == 3
        for boxes in out:
            assert boxes.ndim == 2 and boxes.shape[1] == 4
            assert np.isfinite(boxes).all()

    def test_make_yolo_detector_absent(self, monkeypatch):
        from poco_tpu.demo.yolo import make_yolo_detector

        monkeypatch.delenv("POCO_TPU_YOLO_WEIGHTS", raising=False)
        assert make_yolo_detector("/nonexistent/path.weights") is None
