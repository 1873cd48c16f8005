"""HRNet backbones (flax.linen, NHWC): pose (w32) and classification (w48).

A single parameterized implementation covers both reference topologies:

  * `HRNet(variant="pose", width=32, use_conv=True)` — the PARE backbone:
    stem -> Bottleneck layer1 -> 3 multi-resolution stages with fusion, then
    upsample-and-concat of all four branches to a (B, 56, 56, 480) feature
    map (reference: pocolib/models/backbone/hrnet.py:275-528, factory
    hrnet_w32 at :610-617).

  * `HRNet(variant="cls", width=48)` — the CLIFF backbone: same stages plus
    the classification head (incremental Bottleneck modules + strided
    downsampling + 1x1 conv to 2048, global average pool) returning a
    (B, 2048) vector (reference: pocolib/models/backbone/hrnet_cls.py:
    250-486, factory hrnet_w48_cls at :558-566).

Stage schedule (both variants): stage2 = 1 module x 2 branches,
stage3 = 4 modules x 3 branches, stage4 = 3 modules x 4 branches, all
4-block BASIC branches with SUM fusion.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import (
    BasicBlock,
    Bottleneck,
    ResLayer,
    S2DStemConv,
    batch_norm,
    conv,
    resize_bilinear_align_corners,
    upsample_nearest,
)

STAGE_MODULES = {2: 1, 3: 4, 4: 3}  # modules per stage
STAGE_BLOCKS = 4                    # BASIC blocks per branch


class HRModule(nn.Module):
    """One multi-resolution module: parallel branches + full fusion.

    Reference: pocolib/models/backbone/hrnet.py:102-266.
    """

    num_branches: int
    channels: Sequence[int]
    multi_scale_output: bool = True
    lane_pad: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: list[jnp.ndarray], train: bool = False) -> list[jnp.ndarray]:
        ys = [
            ResLayer(
                BasicBlock, self.channels[b], STAGE_BLOCKS,
                lane_pad=self.lane_pad,
                name=f"branch{b}", dtype=self.dtype,
            )(xs[b], train)
            for b in range(self.num_branches)
        ]
        num_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(num_out):
            acc = None
            for j in range(self.num_branches):
                if j == i:
                    z = ys[j]
                elif j > i:
                    # 1x1 conv + BN, then nearest-upsample 2^(j-i).
                    z = conv(
                        self.channels[i], 1, padding=0,
                        name=f"fuse_{i}_{j}_conv0", dtype=self.dtype,
                    )(ys[j])
                    z = batch_norm(train, name=f"fuse_{i}_{j}_bn0", dtype=self.dtype)(z)
                    z = upsample_nearest(z, 2 ** (j - i))
                else:
                    # (i-j) strided 3x3 convs; ReLU between, none after last.
                    z = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        out_ch = self.channels[i] if last else self.channels[j]
                        z = conv(
                            out_ch, 3, 2,
                            name=f"fuse_{i}_{j}_conv{k}", dtype=self.dtype,
                        )(z)
                        z = batch_norm(
                            train, name=f"fuse_{i}_{j}_bn{k}", dtype=self.dtype
                        )(z)
                        if not last:
                            z = nn.relu(z)
                acc = z if acc is None else acc + z
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    """Unified HRNet backbone.

    Attributes:
        variant: "pose" (multi-branch concat feature map) or "cls"
            (pooled 2048-d vector).
        width: base channel width (32 for pose-w32, 48 for cls-w48).
        use_conv: pose variant only — upsample with bilinear+conv modules
            (hrnet_w32 factory default) instead of plain interpolation.
        downsample: pose variant only — merge at the lowest resolution
            instead of the highest.
    """

    variant: str = "cls"
    width: int = 48
    use_conv: bool = True
    downsample: bool = False
    # lane-pad non-128-multiple branch channel counts (w48's 192ch branch)
    # inside the branch ResLayers — exact math modulo float reordering
    # (~1e-3 rel through the full net), measured ~1.8x faster for that
    # branch on v5e (see common.lane_pad_target / BENCHMARKS.md).
    # None (default) = enabled for bf16 compute, where reorder noise is
    # far below the bf16 floor; fp32 keeps the canonical op order so the
    # parity/golden gates measure the reference-exact program.
    lane_pad: bool | None = None
    # space-to-depth stem conv1 (see common.S2DStemConv) — exact dot
    # products modulo float-add order; opt-in pending TPU measurement.
    s2d_stem: bool | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        w = self.width
        lane_pad = (
            self.lane_pad
            if self.lane_pad is not None
            else self.dtype == jnp.bfloat16
        )
        # default OFF until the TPU measurement lands (lane_pad
        # protocol: accept on measured wall time; see BENCHMARKS.md)
        s2d = bool(self.s2d_stem)
        stage_channels = {
            2: [w, 2 * w],
            3: [w, 2 * w, 4 * w],
            4: [w, 2 * w, 4 * w, 8 * w],
        }

        # Stem: two stride-2 3x3 convs -> 1/4 resolution, 64ch.
        if s2d:
            y = S2DStemConv(64, kernel_size=3, name="conv1", dtype=self.dtype)(x)
        else:
            y = conv(64, 3, 2, name="conv1", dtype=self.dtype)(x)
        y = batch_norm(train, name="bn1", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = conv(64, 3, 2, name="conv2", dtype=self.dtype)(y)
        y = batch_norm(train, name="bn2", dtype=self.dtype)(y)
        y = nn.relu(y)

        # Stage 1: 4 Bottleneck blocks, 64 -> 256 channels.
        y = ResLayer(Bottleneck, 64, 4, name="layer1", dtype=self.dtype)(y, train)

        xs = [y]
        for stage in (2, 3, 4):
            chans = stage_channels[stage]
            prev_chans = [int(t.shape[-1]) for t in xs]
            nxt = []
            for i in range(len(chans)):
                if i < len(prev_chans):
                    if prev_chans[i] != chans[i]:
                        z = conv(
                            chans[i], 3, 1,
                            name=f"transition{stage - 1}_{i}_conv0",
                            dtype=self.dtype,
                        )(xs[-1])
                        z = batch_norm(
                            train,
                            name=f"transition{stage - 1}_{i}_bn0",
                            dtype=self.dtype,
                        )(z)
                        nxt.append(nn.relu(z))
                    else:
                        nxt.append(xs[i])
                else:
                    z = xs[-1]
                    for k in range(i + 1 - len(prev_chans)):
                        last = k == i - len(prev_chans)
                        out_ch = chans[i] if last else prev_chans[-1]
                        z = conv(
                            out_ch, 3, 2,
                            name=f"transition{stage - 1}_{i}_conv{k}",
                            dtype=self.dtype,
                        )(z)
                        z = batch_norm(
                            train,
                            name=f"transition{stage - 1}_{i}_bn{k}",
                            dtype=self.dtype,
                        )(z)
                        z = nn.relu(z)
                    nxt.append(z)
            xs = nxt
            for m in range(STAGE_MODULES[stage]):
                xs = HRModule(
                    num_branches=len(chans),
                    channels=chans,
                    multi_scale_output=True,
                    lane_pad=lane_pad,
                    name=f"stage{stage}_{m}",
                    dtype=self.dtype,
                )(xs, train)

        if self.variant == "cls":
            return self._cls_head(xs, train)
        return self._pose_merge(xs, train)

    def _cls_head(self, xs: list[jnp.ndarray], train: bool) -> jnp.ndarray:
        """Incremental Bottleneck head -> 2048-d pooled feature.

        Reference: pocolib/models/backbone/hrnet_cls.py:306-353, 471-486.
        """
        head_channels = [32, 64, 128, 256]
        y = ResLayer(
            Bottleneck, head_channels[0], 1, name="incre0", dtype=self.dtype
        )(xs[0], train)
        for i in range(3):
            inc = ResLayer(
                Bottleneck, head_channels[i + 1], 1,
                name=f"incre{i + 1}", dtype=self.dtype,
            )(xs[i + 1], train)
            z = conv(
                head_channels[i + 1] * 4, 3, 2, use_bias=True,
                name=f"downsamp{i}_conv", dtype=self.dtype,
            )(y)
            z = batch_norm(train, name=f"downsamp{i}_bn", dtype=self.dtype)(z)
            y = inc + nn.relu(z)
        y = conv(
            2048, 1, padding=0, use_bias=True,
            name="final_conv", dtype=self.dtype,
        )(y)
        y = batch_norm(train, name="final_bn", dtype=self.dtype)(y)
        y = nn.relu(y)
        return jnp.mean(y, axis=(1, 2))  # global average pool -> (B, 2048)

    def _pose_merge(self, xs: list[jnp.ndarray], train: bool) -> jnp.ndarray:
        """Merge the four branches into one feature map.

        Default (downsample=False, use_conv=True): upsample branches 1-3 to
        the 1/4-resolution grid with bilinear(align_corners)+conv+BN+ReLU
        chains and concat -> (B, H/4, W/4, 15w) (480 for w32).
        Reference: pocolib/models/backbone/hrnet.py:437-450, 499-527.
        """
        if self.downsample:
            tgt_h, tgt_w = xs[3].shape[1], xs[3].shape[2]
            outs = []
            for b in range(3):
                z = xs[b]
                if self.use_conv:
                    for k in range(3 - b):
                        z = conv(
                            z.shape[-1], 3, 2,
                            name=f"downsample_stage_{b + 1}_conv{k}",
                            dtype=self.dtype,
                        )(z)
                        z = batch_norm(
                            train,
                            name=f"downsample_stage_{b + 1}_bn{k}",
                            dtype=self.dtype,
                        )(z)
                        z = nn.relu(z)
                else:
                    z = resize_bilinear_align_corners(z, tgt_h, tgt_w)
                outs.append(z)
            outs.append(xs[3])
            return jnp.concatenate(outs, axis=-1)

        tgt_h, tgt_w = xs[0].shape[1], xs[0].shape[2]
        outs = [xs[0]]
        for b in range(1, 4):
            z = xs[b]
            if self.use_conv:
                for k in range(b):
                    h, wdt = z.shape[1] * 2, z.shape[2] * 2
                    z = resize_bilinear_align_corners(z, h, wdt)
                    z = conv(
                        z.shape[-1], 3, 1,
                        name=f"upsample_stage_{b + 1}_conv{k}",
                        dtype=self.dtype,
                    )(z)
                    z = batch_norm(
                        train,
                        name=f"upsample_stage_{b + 1}_bn{k}",
                        dtype=self.dtype,
                    )(z)
                    z = nn.relu(z)
            else:
                z = resize_bilinear_align_corners(z, tgt_h, tgt_w)
            outs.append(z)
        return jnp.concatenate(outs, axis=-1)


def hrnet_w32(dtype: Any = jnp.float32, use_conv: bool = True) -> HRNet:
    """PARE backbone: (B, 224, 224, 3) -> (B, 56, 56, 480)."""
    return HRNet(variant="pose", width=32, use_conv=use_conv, dtype=dtype)


def hrnet_w48_cls(dtype: Any = jnp.float32) -> HRNet:
    """CLIFF backbone: (B, 224, 224, 3) -> (B, 2048)."""
    return HRNet(variant="cls", width=48, dtype=dtype)


def hrnet_w48(dtype: Any = jnp.float32) -> HRNet:
    """Pose-variant HRNet-w48: (B, H/4, W/4, 720) concat feature map
    (reference hrnet.py:620-627, interpolation merge)."""
    return HRNet(variant="pose", width=48, use_conv=False, dtype=dtype)


def hrnet_w64(dtype: Any = jnp.float32) -> HRNet:
    return HRNet(variant="pose", width=64, use_conv=False, dtype=dtype)
