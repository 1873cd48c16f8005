"""ResNet backbones (flax.linen, NHWC), torchvision-compatible topology.

Returns the final convolutional feature map — (B, 7, 7, 2048) for
resnet50 at 224px — matching the reference's backbone contract
(pocolib/models/backbone/resnet.py: returns pre-pool features consumed by
hmr_head / pare_head).
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
)


class ResNet(nn.Module):
    """Torchvision-style ResNet trunk without the classifier."""

    block: Any
    layers: Sequence[int]
    groups: int = 1
    base_width: int = 64
    # space-to-depth stem conv1 (common.S2DStemConv) — exact dot
    # products modulo float-add order; opt-in pending TPU measurement.
    s2d_stem: bool | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # default OFF until the TPU measurement lands (lane_pad
        # protocol: accept on measured wall time; see BENCHMARKS.md)
        s2d = bool(self.s2d_stem)
        if s2d:
            y = S2DStemConv(
                64, kernel_size=7, name="conv1", dtype=self.dtype
            )(x)
        else:
            y = nn.Conv(
                64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                use_bias=False, name="conv1", dtype=self.dtype,
            )(x)
        y = batch_norm(train, name="bn1", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        y = nn.max_pool(y, (3, 3), strides=(2, 2))

        strides = (1, 2, 2, 2)
        filters = (64, 128, 256, 512)
        for i in range(4):
            y = ResLayer(
                self.block, filters[i], self.layers[i], stride=strides[i],
                name=f"layer{i + 1}", groups=self.groups,
                base_width=self.base_width, dtype=self.dtype,
            )(y, train)
        return y


def resnet18(dtype: Any = jnp.float32) -> ResNet:
    return ResNet(BasicBlock, (2, 2, 2, 2), dtype=dtype)


def resnet34(dtype: Any = jnp.float32) -> ResNet:
    return ResNet(BasicBlock, (3, 4, 6, 3), dtype=dtype)


def resnet50(dtype: Any = jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 6, 3), dtype=dtype)


def resnet101(dtype: Any = jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 23, 3), dtype=dtype)


def resnet152(dtype: Any = jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 8, 36, 3), dtype=dtype)


def resnext50_32x4d(dtype: Any = jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 6, 3), groups=32, base_width=4, dtype=dtype)


def resnext101_32x8d(dtype: Any = jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 23, 3), groups=32, base_width=8, dtype=dtype)


def wide_resnet50_2(dtype: Any = jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 6, 3), base_width=128, dtype=dtype)


def wide_resnet101_2(dtype: Any = jnp.float32) -> ResNet:
    return ResNet(Bottleneck, (3, 4, 23, 3), base_width=128, dtype=dtype)


# Channel/downsample registry (reference: pocolib/models/backbone/utils.py:2-18).
BACKBONE_INFO = {
    "resnet18": {"n_output_channels": 512, "downsample_rate": 4},
    "resnet34": {"n_output_channels": 512, "downsample_rate": 4},
    "resnet50": {"n_output_channels": 2048, "downsample_rate": 4},
    "resnet101": {"n_output_channels": 2048, "downsample_rate": 4},
    "resnet152": {"n_output_channels": 2048, "downsample_rate": 4},
    "resnext50_32x4d": {"n_output_channels": 2048, "downsample_rate": 4},
    "resnext101_32x8d": {"n_output_channels": 2048, "downsample_rate": 4},
    "wide_resnet50_2": {"n_output_channels": 2048, "downsample_rate": 4},
    "wide_resnet101_2": {"n_output_channels": 2048, "downsample_rate": 4},
    "hrnet_w32": {"n_output_channels": 480, "downsample_rate": 4},
    "hrnet_w48": {"n_output_channels": 720, "downsample_rate": 4},
    "hrnet_w48_cls": {"n_output_channels": 2048, "downsample_rate": 4},
    "hrnet_w64": {"n_output_channels": 960, "downsample_rate": 4},
    "tiny": {"n_output_channels": 128, "downsample_rate": 4},
    "tiny_pose": {"n_output_channels": 32, "downsample_rate": 4},
}


def get_backbone_info(backbone: str) -> dict:
    return BACKBONE_INFO[backbone]
