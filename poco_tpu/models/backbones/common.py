"""Shared backbone building blocks (flax.linen, NHWC).

Conventions chosen for checkpoint-conversion parity with torch models:
  * explicit torch-style symmetric padding (never 'SAME', whose asymmetric
    pads differ from torch for stride-2 convs),
  * BatchNorm epsilon 1e-5, momentum 0.9 (torch momentum 0.1),
  * module names mirror the torch attribute paths so the converter is a
    mechanical string transform.

Reference topologies: pocolib/models/backbone/{resnet.py,hrnet.py,hrnet_cls.py}.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

BN_MOMENTUM = 0.9  # flax momentum = 1 - torch(0.1)


def conv(
    features: int,
    kernel: int,
    stride: int = 1,
    padding: int | None = None,
    use_bias: bool = False,
    name: str | None = None,
    dtype: Any = jnp.float32,
) -> nn.Conv:
    if padding is None:
        padding = kernel // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        use_bias=use_bias,
        name=name,
        dtype=dtype,
    )


def batch_norm(train: bool, name: str | None = None, dtype: Any = jnp.float32) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=1e-5,
        name=name,
        dtype=dtype,
    )


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (expansion 1)."""

    filters: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        y = conv(self.filters, 3, self.stride, name="conv1", dtype=self.dtype)(x)
        y = batch_norm(train, name="bn1", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = conv(self.filters, 3, 1, name="conv2", dtype=self.dtype)(y)
        y = batch_norm(train, name="bn2", dtype=self.dtype)(y)
        if self.has_downsample:
            residual = conv(
                self.filters, 1, self.stride, padding=0,
                name="downsample_conv", dtype=self.dtype,
            )(x)
            residual = batch_norm(train, name="downsample_bn", dtype=self.dtype)(
                residual
            )
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual block (expansion 4).

    `groups`/`base_width` follow the torchvision convention so the same
    block expresses resnext and wide-resnet variants.
    """

    filters: int
    stride: int = 1
    has_downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        width = int(self.filters * (self.base_width / 64.0)) * self.groups
        y = conv(width, 1, 1, padding=0, name="conv1", dtype=self.dtype)(x)
        y = batch_norm(train, name="bn1", dtype=self.dtype)(y)
        y = nn.relu(y)
        mid = nn.Conv(
            width, (3, 3), (self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False,
            feature_group_count=self.groups, name="conv2", dtype=self.dtype,
        )
        y = mid(y)
        y = batch_norm(train, name="bn2", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = conv(
            self.filters * 4, 1, 1, padding=0, name="conv3", dtype=self.dtype
        )(y)
        y = batch_norm(train, name="bn3", dtype=self.dtype)(y)
        if self.has_downsample:
            residual = conv(
                self.filters * 4, 1, self.stride, padding=0,
                name="downsample_conv", dtype=self.dtype,
            )(x)
            residual = batch_norm(train, name="downsample_bn", dtype=self.dtype)(
                residual
            )
        return nn.relu(y + residual)


def upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Exact integer-factor nearest upsampling (NHWC), torch-equivalent."""
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


def _resize_weights(out_n: int, in_n: int) -> np.ndarray:
    """(out_n, in_n) align-corners bilinear weight matrix (static)."""
    if out_n == 1 or in_n == 1:
        w = np.zeros((out_n, in_n), np.float32)
        w[:, 0] = 1.0
        return w
    coords = np.arange(out_n, dtype=np.float64) * (in_n - 1) / (out_n - 1)
    idx = np.arange(in_n, dtype=np.float64)
    w = np.maximum(0.0, 1.0 - np.abs(coords[:, None] - idx[None, :]))
    return (w / w.sum(axis=1, keepdims=True)).astype(np.float32)


def resize_bilinear_align_corners(
    x: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """Bilinear resize with align_corners=True semantics (NHWC).

    Matches torch `F.interpolate(mode='bilinear', align_corners=True)`:
    output pixel i samples input coordinate i * (in-1) / (out-1).
    TPU-first formulation: the resample is separable, so it is expressed
    as two small static-weight contractions that XLA maps onto the MXU
    (jax.image.resize only implements the half-pixel convention, and a
    gather formulation compiles/runs poorly on TPU).
    """
    _, in_h, in_w, _ = x.shape
    ry = jnp.asarray(_resize_weights(out_h, in_h), x.dtype)
    rx = jnp.asarray(_resize_weights(out_w, in_w), x.dtype)
    tmp = jnp.einsum("oy,byxc->boxc", ry, x)
    return jnp.einsum("px,boxc->bopc", rx, tmp)


class ResLayer(nn.Module):
    """Sequence of residual blocks, torch `_make_layer` equivalent.

    Child names are "0", "1", ... to mirror torch nn.Sequential indices.
    """

    block: Callable[..., nn.Module]
    filters: int
    num_blocks: int
    stride: int = 1
    in_channels: int | None = None
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        expansion = self.block.expansion
        extra = (
            {"groups": self.groups, "base_width": self.base_width}
            if self.block is Bottleneck and (self.groups != 1 or self.base_width != 64)
            else {}
        )
        needs_ds = self.stride != 1 or x.shape[-1] != self.filters * expansion
        y = self.block(
            self.filters,
            stride=self.stride,
            has_downsample=needs_ds,
            name="0",
            dtype=self.dtype,
            **extra,
        )(x, train)
        for i in range(1, self.num_blocks):
            y = self.block(
                self.filters, name=str(i), dtype=self.dtype, **extra
            )(y, train)
        return y
