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

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

BN_MOMENTUM = 0.9  # flax momentum = 1 - torch(0.1)

LANE = 128  # TPU vector lane width / MXU tile edge


def lane_pad_target(c: int) -> int:
    """Channel count the TPU conv path wants for a 3x3 conv stack.

    Empirical (BENCHMARKS.md, round 2): 3x3 convs whose channel count is
    above one lane tile but not a multiple of 128 hit a slow XLA conv
    path on v5e — measured 64-72 TF/s for 14x14x192 ResLayers vs
    >200 TF/s effective after zero-padding the same stack to 256
    channels (1.85x faster wall time despite 78% more FLOPs). Channel
    counts at or below 128 are packed well already (48ch: 99 TF/s) and
    padding them costs more FLOPs than it recovers.
    """
    if c > LANE and c % LANE != 0:
        return ((c + LANE - 1) // LANE) * LANE
    return c


def _pad_last(x: jnp.ndarray, target: int, value: float = 0.0) -> jnp.ndarray:
    pad = target - x.shape[-1]
    if pad <= 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths, constant_values=value)


class LaneConv(nn.Module):
    """3x3/1x1 conv with LOGICAL param shapes but lane-padded compute.

    The kernel parameter keeps the checkpoint-compatible logical shape
    (k, k, in_features, features); at apply time it is zero-padded to
    (k, k, pad_in, pad_out) and applied to an already channel-padded
    input. Zero padding is mathematically exact: padded input channels
    are zero and padded output channels produce zero.
    """

    features: int          # logical output channels
    in_features: int       # logical input channels
    kernel: int
    stride: int = 1
    pad_in: int | None = None
    pad_out: int | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, self.in_features, self.features),
            jnp.float32,
        )
        pad_in = self.pad_in or self.in_features
        pad_out = self.pad_out or self.features
        if xp.shape[-1] != pad_in:
            raise ValueError(
                f"LaneConv expected padded input {pad_in}, got {xp.shape}"
            )
        kp = jnp.zeros((k, k, pad_in, pad_out), jnp.float32)
        kp = kp.at[:, :, : self.in_features, : self.features].set(kernel)
        p = (k - 1) // 2
        return jax.lax.conv_general_dilated(
            xp.astype(self.dtype),
            kp.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class LaneBatchNorm(nn.Module):
    """BatchNorm with LOGICAL param/stat shapes over lane-padded input.

    scale pads with 1, bias/mean with 0, var with 1, so padded (zero)
    channels stay exactly zero in both eval and train modes; running
    stats are updated from the logical slice only.
    """

    features: int
    momentum: float = BN_MOMENTUM
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(c, jnp.float32)
        )
        cp = xp.shape[-1]
        if train:
            x32 = xp.astype(jnp.float32)
            mean = jnp.mean(x32, axis=(0, 1, 2))
            var = jnp.var(x32, axis=(0, 1, 2))
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1.0 - self.momentum) * mean[:c]
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1.0 - self.momentum) * var[:c]
                )
        else:
            mean = _pad_last(ra_mean.value, cp, 0.0)
            var = _pad_last(ra_var.value, cp, 1.0)
        scale_p = _pad_last(scale, cp, 1.0)
        bias_p = _pad_last(bias, cp, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale_p
        y = (xp.astype(jnp.float32) - mean) * inv + bias_p
        return y.astype(self.dtype)


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


class S2DStemConv(nn.Module):
    """Stem odd-k/stride-2 conv computed as space-to-depth + small conv.

    The stem's first conv has few input channels (RGB: 3 of 128 vector
    lanes used), so the MXU runs nearly empty. The classic TPU rewrite
    (MLPerf ResNet): zero-pad the kxk kernel to (k+1)x(k+1) with a
    leading row/col (the added taps multiply pixels by exact zeros),
    then the (k+1)x(k+1) stride-2 conv over (H, W, C) is identically an
    m x m stride-1 conv, m=(k+1)/2, over the (H/2, W/2, 4C)
    space-to-depth rearrangement — 4x the input-channel occupancy, the
    same dot products, exact math modulo float-add order.

    The kernel PARAMETER keeps the checkpoint-compatible logical shape
    (k, k, in, out) under the same `kernel` name as nn.Conv, so
    converted reference weights load into either implementation
    unchanged. Falls back to the plain conv for odd spatial sizes.
    """

    features: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        assert k % 2 == 1, "stem rewrite expects an odd kernel"
        p = k // 2
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, cin, self.features),
            jnp.float32,
        )
        b, h, w, _ = x.shape
        if h % 2 or w % 2:
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
            )
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(2, 2), padding=[(p, p), (p, p)],
                dimension_numbers=dn,
            )
        # kernel kxk -> (k+1)x(k+1) with a leading zero row/col, then
        # split each spatial axis into (block, offset): index a = 2u+pi.
        m = (k + 1) // 2
        kpad = jnp.pad(kernel, [(1, 0), (1, 0), (0, 0), (0, 0)])
        k2 = kpad.reshape(m, 2, m, 2, cin, self.features)  # (u,pi,v,pj,c,o)
        k2 = k2.transpose(0, 2, 1, 3, 4, 5).reshape(m, m, 4 * cin, self.features)
        # space-to-depth with the matching (pi, pj, c) flat order
        xs = x.reshape(b, h // 2, 2, w // 2, 2, cin)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * cin)
        dn = jax.lax.conv_dimension_numbers(
            xs.shape, k2.shape, ("NHWC", "HWIO", "NHWC")
        )
        # out(i) covers input rows 2i-p-1 .. 2i+p = blocks
        # i-(p+1)/2 .. i+p/2 -> block padding ((p+1)//2, p//2).
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype), k2.astype(self.dtype),
            window_strides=(1, 1),
            padding=[((p + 1) // 2, p // 2), ((p + 1) // 2, p // 2)],
            dimension_numbers=dn,
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
    """3x3 + 3x3 residual block (expansion 1).

    With `lane_pad` set (a padded channel count > filters), the block
    expects/returns lane-padded activations and runs its convs/BNs in
    padded space while the PARAMETERS keep logical shapes — exact math,
    faster TPU conv path (see lane_pad_target).
    """

    filters: int
    stride: int = 1
    has_downsample: bool = False
    lane_pad: int | None = None
    dtype: Any = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.lane_pad and self.lane_pad != self.filters:
            if self.stride != 1 or self.has_downsample:
                raise ValueError("lane_pad requires a plain residual block")
            f, p = self.filters, self.lane_pad
            y = LaneConv(
                f, f, 3, pad_in=p, pad_out=p, name="conv1", dtype=self.dtype
            )(x)
            y = LaneBatchNorm(f, name="bn1", dtype=self.dtype)(y, train)
            y = nn.relu(y)
            y = LaneConv(
                f, f, 3, pad_in=p, pad_out=p, name="conv2", dtype=self.dtype
            )(y)
            y = LaneBatchNorm(f, name="bn2", dtype=self.dtype)(y, train)
            return nn.relu(y + x)
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
    lane_pad: bool = False
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
        target = lane_pad_target(self.filters)
        if (
            self.lane_pad
            and self.block is BasicBlock
            and target != self.filters
            and not needs_ds
        ):
            # pad once at entry, run all blocks padded, slice at exit
            xp = _pad_last(x, target)
            for i in range(self.num_blocks):
                xp = BasicBlock(
                    self.filters, lane_pad=target,
                    name=str(i), dtype=self.dtype,
                )(xp, train)
            return xp[..., : self.filters]
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
