"""Neural net layers shared by the PARE/POCO heads (flax/JAX, NHWC).

JAX re-expressions of the reference layer zoo
(pocolib/models/layers/{locallyconnected2d,keypoint_attention,softargmax,
interpolate}.py). All are batched tensor ops that XLA fuses into the
surrounding program — the unfold/broadcast tricks of the torch versions
become plain einsums.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class PerPositionConv1x1(nn.Module):
    """Unshared-weight 1x1 conv over a fixed (H, W) output grid.

    Equivalent to the reference's LocallyConnected2d with kernel_size=1
    (pocolib/models/layers/locallyconnected2d.py:27-37), used as per-joint
    pose MLPs over a [24, 1] grid (pare_head.py:411-419) and as the lc2d
    uncertainty head over [24, sigma] (poco_head.py:46-55).

    Input (B, C, H, W) -> output (B, O, H, W); weight (H, W, O, C).
    """

    out_channels: int
    grid: tuple[int, int]
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.grid
        weight = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (h, w, self.out_channels, x.shape[1]),
            self.dtype,
        )
        y = jnp.einsum("bchw,hwoc->bohw", x, weight)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (1, self.out_channels, h, w),
                self.dtype,
            )
            y = y + bias
        return y


def keypoint_attention(
    features: jnp.ndarray,
    heatmaps: jnp.ndarray,
    act: str = "softmax",
    use_scale: bool = False,
) -> jnp.ndarray:
    """Per-joint soft feature pooling.

    Reference contract: pocolib/models/layers/keypoint_attention.py:34-56
    (use_conv=False path, the shipped-config default).

    Args:
        features: (B, C, H, W).
        heatmaps: (B, J, H, W) attention logits.
    Returns:
        (B, C, J) per-joint pooled features.
    """
    b, j, h, w = heatmaps.shape
    hm = heatmaps.reshape(b, j, h * w)
    if use_scale:
        hm = hm / jnp.sqrt(float(h * w))
    if act == "softmax":
        hm = jnp.exp(hm - hm.max(axis=-1, keepdims=True))
        hm = hm / hm.sum(axis=-1, keepdims=True)
    elif act == "sigmoid":
        hm = 1.0 / (1.0 + jnp.exp(-hm))
    feat = features.reshape(b, -1, h * w)
    return jnp.einsum("bjn,bcn->bcj", hm, feat)


def softargmax2d(
    heatmaps: jnp.ndarray,
    temperature: float = 1.0,
    normalize_keypoints: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable 2D argmax (reference softargmax.py:56-108).

    Args:
        heatmaps: (B, J, H, W).
    Returns:
        keypoints (B, J, 2) in [-1, 1] (x, y) if normalized,
        normalized_heatmap (B, J, H, W).
    """
    b, j, h, w = heatmaps.shape
    flat = heatmaps.reshape(b, j, h * w) * temperature
    norm = jnp.exp(flat - flat.max(axis=-1, keepdims=True))
    norm = norm / norm.sum(axis=-1, keepdims=True)

    xs = jnp.tile(jnp.arange(w, dtype=heatmaps.dtype), h)
    ys = jnp.repeat(jnp.arange(h, dtype=heatmaps.dtype), w)
    kx = (norm * xs).sum(axis=-1)
    ky = (norm * ys).sum(axis=-1)
    if normalize_keypoints:
        kx = kx / (w - 1) * 2.0 - 1.0
        ky = ky / (h - 1) * 2.0 - 1.0
    return jnp.stack([kx, ky], axis=-1), norm.reshape(b, j, h, w)


def softargmax1d(
    heatmaps: jnp.ndarray,
    temperature: float = 1.0,
    normalize_keypoints: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable 1D argmax (reference softargmax.py:25-54)."""
    b, c, d = heatmaps.shape
    flat = heatmaps * temperature
    norm = jnp.exp(flat - flat.max(axis=-1, keepdims=True))
    norm = norm / norm.sum(axis=-1, keepdims=True)
    pts = jnp.arange(d, dtype=heatmaps.dtype)
    kp = (norm * pts).sum(axis=-1)
    if normalize_keypoints:
        kp = kp / (d - 1) * 2.0 - 1.0
    return kp, norm


def get_heatmap_preds(
    heatmaps: jnp.ndarray, normalize_keypoints: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Hard argmax keypoints + max-value confidence.

    Reference contract: softargmax.py get_heatmap_preds — coordinates of
    the per-joint maximum, masked to zero where the max is non-positive.
    """
    b, j, h, w = heatmaps.shape
    flat = heatmaps.reshape(b, j, h * w)
    idx = jnp.argmax(flat, axis=-1)
    maxval = jnp.max(flat, axis=-1)
    x = (idx % w).astype(heatmaps.dtype)
    y = (idx // w).astype(heatmaps.dtype)
    mask = (maxval > 0).astype(heatmaps.dtype)
    kp = jnp.stack([x * mask, y * mask], axis=-1)
    if normalize_keypoints:
        kp = kp.at[..., 0].set(kp[..., 0] / (w - 1) * 2.0 - 1.0)
        kp = kp.at[..., 1].set(kp[..., 1] / (h - 1) * 2.0 - 1.0)
    return kp, maxval[..., None]


def grid_sample_bilinear(
    features: jnp.ndarray, uv: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear sampling at normalized coordinates, align_corners=True.

    Equivalent to the reference's `interpolate` (interpolate.py:3-19):
    torch F.grid_sample(feat, uv, align_corners=True) with zero padding.

    Args:
        features: (B, C, H, W).
        uv: (B, N, 2) in [-1, 1], (x, y) order.
    Returns:
        (B, C, N) sampled features.
    """
    b, c, h, w = features.shape
    x = (uv[..., 0] + 1.0) * (w - 1) / 2.0
    y = (uv[..., 1] + 1.0) * (h - 1) / 2.0

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1, y1 = x0 + 1, y0 + 1
    wx = x - x0
    wy = y - y0

    def gather(yi, xi):
        # zero padding outside bounds
        valid = (
            (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        ).astype(features.dtype)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = features.reshape(b, c, h * w)
        idx = yc * w + xc                                  # (B, N)
        vals = jnp.take_along_axis(flat, idx[:, None, :], axis=-1)
        return vals * valid[:, None, :]

    out = (
        gather(y0, x0) * ((1 - wx) * (1 - wy))[:, None, :]
        + gather(y0, x1) * (wx * (1 - wy))[:, None, :]
        + gather(y1, x0) * ((1 - wx) * wy)[:, None, :]
        + gather(y1, x1) * (wx * wy)[:, None, :]
    )
    return out
