"""Tiny CNN backbones for tests, CI, and multichip dry runs.

Structurally complete stand-ins (strided conv stem -> feature map or
pooled vector) that keep single-core-CPU XLA compiles fast while
exercising the same head/SMPL/uncertainty/flow machinery as the real
HRNet/ResNet backbones.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .common import batch_norm, conv


class TinyBackbone(nn.Module):
    """4 strided conv blocks; "cls" -> (B, C), "pose" -> (B, 56, 56, C/4)."""

    variant: str = "cls"
    width: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        w = self.width
        y = conv(w, 3, 2, name="conv1", dtype=self.dtype)(x)
        y = batch_norm(train, name="bn1", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = conv(w, 3, 2, name="conv2", dtype=self.dtype)(y)
        y = batch_norm(train, name="bn2", dtype=self.dtype)(y)
        y = nn.relu(y)
        if self.variant == "pose":
            y = conv(w, 3, 1, name="conv3", dtype=self.dtype)(y)
            return nn.relu(batch_norm(train, name="bn3", dtype=self.dtype)(y))
        y = conv(2 * w, 3, 2, name="conv3", dtype=self.dtype)(y)
        y = batch_norm(train, name="bn3", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = conv(4 * w, 3, 2, name="conv4", dtype=self.dtype)(y)
        y = batch_norm(train, name="bn4", dtype=self.dtype)(y)
        y = nn.relu(y)
        return jnp.mean(y, axis=(1, 2))


def tiny_cls(dtype: Any = jnp.float32) -> TinyBackbone:
    return TinyBackbone(variant="cls", width=32, dtype=dtype)


def tiny_pose(dtype: Any = jnp.float32) -> TinyBackbone:
    return TinyBackbone(variant="pose", width=32, dtype=dtype)
