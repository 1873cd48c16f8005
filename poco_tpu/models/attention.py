"""Optional PARE attention modules: co-attention and non-local blocks.

Reference contracts: pocolib/models/layers/coattention.py:24-126 and
pocolib/models/layers/non_local/dot_product.py:6-115. These are off in
every shipped config but are part of the PARE head's option surface
(pare_head.py:312-352). NHWC layout; the bilinear attention products map
onto MXU matmuls.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .backbones.common import batch_norm, conv


class CoAttention(nn.Module):
    """Gated cross-branch co-attention between two feature maps.

    Inputs/outputs (B, H, W, C) (reference operates NCHW; semantics are
    identical).
    """

    n_channel: int
    final_conv: str = "simple"   # simple / single_1 / single_3 / double_1 / double_3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, input_1: jnp.ndarray, input_2: jnp.ndarray, train: bool = False
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        b, h, w, c = input_1.shape
        exemplar = input_1.reshape(b, h * w, c)   # (B, N, C)
        query = input_2.reshape(b, h * w, c)

        # S = (W_e exemplar) @ query^T  (reference uses bmm on flattened)
        exemplar_corr = nn.Dense(
            c, use_bias=False, name="linear_e", dtype=self.dtype
        )(exemplar)                                # (B, N, C)
        attn = jnp.einsum("bnc,bmc->bnm", exemplar_corr, query)
        a1 = nn.softmax(attn, axis=1)              # over exemplar positions
        b1 = nn.softmax(attn.transpose(0, 2, 1), axis=1)
        query_att = jnp.einsum("bnc,bnm->bmc", exemplar, a1)
        exemplar_att = jnp.einsum("bmc,bmn->bnc", query, b1)

        input1_att = exemplar_att.reshape(b, h, w, c)
        input2_att = query_att.reshape(b, h, w, c)

        gate = conv(1, 1, padding=0, name="gate", dtype=self.dtype)
        input1_att = input1_att * nn.sigmoid(gate(input1_att))
        input2_att = input2_att * nn.sigmoid(gate(input2_att))

        cat1 = jnp.concatenate([input1_att, input_1], axis=-1)
        cat2 = jnp.concatenate([input2_att, input_2], axis=-1)

        def final(x, tag):
            if self.final_conv == "simple":
                return conv(
                    c, 1, padding=0, use_bias=True,
                    name=f"final_conv_{tag}", dtype=self.dtype,
                )(x)
            k = int(self.final_conv[-1])
            reps = 2 if self.final_conv.startswith("double") else 1
            y = x
            for r in range(reps):
                y = conv(
                    c, k, name=f"final_conv_{tag}_c{r}", dtype=self.dtype
                )(y)
                y = batch_norm(
                    train, name=f"final_conv_{tag}_bn{r}", dtype=self.dtype
                )(y)
                y = nn.relu(y)
            return y

        return final(cat1, "1"), final(cat2, "2")


class NonLocalBlock(nn.Module):
    """Dot-product non-local block over a 1D or 2D feature layout.

    Args (inputs):
        1D: (B, N, C); 2D: (B, H, W, C).
    The residual projection W is zero-initialized so the block starts as
    identity (reference dot_product.py:41-47).
    """

    in_channels: int
    inter_channels: int | None = None
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inter = self.inter_channels or max(self.in_channels // 2, 1)
        shape = x.shape
        flat = x.reshape(shape[0], -1, shape[-1])   # (B, N, C)

        g = nn.Dense(inter, name="g", dtype=self.dtype)(flat)
        theta = nn.Dense(inter, name="theta", dtype=self.dtype)(flat)
        phi = nn.Dense(inter, name="phi", dtype=self.dtype)(flat)

        f = jnp.einsum("bnc,bmc->bnm", theta, phi) / flat.shape[1]
        y = jnp.einsum("bnm,bmc->bnc", f, g)

        w = nn.Dense(
            self.in_channels, name="w",
            kernel_init=nn.initializers.zeros, dtype=self.dtype,
        )(y)
        if self.use_bn:
            w = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name="w_bn", scale_init=nn.initializers.zeros,
                dtype=self.dtype,
            )(w)
        return (w + flat).reshape(shape)
