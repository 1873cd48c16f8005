"""Conditional RealNVP normalizing flow for confidence calibration.

Reference contract: pocolib/models/layers/real_nvp.py (affine-coupling flow)
and pocolib/models/head/nf_head.py (flow over the normalized pose residual
bar_pose = |pred - gt| / sigma, optionally conditioned on pose-head
features).

JAX notes: the coupling masks are static compile-time constants so the
(2 * num_flow_layers)-step loop unrolls cleanly under jit; the standard
normal prior needs none of the reference's device-migration hacks
(real_nvp.py:55-62).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Coupling masks (reference: nf_head.py:20-29)
# ---------------------------------------------------------------------------

def get_alter_masks(num_rv: int, num_layers: int) -> np.ndarray:
    pair = [
        [i % 2 for i in range(num_rv)],
        [(i + 1) % 2 for i in reversed(range(num_rv))],
    ]
    return np.array(pair * num_layers, dtype=np.float32)


def get_new_masks(num_rv: int, num_layers: int) -> np.ndarray:
    split = math.floor(num_rv / 2)
    pair = [
        [min(i // split, 1) for i in range(num_rv)],
        [min(i // split, 1) for i in reversed(range(num_rv))],
    ]
    return np.array(pair * num_layers, dtype=np.float32)


def get_old_masks(num_rv: int, num_layers: int) -> np.ndarray:
    split = math.ceil(num_rv / 2)
    pair = [
        [i // split for i in range(num_rv)],
        [i // split for i in reversed(range(num_rv))],
    ]
    return np.array(pair * num_layers, dtype=np.float32)


MASK_BUILDERS = {"alter": get_alter_masks, "new": get_new_masks, "old": get_old_masks}


class CouplingNet(nn.Module):
    """3-layer MLP; tanh on the output for scale nets (reference nf_head.py:13-17)."""

    hidden: int
    out: int
    final_tanh: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, name="fc0", dtype=self.dtype)(x)
        x = nn.leaky_relu(x)
        x = nn.Dense(self.hidden, name="fc1", dtype=self.dtype)(x)
        x = nn.leaky_relu(x)
        x = nn.Dense(self.out, name="fc2", dtype=self.dtype)(x)
        if self.final_tanh:
            x = nn.tanh(x)
        return x


class RealNVP(nn.Module):
    """Affine-coupling flow with optional conditioning concat.

    Reference contract: pocolib/models/layers/real_nvp.py:25-70.
    """

    num_rv: int
    num_coupling_layers: int
    hidden: int = 64
    mask_type: str = "alter"
    dtype: Any = jnp.float32

    def setup(self):
        masks = MASK_BUILDERS[self.mask_type](
            self.num_rv, self.num_coupling_layers
        )
        self.masks = jnp.asarray(masks)
        n = masks.shape[0]
        self.s_nets = [
            CouplingNet(self.hidden, self.num_rv, final_tanh=True,
                        name=f"s{i}", dtype=self.dtype)
            for i in range(n)
        ]
        self.t_nets = [
            CouplingNet(self.hidden, self.num_rv, final_tanh=False,
                        name=f"t{i}", dtype=self.dtype)
            for i in range(n)
        ]

    def _st(self, i: int, masked: jnp.ndarray, cond: jnp.ndarray | None):
        inp = masked if cond is None else jnp.concatenate([masked, cond], axis=1)
        inv = 1.0 - self.masks[i]
        return self.s_nets[i](inp) * inv, self.t_nets[i](inp) * inv

    def forward_p(
        self, z: jnp.ndarray, cond: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        """Latent -> data (sampling direction)."""
        x = z
        for i in range(len(self.s_nets)):
            x_masked = x * self.masks[i]
            s, t = self._st(i, x_masked, cond)
            x = x_masked + (1.0 - self.masks[i]) * (x * jnp.exp(s) + t)
        return x

    def backward_p(
        self, x: jnp.ndarray, cond: jnp.ndarray | None = None
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Data -> latent, returning (z, log|det J|)."""
        log_det = jnp.zeros(x.shape[0], dtype=x.dtype)
        z = x
        for i in reversed(range(len(self.s_nets))):
            z_masked = z * self.masks[i]
            s, t = self._st(i, z_masked, cond)
            z = (1.0 - self.masks[i]) * (z - t) * jnp.exp(-s) + z_masked
            log_det = log_det - jnp.sum(s, axis=1)
        return z, log_det

    def log_prob(
        self, x: jnp.ndarray, cond: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        z, log_det = self.backward_p(x, cond)
        prior_lp = -0.5 * jnp.sum(z**2, axis=1) - 0.5 * self.num_rv * math.log(
            2 * math.pi
        )
        return prior_lp + log_det

    def sample(
        self, rng: jax.Array, batch: int, cond: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        z = jax.random.normal(rng, (batch, self.num_rv), dtype=self.dtype)
        return self.forward_p(z, cond)

    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray | None = None):
        return self.log_prob(x, cond)


class FlowHead(nn.Module):
    """Flow over the sigma-normalized pose residual (training-time only).

    Reference contract: pocolib/models/head/nf_head.py:32-136.
    """

    num_nf_rv: int = 9
    num_flow_layers: int = 1
    nflow_mask_type: str = "alter"
    cond_nflow: bool = True
    context_dim: int = 512
    exclude_uncert_idx: Sequence[int] = ()
    mask_params_id: Sequence[int] = ()
    num_joints: int = 24
    dtype: Any = jnp.float32

    def setup(self):
        self.sel_parts = tuple(
            j for j in range(self.num_joints) if j not in self.exclude_uncert_idx
        )
        if self.cond_nflow:
            self.cond_layer = nn.Dense(
                self.context_dim, name="cond_layer", dtype=self.dtype
            )
        self.flow = RealNVP(
            num_rv=self.num_nf_rv,
            num_coupling_layers=self.num_flow_layers,
            mask_type=self.nflow_mask_type,
            name="flow",
            dtype=self.dtype,
        )

    def __call__(
        self,
        uncert_feat: jnp.ndarray,
        pred_pose: jnp.ndarray,
        gt_pose_rotmat: jnp.ndarray,
        var_pose: jnp.ndarray,
    ) -> jnp.ndarray:
        """Compute log phi for every sample (the loss masks by has_smpl).

        Args:
            uncert_feat: (B, C) pose-head features for conditioning.
            pred_pose: (B, 24, 3, 3).
            gt_pose_rotmat: (B, 24, 3, 3).
            var_pose: (B, P) or (B, P, 3, 3) predicted sigma.
        Returns:
            log_phi: (B, P') per-part flow log-likelihoods, where
            P' = 24*9/num_nf_rv selected parts.
        """
        batch = pred_pose.shape[0]
        sel = jnp.asarray(self.sel_parts)
        pred = pred_pose[:, sel]
        gt = gt_pose_rotmat[:, sel]
        sigma = var_pose
        if sigma is None:
            # no uncertainty head active (e.g. mse loss_ver + flow):
            # flow over the raw residual
            sigma = jnp.ones_like(pred)
        if sigma.ndim == 2:
            sigma = sigma[:, :, None, None]
            sigma = jnp.broadcast_to(sigma, sigma.shape[:2] + (3, 3))

        bar_pose = jnp.abs(pred - gt) / (sigma + 1e-9)
        if self.num_nf_rv == self.num_joints:
            bar_pose = bar_pose.mean(axis=(-1, -2))
        bar_pose = bar_pose.reshape(-1, self.num_nf_rv)

        cond = None
        if self.cond_nflow:
            cond = self.cond_layer(uncert_feat)
            reps = bar_pose.shape[0] // batch
            if reps > 1:
                cond = jnp.repeat(cond, reps, axis=0)

        log_phi = self.flow.log_prob(bar_pose, cond).reshape(batch, -1)

        if (
            log_phi.shape[1] == self.num_joints
            and len(self.mask_params_id) > 0
            and len(self.sel_parts) == self.num_joints
        ):
            mask = np.ones(self.num_joints, np.float32)
            mask[list(self.mask_params_id)] = 0.0
            log_phi = log_phi * jnp.asarray(mask)
        return log_phi
