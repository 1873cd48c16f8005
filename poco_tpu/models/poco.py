"""POCO model composition: backbone -> head -> SMPL -> uncertainty -> flow.

Reference contract: pocolib/models/poco.py:12-129 (POCO) and hmr.py (the
plain-HMR baseline, METHOD=spin). TPU-first redesign choices:

  * explicit constructor registries instead of `eval`-built modules
    (reference poco.py:65-67);
  * one flax module whose `__call__` is the complete inference graph —
    jit-compiling `POCO.apply` yields a single XLA program covering
    backbone, iterative head, SMPL LBS, projection, uncertainty MLP and
    (in training) the RealNVP flow;
  * the SMPL weights are passed as a pytree argument (not captured
    constants) so the same compiled program serves any gender/model file.

Batch dict keys consumed (all device arrays):
    img         (B, 224, 224, 3)  normalized crop (NHWC)
    bbox_info   (B, 3)            CLIFF bbox descriptor   [cliff heads]
    focal_length (B,)             full-image focal length [cliff heads]
    scale       (B,)              bbox height / 200       [cliff heads]
    center      (B, 2)            bbox center (pixels)    [cliff heads]
    orig_shape  (B, 2)            original (h, w)         [cliff heads]
    gt_pose_rotmat      (B, 24, 3, 3)  optional, training only
    gt_pose_cond_mask   (B,)           optional, training only
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..smpl.lbs import SmplParams
from ..smpl.model import smpl_head, smplcam_head
from .backbones.hrnet import hrnet_w32, hrnet_w48, hrnet_w48_cls, hrnet_w64
from .backbones.tiny import tiny_cls, tiny_pose
from .backbones.resnet import (
    get_backbone_info,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnext50_32x4d,
    resnext101_32x8d,
    wide_resnet50_2,
    wide_resnet101_2,
)
from .heads.cliff import CliffHead
from .heads.flow import FlowHead
from .heads.hmr import HmrHead
from .heads.poco_uncert import PocoUncertHead

BACKBONES = {
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnet101": resnet101,
    "resnet152": resnet152,
    "resnext50_32x4d": resnext50_32x4d,
    "resnext101_32x8d": resnext101_32x8d,
    "wide_resnet50_2": wide_resnet50_2,
    "wide_resnet101_2": wide_resnet101_2,
    "hrnet_w32": hrnet_w32,
    "hrnet_w48": hrnet_w48,
    "hrnet_w48_cls": hrnet_w48_cls,
    "hrnet_w64": hrnet_w64,
    "tiny": tiny_cls,
    "tiny_pose": tiny_pose,
}


@dataclasses.dataclass(frozen=True)
class PocoConfig:
    """Model hyperparameters (mirrors the reference POCO kwargs,
    poco.py:13-39, and the shipped configs/demo_poco_{cliff,pare}.yaml)."""

    backbone: str = "hrnet_w48_cls-cliff"   # "<backbone>-<head>"
    img_res: int = 224
    uncert_layer: str = "diff_branch"
    activation_type: str = "sigmoid"
    uncert_type: str = "pose"
    uncert_inp_type: str = "feat-pose-net"
    loss_ver: str = "norm_flow_res_gaus"
    num_neurons: tuple[int, ...] = (216,)
    num_flow_layers: int = 1
    sigma_dim: int = 1
    num_nf_rv: int = 9
    mask_params_id: tuple[int, ...] = ()
    nflow_mask_type: str = "alter"
    exclude_uncert_idx: tuple[int, ...] = ()
    use_dropout: bool = True
    use_iter_feats: bool = True
    cond_nflow: bool = True
    context_dim: int = 512
    gt_pose_cond: bool = True
    gt_pose_cond_ds: str = "h36m"
    gt_pose_cond_ratio: float = 0.25

    @property
    def backbone_name(self) -> str:
        return self.backbone.split("-")[0]

    @property
    def head_name(self) -> str:
        parts = self.backbone.split("-")
        return parts[1] if len(parts) > 1 else "hmr"

    @property
    def has_uncert_head(self) -> bool:
        return "diff_branch" in self.uncert_layer

    @property
    def has_flow_head(self) -> bool:
        return "norm_flow" in self.loss_ver

    @staticmethod
    def parse_num_neurons(spec: str) -> tuple[int, ...]:
        """'216-' -> (216,), '1024-512' -> (1024, 512)."""
        return tuple(int(x) for x in spec.split("-") if x)


class POCO(nn.Module):
    """Full POCO network. See module docstring for the batch contract."""

    cfg: PocoConfig = PocoConfig()
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.backbone_net = BACKBONES[cfg.backbone_name](dtype=self.dtype)
        n_feat = get_backbone_info(cfg.backbone_name)["n_output_channels"]
        if cfg.head_name == "cliff":
            self.head = CliffHead(num_input_features=n_feat, dtype=self.dtype)
        elif cfg.head_name == "pare":
            from .heads.pare import PareHead

            # forward the uncert-layer mode so same_branch_v1 /
            # diff_branch_lc2d size the head's exposed channels correctly
            self.head = PareHead(
                num_input_features=n_feat,
                uncert_layer=cfg.uncert_layer,
                dtype=self.dtype,
            )
        else:
            self.head = HmrHead(num_input_features=n_feat, dtype=self.dtype)

        head_channels = self.head.get_output_channels()
        if cfg.has_uncert_head:
            self.uncert_head = PocoUncertHead(
                num_input_channels=head_channels,
                num_neurons=cfg.num_neurons,
                sigma_dim=cfg.sigma_dim,
                activation_type=cfg.activation_type,
                use_dropout=cfg.use_dropout,
                uncert_inp_type=cfg.uncert_inp_type,
                exclude_uncert_idx=cfg.exclude_uncert_idx,
                loss_ver=cfg.loss_ver,
                uncert_type=cfg.uncert_type,
                dtype=self.dtype,
            )
        if cfg.has_flow_head:
            self.flow_head = FlowHead(
                num_nf_rv=cfg.num_nf_rv,
                num_flow_layers=cfg.num_flow_layers,
                nflow_mask_type=cfg.nflow_mask_type,
                cond_nflow=cfg.cond_nflow,
                context_dim=cfg.context_dim,
                exclude_uncert_idx=cfg.exclude_uncert_idx,
                mask_params_id=cfg.mask_params_id,
                dtype=self.dtype,
            )

    def __call__(
        self,
        batch: dict[str, jnp.ndarray],
        smpl: SmplParams,
        train: bool = False,
    ) -> dict[str, Any]:
        cfg = self.cfg
        features = self.backbone_net(batch["img"], train=train)

        if cfg.head_name == "cliff":
            head_out = self.head(features, batch["bbox_info"], train=train)
            s = smplcam_head(
                smpl,
                rotmat=head_out["pred_pose"],
                shape=head_out["pred_shape"],
                cam=head_out["pred_cam"],
                focal_length=batch["focal_length"],
                bbox_scale=batch["scale"],
                bbox_center=batch["center"],
                img_h=batch["orig_shape"][:, 0],
                img_w=batch["orig_shape"][:, 1],
                img_res=cfg.img_res,
            )
        else:
            head_out = self.head(features, train=train)
            s = smpl_head(
                smpl,
                rotmat=head_out["pred_pose"],
                shape=head_out["pred_shape"],
                cam=head_out["pred_cam"],
                img_res=cfg.img_res,
                normalize_joints2d=True,
            )

        output = dict(head_out)
        output.update(
            smpl_vertices=s.vertices,
            smpl_joints3d=s.joints3d,
            smpl_joints2d=s.joints2d,
            pred_cam_t=s.cam_t,
        )
        if s.fullimg_cam_t is not None:
            output["pred_fullimg_cam_t"] = s.fullimg_cam_t

        if cfg.has_uncert_head:
            gt_pose = batch.get("gt_pose_rotmat") if cfg.gt_pose_cond else None
            mask = batch.get("gt_pose_cond_mask") if cfg.gt_pose_cond else None
            uncert_out = self.uncert_head(
                head_out["uncert_feat"],
                head_out["pred_pose"],
                gt_pose_rotmat=gt_pose,
                gt_pose_cond_mask=mask,
                train=train,
            )
            output.update(uncert_out)

        # Flow log-likelihood is a training-time quantity (reference
        # nf_head.py:128-130 returns None at inference); it runs whenever
        # GT pose is supplied. Initialize params with `make_dummy_batch`
        # (include_gt=True) so the flow parameters always exist.
        if cfg.has_flow_head and "gt_pose_rotmat" in batch:
            output["log_phi"] = self.flow_head(
                head_out["uncert_feat"],
                head_out["pred_pose"],
                batch["gt_pose_rotmat"],
                output.get("var_pose"),
            )
        else:
            output["log_phi"] = None
        return output


def make_dummy_batch(
    cfg: PocoConfig, batch_size: int = 1, include_gt: bool = True
) -> dict[str, jnp.ndarray]:
    """A shape-correct zero batch for `POCO.init` / compile warm-up.

    Always include the GT keys at init time so the flow-head parameters are
    created even when the model is later used for inference only.
    """
    b = batch_size
    batch = {
        "img": jnp.zeros((b, cfg.img_res, cfg.img_res, 3), jnp.float32),
        "bbox_info": jnp.zeros((b, 3), jnp.float32),
        "focal_length": jnp.full((b,), 1000.0, jnp.float32),
        "scale": jnp.full((b,), 1.0, jnp.float32),
        "center": jnp.full((b, 2), 500.0, jnp.float32),
        "orig_shape": jnp.full((b, 2), 1000.0, jnp.float32),
    }
    if include_gt:
        batch["gt_pose_rotmat"] = jnp.broadcast_to(
            jnp.eye(3, dtype=jnp.float32), (b, 24, 3, 3)
        )
        batch["gt_pose_cond_mask"] = jnp.zeros((b,), bool)
    return batch


def init_poco(model: POCO, rng, smpl: SmplParams, batch_size: int = 1):
    """Initialize all model variables (params, batch_stats, buffers).

    The init is jitted: on remote-TPU tunnels each eager op dispatch pays
    a round trip, so tracing the whole init into one program matters.
    """
    import jax

    batch = make_dummy_batch(model.cfg, batch_size, include_gt=True)
    return jax.jit(lambda r: model.init(r, batch, smpl, train=False))(rng)


def build_poco_cliff(**overrides) -> POCO:
    """The flagship POCO-CLIFF model (configs/demo_poco_cliff.yaml)."""
    return POCO(cfg=PocoConfig(**overrides))


def build_poco_pare(**overrides) -> POCO:
    """POCO-PARE (configs/demo_poco_pare.yaml)."""
    defaults = dict(
        backbone="hrnet_w32-pare",
        uncert_inp_type="feat-pose",
        num_neurons=(512,),
        num_flow_layers=3,
        gt_pose_cond=False,
    )
    defaults.update(overrides)
    return POCO(cfg=PocoConfig(**defaults))


def build_hmr(**overrides) -> POCO:
    """Plain HMR/SPIN baseline (reference METHOD=spin, hmr.py)."""
    defaults = dict(
        backbone="resnet50-hmr",
        uncert_layer="",
        loss_ver="mse",
        gt_pose_cond=False,
    )
    defaults.update(overrides)
    return POCO(cfg=PocoConfig(**defaults))
