"""Full PARE-head conversion parity: torch clone -> converted flax outputs.

Covers the complete default inference path of the reference pare_head
(dual conv branches, part_segm attention, keypoint-attention pooling,
LC2d pose decoder, shape/cam MLPs — pare_head.py:669-752) and the
uncertainty head (feat-pose input type, poco_head.py:96-154), end to end
through the checkpoint converter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from poco_tpu.models.heads.pare import PareHead
from poco_tpu.models.heads.poco_uncert import PocoUncertHead
from poco_tpu.utils.checkpoint_convert import convert_state_dict, merge_converted

CIN = 24   # tiny backbone channels
NDF = 16   # deconv filters
NSF = 8    # smpl final dim


class _TorchPareMini(tnn.Module):
    """Reference pare_head default path at tiny width, reference names."""

    def __init__(self):
        super().__init__()
        def branch():
            return tnn.Sequential(
                tnn.Conv2d(CIN, NDF, 3, 1, 1, bias=False),
                tnn.BatchNorm2d(NDF), tnn.ReLU(True),
                tnn.Conv2d(NDF, NDF, 3, 1, 1, bias=False),
                tnn.BatchNorm2d(NDF), tnn.ReLU(True),
            )
        self.keypoint_deconv_layers = branch()
        self.smpl_deconv_layers = branch()
        self.keypoint_final_layer = tnn.Conv2d(NDF, 25, 1)
        self.smpl_final_layer = tnn.Conv2d(NDF, NSF, 1)
        # LC2d pose decoder: weight (1, 6, NDF, 24, 1, 1)
        self.pose_mlp = tnn.Module()
        self.pose_mlp.weight = tnn.Parameter(
            torch.randn(1, 6, NDF, 24, 1, 1) * 0.1
        )
        self.shape_mlp = tnn.Linear(24 * NSF, 10)
        self.cam_mlp = tnn.Linear(24 * NSF, 3)

    def forward(self, feats):
        b = feats.shape[0]
        part = self.keypoint_deconv_layers(feats)
        smpl = self.smpl_deconv_layers(feats)
        hm = self.keypoint_final_layer(part)[:, 1:]         # drop bg
        csf = self.smpl_final_layer(smpl)

        attn = F.softmax(hm.reshape(b, 24, -1), dim=-1)
        plf = torch.matmul(
            attn, smpl.reshape(b, NDF, -1).transpose(2, 1)
        ).transpose(2, 1)                                   # (B, NDF, 24)
        csp = torch.matmul(
            attn, csf.reshape(b, NSF, -1).transpose(2, 1)
        ).transpose(2, 1)                                   # (B, NSF, 24)

        # LC2d forward (locallyconnected2d.py:27-37, kernel 1)
        x = plf.unsqueeze(-1)                               # (B, NDF, 24, 1)
        xu = x.unfold(2, 1, 1).unfold(3, 1, 1).contiguous()
        xu = xu.view(*xu.size()[:-2], -1)
        pose = (xu.unsqueeze(1) * self.pose_mlp.weight).sum([2, -1])

        flat = csp.reshape(b, -1)
        shape = self.shape_mlp(flat)
        cam = self.cam_mlp(flat)
        pose6d = pose.squeeze(-1).transpose(2, 1)           # (B, 24, 6)
        return pose6d, shape, cam, plf.reshape(b, -1)


def _randomize_bns(m):
    for mod in m.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            mod.running_mean.data = torch.randn_like(mod.running_mean) * 0.05
            mod.running_var.data = torch.rand_like(mod.running_var) + 0.5
            mod.weight.data = torch.rand_like(mod.weight) + 0.5
            mod.bias.data = torch.randn_like(mod.bias) * 0.05


class TestPareHeadParity:
    def test_converted_head_outputs_match(self):
        tm = _TorchPareMini().eval()
        _randomize_bns(tm)
        x = torch.randn(2, CIN, 14, 14)
        with torch.no_grad():
            ref_pose6d, ref_shape, ref_cam, ref_uncert_feat = tm(x)

        sd = {f"head.{k}": v for k, v in tm.state_dict().items()}
        conv_out = convert_state_dict(sd, head_type="pare")
        assert not conv_out["unmatched"], conv_out["unmatched"]

        head = PareHead(
            num_input_features=CIN,
            num_deconv_filters=(NDF, NDF),
            num_features_smpl=NSF,
        )
        x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        variables = head.init(jax.random.PRNGKey(0), x_nhwc)
        src = {
            "params": conv_out["params"]["head"],
            "batch_stats": conv_out["batch_stats"]["head"],
        }
        merged, stats = merge_converted(variables, src)
        assert stats["skipped"] == 0, stats

        out = head.apply(merged, x_nhwc)
        np.testing.assert_allclose(
            np.asarray(out["pred_pose_6d"]).reshape(2, 24, 6),
            ref_pose6d.numpy(), atol=1e-4, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out["pred_shape"]), ref_shape.numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["pred_cam"]), ref_cam.numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["uncert_feat"]), ref_uncert_feat.numpy(),
            atol=1e-4,
        )


class _TorchUncertMini(tnn.Module):
    """Reference poco_head, feat-pose input type (poco_head.py:56-82):
    layers [C+216, 64, 24] -> fc1, fc2 with dropout+sigmoid each."""

    def __init__(self, c=32):
        super().__init__()
        self.uncert_fc1 = tnn.Linear(c + 216, 64)
        self.uncert_fc2 = tnn.Linear(64, 24)

    def forward(self, feats, pose):
        x = torch.cat([feats, pose.reshape(pose.shape[0], -1)], 1)
        x = torch.sigmoid(self.uncert_fc1(x))
        x = torch.sigmoid(self.uncert_fc2(x))
        return x


class TestUncertHeadParity:
    def test_feat_pose_conversion(self):
        tm = _TorchUncertMini(32).eval()
        feats = torch.randn(3, 32)
        pose = torch.randn(3, 24, 3, 3)
        with torch.no_grad():
            ref = tm(feats, pose).numpy()

        sd = {f"uncert_head.{k}": v for k, v in tm.state_dict().items()}
        conv_out = convert_state_dict(sd)
        assert not conv_out["unmatched"]

        head = PocoUncertHead(
            num_input_channels=32, num_neurons=(64,),
            uncert_inp_type="feat-pose", use_dropout=False,
        )
        variables = head.init(
            jax.random.PRNGKey(0), jnp.asarray(feats.numpy()),
            jnp.asarray(pose.numpy()),
        )
        merged, stats = merge_converted(
            variables, {"params": conv_out["params"]["uncert_head"]}
        )
        assert stats["skipped"] == 0
        out = head.apply(
            merged, jnp.asarray(feats.numpy()), jnp.asarray(pose.numpy())
        )
        np.testing.assert_allclose(
            np.asarray(out["var_pose"]), ref, atol=1e-5
        )
