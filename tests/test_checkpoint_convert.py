"""Checkpoint conversion parity: torch modules -> flax, identical outputs.

Each test builds a small torch module with the reference architecture's
layer names, converts its state_dict, and checks the flax module output
matches to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from poco_tpu.models.backbones.common import BasicBlock, Bottleneck, ResLayer, batch_norm, conv
from poco_tpu.utils.checkpoint_convert import (
    _group_state_dict,
    convert_conv,
    convert_lc2d,
    convert_linear,
    convert_state_dict,
    merge_converted,
)


def _to_jnp_nhwc(x_torch):
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 1))


def _from_flax_nhwc(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


class TestTensorTransforms:
    def test_conv_weight_layout(self):
        w = torch.randn(8, 4, 3, 3)
        out = convert_conv(w)
        assert out.shape == (3, 3, 4, 8)
        np.testing.assert_allclose(out[1, 2, 3, 5], w[5, 3, 1, 2].numpy())

    def test_linear_transpose(self):
        w = torch.randn(6, 4)
        assert convert_linear(w).shape == (4, 6)

    def test_lc2d_layout(self):
        w = torch.randn(1, 6, 128, 24, 1, 1)
        out = convert_lc2d(w)
        assert out.shape == (24, 1, 6, 128)


class TestConvBnParity:
    def test_stride2_conv_bn(self):
        """Explicit-padding conv + BN matches torch in eval mode."""
        tconv = tnn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
        tbn = tnn.BatchNorm2d(8)
        tbn.running_mean.data = torch.randn(8) * 0.1
        tbn.running_var.data = torch.rand(8) + 0.5
        tbn.weight.data = torch.rand(8) + 0.5
        tbn.bias.data = torch.randn(8) * 0.1
        tbn.eval()

        x = torch.randn(2, 3, 16, 16)
        with torch.no_grad():
            ref = tbn(tconv(x)).numpy()

        params = {
            "params": {
                "c": {"kernel": jnp.asarray(convert_conv(tconv.weight))},
                "b": {
                    "scale": jnp.asarray(tbn.weight.detach().numpy()),
                    "bias": jnp.asarray(tbn.bias.detach().numpy()),
                },
            },
            "batch_stats": {
                "b": {
                    "mean": jnp.asarray(tbn.running_mean.numpy()),
                    "var": jnp.asarray(tbn.running_var.numpy()),
                }
            },
        }

        import flax.linen as nn

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                y = conv(8, 3, 2, name="c")(x)
                return batch_norm(False, name="b")(y)

        out = M().apply(params, _to_jnp_nhwc(x))
        np.testing.assert_allclose(
            _from_flax_nhwc(out), ref, atol=1e-4, rtol=1e-4
        )


def _make_torch_bottleneck(inplanes, planes, stride=1):
    """Reference-style Bottleneck (resnet.py topology) with std names."""

    class TB(tnn.Module):
        expansion = 4

        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

        def forward(self, x):
            idt = self.downsample(x)
            y = F.relu(self.bn1(self.conv1(x)))
            y = F.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return F.relu(y + idt)

    m = TB()
    for bn in [m.bn1, m.bn2, m.bn3, m.downsample[1]]:
        bn.running_mean.data = torch.randn_like(bn.running_mean) * 0.05
        bn.running_var.data = torch.rand_like(bn.running_var) + 0.5
        bn.weight.data = torch.rand_like(bn.weight) + 0.5
        bn.bias.data = torch.randn_like(bn.bias) * 0.05
    return m.eval()


class TestBottleneckParity:
    def test_bottleneck_block(self):
        tm = _make_torch_bottleneck(16, 8, stride=2)
        x = torch.randn(2, 16, 8, 8)
        with torch.no_grad():
            ref = tm(x).numpy()

        sd = {f"layer1.0.{k}": v for k, v in tm.state_dict().items()}
        conv_out = convert_state_dict({f"backbone.{k}": v for k, v in sd.items()})

        fb = ResLayer(Bottleneck, 8, 1, stride=2, name=None)
        variables = fb.init(jax.random.PRNGKey(0), _to_jnp_nhwc(x))
        src = {
            "params": conv_out["params"]["backbone_net"]["layer1"],
            "batch_stats": conv_out["batch_stats"]["backbone_net"]["layer1"],
        }
        merged, stats = merge_converted(variables, src)
        assert stats["skipped"] == 0
        out = fb.apply(merged, _to_jnp_nhwc(x))
        np.testing.assert_allclose(
            _from_flax_nhwc(out), ref, atol=5e-4, rtol=1e-3
        )


def _make_torch_cliff_head(feat_dim=64):
    """Reference cliff_head topology (cliff_head.py:10-127) rebuilt for
    conversion testing."""

    class TCliff(tnn.Module):
        def __init__(self):
            super().__init__()
            npose = 24 * 6
            self.fc1 = tnn.Linear(feat_dim + 3 + npose + 13, 1024)
            self.fc2 = tnn.Linear(1024, 1024)
            self.decpose = tnn.Linear(1024, npose)
            self.decshape = tnn.Linear(1024, 10)
            self.deccam = tnn.Linear(1024, 3)
            self.register_buffer(
                "init_pose",
                torch.tensor([1.0, 0, 0, 1, 0, 0]).repeat(24)[None],
            )
            self.register_buffer("init_shape", torch.zeros(1, 10))
            self.register_buffer(
                "init_cam", torch.tensor([[0.9, 0.0, 0.0]])
            )

        def forward(self, feats, bbox):
            b = feats.shape[0]
            pose = self.init_pose.expand(b, -1)
            shape = self.init_shape.expand(b, -1)
            cam = self.init_cam.expand(b, -1)
            for _ in range(3):
                xc = torch.cat([feats, bbox, pose, shape, cam], 1)
                xc = self.fc2(self.fc1(xc))
                pose = self.decpose(xc) + pose
                shape = self.decshape(xc) + shape
                cam = self.deccam(xc) + cam
            return pose, shape, cam

    return TCliff().eval()


class TestCliffHeadParity:
    def test_full_head_outputs_match(self):
        from poco_tpu.models.heads.cliff import CliffHead

        tm = _make_torch_cliff_head(64)
        feats = torch.randn(3, 64)
        bbox = torch.randn(3, 3)
        with torch.no_grad():
            ref_pose, ref_shape, ref_cam = tm(feats, bbox)

        sd = {f"head.{k}": v for k, v in tm.state_dict().items()}
        conv_out = convert_state_dict(sd, head_type="cliff")

        head = CliffHead(num_input_features=64)
        variables = head.init(
            jax.random.PRNGKey(0), jnp.asarray(feats.numpy()),
            jnp.asarray(bbox.numpy()),
        )
        src = {
            "params": conv_out["params"]["head"],
            "buffers": conv_out["buffers"]["head"],
        }
        merged, stats = merge_converted(variables, src)
        assert stats["loaded"] >= 10
        out = head.apply(
            merged, jnp.asarray(feats.numpy()), jnp.asarray(bbox.numpy())
        )
        np.testing.assert_allclose(
            np.asarray(out["pred_pose_6d"]), ref_pose.numpy(),
            atol=1e-4, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["pred_shape"]), ref_shape.numpy(), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["pred_cam"]), ref_cam.numpy(), atol=1e-4
        )


def _make_torch_realnvp(num_rv=9, layers=2, cond_dim=5):
    def net_s(i, h, o):
        return tnn.Sequential(
            tnn.Linear(i, h), tnn.LeakyReLU(), tnn.Linear(h, h),
            tnn.LeakyReLU(), tnn.Linear(h, o), tnn.Tanh(),
        )

    def net_t(i, h, o):
        return tnn.Sequential(
            tnn.Linear(i, h), tnn.LeakyReLU(), tnn.Linear(h, h),
            tnn.LeakyReLU(), tnn.Linear(h, o),
        )

    masks = np.array(
        [[i % 2 for i in range(num_rv)],
         [(i + 1) % 2 for i in reversed(range(num_rv))]] * (layers // 2 or 1),
        np.float32,
    )[:layers * 2] if False else np.array(
        [[i % 2 for i in range(num_rv)],
         [(i + 1) % 2 for i in reversed(range(num_rv))]] * layers,
        np.float32,
    )

    class TFlow(tnn.Module):
        def __init__(self):
            super().__init__()
            self.register_buffer("mask", torch.from_numpy(masks))
            inp = num_rv + cond_dim
            self.t = tnn.ModuleList(
                [net_t(inp, 64, num_rv) for _ in range(len(masks))]
            )
            self.s = tnn.ModuleList(
                [net_s(inp, 64, num_rv) for _ in range(len(masks))]
            )

        def log_prob(self, x, cond):
            log_det, z = torch.zeros(x.shape[0]), x
            for i in reversed(range(len(self.t))):
                z_ = self.mask[i] * z
                inp = torch.cat((z_, cond), dim=1)
                s = self.s[i](inp) * (1 - self.mask[i])
                t = self.t[i](inp) * (1 - self.mask[i])
                z = (1 - self.mask[i]) * (z - t) * torch.exp(-s) + z_
                log_det -= s.sum(dim=1)
            prior = -0.5 * (z**2).sum(1) - 0.5 * num_rv * np.log(2 * np.pi)
            return prior + log_det

    return TFlow().eval()


class TestRealNvpParity:
    def test_log_prob_matches(self):
        from poco_tpu.models.heads.flow import RealNVP

        tm = _make_torch_realnvp(num_rv=9, layers=1, cond_dim=5)
        x = torch.randn(4, 9)
        cond = torch.randn(4, 5)
        with torch.no_grad():
            ref = tm.log_prob(x, cond).numpy()

        sd = {f"flow_head.flow.{k}": v for k, v in tm.state_dict().items()}
        conv_out = convert_state_dict(sd)

        flow = RealNVP(num_rv=9, num_coupling_layers=1)
        variables = flow.init(
            jax.random.PRNGKey(0), jnp.asarray(x.numpy()),
            jnp.asarray(cond.numpy()),
        )
        src = {"params": conv_out["params"]["flow_head"]["flow"]}
        merged, stats = merge_converted(variables, src)
        assert stats["skipped"] == 0
        out = flow.apply(
            merged, jnp.asarray(x.numpy()), jnp.asarray(cond.numpy()),
            method=flow.log_prob,
        )
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


class TestPerJointMlpParity:
    def test_lc2d_conversion(self):
        from poco_tpu.models.layers import PerPositionConv1x1

        w = torch.randn(1, 6, 32, 24, 1, 1) * 0.1
        x = torch.randn(2, 32, 24, 1)
        # torch LC2d forward with kernel 1 (locallyconnected2d.py:27-37)
        xu = x.unfold(2, 1, 1).unfold(3, 1, 1).contiguous()
        xu = xu.view(*xu.size()[:-2], -1)
        ref = (xu.unsqueeze(1) * w).sum([2, -1]).numpy()

        mod = PerPositionConv1x1(6, (24, 1))
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()))
        merged = {"params": {"weight": jnp.asarray(convert_lc2d(w))}}
        out = mod.apply(merged, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


class TestHrnetNameMapping:
    @pytest.mark.parametrize(
        "torch_key,expected_path",
        [
            ("conv1", ["conv1"]),
            ("layer1.2.conv3", ["layer1", "2", "conv3"]),
            ("layer1.0.downsample.0", ["layer1", "0", "downsample_conv"]),
            ("transition1.0.0", ["transition1_0_conv0"]),
            ("transition1.1.0.0", ["transition1_1_conv0"]),
            ("stage2.0.branches.1.3.conv2", ["stage2_0", "branch1", "3", "conv2"]),
            ("stage3.2.fuse_layers.0.2.0", ["stage3_2", "fuse_0_2_conv0"]),
            ("stage3.2.fuse_layers.2.0.1.0", ["stage3_2", "fuse_2_0_conv1"]),
            ("incre_modules.1.0.conv1", ["incre1", "0", "conv1"]),
            ("downsamp_modules.2.0", ["downsamp2_conv"]),
            ("final_layer.0", ["final_conv"]),
            ("upsample_stage_3.5", ["upsample_stage_3_conv1"]),
            ("upsample_stage_2.2", ["upsample_stage_2_bn0"]),
        ],
    )
    def test_mapping(self, torch_key, expected_path):
        from poco_tpu.utils.checkpoint_convert import _hrnet_module_name

        kind, path = _hrnet_module_name(torch_key)
        assert kind is not None
        assert path == expected_path
