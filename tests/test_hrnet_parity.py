"""HRNet structural parity: torch multi-branch stage -> converted flax.

Builds a reference-topology torch HRNet fragment (stem + layer1 +
transition1 + one 2-branch HRModule with fuse layers) with the
reference's naming scheme, converts the state_dict, and checks the flax
forward reproduces the torch output — covering the fuse-layer and
transition name mapping end to end (beyond the per-block tests in
test_checkpoint_convert.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from poco_tpu.utils.checkpoint_convert import convert_state_dict, merge_converted

WIDTH = 8  # tiny channel width, full topology


def _bn_randomize(bn):
    bn.running_mean.data = torch.randn_like(bn.running_mean) * 0.05
    bn.running_var.data = torch.rand_like(bn.running_var) + 0.5
    bn.weight.data = torch.rand_like(bn.weight) + 0.5
    bn.bias.data = torch.randn_like(bn.bias) * 0.05


class _TorchBasic(tnn.Module):
    def __init__(self, cin, cout, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


class _TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, cin, planes, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


class _TorchHrModule(tnn.Module):
    """2-branch module with SUM fusion (reference hrnet.py:102-266)."""

    def __init__(self, c0, c1):
        super().__init__()
        # 4 BASIC blocks per branch (reference stage schedule).
        self.branches = tnn.ModuleList(
            [
                tnn.Sequential(*[_TorchBasic(c0, c0) for _ in range(4)]),
                tnn.Sequential(*[_TorchBasic(c1, c1) for _ in range(4)]),
            ]
        )
        # fuse_layers[0][1]: conv1x1 c1->c0 + bn + upsample
        # fuse_layers[1][0]: conv3x3 s2 c0->c1 + bn
        self.fuse_layers = tnn.ModuleList(
            [
                tnn.ModuleList(
                    [
                        None,
                        tnn.Sequential(
                            tnn.Conv2d(c1, c0, 1, 1, 0, bias=False),
                            tnn.BatchNorm2d(c0),
                            tnn.Upsample(scale_factor=2, mode="nearest"),
                        ),
                    ]
                ),
                tnn.ModuleList(
                    [
                        tnn.Sequential(
                            tnn.Sequential(
                                tnn.Conv2d(c0, c1, 3, 2, 1, bias=False),
                                tnn.BatchNorm2d(c1),
                            )
                        ),
                        None,
                    ]
                ),
            ]
        )

    def forward(self, xs):
        xs = [b(x) for b, x in zip(self.branches, xs)]
        y0 = F.relu(xs[0] + self.fuse_layers[0][1](xs[1]))
        y1 = F.relu(self.fuse_layers[1][0][0](xs[0]) + xs[1])
        return [y0, y1]


class _TorchHrFragment(tnn.Module):
    """stem -> layer1 (Bottleneck x2) -> transition1 -> stage2 module."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 16, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(16)
        self.conv2 = tnn.Conv2d(16, 16, 3, 2, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(16)
        ds = tnn.Sequential(
            tnn.Conv2d(16, 32, 1, 1, bias=False), tnn.BatchNorm2d(32)
        )
        self.layer1 = tnn.Sequential(
            _TorchBottleneck(16, 8, ds), _TorchBottleneck(32, 8)
        )
        self.transition1 = tnn.ModuleList(
            [
                tnn.Sequential(
                    tnn.Conv2d(32, WIDTH, 3, 1, 1, bias=False),
                    tnn.BatchNorm2d(WIDTH),
                    tnn.ReLU(True),
                ),
                tnn.Sequential(
                    tnn.Sequential(
                        tnn.Conv2d(32, 2 * WIDTH, 3, 2, 1, bias=False),
                        tnn.BatchNorm2d(2 * WIDTH),
                        tnn.ReLU(True),
                    )
                ),
            ]
        )
        self.stage2 = tnn.Sequential(_TorchHrModule(WIDTH, 2 * WIDTH))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xs = [self.transition1[0](x), self.transition1[1](x)]
        return self.stage2(xs)


class _FlaxHrFragment:
    """The same fragment expressed with this framework's modules."""

    def __init__(self):
        import flax.linen as nn

        from poco_tpu.models.backbones.common import (
            BasicBlock,
            Bottleneck,
            ResLayer,
            batch_norm,
            conv,
        )
        from poco_tpu.models.backbones.hrnet import HRModule

        class Frag(nn.Module):
            @nn.compact
            def __call__(self, x):
                y = conv(16, 3, 2, name="conv1")(x)
                y = batch_norm(False, name="bn1")(y)
                y = nn.relu(y)
                y = conv(16, 3, 2, name="conv2")(y)
                y = batch_norm(False, name="bn2")(y)
                y = nn.relu(y)
                y = ResLayer(Bottleneck, 8, 2, name="layer1")(y, False)
                x0 = conv(WIDTH, 3, 1, name="transition1_0_conv0")(y)
                x0 = nn.relu(batch_norm(False, name="transition1_0_bn0")(x0))
                x1 = conv(2 * WIDTH, 3, 2, name="transition1_1_conv0")(y)
                x1 = nn.relu(batch_norm(False, name="transition1_1_bn0")(x1))
                return HRModule(
                    num_branches=2, channels=(WIDTH, 2 * WIDTH),
                    name="stage2_0",
                )([x0, x1], False)

        self.module = Frag()


class TestHrnetFragmentParity:
    def test_converted_stage_outputs_match(self):
        tm = _TorchHrFragment().eval()
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                _bn_randomize(m)

        x = torch.randn(2, 3, 32, 32)
        with torch.no_grad():
            ref0, ref1 = tm(x)

        sd = {f"backbone.{k}": v for k, v in tm.state_dict().items()}
        conv_out = convert_state_dict(sd)
        assert not conv_out["unmatched"], conv_out["unmatched"]

        frag = _FlaxHrFragment().module
        x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        variables = frag.init(jax.random.PRNGKey(0), x_nhwc)
        src = {
            "params": conv_out["params"]["backbone_net"],
            "batch_stats": conv_out["batch_stats"]["backbone_net"],
        }
        merged, stats = merge_converted(variables, src)
        assert stats["skipped"] == 0, stats
        out0, out1 = frag.apply(merged, x_nhwc)

        np.testing.assert_allclose(
            np.asarray(out0).transpose(0, 3, 1, 2), ref0.numpy(),
            atol=2e-3, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(out1).transpose(0, 3, 1, 2), ref1.numpy(),
            atol=2e-3, rtol=1e-3,
        )
