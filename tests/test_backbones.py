"""Backbone tests: resize parity, tiny/resnet/hrnet shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poco_tpu.models.backbones.common import (
    resize_bilinear_align_corners,
    upsample_nearest,
)


class TestResize:
    def test_matches_torch_align_corners(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.RandomState(0)
        x = rng.randn(2, 7, 9, 3).astype(np.float32)
        ours = np.asarray(
            resize_bilinear_align_corners(jnp.asarray(x), 14, 18)
        )
        theirs = (
            F.interpolate(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                size=(14, 18), mode="bilinear", align_corners=True,
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_downscale_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.RandomState(1)
        x = rng.randn(1, 8, 8, 2).astype(np.float32)
        ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 4, 4))
        theirs = (
            F.interpolate(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                size=(4, 4), mode="bilinear", align_corners=True,
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_nearest_upsample_exact(self):
        x = jnp.asarray([[[[1.0], [2.0]], [[3.0], [4.0]]]])
        out = np.asarray(upsample_nearest(x, 2))
        assert out.shape == (1, 4, 4, 1)
        np.testing.assert_array_equal(out[0, :2, :2, 0], 1.0)
        np.testing.assert_array_equal(out[0, 2:, 2:, 0], 4.0)


class TestBackboneShapes:
    def test_resnet18_feature_map(self):
        from poco_tpu.models.backbones.resnet import resnet18

        model = resnet18()
        x = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), x)
        )()
        out = model.apply(variables, x)
        assert out.shape == (1, 2, 2, 512)

    def test_hrnet_w32_pose_output(self):
        """Small-input HRNet-w32: (B, H/4, W/4, 480) concat output."""
        from poco_tpu.models.backbones.hrnet import hrnet_w32

        model = hrnet_w32()
        x = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), x)
        )()
        out = model.apply(variables, x)
        assert out.shape == (1, 16, 16, 480)

    def test_hrnet_w48_cls_output(self):
        from poco_tpu.models.backbones.hrnet import hrnet_w48_cls

        model = hrnet_w48_cls()
        x = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(
            lambda: model.init(jax.random.PRNGKey(0), x)
        )()
        out = model.apply(variables, x)
        assert out.shape == (1, 2048)

    def test_tiny_variants(self):
        from poco_tpu.models.backbones.tiny import tiny_cls, tiny_pose

        x = jnp.zeros((2, 224, 224, 3))
        m = tiny_cls()
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (2, 128)
        m = tiny_pose()
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (2, 56, 56, 32)


class TestResnextVariants:
    def test_resnext_grouped_conv_shapes(self):
        from poco_tpu.models.backbones.resnet import resnext50_32x4d

        model = resnext50_32x4d()
        x = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()
        out = model.apply(variables, x)
        assert out.shape == (1, 2, 2, 2048)
        # grouped conv2 kernel: input channel dim divided by groups
        k = variables["params"]["layer1"]["0"]["conv2"]["kernel"]
        assert k.shape == (3, 3, 128 // 32, 128)

    def test_wide_resnet_width(self):
        from poco_tpu.models.backbones.resnet import wide_resnet50_2

        model = wide_resnet50_2()
        x = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()
        k = variables["params"]["layer1"]["0"]["conv2"]["kernel"]
        assert k.shape == (3, 3, 128, 128)

    def test_registry_matches_reference(self):
        from poco_tpu.models.backbones.resnet import BACKBONE_INFO

        assert BACKBONE_INFO["hrnet_w64"]["n_output_channels"] == 960
        assert BACKBONE_INFO["hrnet_w48"]["n_output_channels"] == 720
        assert len(BACKBONE_INFO) >= 13
