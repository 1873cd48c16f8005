"""Backbone tests: resize parity, tiny/resnet/hrnet shapes."""

import flax.linen as nn
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

    @pytest.mark.slow
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

    @pytest.mark.slow
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


class TestLanePadding:
    """Lane-padded branch ResLayers (common.LaneConv/LaneBatchNorm) are
    mathematically exact vs the plain path with identical params."""

    def _pair(self, c=24):
        # make c a non-multiple above LANE by patching LANE for the test?
        # No: use the real rule with a real padded width via lane_pad
        from poco_tpu.models.backbones.common import BasicBlock, ResLayer

        plain = ResLayer(BasicBlock, c, 4, lane_pad=False)
        padded = ResLayer(BasicBlock, c, 4, lane_pad=True)
        return plain, padded

    def test_param_tree_identical_and_outputs_equal(self):
        import numpy as np

        from poco_tpu.models.backbones.common import (
            BasicBlock,
            ResLayer,
            lane_pad_target,
        )

        c = 192  # the w48 branch2 case: pads to 256
        assert lane_pad_target(c) == 256
        assert lane_pad_target(128) == 128
        assert lane_pad_target(48) == 48
        assert lane_pad_target(384) == 384

        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 6, 6, c), jnp.float32
        )
        plain = ResLayer(BasicBlock, c, 2, lane_pad=False)
        padded = ResLayer(BasicBlock, c, 2, lane_pad=True)
        v_plain = plain.init(jax.random.PRNGKey(1), x)
        v_padded = padded.init(jax.random.PRNGKey(1), x)
        # identical param/stat tree structure and shapes
        assert jax.tree_util.tree_structure(
            v_plain
        ) == jax.tree_util.tree_structure(v_padded)
        for a, b in zip(
            jax.tree_util.tree_leaves(v_plain),
            jax.tree_util.tree_leaves(v_padded),
        ):
            assert a.shape == b.shape

        # eval mode: same params -> same outputs
        y_plain = plain.apply(v_plain, x, False)
        y_padded = padded.apply(v_plain, x, False)
        assert y_padded.shape == y_plain.shape
        np.testing.assert_allclose(
            np.asarray(y_padded), np.asarray(y_plain), atol=2e-5
        )

    def test_train_mode_and_stats_update_match(self):
        import numpy as np

        from poco_tpu.models.backbones.common import BasicBlock, ResLayer

        c = 192
        x = jnp.asarray(
            np.random.RandomState(2).randn(4, 6, 6, c), jnp.float32
        )
        plain = ResLayer(BasicBlock, c, 2, lane_pad=False)
        padded = ResLayer(BasicBlock, c, 2, lane_pad=True)
        v = plain.init(jax.random.PRNGKey(3), x)
        y_p, m_p = plain.apply(v, x, True, mutable=["batch_stats"])
        y_q, m_q = padded.apply(v, x, True, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(y_q), np.asarray(y_p), atol=3e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(m_p), jax.tree_util.tree_leaves(m_q)
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=3e-5
            )

    @pytest.mark.slow
    def test_hrnet_w48_padded_matches_unpadded(self):
        import numpy as np

        from poco_tpu.models.backbones.hrnet import HRNet

        x = jnp.asarray(
            np.random.RandomState(4).randn(1, 64, 64, 3), jnp.float32
        )
        on = HRNet(variant="cls", width=48, lane_pad=True)
        off = HRNet(variant="cls", width=48, lane_pad=False)
        v = jax.jit(lambda: off.init(jax.random.PRNGKey(5), x))()
        y_off = jax.jit(lambda v_: off.apply(v_, x))(v)
        y_on = jax.jit(lambda v_: on.apply(v_, x))(v)
        # exact math modulo conv reduction reordering (~1e-3 rel through
        # the full 70-conv net); fp32 parity paths keep lane_pad off
        np.testing.assert_allclose(
            np.asarray(y_on), np.asarray(y_off), rtol=5e-3, atol=5e-3
        )

    def test_default_resolution_by_dtype(self):
        from poco_tpu.models.backbones.hrnet import HRNet

        # default None -> padded only for bf16 compute
        assert HRNet(dtype=jnp.bfloat16).lane_pad is None
        assert HRNet(dtype=jnp.float32).lane_pad is None
        # params are identical either way, so the switch is free
        import numpy as np

        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        v32 = jax.eval_shape(
            lambda: HRNet(width=48, dtype=jnp.float32).init(
                jax.random.PRNGKey(0), x
            )
        )
        vbf = jax.eval_shape(
            lambda: HRNet(width=48, dtype=jnp.bfloat16).init(
                jax.random.PRNGKey(0), x
            )
        )
        assert jax.tree_util.tree_structure(
            v32
        ) == jax.tree_util.tree_structure(vbf)
        for a, b in zip(
            jax.tree_util.tree_leaves(v32), jax.tree_util.tree_leaves(vbf)
        ):
            assert a.shape == b.shape and a.dtype == b.dtype

    def test_gradients_match_plain_path(self):
        import numpy as np

        from poco_tpu.models.backbones.common import BasicBlock, ResLayer

        c = 192
        x = jnp.asarray(
            np.random.RandomState(6).randn(2, 4, 4, c), jnp.float32
        )
        plain = ResLayer(BasicBlock, c, 1, lane_pad=False)
        padded = ResLayer(BasicBlock, c, 1, lane_pad=True)
        v = plain.init(jax.random.PRNGKey(7), x)

        def loss(params, model):
            out = model.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, True, mutable=["batch_stats"],
            )[0]
            return jnp.sum(out ** 2)

        g_plain = jax.grad(loss)(v["params"], plain)
        g_padded = jax.grad(loss)(v["params"], padded)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_plain),
            jax.tree_util.tree_leaves(g_padded),
        ):
            assert a.shape == b.shape
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4
            )


class TestS2DStem:
    """Space-to-depth stem conv (common.S2DStemConv) computes exactly
    the same dot products as the plain odd-k stride-2 conv, with an
    identical (checkpoint-compatible) param tree."""

    def _compare(self, k, h, w, cin=3, cout=64, atol=2e-5):
        import numpy as np

        from poco_tpu.models.backbones.common import S2DStemConv

        x = jnp.asarray(
            np.random.RandomState(k).randn(2, h, w, cin), jnp.float32
        )
        plain = nn.Conv(
            cout, (k, k), (2, 2),
            padding=[(k // 2, k // 2), (k // 2, k // 2)],
            use_bias=False, name="conv1",
        )
        s2d = S2DStemConv(cout, kernel_size=k, name="conv1")
        v = plain.init(jax.random.PRNGKey(0), x)
        v2 = s2d.init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
        for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
            assert a.shape == b.shape
        y = plain.apply(v, x)
        y2 = s2d.apply(v, x)  # the SAME logical params
        assert y2.shape == y.shape
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=atol)

    def test_3x3_even_input(self):
        self._compare(3, 224, 224)

    def test_3x3_rectangular(self):
        self._compare(3, 64, 96, cin=5, cout=32)

    def test_7x7_resnet_stem(self):
        self._compare(7, 224, 224)

    def test_odd_input_falls_back(self):
        self._compare(3, 65, 65)

    def test_grad_matches(self):
        import numpy as np

        from poco_tpu.models.backbones.common import S2DStemConv

        x = jnp.asarray(
            np.random.RandomState(9).randn(2, 32, 32, 3), jnp.float32
        )
        plain = nn.Conv(
            16, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
            use_bias=False, name="conv1",
        )
        s2d = S2DStemConv(16, kernel_size=3, name="conv1")
        v = plain.init(jax.random.PRNGKey(0), x)

        def loss(params, mod):
            return jnp.sum(mod.apply(params, x) ** 2)

        g = jax.grad(lambda p: loss(p, plain))(v)
        g2 = jax.grad(lambda p: loss(p, s2d))(v)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4
            )

    @pytest.mark.slow
    def test_hrnet_and_resnet_wire_s2d(self):
        """s2d variants produce the plain variants' outputs with the
        plain variants' params (full tiny forward)."""
        import numpy as np

        from poco_tpu.models.backbones.hrnet import HRNet
        from poco_tpu.models.backbones.resnet import resnet18

        x = jnp.asarray(
            np.random.RandomState(1).randn(1, 64, 64, 3), jnp.float32
        )
        for a, b in (
            (HRNet(variant="cls", width=18, s2d_stem=False),
             HRNet(variant="cls", width=18, s2d_stem=True)),
            (resnet18().clone(s2d_stem=False),
             resnet18().clone(s2d_stem=True)),
        ):
            v = a.init(jax.random.PRNGKey(0), x)
            ya = a.apply(v, x, False)
            yb = b.apply(v, x, False)
            np.testing.assert_allclose(
                np.asarray(yb), np.asarray(ya), atol=5e-4, rtol=1e-4
            )
