"""Stage-level timing attribution for the HRNet backbones on TPU.

The backbone is ~100% of POCO-CLIFF inference cost (BENCHMARKS.md); this
script times each architectural region so conv-level tuning targets the
real hot spots.

Measurement design for the axon tunnel (one ~25-30 ms round trip per
dispatch, async execution): each region is wrapped in a `lax.scan` that
re-applies the module N times with a tiny feedback term (x + 1e-12 *
probe(out)) so XLA cannot dead-code the loop, and the per-iteration cost
is the SLOPE between two scan lengths — fixed dispatch/fetch overhead
cancels exactly. Params are passed as arguments (never closed over:
embedded-constant HLO blows the tunnel's remote_compile size limit).

Usage: python tools/bench_backbone.py [--batch 128] [--width 48]
Prints per-region ms + crops/s + XLA cost-analysis FLOPs/bytes.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    # The axon plugin ignores the JAX_PLATFORMS env var; force the host
    # platform programmatically for smoke runs while the tunnel is down.
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from poco_tpu.utils.comp_cache import enable_compilation_cache

enable_compilation_cache()

N_LO, N_HI = 4, 24  # scan lengths; slope = (t_hi - t_lo) / (N_HI - N_LO)


GRAD_MODE = False  # --grad: time fwd+bwd per region instead of fwd


def make_repeat(module, n: int):
    """Jitted program applying `module` n times with value feedback.

    With GRAD_MODE the step is the full fwd+bwd of the region (grad of a
    sum-probe w.r.t. params AND inputs — both gradients exist in the
    real training step), so region deltas attribute the backward pass.
    """

    def fwd_step(variables, xs):
        ys = module.apply(variables, *xs)
        leaves = jax.tree_util.tree_leaves(ys)
        probe = sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)
        probe = (1e-12 * probe).astype(xs[0].dtype)
        return tuple(x + probe for x in xs)

    def region_sum(variables, xs):
        ys = module.apply(variables, *xs)
        return sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(ys)
        )

    def grad_step(variables, xs):
        gx = jax.grad(region_sum, argnums=(0, 1))(variables, xs)
        probe = sum(
            jnp.mean(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(gx[1])
        )
        probe = (1e-12 * probe).astype(xs[0].dtype)
        return tuple(x + probe for x in xs)

    step = grad_step if GRAD_MODE else fwd_step

    @functools.partial(jax.jit, static_argnums=2)
    def repeat(variables, xs, n):
        def body(carry, _):
            return step(variables, carry), ()

        out, _ = jax.lax.scan(body, xs, None, length=n)
        return out[0].reshape(-1)[0]

    return lambda variables, xs: repeat(variables, xs, n)


def timed(fn, variables, xs, reps: int = 3) -> float:
    fn(variables, xs).block_until_ready()  # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(fn(variables, xs)))  # host fetch awaits execution
        best = min(best, time.perf_counter() - t0)
    return best


def region_cost(module, variables, xs) -> tuple[float, float]:
    """(TFLOP, GB) per application from XLA cost analysis."""
    try:
        lowered = jax.jit(
            lambda v, inp: module.apply(v, *inp)
        ).lower(variables, xs)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return (
            cost.get("flops", 0.0) / 1e12,
            cost.get("bytes accessed", 0.0) / 1e9,
        )
    except Exception:
        return 0.0, 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--width", type=int, default=48)
    ap.add_argument("--costs", action="store_true",
                    help="also print XLA cost analysis per region")
    ap.add_argument("--branches", action="store_true",
                    help="microbench one ResLayer(BasicBlock x4) per "
                         "branch shape + the stage4 fusion ladder alone")
    ap.add_argument("--grad", action="store_true",
                    help="time fwd+bwd per region (training attribution)")
    ap.add_argument("--s2d", action="store_true",
                    help="compare the plain stem vs the space-to-depth "
                         "stem (common.S2DStemConv) under the slope "
                         "protocol; combine with --grad for fwd+bwd")
    ap.add_argument("--pare", action="store_true",
                    help="attribute the PARE head (shipped w32-pare "
                         "config shape): full head + conv branches + "
                         "attention pooling + per-joint decoders; "
                         "combine with --width 32 runs for the backbone "
                         "side")
    args = ap.parse_args()
    if args.grad:
        global GRAD_MODE
        GRAD_MODE = True
        print("[grad mode: each region timed as fwd+bwd]")
    B, w = args.batch, args.width
    dtype = jnp.bfloat16

    from poco_tpu.models.backbones.common import (
        Bottleneck,
        ResLayer,
        batch_norm,
        conv,
    )
    from poco_tpu.models.backbones.hrnet import HRNet, HRModule

    rng = jax.random.PRNGKey(0)

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = conv(64, 3, 2, name="conv1", dtype=dtype)(x)
            y = nn.relu(batch_norm(False, name="bn1", dtype=dtype)(y))
            y = conv(64, 3, 2, name="conv2", dtype=dtype)(y)
            y = nn.relu(batch_norm(False, name="bn2", dtype=dtype)(y))
            # cheap shape projection so the repeat-scan can chain:
            # slice 3 channels and tile 4x spatially (pure data movement)
            y = y[..., :3]
            return jnp.tile(y, (1, 4, 4, 1))

    if args.s2d:
        from poco_tpu.models.backbones.common import S2DStemConv

        class StemS2D(nn.Module):
            @nn.compact
            def __call__(self, x):
                y = S2DStemConv(64, kernel_size=3, name="conv1", dtype=dtype)(x)
                y = nn.relu(batch_norm(False, name="bn1", dtype=dtype)(y))
                y = conv(64, 3, 2, name="conv2", dtype=dtype)(y)
                y = nn.relu(batch_norm(False, name="bn2", dtype=dtype)(y))
                y = y[..., :3]
                return jnp.tile(y, (1, 4, 4, 1))

        x_img = jnp.asarray(np.random.randn(B, 224, 224, 3), dtype)
        for name, m in (("stem plain", Stem()), ("stem s2d  ", StemS2D())):
            v = m.init(rng, x_img)
            lo = timed(make_repeat(m, N_LO), v, (x_img,))
            hi = timed(make_repeat(m, N_HI), v, (x_img,))
            t = max(hi - lo, 1e-9) / (N_HI - N_LO)
            print(f"{name} B={B} {t * 1e3:8.3f} ms/apply", flush=True)
        return

    if args.pare:
        from poco_tpu.models.heads.pare import PareHead
        from poco_tpu.models.layers import (
            PerPositionConv1x1,
            keypoint_attention,
        )

        x480 = jnp.asarray(np.random.randn(B, 56, 56, 480), dtype)

        class FullHead(nn.Module):
            lane_pad: bool = False

            @nn.compact
            def __call__(self, x):
                out = PareHead(
                    dtype=dtype, lane_pad=self.lane_pad, name="head"
                )(x, train=False)
                # chainable: feed a probe of the outputs back into x's shape
                return out

        class ConvBranches(nn.Module):
            """The two deconv branches: 2x [3x3 conv 128 -> BN -> ReLU]
            each over 56x56x480 (pare.py:117-126, both branches)."""

            @nn.compact
            def __call__(self, x):
                ys = []
                for br in ("kd", "sd"):
                    y = x
                    for i in range(2):
                        y = conv(128, 3, 1, name=f"{br}{i}", dtype=dtype)(y)
                        y = batch_norm(
                            False, name=f"{br}bn{i}", dtype=dtype
                        )(y)
                        y = nn.relu(y)
                    ys.append(y)
                return tuple(ys)

        class AttnFinals(nn.Module):
            """Final 1x1 convs (J+1 seg logits, 64 smpl feats) + the two
            keypoint-attention poolings (pare.py:234-290)."""

            @nn.compact
            def __call__(self, pf, sf):
                hm = jnp.transpose(
                    conv(25, 1, 1, padding=0, use_bias=True, name="kf",
                         dtype=dtype)(pf),
                    (0, 3, 1, 2),
                )[:, 1:]
                csf = conv(64, 1, 1, padding=0, use_bias=True, name="sf",
                           dtype=dtype)(sf)
                plf = keypoint_attention(
                    jnp.transpose(sf, (0, 3, 1, 2)), hm, act="softmax",
                    use_scale=False,
                )
                csp = keypoint_attention(
                    jnp.transpose(csf, (0, 3, 1, 2)), hm, act="softmax",
                    use_scale=False,
                )
                return plf, csp

        class Decoders(nn.Module):
            """Per-joint pose MLP + shape/cam MLPs (pare.py:325-354)."""

            @nn.compact
            def __call__(self, plf, csp):
                pose = PerPositionConv1x1(
                    6, (24, 1), name="pose_mlp", dtype=dtype
                )(plf[..., None])
                flat = csp.reshape(B, -1)
                return (
                    pose,
                    nn.Dense(10, name="shape_mlp", dtype=dtype)(flat),
                    nn.Dense(3, name="cam_mlp", dtype=dtype)(flat),
                )

        x128 = jnp.asarray(np.random.randn(B, 56, 56, 128), dtype)
        plf0 = jnp.asarray(np.random.randn(B, 128, 24), dtype)
        csp0 = jnp.asarray(np.random.randn(B, 64, 24), dtype)
        class ConvBranchesLP(nn.Module):
            """ConvBranches with the conv0 contraction lane-padded
            480 -> 512 (heads.pare lane_pad option)."""

            @nn.compact
            def __call__(self, x):
                from poco_tpu.models.backbones.common import (
                    LaneConv,
                    _pad_last,
                    lane_pad_target,
                )

                xp = _pad_last(x, lane_pad_target(x.shape[-1]))
                ys = []
                for br in ("kd", "sd"):
                    y = LaneConv(
                        128, x.shape[-1], 3, pad_in=xp.shape[-1],
                        name=f"{br}0", dtype=dtype,
                    )(xp)
                    y = batch_norm(False, name=f"{br}bn0", dtype=dtype)(y)
                    y = nn.relu(y)
                    y = conv(128, 3, 1, name=f"{br}1", dtype=dtype)(y)
                    y = batch_norm(False, name=f"{br}bn1", dtype=dtype)(y)
                    y = nn.relu(y)
                    ys.append(y)
                return tuple(ys)

        from poco_tpu.models.backbones.hrnet import (
            resize_bilinear_align_corners,
        )

        class PoseMerge(nn.Module):
            """The w32 pose-variant merge replicated inline: bilinear
            -upsample + conv + BN + ReLU chains for branches 1-3, concat
            to 480ch (hrnet.py _pose_merge, use_conv path). Benchmarked
            standalone because the 28->56 128/256-ch convs at 56x56 are
            merge-only FLOPs."""

            @nn.compact
            def __call__(self, *xs):
                outs = [xs[0]]
                for b in range(1, 4):
                    z = xs[b]
                    for k in range(b):
                        h, wd = z.shape[1] * 2, z.shape[2] * 2
                        z = resize_bilinear_align_corners(z, h, wd)
                        z = conv(
                            z.shape[-1], 3, 1,
                            name=f"up{b}_conv{k}", dtype=dtype,
                        )(z)
                        z = batch_norm(
                            False, name=f"up{b}_bn{k}", dtype=dtype
                        )(z)
                        z = nn.relu(z)
                    outs.append(z)
                y = jnp.concatenate(outs, axis=-1)
                probe = (1e-12 * jnp.mean(y.astype(jnp.float32))).astype(
                    xs[0].dtype
                )
                return tuple(x + probe for x in xs)

        class MergeConvsOnly(nn.Module):
            """The merge's conv+BN+ReLU chains fed pre-upsampled inputs
            (isolates conv cost from resize cost)."""

            @nn.compact
            def __call__(self, *xs):
                # xs shapes: the post-resize inputs of every conv in the
                # three chains: b1 (56,64); b2 (28,128),(56,128);
                # b3 (14,256),(28,256),(56,256)
                outs = []
                for i, z in enumerate(xs):
                    z = conv(
                        z.shape[-1], 3, 1, name=f"mc{i}", dtype=dtype
                    )(z)
                    z = batch_norm(False, name=f"mbn{i}", dtype=dtype)(z)
                    outs.append(nn.relu(z))
                probe = sum(
                    1e-12 * jnp.mean(o.astype(jnp.float32)) for o in outs
                )
                return tuple(x + probe.astype(x.dtype) for x in xs)

        class MergeResizesOnly(nn.Module):
            """The merge's 6 bilinear x2 resizes alone (no convs)."""

            @nn.compact
            def __call__(self, *xs):
                outs = []
                for b in range(1, 4):
                    z = xs[b]
                    for _ in range(b):
                        z = resize_bilinear_align_corners(
                            z, z.shape[1] * 2, z.shape[2] * 2
                        )
                    outs.append(z)
                probe = sum(
                    1e-12 * jnp.mean(o.astype(jnp.float32)) for o in outs
                )
                return tuple(x + probe.astype(x.dtype) for x in xs)

        class FullPose(nn.Module):
            """Whole hrnet_w32 pose backbone (stem -> stages -> merge)."""

            @nn.compact
            def __call__(self, x):
                y = HRNet(variant="pose", width=32, dtype=dtype,
                          name="net")(x, False)
                return x + jnp.mean(y.astype(jnp.float32)).astype(
                    x.dtype
                ) * 1e-12

        xs_merge = tuple(
            jnp.asarray(np.random.randn(B, s, s, c), dtype)
            for s, c in [(56, 32), (28, 64), (14, 128), (7, 256)]
        )
        x_img32 = jnp.asarray(np.random.randn(B, 224, 224, 3), dtype)
        pare_regions = [
            ("pare head FULL (480ch in)", FullHead(), (x480,)),
            ("pare head FULL lane_pad", FullHead(lane_pad=True), (x480,)),
            ("conv branches (2x2 convs)", ConvBranches(), (x480,)),
            ("conv branches lane_pad 512", ConvBranchesLP(), (x480,)),
            ("finals + 2x kp attention", AttnFinals(), (x128, x128)),
            ("per-joint decoders", Decoders(), (plf0, csp0)),
            ("w32 pose merge (ups+concat)", PoseMerge(), xs_merge),
            (
                "merge convs only (6 convs)",
                MergeConvsOnly(),
                tuple(
                    jnp.asarray(np.random.randn(B, s, s, c), dtype)
                    for s, c in [
                        (56, 64),
                        (28, 128), (56, 128),
                        (14, 256), (28, 256), (56, 256),
                    ]
                ),
            ),
            ("merge resizes only (6 ups)", MergeResizesOnly(), xs_merge),
            ("w32 pose backbone FULL", FullPose(), (x_img32,)),
        ]
        for name, m, xs in pare_regions:
            v = m.init(rng, *xs)
            lo = timed(make_repeat(m, N_LO), v, xs)
            hi = timed(make_repeat(m, N_HI), v, xs)
            t = max(hi - lo, 1e-9) / (N_HI - N_LO)
            tf, gb = region_cost(m, v, xs)
            print(
                f"{name:28s} B={B} {t * 1e3:8.3f} ms "
                f"{tf:6.3f} TFLOP {gb:5.2f} GB -> "
                f"{tf / t:6.1f} TF/s {gb / t:6.0f} GB/s",
                flush=True,
            )
        return

    class Layer1(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = ResLayer(Bottleneck, 64, 4, name="layer1", dtype=dtype)(
                x, False
            )
            return y[..., :64]  # chainable shape

    def stage_module(n_branches, chans, n_modules):
        class Stage(nn.Module):
            @nn.compact
            def __call__(self, *xs):
                xs = list(xs)
                for m in range(n_modules):
                    xs = HRModule(
                        num_branches=n_branches, channels=chans,
                        name=f"m{m}", dtype=dtype,
                    )(xs, False)
                return tuple(xs)

        return Stage()

    if args.branches:
        from poco_tpu.models.backbones.common import BasicBlock

        class Branch(nn.Module):
            ch: int

            @nn.compact
            def __call__(self, x):
                return ResLayer(
                    BasicBlock, self.ch, 4, name="br", dtype=dtype
                )(x, False)

        for bi, (s, c) in enumerate(
            [(56, w), (28, 2 * w), (14, 4 * w), (7, 8 * w)]
        ):
            xb = jnp.asarray(np.random.randn(B, s, s, c), dtype)
            m = Branch(ch=c)
            v = m.init(rng, xb)
            lo = timed(make_repeat(m, N_LO), v, (xb,))
            hi = timed(make_repeat(m, N_HI), v, (xb,))
            t = max(hi - lo, 1e-9) / (N_HI - N_LO)
            tf, gb = region_cost(m, v, (xb,))
            print(
                f"branch{bi} ResLayer 4xBasic {s}x{s}x{c:4d} "
                f"{t * 1e3:8.2f} ms  {tf:6.3f} TFLOP {gb:5.2f} GB "
                f"-> {tf / t:6.1f} TF/s {gb / t:6.0f} GB/s",
                flush=True,
            )
        return

    regions = []

    x_img = jnp.asarray(np.random.randn(B, 224, 224, 3), dtype)
    stem = Stem()
    regions.append(("stem (224->56, 64ch)", stem, stem.init(rng, x_img), (x_img,)))

    x56_64 = jnp.asarray(np.random.randn(B, 56, 56, 64), dtype)
    l1 = Layer1()
    regions.append(
        ("layer1 (Bottleneck x4, 56x56x256)", l1, l1.init(rng, x56_64), (x56_64,))
    )

    def binputs(n):
        shapes = [(56, w), (28, 2 * w), (14, 4 * w), (7, 8 * w)][:n]
        return tuple(
            jnp.asarray(np.random.randn(B, s, s, c), dtype) for s, c in shapes
        )

    s2 = stage_module(2, [w, 2 * w], 1)
    xs2 = binputs(2)
    regions.append(("stage2 (1 module, 2 br)", s2, s2.init(rng, *xs2), xs2))

    s3 = stage_module(3, [w, 2 * w, 4 * w], 4)
    xs3 = binputs(3)
    regions.append(("stage3 (4 modules, 3 br)", s3, s3.init(rng, *xs3), xs3))

    s4 = stage_module(4, [w, 2 * w, 4 * w, 8 * w], 3)
    xs4 = binputs(4)
    regions.append(("stage4 (3 modules, 4 br)", s4, s4.init(rng, *xs4), xs4))

    total = 0.0
    for name, mod, variables, inputs in regions:
        lo = timed(make_repeat(mod, N_LO), variables, inputs)
        hi = timed(make_repeat(mod, N_HI), variables, inputs)
        t = max(hi - lo, 1e-9) / (N_HI - N_LO)
        total += t
        line = f"{name:38s} {t * 1e3:8.2f} ms  ({B / t:9.0f} crops/s)"
        if args.costs:
            tf, gb = region_cost(mod, variables, inputs)
            if tf:
                line += (
                    f"  {tf:6.3f} TFLOP {gb:6.2f} GB"
                    f"  -> {tf / t:6.1f} TF/s {gb / t:6.0f} GB/s"
                )
        print(line, flush=True)

    # full model reference (params as args; slope protocol)
    class Full(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = HRNet(variant="cls", width=w, dtype=dtype, name="net")(x)
            # chainable: broadcast the pooled vector back onto the image
            return x + jnp.mean(y).astype(x.dtype)[None, None, None, None] * 1e-12

    full = Full()
    vf = full.init(rng, x_img[:1])
    lo = timed(make_repeat(full, N_LO), vf, (x_img,))
    hi = timed(make_repeat(full, N_HI), vf, (x_img,))
    t_full = max(hi - lo, 1e-9) / (N_HI - N_LO)
    print(f"{'FULL hrnet_w%d_cls' % w:38s} {t_full * 1e3:8.2f} ms  "
          f"({B / t_full:9.0f} crops/s)")
    print(f"{'sum of regions (- cls head)':38s} {total * 1e3:8.2f} ms")
    print(f"{'cls head + misc (residual)':38s} {(t_full - total) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
