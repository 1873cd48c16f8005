"""Stage-level timing attribution for the HRNet-W48 backbone on TPU.

The backbone is ~100% of POCO-CLIFF inference cost (BENCHMARKS.md); this
script times each architectural region as its own jitted program with
representative input shapes (batch 128 bf16, chained-dispatch protocol —
see bench.py for why) so conv-level tuning targets the real hot spots.

Usage: python tools/bench_backbone.py [--batch 128] [--iters 10]
Prints one line per region + the full-model reference time.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from poco_tpu.utils.comp_cache import enable_compilation_cache

enable_compilation_cache()


def chained_time(fn, args, iters: int, n_chain_outputs=1) -> float:
    """Best-of-3 per-iteration time via dependency-chained dispatches."""

    def run(n):
        a = list(args)
        out = None
        for _ in range(n):
            out = fn(*a)
            probe = jax.tree_util.tree_leaves(out)[0]
            a[0] = a[0] + 0.0 * probe.reshape(-1)[0].astype(a[0].dtype)
        return float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])

    run(2)  # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        run(1)
        dt1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(iters)
        dtn = time.perf_counter() - t0
        best = min(best, max(dtn - dt1, 1e-9) / max(iters - 1, 1))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--width", type=int, default=48)
    args = ap.parse_args()
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
            return nn.relu(batch_norm(False, name="bn2", dtype=dtype)(y))

    class Layer1(nn.Module):
        @nn.compact
        def __call__(self, x):
            return ResLayer(Bottleneck, 64, 4, name="layer1", dtype=dtype)(
                x, False
            )

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

    class ClsHead(nn.Module):
        @nn.compact
        def __call__(self, *xs):
            net = HRNet(variant="cls", width=w, dtype=dtype)
            # reuse the real head implementation via a bound module
            return net._cls_head.__wrapped__(net, list(xs), False) \
                if hasattr(net._cls_head, "__wrapped__") else None

    regions = []

    x_img = jnp.asarray(np.random.randn(B, 224, 224, 3), dtype)
    stem = Stem()
    v = stem.init(rng, x_img)
    regions.append(("stem (224->56, 64ch)", stem, v, (x_img,)))

    x56_64 = jnp.asarray(np.random.randn(B, 56, 56, 64), dtype)
    l1 = Layer1()
    v1 = l1.init(rng, x56_64)
    regions.append(("layer1 (Bottleneck x4, 56x56x256)", l1, v1, (x56_64,)))

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

    # cls head timed as part of full minus sum of stages (composition is
    # awkward to isolate through the shared HRNet module).

    total = 0.0
    for name, mod, variables, inputs in regions:
        f = jax.jit(lambda v_, *a, m=mod: m.apply(v_, *a))

        def fn(x0, *rest):
            return f(variables, x0, *rest)

        t = chained_time(fn, list(inputs), args.iters)
        total += t
        print(f"{name:40s} {t * 1e3:8.2f} ms  ({B / t:8.0f} crops/s)")

    # full model reference
    full = HRNet(variant="cls", width=w, dtype=dtype)
    vf = jax.jit(lambda r: full.init(r, x_img[:1]))(rng)
    ff = jax.jit(lambda x: full.apply(vf, x))
    t_full = chained_time(ff, [x_img], args.iters)
    print(f"{'FULL hrnet_w%d_cls' % w:40s} {t_full * 1e3:8.2f} ms  "
          f"({B / t_full:8.0f} crops/s)")
    print(f"{'sum of stages (- cls head)':40s} {total * 1e3:8.2f} ms")
    print(f"{'cls head (residual)':40s} {(t_full - total) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
