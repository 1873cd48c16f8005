"""Capture a jax.profiler trace of the flagship POCO-CLIFF program.

Writes a TensorBoard-compatible trace (xplane) under --out; open with
`tensorboard --logdir <out>` -> Profile tab, or feed to xprof tooling.
Complements the crops/sec telemetry (bench.py) with op-level timing.

Usage:
  python tools/profile_model.py [--mode infer|train] [--batch 128]
                                [--steps 5] [--out /tmp/poco_trace]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from poco_tpu.utils.comp_cache import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="infer", choices=["infer", "train"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/poco_trace")
    ap.add_argument("--precision", default="16", choices=["16", "32"])
    args = ap.parse_args()

    from poco_tpu.models.poco import POCO, PocoConfig, init_poco, make_dummy_batch
    from poco_tpu.smpl.assets import synthetic_smpl_model

    dtype = jnp.bfloat16 if args.precision == "16" else jnp.float32
    model = POCO(cfg=PocoConfig(), dtype=dtype)
    smpl = synthetic_smpl_model(num_verts=6890)
    variables = init_poco(model, jax.random.PRNGKey(0), smpl, batch_size=1)
    B = args.batch
    batch = make_dummy_batch(model.cfg, B, include_gt=args.mode == "train")

    if args.mode == "infer":
        @jax.jit
        def step_fn(variables, batch, smpl):
            return model.apply(variables, batch, smpl, train=False)

        def run_one(carry):
            out = step_fn(variables, batch, smpl)
            return out["pred_pose"]
    else:
        from poco_tpu.losses.losses import LossConfig
        from poco_tpu.train.state import create_train_state, make_optimizer
        from poco_tpu.train.step import make_train_step

        batch.update(
            pose=jnp.zeros((B, 72), jnp.float32),
            betas=jnp.zeros((B, 10), jnp.float32),
            has_smpl=jnp.ones((B,), jnp.float32),
            has_pose_3d=jnp.ones((B,), jnp.float32),
            keypoints=jnp.zeros((B, 49, 3), jnp.float32),
        )
        tx = make_optimizer(lr=1e-4)
        state = create_train_state(model, variables, tx)
        train_step = make_train_step(model, LossConfig(), donate=False)
        rng = jax.random.PRNGKey(1)

        def run_one(carry):
            nonlocal state
            state, metrics = train_step(state, batch, smpl, rng)
            return metrics["loss/total_loss"]

    # compile + warm outside the trace
    probe = run_one(None)
    np.asarray(probe)

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        out = None
        for _ in range(args.steps):
            out = run_one(out)
        np.asarray(out)  # await execution inside the trace window
    print(f"trace written to {args.out} ({args.mode}, batch {B}, "
          f"{args.steps} steps)")


if __name__ == "__main__":
    main()
