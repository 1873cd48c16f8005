"""Training-step stage attribution on the TPU (slope protocol).

Times, at matched batch/dtype, the nested prefixes of the train step:

  fwd_eval    model.apply(train=False)              (inference baseline)
  fwd_train   prepare_gt + model.apply(train=True) + loss (value only)
  fwd_bwd     value_and_grad (no optimizer update)
  full        make_train_step(donate=False)          (the bench.py metric)
  full_donate make_train_step(donate=True)           (the trainer default)

Differences between consecutive rows attribute wall time to loss/GT
prep, backward pass, and optimizer/metrics. Each row uses the
dependency-chained slope protocol (t = (t_N - t_1)/(N-1), median of
--chains) because `block_until_ready` does not await execution over the
axon tunnel.

Usage: python tools/bench_train_stages.py [--batch 64] [--prec 16]
       [--iters 10] [--chains 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from poco_tpu.utils.comp_cache import enable_compilation_cache

enable_compilation_cache()


def slope(run, iters, chains):
    samples = []
    for _ in range(chains):
        t0 = time.perf_counter()
        run(1)
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(iters)
        dn = time.perf_counter() - t0
        samples.append(max(dn - d1, 1e-9) / (iters - 1))
    return float(np.median(samples)), min(samples), max(samples)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--prec", default="16", choices=["16", "32"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--chains", type=int, default=5)
    ap.add_argument("--stages", default="",
                    help="comma list to run (default all)")
    args = ap.parse_args()

    from poco_tpu.losses.losses import LossConfig, poco_loss
    from poco_tpu.models.poco import POCO, PocoConfig, init_poco, make_dummy_batch
    from poco_tpu.smpl.assets import synthetic_smpl_model
    from poco_tpu.train.state import create_train_state, make_optimizer
    from poco_tpu.train.step import make_train_step, prepare_gt

    B = args.batch
    dtype = jnp.bfloat16 if args.prec == "16" else jnp.float32
    model = POCO(cfg=PocoConfig(), dtype=dtype)
    smpl = synthetic_smpl_model(num_verts=6890)
    variables = init_poco(model, jax.random.PRNGKey(0), smpl, batch_size=1)
    state = create_train_state(model, variables, make_optimizer(lr=1e-4))
    loss_cfg = LossConfig()
    batch = make_dummy_batch(model.cfg, B, include_gt=True)
    batch.update(
        pose=jnp.zeros((B, 72), jnp.float32),
        betas=jnp.zeros((B, 10), jnp.float32),
        has_smpl=jnp.ones((B,), jnp.float32),
        has_pose_3d=jnp.ones((B,), jnp.float32),
        keypoints=jnp.zeros((B, 49, 3), jnp.float32),
    )
    rng = jax.random.PRNGKey(1)

    def loss_value(params, bstats, buffers, b, s, r):
        gt = prepare_gt(b, s)
        mb = dict(b)
        mb["gt_pose_rotmat"] = gt["gt_pose_rotmat"]
        vs = {"params": params}
        if bstats is not None:
            vs["batch_stats"] = bstats
        if buffers is not None:
            vs["buffers"] = buffers
        out, _ = model.apply(
            vs, mb, s, train=True, rngs={"dropout": r},
            mutable=["batch_stats"],
        )
        loss, _ = poco_loss(out, gt, loss_cfg)
        return loss

    # --- stage runners (each chains via a scalar fed into the input) ---
    def chain_img(b, scalar):
        nb = dict(b)
        nb["img"] = nb["img"] + 0.0 * scalar
        return nb

    stages = {}

    fwd_eval_fn = jax.jit(
        lambda v, b, s: model.apply(v, b, s, train=False)
    )

    def run_fwd_eval(n):
        sc = jnp.float32(0.0)
        for _ in range(n):
            out = fwd_eval_fn(variables, chain_img(batch, sc), smpl)
            sc = out["pred_cam"][0, 0]
        return float(np.asarray(sc))

    stages["fwd_eval"] = run_fwd_eval

    fwd_train_fn = jax.jit(loss_value)

    def run_fwd_train(n):
        sc = jnp.float32(0.0)
        for _ in range(n):
            sc = fwd_train_fn(
                state.params, state.batch_stats, state.buffers,
                chain_img(batch, sc), smpl, rng,
            )
        return float(np.asarray(sc))

    stages["fwd_train"] = run_fwd_train

    grad_fn = jax.jit(jax.grad(loss_value))

    def run_fwd_bwd(n):
        sc = jnp.float32(0.0)
        for _ in range(n):
            g = grad_fn(
                state.params, state.batch_stats, state.buffers,
                chain_img(batch, sc), smpl, rng,
            )
            sc = jax.tree_util.tree_leaves(g)[0].reshape(-1)[0]
        return float(np.asarray(sc))

    stages["fwd_bwd"] = run_fwd_bwd

    step_nd = make_train_step(model, loss_cfg, donate=False)

    def run_full(n):
        s = state
        for _ in range(n):
            s, m = step_nd(s, batch, smpl, rng)
        return float(np.asarray(m["loss/total_loss"]))

    stages["full"] = run_full

    step_d = make_train_step(model, loss_cfg, donate=True)

    def run_full_donate(n):
        # donation invalidates the input state: thread a fresh copy
        s = jax.tree_util.tree_map(jnp.copy, state)
        for _ in range(n):
            s, m = step_d(s, batch, smpl, rng)
        return float(np.asarray(m["loss/total_loss"]))

    stages["full_donate"] = run_full_donate

    # optimizer alone: Adam update + apply on fixed grads
    grads0 = jax.tree_util.tree_map(
        lambda p: jnp.zeros_like(p), state.params
    )

    @jax.jit
    def opt_fn(params, opt_state, g):
        updates, new_opt = state.tx.update(g, opt_state, params)
        return optax_apply(params, updates), new_opt

    import optax as _optax

    def optax_apply(p, u):
        return _optax.apply_updates(p, u)

    def run_opt_only(n):
        p, o = state.params, state.opt_state
        for _ in range(n):
            p, o = opt_fn(p, o, grads0)
        return float(np.asarray(jax.tree_util.tree_leaves(p)[0].reshape(-1)[0]))

    stages["opt_only"] = run_opt_only

    # full step minus the metric extras (_viz verts, var_pose, grad_norm):
    # quantifies what materializing auxiliary outputs costs the hot path
    from poco_tpu.train.step import prepare_gt as _pg

    def light_step(s, b, sp, r):
        gt = _pg(b, sp)
        mb = dict(b)
        mb["gt_pose_rotmat"] = gt["gt_pose_rotmat"]

        def lf(params):
            vs = {"params": params}
            if s.batch_stats is not None:
                vs["batch_stats"] = s.batch_stats
            if s.buffers is not None:
                vs["buffers"] = s.buffers
            out, mut = s.apply_fn(
                vs, mb, sp, train=True, rngs={"dropout": r},
                mutable=["batch_stats"],
            )
            loss, ld = poco_loss(out, gt, loss_cfg)
            return loss, (ld, mut.get("batch_stats"))

        (loss, (ld, bs)), g = jax.value_and_grad(lf, has_aux=True)(s.params)
        ns = s.apply_gradients(g)
        if bs is not None:
            ns = ns.replace(batch_stats=bs)
        return ns, ld["loss/total_loss"]

    light_fn = jax.jit(light_step, donate_argnums=(0,))

    def run_full_light(n):
        s = jax.tree_util.tree_map(jnp.copy, state)
        for _ in range(n):
            s, l = light_fn(s, batch, smpl, rng)
        return float(np.asarray(l))

    stages["full_light"] = run_full_light

    wanted = [s for s in args.stages.split(",") if s] or list(stages)
    prev = None
    print(f"batch={B} prec=bf{args.prec} iters={args.iters} "
          f"chains={args.chains}")
    for name in wanted:
        run = stages[name]
        run(2)  # compile + warm
        med, lo, hi = slope(run, args.iters, args.chains)
        delta = "" if prev is None else f"  (+{(med - prev) * 1e3:6.1f} ms)"
        print(
            f"{name:12s} {med * 1e3:7.1f} ms/step  "
            f"[{lo * 1e3:.1f}-{hi * 1e3:.1f}]  "
            f"{B / med:7.0f} crops/s{delta}"
        )
        prev = med


if __name__ == "__main__":
    main()
