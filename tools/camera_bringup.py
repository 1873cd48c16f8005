"""Camera-decoder calibration: train ONLY `deccam` on the 2D loss.

The synthetic convergence recipe (configs/convergence.yaml) trains pose/
shape/uncertainty with KEYPOINT_2D_LOSS_WEIGHT=0 — its full-image camera
is never supervised, so everything downstream of `smpl_joints2d` (demo
overlays, the model-in-the-loop refine detector, pose tracking) is
meaningless on those checkpoints. Full-head camera bring-up was measured
divergent at every LR/freeze combination (configs/convergence_ft2d.yaml:
the 2D gradients through the shared fc trunk destroy the pose).

This pass closes that gap without touching the trunk: the gradient is
masked to the head's camera decoder (`deccam`, ~3k params — reference
cliff_head.py:45-49), every other parameter and the BN statistics stay
bit-identical, and the full reference loss (noncrop 2D active,
losses.py:252-293) keeps the pose terms in the objective so the cam ->
next-iteration conditioning (cliff_head.py:99-113) stays accountable.
The measured failure mode is structurally impossible here.

Usage:
    python tools/camera_bringup.py \
        --ckpt logs/experiments/poco/convergence/<run> \
        [--cfg configs/convergence_ft2d.yaml] [--epochs 40] [--lr 1e-3] \
        [--out <ckpt>/../best_model_cam]

Writes an orbax checkpoint loadable by eval.py / demo.py / the detector
tools, and prints before/after full-image 2D pixel error + val MPJPE.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="configs/convergence_ft2d.yaml")
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir or run logdir")
    ap.add_argument("--out", default=None,
                    help="output checkpoint dir (default: "
                         "<ckpt parent>/best_model_cam)")
    ap.add_argument("--epochs", type=int, default=40)
    # Stable-SGD regime for the 1024-dim decoder input: the quadratic's
    # curvature scales with |xc|^2, so lr must sit well below 2/lambda —
    # 1e-3 measured divergent within 2 steps, 1e-5 is the safe default.
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--data_dir", default="data")
    ap.add_argument("--max_steps", type=int, default=0,
                    help="cap optimizer steps per epoch (0 = full epoch; "
                         "use a small cap for CPU smoke runs)")
    ap.add_argument("--eval_batches", type=int, default=0,
                    help="cap evaluation batches (0 = all)")
    args = ap.parse_args()

    from poco_tpu.utils.comp_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from eval import load_checkpoint_into
    from poco_tpu.config import (
        loss_config_from_hparams,
        model_config_from_hparams,
        update_hparams,
    )
    from poco_tpu.data.dataset import DataLoader, PocoDataset
    from poco_tpu.config import dataset_npz_path
    from poco_tpu.models.poco import POCO, init_poco
    from poco_tpu.parallel.mesh import make_mesh, replicate_tree
    from poco_tpu.smpl.assets import resolve_smpl_params
    from poco_tpu.train.state import create_train_state
    from poco_tpu.train.step import make_train_step

    hparams = update_hparams(args.cfg)
    cfg = model_config_from_hparams(hparams)
    # Pure-2D calibration objective: the pose/shape/flow terms have ~no
    # gradient w.r.t. the camera decoder (measured: zeroing deccam left
    # val MPJPE at 49.5 mm), so they contribute only noise here; the 2D
    # reprojection term (noncrop, the CLIFF contract) IS the objective.
    import dataclasses as _dc

    loss_cfg = _dc.replace(
        loss_config_from_hparams(hparams),
        keypoint3d_loss_weight=0.0,
        pose_loss_weight=0.0,
        beta_loss_weight=0.0,
        shape_loss_weight=0.0,
        nf_loss_weight=0.0,
    )
    smpl = resolve_smpl_params(None, "neutral")
    smpl_m = resolve_smpl_params(None, "male")
    smpl_f = resolve_smpl_params(None, "female")

    model = POCO(cfg=cfg)
    variables = init_poco(model, jax.random.PRNGKey(0), smpl)
    variables = load_checkpoint_into(variables, args.ckpt, cfg)
    orig_batch_stats = variables.get("batch_stats")

    # --- gradient mask: only leaves under a 'deccam' module train ---
    def is_deccam(path, _leaf):
        return any(
            getattr(k, "key", str(k)) == "deccam" for k in path
        )

    mask = jax.tree_util.tree_map_with_path(is_deccam, variables["params"])
    n_train = sum(
        int(np.prod(l.shape))
        for l, m in zip(
            jax.tree_util.tree_leaves(variables["params"]),
            jax.tree_util.tree_leaves(mask),
        )
        if m
    )
    if n_train == 0:
        raise SystemExit(
            "no deccam leaves found — is this a CLIFF/HMR-head model?"
        )
    print(f"trainable camera-decoder params: {n_train}", flush=True)

    # The untrained decoder emits an arbitrary camera; the reference's
    # exp(-10s) camera regularizer and the 1/s translation overflow on
    # it (measured: inf loss -> NaN params in 2 steps). Start from the
    # residual-decoder identity instead: zeroed deccam leaves make
    # pred_cam == init_cam (the SMPL mean camera) through all three
    # decoder iterations — every loss term is finite from step 0.
    def zero_deccam(path, leaf):
        return np.zeros_like(leaf) if is_deccam(path, leaf) else leaf

    orig_params = variables["params"]
    params0 = jax.tree_util.tree_map_with_path(zero_deccam, orig_params)
    variables = dict(variables, params=params0)

    # SGD, not Adam: Adam's per-coordinate update is ~lr regardless of
    # gradient magnitude, so from the near-optimal mean-cam start it
    # walks the 1024-dim decoder ~lr*|xc| per step in whatever direction
    # the first noisy minibatches point — measured to blow s (and with
    # it tz = 2f/(res*s)) within 2 steps at lr 1e-3. SGD's update is
    # gradient-proportional: tiny near the optimum, clip-bounded when
    # divergent — self-stabilizing for the scale-sensitive camera.
    #
    # multi_transform, NOT optax.masked: masked leaves the updates of
    # unmasked parameters UNCHANGED (i.e. raw gradients reach
    # apply_gradients for the whole frozen net — measured to corrupt it
    # within one epoch); the frozen partition must be set_to_zero.
    labels = jax.tree_util.tree_map(
        lambda m: "cam" if m else "frozen", mask
    )
    tx = optax.multi_transform(
        {
            "cam": optax.chain(
                optax.zero_nans(),
                optax.clip(1e3),
                optax.clip_by_global_norm(1.0),
                optax.sgd(args.lr, momentum=0.9),
            ),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    state = create_train_state(model, variables, tx)
    train_step = make_train_step(model, loss_cfg, donate=False)

    # Pose-preservation guardrail: the SAME metric convention as
    # eval.py / the convergence benchmark (runner.make_gendered_eval_step
    # — skeleton-space J14, hip-midpoint pelvis).
    from poco_tpu.eval.runner import make_gendered_eval_step

    metric_step = make_gendered_eval_step(model, None)

    @jax.jit
    def j2d_fwd(variables, batch, smpl):
        out = model.apply(variables, batch, smpl, train=False)
        return out["smpl_joints2d"]

    def load_ds(name, is_train, seed=0):
        npz = dataset_npz_path(args.data_dir, name, is_train=is_train)
        return PocoDataset(
            npz, img_dir=args.data_dir, dataset_name=name,
            is_train=is_train,
            use_augmentation=is_train and hparams.TRAINING.USE_AUGM,
            options={"FLIP": hparams.DATASET.FLIP},
            seed=seed,
        )

    train_name = hparams.DATASET.DATASETS_AND_RATIOS.rsplit("_", 1)[0]
    val_name = hparams.DATASET.VAL_DS
    val_ds = load_ds(val_name, is_train=False)
    bsz = hparams.DATASET.BATCH_SIZE

    mesh = make_mesh()

    from poco_tpu.ops.preprocess import normalize_image

    def device_batch(host_batch):
        batch = {
            k: jnp.asarray(v)
            for k, v in host_batch.items()
            if not isinstance(v, list)
        }
        # The dataset emits raw pixel crops; mean/std normalization is
        # an on-device op in every pipeline (trainer.py _device_batch,
        # eval runner, demo tester).
        batch["img"] = normalize_image(
            batch["img"].astype(jnp.float32)
        )
        return batch

    def px2d_and_mpjpe(variables):
        """Mean full-image 2D pixel error + val MPJPE (mm)."""
        errs, mpjpes = [], []
        loader = DataLoader(val_ds, batch_size=bsz, shuffle=False)
        for bi, host_batch in enumerate(loader):
            if args.eval_batches and bi >= args.eval_batches:
                break
            batch = device_batch(host_batch)
            j2d = np.asarray(j2d_fwd(variables, batch, smpl))
            m = metric_step(variables, batch, smpl, smpl_m, smpl_f)
            gt = np.asarray(host_batch["keypoints_fullimg"])
            conf = gt[..., 2]
            d = np.linalg.norm(j2d - gt[..., :2], axis=-1)
            errs.append((d * conf).sum() / np.maximum(conf.sum(), 1.0))
            mpjpes.append(float(np.mean(np.asarray(m["mpjpe"]))))
        return float(np.mean(errs)), 1000.0 * float(np.mean(mpjpes))

    with mesh:
        px_orig, mpjpe_orig = px2d_and_mpjpe({
            "params": orig_params,
            "batch_stats": state.batch_stats,
            "buffers": state.buffers,
        })
        print(f"raw checkpoint: 2d err {px_orig:.1f} px, val mpjpe "
              f"{mpjpe_orig:.1f} mm", flush=True)
        v0 = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "buffers": state.buffers,
        }
        px0, mpjpe0 = px2d_and_mpjpe(v0)
        print(f"mean-cam init: 2d err {px0:.1f} px, val mpjpe "
              f"{mpjpe0:.1f} mm", flush=True)

        state = replicate_tree(state, mesh)
        smpl_r = replicate_tree(smpl, mesh)
        rng = jax.random.PRNGKey(1)
        for epoch in range(args.epochs):
            train_ds = load_ds(train_name, is_train=True, seed=epoch)
            loader = DataLoader(
                train_ds, batch_size=bsz, shuffle=True, seed=epoch
            )
            last = {}
            for si, host_batch in enumerate(loader):
                if args.max_steps and si >= args.max_steps:
                    break
                batch = device_batch(host_batch)
                rng, step_rng = jax.random.split(rng)
                state, metrics = train_step(state, batch, smpl_r, step_rng)
                last = metrics
            if epoch % 5 == 0 or epoch == args.epochs - 1:
                kp = float(last.get("loss/loss_keypoints", np.nan))
                print(f"epoch {epoch}: kp2d loss {kp:.4f}", flush=True)

        # Keep everything except params bit-identical to the input
        # checkpoint (only deccam leaves differ; BN stats untouched).
        final = {
            "params": jax.device_get(state.params),
            "batch_stats": orig_batch_stats,
            "buffers": jax.device_get(state.buffers),
        }
        px1, mpjpe1 = px2d_and_mpjpe(final)
        print(f"after:  2d err {px1:.1f} px, val mpjpe {mpjpe1:.1f} mm",
              flush=True)

    out_dir = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.ckpt).rstrip("/")),
        "best_model_cam",
    )
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(out_dir), final, force=True)
    ckptr.wait_until_finished()
    print(json.dumps({
        "out": out_dir, "px2d_raw_ckpt": round(px_orig, 2),
        "mpjpe_raw_ckpt_mm": round(mpjpe_orig, 2),
        "px2d_meancam": round(px0, 2),
        "px2d_after": round(px1, 2), "mpjpe_meancam_mm": round(mpjpe0, 2),
        "mpjpe_after_mm": round(mpjpe1, 2), "epochs": args.epochs,
        "trainable_params": n_train,
    }))


if __name__ == "__main__":
    main()
