"""ONE command for the golden gate: convert -> eval -> 0.5 mm assertion.

The BASELINE.md accuracy gate ("3DPW MPJPE within 0.5 mm of the PyTorch
reference on converted weights") needs license-gated assets that are not
shipped here. The moment they exist, this script runs the whole gate:

    python tools/golden_gate.py \
        --smpl_dir  <dir with SMPL_NEUTRAL.pkl / basicmodel_*.pkl> \
        --torch_ckpt <reference poco checkpoint .pt> \
        --data_dir  <dir with dataset_extras/3dpw_test.npz + images> \
        [--cfg configs/poco_cliff.yaml] [--dataset 3dpw]
        [--ref_mpjpe <mm>]   # reference-side MPJPE if already known

Steps:
  1. convert the torch checkpoint (tools/convert_checkpoint.py logic) —
     asserts full coverage: 0 unmatched torch modules, 0 skipped.
  2. run the sharded JAX eval (eval.py machinery) on the dataset with
     gendered real SMPL GT -> MPJPE_jax.
  3. reference side: --ref_mpjpe if given, else the ACTUAL reference
     torch model (/root/reference/pocolib via tests/ref_torch stubs) is
     run over the same dataset on CPU -> MPJPE_torch.
  4. assert |MPJPE_jax - MPJPE_torch| <= 0.5 mm. Exit 0 iff the gate
     passes; prints one JSON line either way.

Related: tests/test_golden.py (pytest form of the same assets),
BASELINE.md (the gate), pocolib/utils/eval_utils.py:62-102 (protocol).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def eval_jax(args, hparams, variables) -> float:
    import jax

    from poco_tpu.config import model_config_from_hparams
    from poco_tpu.data.dataset import PocoDataset
    from poco_tpu.eval.runner import run_eval
    from poco_tpu.models.poco import POCO
    from poco_tpu.smpl.assets import resolve_smpl_params
    from poco_tpu.config import dataset_npz_path

    model = POCO(cfg=model_config_from_hparams(hparams))
    npz = dataset_npz_path(args.data_dir, args.dataset, is_train=False)
    dataset = PocoDataset(
        npz, img_dir=args.data_dir, dataset_name=args.dataset,
        is_train=False,
    )
    result = run_eval(
        model, variables, dataset,
        smpl_neutral=resolve_smpl_params(args.smpl_dir, "neutral"),
        smpl_male=resolve_smpl_params(args.smpl_dir, "male"),
        smpl_female=resolve_smpl_params(args.smpl_dir, "female"),
        batch_size=args.batch_size,
        loss_ver=hparams.POCO.LOSS_VER,
        j_regressor_eval=_h36m_regressor(args),
    )
    return float(result.summary()["mpjpe"])


def _h36m_regressor(args):
    import jax.numpy as jnp

    path = os.path.join(args.data_dir, "J_regressor_h36m.npy")
    if os.path.exists(path):
        return jnp.asarray(np.load(path), jnp.float32)
    return None


def eval_torch_reference(args, hparams) -> float:
    """Run the reference's own torch modules over the same npz on CPU.

    Uses tests/ref_torch.import_reference_modules (yacs/loguru/smplx
    stubbed only where missing — with real assets smplx may be real) to
    build the reference POCO from the checkpoint, then computes the
    reference-protocol MPJPE with our metric code on its outputs (the
    metric itself is parity-tested, tests/test_eval.py).
    """
    import tempfile

    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from ref_torch import import_reference_modules  # noqa: E402

    ref = import_reference_modules(
        __import__("pathlib").Path(tempfile.mkdtemp())
    )
    sd = torch.load(args.torch_ckpt, map_location="cpu")
    sd = sd.get("model", sd.get("state_dict", sd))

    # Reference model build mirrors configs/poco_cliff.yaml <->
    # reference demo_poco_cliff.yaml; PARE checkpoints: --cfg poco_pare.
    if "pare" in hparams.POCO.BACKBONE:
        backbone = ref.hrnet_w32(pretrained=False)
        head = ref.pare_head(480, "diff_branch", "sigmoid")
    else:
        backbone = ref.hrnet_w48_cls()
        head = ref.cliff_head(2048, "diff_branch", "sigmoid")

    def pick(prefix):
        return {
            k[len(prefix):]: v for k, v in sd.items()
            if k.startswith(prefix)
        }

    backbone.load_state_dict(pick("backbone."), strict=True)
    head.load_state_dict(pick("head."), strict=True)
    backbone.eval()
    head.eval()

    from poco_tpu.config import dataset_npz_path
    from poco_tpu.data.dataset import PocoDataset
    from poco_tpu.eval.metrics import joints_from_vertices
    from poco_tpu.eval.metrics import mpjpe as mpjpe_fn
    from poco_tpu.ops.rotation import axis_angle_to_rotmat
    from poco_tpu.smpl.assets import resolve_smpl_params
    from poco_tpu.smpl.lbs import smpl_forward
    from poco_tpu.constants import SMPL_J24_TO_COMMON_J14

    import jax
    import jax.numpy as jnp

    npz = dataset_npz_path(args.data_dir, args.dataset, is_train=False)
    dataset = PocoDataset(
        npz, img_dir=args.data_dir, dataset_name=args.dataset,
        is_train=False,
    )
    smpl_by_gender = {
        g: resolve_smpl_params(args.smpl_dir, g)
        for g in ("neutral", "male", "female")
    }
    j_reg = _h36m_regressor(args)

    # EXACT mirror of the JAX eval protocol (eval/runner.py
    # make_gendered_eval_step): predictions through the NEUTRAL SMPL
    # (that is what the model's smpl head uses), GT through the gendered
    # SMPL, then either H36M-regressed pelvis-centered J14 (when the
    # regressor asset is present — both sides see the same _h36m_regressor)
    # or the SMPL-skeleton J14 fallback with hip-midpoint centering. Any
    # protocol asymmetry here would masquerade as conversion error and
    # corrupt the 0.5 mm budget.
    # SMPL params go in as jit ARGUMENTS (closure constants this large
    # overflow the axon remote_compile request).
    @jax.jit
    def joints14(smpl_n, smpl_m, smpl_f, rot, shp, gt_rot, gt_betas,
                 gender):
        pred = smpl_forward(smpl_n, shp, rot)
        out_n = smpl_forward(smpl_n, gt_betas, gt_rot)
        out_m = smpl_forward(smpl_m, gt_betas, gt_rot)
        out_f = smpl_forward(smpl_f, gt_betas, gt_rot)
        g = gender.reshape(-1, 1, 1)
        gt_verts = jnp.where(
            g == 1, out_f.vertices,
            jnp.where(g == 0, out_m.vertices, out_n.vertices),
        )
        gt_j24 = jnp.where(
            g == 1, out_f.joints_lbs,
            jnp.where(g == 0, out_m.joints_lbs, out_n.joints_lbs),
        )
        if j_reg is not None:
            pred_j14 = joints_from_vertices(j_reg, pred.vertices)
            gt_j14 = joints_from_vertices(j_reg, gt_verts)
        else:
            sel = jnp.asarray(SMPL_J24_TO_COMMON_J14)
            pred_j = pred.joints_lbs[:, sel]
            gt_j = gt_j24[:, sel]
            pred_j14 = pred_j - (pred_j[:, 2:3] + pred_j[:, 3:4]) / 2.0
            gt_j14 = gt_j - (gt_j[:, 2:3] + gt_j[:, 3:4]) / 2.0
        return mpjpe_fn(pred_j14, gt_j14)

    from poco_tpu.constants import IMG_NORM_MEAN, IMG_NORM_STD

    mean = np.asarray(IMG_NORM_MEAN, np.float32)
    std = np.asarray(IMG_NORM_STD, np.float32)

    errs = []
    B = args.batch_size
    for s in range(0, len(dataset), B):
        items = [dataset[i] for i in range(s, min(s + B, len(dataset)))]
        crops = np.stack([it["img"] for it in items])  # [0,255] RGB
        crops = (crops / 255.0 - mean) / std
        img = torch.from_numpy(
            crops.transpose(0, 3, 1, 2).astype(np.float32)
        )
        bbox_info = torch.from_numpy(
            np.stack([it["bbox_info"] for it in items])
        )
        with torch.no_grad():
            feats = backbone(img)
            out = (
                head(feats)
                if "pare" in hparams.POCO.BACKBONE
                else head(feats, {"bbox_info": bbox_info})
            )
        rot = jnp.asarray(np.asarray(out["pred_pose"], np.float32))
        shp = jnp.asarray(np.asarray(out["pred_shape"], np.float32))
        n = len(items)
        gt_rot = axis_angle_to_rotmat(
            jnp.asarray(
                np.stack([np.asarray(it["pose"]) for it in items])
            ).reshape(-1, 3)
        ).reshape(n, 24, 3, 3)
        gt_betas = jnp.asarray(
            np.stack([np.asarray(it["betas"]) for it in items])
        )
        gender = jnp.asarray(
            np.array([int(it.get("gender", -1)) for it in items],
                     np.int32)
        )
        errs.extend(
            np.asarray(
                joints14(
                    smpl_by_gender["neutral"], smpl_by_gender["male"],
                    smpl_by_gender["female"], rot, shp, gt_rot, gt_betas,
                    gender,
                )
            ).tolist()
        )
    return float(np.mean(errs) * 1000.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smpl_dir", required=True)
    ap.add_argument("--torch_ckpt", required=True)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--cfg", default="configs/poco_cliff.yaml")
    ap.add_argument("--dataset", default="3dpw")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--ref_mpjpe", type=float, default=None,
                    help="reference-side MPJPE in mm, if already known "
                         "(skips the torch CPU eval)")
    ap.add_argument("--budget_mm", type=float, default=0.5)
    args = ap.parse_args()

    for path, what in (
        (args.smpl_dir, "SMPL dir"),
        (args.torch_ckpt, "torch checkpoint"),
        (args.data_dir, "data dir"),
    ):
        if not os.path.exists(path):
            raise SystemExit(f"{what} not found: {path}")

    from poco_tpu.utils.comp_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from poco_tpu.config import model_config_from_hparams, update_hparams
    from poco_tpu.models.poco import POCO, init_poco
    from poco_tpu.smpl.assets import resolve_smpl_params
    from poco_tpu.utils.checkpoint_convert import (
        convert_state_dict,
        load_torch_checkpoint,
        merge_converted,
    )

    hparams = update_hparams(args.cfg)
    cfg = model_config_from_hparams(hparams)
    smpl = resolve_smpl_params(args.smpl_dir, "neutral")
    model = POCO(cfg=cfg)
    variables = init_poco(model, jax.random.PRNGKey(0), smpl)

    # 1. convert, full coverage required
    sd = load_torch_checkpoint(args.torch_ckpt)
    converted = convert_state_dict(sd, head_type=cfg.head_name)
    if converted["unmatched"]:
        raise SystemExit(f"unmatched torch modules: {converted['unmatched']}")
    variables, stats = merge_converted(variables, converted)
    if stats["skipped"]:
        raise SystemExit(f"conversion skipped tensors: {stats}")
    print(f"converted: {stats['loaded']} tensors, 0 skipped",
          file=sys.stderr)

    # 2. JAX eval
    mpjpe_jax = eval_jax(args, hparams, variables)

    # 3. reference side
    if args.ref_mpjpe is not None:
        mpjpe_ref = float(args.ref_mpjpe)
    else:
        mpjpe_ref = eval_torch_reference(args, hparams)

    delta = abs(mpjpe_jax - mpjpe_ref)
    ok = delta <= args.budget_mm
    print(json.dumps({
        "gate": "golden_3dpw_mpjpe",
        "mpjpe_jax_mm": round(mpjpe_jax, 3),
        "mpjpe_ref_mm": round(mpjpe_ref, 3),
        "delta_mm": round(delta, 3),
        "budget_mm": args.budget_mm,
        "pass": bool(ok),
    }))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
