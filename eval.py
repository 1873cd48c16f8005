"""Evaluation CLI: 3DPW-style test sharded across all available chips.

Reference contract: eval.py:14-62 (fixed: the reference crashes on a
missing argument — SURVEY.md §2.1) + compute_error.py splits.

Usage:
    python eval.py --cfg configs/poco_cliff.yaml --ckpt <orbax dir or
        torch .pt> [--dataset 3dpw] [--data_dir data] [--smpl_dir ...]
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--cfg_id", type=int, default=None,
                        help="experiment id within a grid-search config "
                             "(reference eval.py:41-44)")
    parser.add_argument("--ckpt", default=None,
                        help="orbax checkpoint dir or torch .pt file")
    parser.add_argument("--dataset", default=None)
    parser.add_argument("--data_dir", default=None)
    parser.add_argument("--smpl_dir", default=None)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--out", default=None, help="report json path")
    parser.add_argument(
        "--flip_test", action="store_true",
        help="horizontal-flip test-time augmentation (the reference "
             "intended this via its nonexistent TestAugDataset import, "
             "pocolib/core/trainer.py:24): flipped crop through the "
             "same program, rotations un-flipped + SO(3)-averaged, one "
             "extra SMPL pass; ~2x eval compute",
    )
    parser.add_argument(
        "--dist", action="store_true",
        help="initialize jax.distributed with auto-detected pod "
             "topology for a multi-host eval (explicit topology via "
             "POCO_COORDINATOR/POCO_NUM_PROCESSES/POCO_PROCESS_ID env "
             "vars works without this flag); metrics allgather across "
             "processes, rank 0 prints/writes the report",
    )
    parser.add_argument(
        "--make_launcher", default=None, choices=["bash", "slurm"],
        help="write a grid-search eval array launcher and exit (the "
             "reference eval.py's --cluster handoff, eval.py:44-58)",
    )
    args = parser.parse_args()

    if args.make_launcher:
        from poco_tpu.utils.cluster import write_launcher

        path = write_launcher(
            args.cfg, script="eval.py", scheduler=args.make_launcher
        )
        print(f"launcher written: {path}")
        return

    import jax

    from poco_tpu.parallel import distributed as dist
    from poco_tpu.utils.comp_cache import enable_compilation_cache

    # Must run before first device use so the processes form one SPMD
    # runtime (reference eval.py:28-34 is single-GPU only; SURVEY §5.8 —
    # the sharded 3DPW eval is BASELINE configs[5]).
    dist.maybe_initialize(auto=args.dist)

    enable_compilation_cache()

    from poco_tpu.config import model_config_from_hparams, update_hparams
    from poco_tpu.data.dataset import PocoDataset
    from poco_tpu.eval.runner import pw3d_split_report, run_eval
    from poco_tpu.models.poco import POCO, init_poco
    from poco_tpu.smpl.assets import resolve_smpl_params

    if args.cfg_id is not None:
        # grid-search config: pick one experiment, no logdir side effects
        from poco_tpu.config import run_grid_search_experiments

        hparams = run_grid_search_experiments(
            args.cfg, cfg_id=args.cfg_id, log=False
        )
    else:
        hparams = update_hparams(args.cfg)
    if args.data_dir:
        hparams.DATASET.DATA_DIR = args.data_dir
    ds_name = args.dataset or hparams.DATASET.VAL_DS

    smpl = resolve_smpl_params(args.smpl_dir, "neutral")
    model = POCO(cfg=model_config_from_hparams(hparams))
    variables = init_poco(model, jax.random.PRNGKey(0), smpl)

    if args.ckpt:
        variables = load_checkpoint_into(
            variables, args.ckpt, model.cfg,
            inf_model=str(
                getattr(hparams.TESTING, "INF_MODEL", "best") or "best"
            ),
        )

    from poco_tpu.config import dataset_npz_path

    npz = dataset_npz_path(hparams.DATASET.DATA_DIR, ds_name, is_train=False)
    dataset = PocoDataset(
        npz, img_dir=hparams.DATASET.DATA_DIR, dataset_name=ds_name,
        is_train=False,
        options={
            "IMG_RES": hparams.DATASET.IMG_RES,
            "UNCERT_THRESHOLD": hparams.DATASET.UNCERT_THRESHOLD,
            "TEST_ROT": hparams.TESTING.TEST_ROT,
            "TEST_SCALE": hparams.TESTING.TEST_SCALE,
        },
    )

    # H36M 17-joint regressor: the reference 3DPW protocol
    # (eval_utils.py:62-75); asset-gated like the SMPL pkl — the
    # SMPL-skeleton fallback is used when absent.
    j_reg = None
    reg_path = os.path.join(
        hparams.DATASET.DATA_DIR, "J_regressor_h36m.npy"
    )
    if os.path.exists(reg_path):
        import numpy as _np

        j_reg = jax.numpy.asarray(_np.load(reg_path), jax.numpy.float32)
        print(f"using H36M eval regressor: {reg_path}")

    result = run_eval(
        model, variables, dataset,
        smpl_neutral=smpl,
        smpl_male=resolve_smpl_params(args.smpl_dir, "male"),
        smpl_female=resolve_smpl_params(args.smpl_dir, "female"),
        batch_size=args.batch_size,
        loss_ver=hparams.POCO.LOSS_VER,
        j_regressor_eval=j_reg,
        flip_test=args.flip_test,
    )
    summary = result.summary()
    report = pw3d_split_report(
        result.imgnames, result.mpjpe_mm, result.pa_mpjpe_mm, result.v2v_mm
    )
    payload = {"summary": summary, "splits": report}
    per_joint = result.per_joint_stats()
    if per_joint is not None:
        payload["per_joint"] = per_joint
    # run_eval allgathers per-sample metrics, so every process holds the
    # identical report; rank 0 alone prints/writes it (reference
    # rank-0 gating: train_utils.py:167-170 — and the reference's
    # save_results is DISABLED for NUM_GPUS>1, save_results.py:47;
    # here the report survives multi-process).
    if dist.is_main_process():
        print(json.dumps(payload, indent=1))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(payload, f, indent=1)
    dist.barrier("poco_eval_end")


def load_checkpoint_into(variables, ckpt_path: str, model_cfg,
                         inf_model: str = "best"):
    """Load an orbax dir or convert a torch checkpoint file.

    A run logdir is also accepted: the checkpoint inside it is resolved
    per the reference's --inf_model contract (best / best_mpjpe_var /
    latest; train_utils.py:126-136).
    """
    if os.path.isdir(ckpt_path) and not any(
        os.path.exists(os.path.join(ckpt_path, f))
        for f in ("_METADATA", "manifest.ocdbt", "d")
    ):
        from poco_tpu.utils.checkpoint_convert import get_model_path

        try:
            resolved = get_model_path(ckpt_path, inf_model)
            if resolved != ckpt_path:
                print(f"resolved checkpoint: {resolved}")
                ckpt_path = resolved
        except FileNotFoundError:
            pass
    if os.path.isdir(ckpt_path):
        from poco_tpu.utils.checkpoint_convert import restore_checkpoint_tree

        # Template-free restore: checkpoints may carry extra entries
        # (step, opt_state, rng from the complete-resume payload) that a
        # fixed template would reject with a tree-structure mismatch.
        # Topology-tolerant: a pod-trained checkpoint must load on one
        # chip (restore_checkpoint_tree falls back to host numpy).
        restored = restore_checkpoint_tree(ckpt_path)
        out = dict(variables)
        for k in ("params", "batch_stats", "buffers"):
            if restored.get(k) is not None:
                out[k] = restored[k]
        return out

    from poco_tpu.utils.checkpoint_convert import (
        convert_state_dict,
        load_torch_checkpoint,
        merge_converted,
    )

    sd = load_torch_checkpoint(ckpt_path)
    converted = convert_state_dict(sd, head_type=model_cfg.head_name)
    merged, stats = merge_converted(variables, converted)
    print(f"converted checkpoint: {stats}")
    return merged


if __name__ == "__main__":
    main()
