"""Training CLI.

Reference contract: train.py:15-136 — config grid-search expansion,
seeding, logdir setup, dataset construction from DATASETS_AND_RATIOS /
STAGE_DATASETS, fit with validation.

Usage:
    python train.py --cfg configs/poco_cliff.yaml [--cfg_id 0]
        [--data_dir data] [--smpl_dir data/smpl] [--max_epochs N]

Multi-process (multi-host) launch — the reference's DDP equivalent
(/root/reference/train.py:81-96), one process per host, one SPMD
program over the global mesh:

    POCO_COORDINATOR=host0:1234 POCO_NUM_PROCESSES=2 POCO_PROCESS_ID=0 \
        python train.py --cfg ...   # on host 0, and likewise id=1 on
                                    # host 1. On a TPU pod runtime,
                                    # plain `python train.py --dist`
                                    # auto-detects all of it.
"""

from __future__ import annotations

import argparse
import os


def build_train_dataset_factory(hparams, options):
    """Dataset factory honoring stage curricula (trainer.py:640-654)."""
    from poco_tpu.data.dataset import PocoDataset
    from poco_tpu.data.mixed import (
        RatioMixedDataset,
        parse_datasets_and_ratios,
        parse_stage_datasets,
        stage_for_epoch,
    )

    data_dir = hparams.DATASET.DATA_DIR

    from poco_tpu.config import dataset_npz_path

    def load_ds(name: str, seed: int = 0):
        npz = dataset_npz_path(data_dir, name, is_train=True)
        return PocoDataset(
            npz, img_dir=data_dir, dataset_name=name, is_train=True,
            use_augmentation=hparams.TRAINING.USE_AUGM,
            ignore_3d=hparams.DATASET.IGNORE_3D,
            options=options, seed=seed,
        )

    stages = (
        parse_stage_datasets(hparams.DATASET.STAGE_DATASETS)
        if hparams.DATASET.TRAIN_DS == "stage"
        else None
    )

    def factory(epoch: int):
        spec = (
            stage_for_epoch(stages, epoch)
            if stages
            else hparams.DATASET.DATASETS_AND_RATIOS
        )
        names, ratios = parse_datasets_and_ratios(spec)
        if len(names) == 1:
            return load_ds(names[0], seed=epoch)
        return RatioMixedDataset(
            [load_ds(n, seed=epoch) for n in names], ratios, seed=epoch
        )

    return factory


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True, help="experiment yaml")
    parser.add_argument("--cfg_id", type=int, default=0,
                        help="grid-search experiment index")
    parser.add_argument("--smpl_dir", default=None,
                        help="SMPL model directory (else synthetic)")
    parser.add_argument("--data_dir", default=None,
                        help="override DATASET.DATA_DIR")
    parser.add_argument("--max_epochs", type=int, default=None)
    parser.add_argument("--resume", default=None, help="checkpoint path")
    parser.add_argument(
        "--logdir", default=None,
        help="pin the run to this exact logdir (no timestamp minting) — "
             "pairs with --resume so a restarted run keeps appending to "
             "the same trajectory",
    )
    parser.add_argument(
        "--pretrained", default=None,
        help="warm-start weights (orbax dir or torch .pt) — overrides "
             "TRAINING.PRETRAINED; unlike --resume, epoch counters and "
             "optimizer state start fresh",
    )
    parser.add_argument(
        "--dist", action="store_true",
        help="initialize jax.distributed with auto-detected pod "
             "topology (explicit topology comes from POCO_COORDINATOR/"
             "POCO_NUM_PROCESSES/POCO_PROCESS_ID env vars, which work "
             "without this flag)",
    )
    parser.add_argument(
        "--make_launcher", default=None, choices=["bash", "slurm"],
        help="write a grid-search array launcher and exit (the "
             "reference's --cluster HTCondor handoff contract, "
             "config.py:337-355)",
    )
    args = parser.parse_args()

    if args.make_launcher:
        from poco_tpu.utils.cluster import write_launcher

        path = write_launcher(args.cfg, scheduler=args.make_launcher)
        print(f"launcher written: {path}")
        return

    from poco_tpu.config import dataset_npz_path, run_grid_search_experiments
    from poco_tpu.parallel import distributed as dist
    from poco_tpu.utils.comp_cache import enable_compilation_cache

    # Must run before first device use so the processes form one SPMD
    # runtime (reference: PL spawns DDP ranks here, train.py:81-96).
    dist.maybe_initialize(auto=args.dist)

    enable_compilation_cache()
    from poco_tpu.data.dataset import PocoDataset
    from poco_tpu.smpl.assets import resolve_smpl_params
    from poco_tpu.train.trainer import Trainer
    from poco_tpu.utils.os_utils import copy_code

    hparams = run_grid_search_experiments(
        args.cfg, args.cfg_id, logdir=args.logdir
    )
    if args.data_dir:
        hparams.DATASET.DATA_DIR = args.data_dir
    if args.pretrained:
        hparams.TRAINING.PRETRAINED = args.pretrained
    if dist.is_main_process():
        copy_code(hparams.LOG_DIR)

    smpl = resolve_smpl_params(args.smpl_dir, "neutral")
    smpl_male = resolve_smpl_params(args.smpl_dir, "male")
    smpl_female = resolve_smpl_params(args.smpl_dir, "female")

    options = {
        "FLIP": bool(hparams.DATASET.FLIP),
        "NOISE_FACTOR": hparams.DATASET.NOISE_FACTOR,
        "ROT_FACTOR": hparams.DATASET.ROT_FACTOR,
        "SCALE_FACTOR": hparams.DATASET.SCALE_FACTOR,
        "IMG_RES": hparams.DATASET.IMG_RES,
        "USE_SYNTHETIC_OCCLUSION": hparams.DATASET.USE_SYNTHETIC_OCCLUSION,
        "UNCERT_THRESHOLD": hparams.DATASET.UNCERT_THRESHOLD,
    }

    val_npz = dataset_npz_path(
        hparams.DATASET.DATA_DIR, hparams.DATASET.VAL_DS, is_train=False
    )
    val_dataset = (
        PocoDataset(
            val_npz, img_dir=hparams.DATASET.DATA_DIR,
            dataset_name=hparams.DATASET.VAL_DS, is_train=False,
            options=options,
        )
        if os.path.exists(val_npz)
        else None
    )

    trainer = Trainer(
        hparams, smpl,
        train_dataset_fn=build_train_dataset_factory(hparams, options),
        val_dataset=val_dataset,
        smpl_male=smpl_male, smpl_female=smpl_female,
    )
    if args.resume:
        trainer.load_checkpoint(args.resume)
    summary = trainer.fit(args.max_epochs)
    print("final:", summary)

    # RUN_TEST: final evaluation with the best checkpoint (reference
    # train.py:98-106 runs validate -> fit -> test).
    if hparams.RUN_TEST and val_dataset is not None:
        best = os.path.join(hparams.LOG_DIR, "best_model")
        if os.path.exists(best):
            trainer.load_checkpoint(best)
        test_summary = trainer.validate(trainer.epoch)
        print("test:", test_summary)


if __name__ == "__main__":
    main()
