"""Multi-process training worker (driven by tests/test_multiprocess.py).

Runs one JAX process of an N-process tiny-smoke training job on virtual
CPU devices and (on rank 0) dumps per-step losses, validation summary,
and a parameter checksum to results.json, so the test can assert metric
equality between a single-process 8-device run and a 2-process x
4-device run — the multi-host correctness check SURVEY §4.4 calls for
(the reference delegates this entirely to PyTorch-Lightning DDP).

Not a test module: invoked as a subprocess with explicit topology args.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=1)
    ap.add_argument("--proc_id", type=int, default=0)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--devices", type=int, default=8,
                    help="virtual CPU devices for THIS process")
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--data_dir", required=True)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from poco_tpu.parallel import distributed as dist

    if args.nprocs > 1:
        dist.maybe_initialize(
            coordinator=f"localhost:{args.port}",
            num_processes=args.nprocs,
            process_id=args.proc_id,
        )

    import numpy as np

    from poco_tpu.config import update_hparams
    from poco_tpu.data.dataset import PocoDataset
    from poco_tpu.smpl.assets import resolve_smpl_params
    from poco_tpu.train.trainer import Trainer

    hparams = update_hparams(
        os.path.join(REPO, "configs", "tiny_smoke.yaml")
    )
    hparams.LOG_DIR = args.outdir
    hparams.TRAINING.USE_AUGM = False      # determinism across shardings
    hparams.DATASET.BATCH_SIZE = 8
    hparams.TRAINING.MAX_EPOCHS = 1
    hparams.TRAINING.LOG_SAVE_INTERVAL = 1
    # Exercise the GLOBAL GT-pose-conditioning mask: with cond rows in
    # the batch (the smoke dataset is named 'smoke') the conditioned row
    # SET must be a property of the global batch — a per-shard selection
    # would pick int(0.5*4)=2 leading rows of EACH shard instead of the
    # 4 leading global rows, and the loss equality below would fail.
    hparams.POCO.GT_POSE_COND = True
    hparams.POCO.GT_POSE_COND_DS = "smoke"
    hparams.POCO.GT_POSE_COND_RATIO = 0.5
    # Exercise the collective head-sliced viz gather (_fetch_head) in
    # both topologies (rank 0 renders, every process participates).
    hparams.TRAINING.SAVE_IMAGES = True

    options = {"IMG_RES": hparams.DATASET.IMG_RES}
    npz_train = os.path.join(
        args.data_dir, "dataset_extras", "smoke_train.npz"
    )
    npz_val = os.path.join(args.data_dir, "dataset_extras", "smoke_test.npz")

    def train_ds(_epoch: int):
        return PocoDataset(
            npz_train, img_dir=args.data_dir, dataset_name="smoke",
            is_train=True, use_augmentation=False, options=options,
        )

    val_ds = PocoDataset(
        npz_val, img_dir=args.data_dir, dataset_name="smoke",
        is_train=False, options=options,
    )

    trainer = Trainer(
        hparams, resolve_smpl_params(None, "neutral"),
        train_dataset_fn=train_ds, val_dataset=val_ds,
    )
    trainer.fit(max_epochs=1)
    summary = trainer.validate(0)

    # Parameter checksum: params are replicated, so every process can
    # read them; only rank 0 writes.
    leaves = jax.tree_util.tree_leaves(trainer.state.params)
    param_sum = float(
        sum(float(np.sum(np.abs(np.asarray(l)))) for l in leaves)
    )

    if dist.is_main_process():
        losses = []
        with open(os.path.join(args.outdir, "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if "loss/total_loss" in rec and "step" in rec:
                    losses.append(rec["loss/total_loss"])
        with open(os.path.join(args.outdir, "results.json"), "w") as f:
            json.dump(
                {
                    "losses": losses,
                    "val": {
                        k: v for k, v in summary.items()
                        if isinstance(v, (int, float))
                    },
                    "param_sum": param_sum,
                    "process_count": jax.process_count(),
                    "n_devices": len(jax.devices()),
                },
                f,
            )


if __name__ == "__main__":
    main()
