"""Export a POCO checkpoint to an AOT serving artifact.

    python tools/export_model.py --cfg configs/poco_cliff.yaml \
        --ckpt logs/<run> --out exported/poco_cliff \
        --batch-sizes 1,32 --dtype bf16 --compact

The artifact (see poco_tpu/runtime/export.py) contains the StableHLO
programs (lowered for cpu AND tpu), the model variables and the SMPL
weights — servable with jax+numpy only, no tracing/compiling of the
model at startup. The reference has no equivalent: its demo rebuilds
the torch model from the yacs config on every start
(/root/reference/pocolib/core/tester.py:55-111).

With --data_parallel N the batch dimension of every bucket is sharded
over an N-device 1-D mesh (weights replicated, XLA SPMD partitioning
baked into the artifact). Such artifacts are lowered for the export
host's own platform only, so export them on a host that sees the
serving devices (or on a virtual CPU mesh for CPU serving/tests).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", default="configs/poco_cliff.yaml")
    ap.add_argument("--ckpt", default=None,
                    help="orbax dir / torch ckpt / run logdir (random "
                         "weights when omitted — pipeline testing only)")
    ap.add_argument("--inf_model", default="best")
    ap.add_argument("--smpl_dir", default="data/smpl")
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch-sizes", default="1,32")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--platforms", default="cpu,tpu")
    ap.add_argument("--compact", action="store_true",
                    help="fp16 vertex/joint outputs (rendering-grade)")
    ap.add_argument("--uint8-input", action="store_true",
                    help="program takes raw uint8 crops and normalizes "
                         "on device (4x smaller request uploads)")
    ap.add_argument("--data_parallel", type=int, default=None,
                    help="shard each batch bucket over N devices (SPMD; "
                         "lowers for the dp_platform only)")
    ap.add_argument("--dp_platform", default="cpu",
                    choices=["cpu", "native"],
                    help="device platform for --data_parallel exports: "
                         "'cpu' splits the host into N virtual devices "
                         "(tests / CPU serving); 'native' uses the real "
                         "accelerators (run on a host that sees all N)")
    return ap


def main() -> None:
    args = build_parser().parse_args()

    if args.data_parallel and args.dp_platform == "cpu":
        # A data-parallel export needs N live devices: split the host
        # into N virtual CPU devices (the same mechanism the tests and
        # the driver dryrun use) before jax initializes.
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count="
                f"{args.data_parallel}"
            ).strip()

    import jax

    if not (args.data_parallel and args.dp_platform == "native"):
        # Export is pure host work (tracing + lowering, no execution):
        # force CPU so it runs without the TPU tunnel, like
        # convert_checkpoint.py. Must go through jax.config — the TPU
        # plugin in this environment ignores the JAX_PLATFORMS env var.
        # Native data-parallel exports instead keep the real platform;
        # they bake the local device assignment.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from poco_tpu.config import model_config_from_hparams, update_hparams
    from poco_tpu.models.poco import POCO, init_poco
    from poco_tpu.runtime.export import export_poco
    from poco_tpu.smpl.assets import resolve_smpl_params

    hparams = update_hparams(args.cfg)
    model_cfg = model_config_from_hparams(hparams)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = POCO(cfg=model_cfg, dtype=dtype)
    smpl = resolve_smpl_params(args.smpl_dir, "neutral")

    variables = init_poco(model, jax.random.PRNGKey(0), smpl)
    if args.ckpt:
        from eval import load_checkpoint_into

        variables = load_checkpoint_into(
            variables, args.ckpt, model_cfg, inf_model=args.inf_model
        )
    else:
        print("WARNING: no --ckpt given; exporting random weights")

    batch_sizes = tuple(int(b) for b in args.batch_sizes.split(","))
    out = export_poco(
        model,
        variables,
        smpl,
        args.out,
        batch_sizes=batch_sizes,
        platforms=tuple(args.platforms.split(",")),
        compact=args.compact,
        data_parallel=args.data_parallel,
        uint8_input=args.uint8_input,
    )
    total = sum(
        os.path.getsize(os.path.join(out, f)) for f in os.listdir(out)
    )
    print(f"exported {args.cfg} -> {out} ({total / 1e6:.1f} MB, "
          f"buckets {list(batch_sizes)}, platforms {args.platforms})")


if __name__ == "__main__":
    main()
