"""Export a POCO checkpoint to an AOT serving artifact.

    python tools/export_model.py --cfg configs/demo_poco_cliff.yaml \
        --ckpt logs/<run> --out exported/poco_cliff \
        --batch-sizes 1,32 --dtype bf16 --compact

The artifact (see poco_tpu/runtime/export.py) contains the StableHLO
programs (lowered for cpu AND tpu), the model variables and the SMPL
weights — servable with jax+numpy only, no tracing/compiling of the
model at startup. The reference has no equivalent: its demo rebuilds
the torch model from the yacs config on every start
(/root/reference/pocolib/core/tester.py:55-111).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", default="configs/demo_poco_cliff.yaml")
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
    args = ap.parse_args()

    # Export is pure host work (tracing + lowering, no execution): force
    # CPU so it runs without the TPU tunnel, like convert_checkpoint.py.
    import jax

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
    )
    total = sum(
        os.path.getsize(os.path.join(out, f)) for f in os.listdir(out)
    )
    print(f"exported {args.cfg} -> {out} ({total / 1e6:.1f} MB, "
          f"buckets {list(batch_sizes)}, platforms {args.platforms})")


if __name__ == "__main__":
    main()
