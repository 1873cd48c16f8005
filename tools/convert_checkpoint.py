"""Convert a reference PyTorch POCO checkpoint to an orbax checkpoint.

Usage:
    python tools/convert_checkpoint.py --torch_ckpt poco_cliff.pt \
        --cfg configs/poco_cliff.yaml --out ckpt/poco_cliff \
        [--smpl_dir data/smpl]

Prints the load statistics (tensors converted / skipped and any
unmatched module names) so conversion coverage of a given checkpoint is
auditable — the parity gate of SURVEY.md §4 ("golden-parity" tests).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--torch_ckpt", required=True)
    parser.add_argument("--cfg", default="configs/poco_cliff.yaml")
    parser.add_argument("--out", required=True, help="orbax output dir")
    parser.add_argument("--smpl_dir", default=None)
    args = parser.parse_args()

    import jax

    # Conversion is pure host work (init a param tree, rename tensors,
    # save orbax): run it on CPU. This also keeps the tool usable when
    # the TPU tunnel is down — the axon plugin ignores the JAX_PLATFORMS
    # env var and would otherwise hang initializing the backend.
    jax.config.update("jax_platforms", "cpu")

    from poco_tpu.utils.comp_cache import enable_compilation_cache

    enable_compilation_cache()
    import orbax.checkpoint as ocp

    from poco_tpu.config import model_config_from_hparams, update_hparams
    from poco_tpu.models.poco import POCO, init_poco
    from poco_tpu.smpl.assets import resolve_smpl_params
    from poco_tpu.utils.checkpoint_convert import (
        convert_state_dict,
        load_torch_checkpoint,
        merge_converted,
    )

    hparams = update_hparams(args.cfg)
    model_cfg = model_config_from_hparams(hparams)
    smpl = resolve_smpl_params(args.smpl_dir, "neutral")
    model = POCO(cfg=model_cfg)
    variables = init_poco(model, jax.random.PRNGKey(0), smpl)

    sd = load_torch_checkpoint(args.torch_ckpt)
    converted = convert_state_dict(sd, head_type=model_cfg.head_name)
    if converted["unmatched"]:
        print(f"unmatched torch modules ({len(converted['unmatched'])}):")
        for name in converted["unmatched"][:50]:
            print("  ", name)
    merged, stats = merge_converted(variables, converted)
    print(f"loaded {stats['loaded']} tensors, skipped {stats['skipped']}")

    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": merged["params"],
        "batch_stats": merged.get("batch_stats"),
        "buffers": merged.get("buffers"),
    }
    ckptr.save(os.path.abspath(args.out), payload, force=True)
    ckptr.wait_until_finished()
    print(f"saved orbax checkpoint to {args.out}")


if __name__ == "__main__":
    main()
