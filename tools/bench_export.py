"""Throughput of the AOT-exported artifact vs the in-process jit path.

Exports the full-width flagship (POCO-CLIFF, bf16) to a serving
artifact, then measures the deserialized program's crops/s/chip with
bench.py's chained protocol — the serving story must not cost
performance vs `jax.jit(model.apply)` (bench.py's headline).

    python tools/bench_export.py [--which cliff] [--batch 128]

Prints one JSON line per run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--which", default="cliff", choices=["cliff", "pare"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--chains", type=int, default=5)
    ap.add_argument("--artifact", default="",
                    help="reuse an existing artifact instead of exporting")
    ap.add_argument("--platforms", default="tpu",
                    help="lowering platforms for a fresh export")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from poco_tpu.utils.comp_cache import enable_compilation_cache

    enable_compilation_cache()

    from poco_tpu.config import model_config_from_hparams, update_hparams
    from poco_tpu.models.poco import POCO, init_poco
    from poco_tpu.runtime.export import export_poco, load_exported
    from poco_tpu.smpl.assets import synthetic_smpl_model

    batch_size = args.batch
    artifact = args.artifact
    if not artifact:
        model = POCO(
            cfg=model_config_from_hparams(
                update_hparams(f"configs/poco_{args.which}.yaml")
            ),
            dtype=jnp.bfloat16,
        )
        smpl = synthetic_smpl_model(num_verts=6890)
        variables = init_poco(model, jax.random.PRNGKey(0), smpl, batch_size=1)
        artifact = os.path.join(
            tempfile.gettempdir(), f"poco_{args.which}_b{batch_size}_artifact"
        )
        t0 = time.perf_counter()
        export_poco(
            model, variables, smpl, artifact,
            batch_sizes=(batch_size,),
            platforms=tuple(args.platforms.split(",")),
        )
        print(f"exported -> {artifact} in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    loaded = load_exported(artifact)
    loaded._ensure_resident()
    fn = loaded._call_for(batch_size)

    rng = np.random.RandomState(0)
    batch = {
        "img": jnp.asarray(rng.randn(batch_size, 224, 224, 3), jnp.float32),
        "bbox_info": jnp.asarray(rng.randn(batch_size, 3), jnp.float32),
        "focal_length": jnp.full((batch_size,), 1118.0, jnp.float32),
        "scale": jnp.full((batch_size,), 1.2, jnp.float32),
        "center": jnp.full((batch_size, 2), 500.0, jnp.float32),
        "orig_shape": jnp.full((batch_size, 2), 1000.0, jnp.float32),
    }

    def chained_run(n: int) -> float:
        # Same ordering trick as bench.py: the tunnel's block_until_ready
        # does not await execution, so chain a scalar output into the
        # next input and fetch once at the end.
        img = batch["img"]
        out = None
        for _ in range(n):
            b = dict(batch)
            b["img"] = img
            out = fn(loaded.variables, loaded.smpl_arrays, b)
            img = img + 0.0 * out["pred_cam"][0, 0]
        return float(np.asarray(out["pred_cam"][0, 0]))

    chained_run(3)
    samples = []
    for _ in range(args.chains):
        t0 = time.perf_counter()
        chained_run(1)
        dt1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        chained_run(args.iters)
        dtn = time.perf_counter() - t0
        samples.append(
            batch_size / (max(dtn - dt1, 1e-6) / max(args.iters - 1, 1))
        )
    samples.sort()
    print(json.dumps({
        "metric": f"exported_{args.which}_crops_per_sec_per_chip",
        "value": round(float(np.median(samples)), 2),
        "unit": "crops/s/chip",
        "vs_baseline": round(float(np.median(samples)) / 250.0, 3),
        "spread": {"n_chains": len(samples),
                   "min": round(samples[0], 2),
                   "max": round(samples[-1], 2)},
    }))


if __name__ == "__main__":
    main()
