"""Headline benchmark: POCO-CLIFF inference throughput (crops/sec/chip).

Runs the flagship fused pipeline — normalized 224px crops through
HRNet-W48 -> CLIFF head -> SMPL LBS (full 6890-vertex mesh) -> projection
-> uncertainty head — as one jitted XLA program on the available device,
and reports crops/sec/chip.

Baseline contract (BASELINE.md): >2000 crops/sec on a v5e-8 for the
POCO-CLIFF demo, i.e. 250 crops/sec/chip. `vs_baseline` is
crops_per_sec_per_chip / 250.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from poco_tpu.utils.comp_cache import enable_compilation_cache

enable_compilation_cache()

BATCH = int(os.environ.get("POCO_BENCH_BATCH", "128"))
ITERS = int(os.environ.get("POCO_BENCH_ITERS", "20"))
WARMUP = 3
BASELINE_PER_CHIP = 250.0  # 2000 crops/s on 8 chips


def main():
    from poco_tpu.models.poco import build_poco_cliff, init_poco
    from poco_tpu.smpl.assets import synthetic_smpl_model

    from poco_tpu.config import model_config_from_hparams, update_hparams
    from poco_tpu.models.poco import POCO

    dtype = (
        jnp.bfloat16
        if os.environ.get("POCO_BENCH_BF16", "1") == "1"
        else jnp.float32
    )
    # POCO_BENCH_MODEL=pare benches the second config (POCO-PARE).
    which = os.environ.get("POCO_BENCH_MODEL", "cliff")
    cfg_file = f"configs/poco_{which}.yaml"
    model = POCO(
        cfg=model_config_from_hparams(update_hparams(cfg_file)), dtype=dtype
    )
    smpl = synthetic_smpl_model(num_verts=6890)
    variables = init_poco(model, jax.random.PRNGKey(0), smpl, batch_size=1)

    rng = np.random.RandomState(0)
    batch = {
        "img": jnp.asarray(rng.randn(BATCH, 224, 224, 3), jnp.float32),
        "bbox_info": jnp.asarray(rng.randn(BATCH, 3), jnp.float32),
        "focal_length": jnp.full((BATCH,), 1118.0, jnp.float32),
        "scale": jnp.full((BATCH,), 1.2, jnp.float32),
        "center": jnp.full((BATCH, 2), 500.0, jnp.float32),
        "orig_shape": jnp.full((BATCH, 2), 1000.0, jnp.float32),
    }

    @jax.jit
    def forward(variables, batch, smpl):
        return model.apply(variables, batch, smpl, train=False)

    def chained_run(n):
        """Sequentially-dependent forwards + final host fetch.

        Over the remote-TPU tunnel `block_until_ready` does not reliably
        wait for execution, so each iteration feeds a scalar from the
        previous output into the next input (forcing ordering) and the
        final fetch blocks on the whole chain.
        """
        img = batch["img"]
        out = None
        for _ in range(n):
            b = dict(batch)
            b["img"] = img
            out = forward(variables, b, smpl)
            img = img + 0.0 * out["pred_cam"][0, 0]
        return float(np.asarray(out["pred_cam"][0, 0]))

    chained_run(WARMUP)  # compile + warm

    # Subtract the fixed dispatch/fetch overhead (1-step chain) from the
    # long chain: t_iter = (t_N - t_1) / (N - 1). Take the median over
    # several chains and report the spread — the device is reached
    # through a shared tunnel and a single window can be polluted by
    # other tenants, so round-over-round comparisons need the
    # distribution, not one sample.
    n_chains = int(os.environ.get("POCO_BENCH_CHAINS", "5"))
    samples = []
    for _ in range(n_chains):
        t0 = time.perf_counter()
        chained_run(1)
        dt1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        chained_run(ITERS)
        dt_n = time.perf_counter() - t0
        samples.append(max(dt_n - dt1, 1e-6) / max(ITERS - 1, 1))

    # The jitted forward runs on exactly ONE device (no sharding), so
    # per-chip throughput is batch/time regardless of how many chips the
    # host exposes; dividing by device_count would under-report by
    # n_chips on multi-chip hosts.
    per_chip_samples = sorted(BATCH / t for t in samples)
    per_chip = float(np.median(per_chip_samples))
    print(
        json.dumps(
            {
                "metric": f"poco_{which}_crops_per_sec_per_chip",
                "value": round(per_chip, 2),
                "unit": "crops/s/chip",
                "vs_baseline": round(per_chip / BASELINE_PER_CHIP, 3),
                "spread": {
                    "n_chains": n_chains,
                    "min": round(per_chip_samples[0], 2),
                    "max": round(per_chip_samples[-1], 2),
                    "all": [round(s, 2) for s in per_chip_samples],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
