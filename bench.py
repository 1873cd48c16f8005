"""Headline benchmarks: POCO-CLIFF + POCO-PARE inference and the
bf16 training step, all as crops/sec/chip with median + spread.

Each inference bench runs the flagship fused pipeline — normalized 224px
crops through the backbone -> head -> SMPL LBS (full 6890-vertex mesh)
-> projection -> uncertainty head — as one jitted XLA program on the
available device. The train benches measure the full fwd+bwd+Adam step
for both shipped recipes (w48+CLIFF and w32+PARE, built from their
configs/ yaml, flow loss included) with the slope protocol.

Baseline contract (BASELINE.md): >2000 crops/sec on a v5e-8 for the
POCO-CLIFF demo, i.e. 250 crops/sec/chip. `vs_baseline` is
crops_per_sec_per_chip / 250 (the only driver-defined per-chip target;
the train metric reuses it as denominator for comparability).

Prints exactly ONE JSON line: the POCO-CLIFF headline, with the PARE and
train-step results under `extra_metrics` (VERDICT r2 #6: all three
tracked per round with spreads, so drifts are adjudicable).

Env knobs: POCO_BENCH_BATCH (128), POCO_BENCH_ITERS (20),
POCO_BENCH_CHAINS (5), POCO_BENCH_BF16 (1), POCO_BENCH_ONLY
(cliff|pare|train_cliff|train_pare|serving_loopback — single-metric
mode for manual runs).
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
N_CHAINS = int(os.environ.get("POCO_BENCH_CHAINS", "5"))


OUTLIER_TOL = float(os.environ.get("POCO_BENCH_OUTLIER_TOL", "0.05"))
MAX_RERUNS = int(os.environ.get("POCO_BENCH_MAX_RERUNS", "3"))


def _adjudicate_chains(
    samples: list[float], sample_fn, tol: float = OUTLIER_TOL,
    max_reruns: int = MAX_RERUNS,
) -> tuple[list[float], dict]:
    """Self-adjudicating spread: chains deviating >tol from the median
    are re-run (bounded), and the verdict rides in the JSON so the
    driver artifact can't silently contradict the in-repo spread claims
    (VERDICT r4 weak #2: one PARE train chain landed 15% below median
    with nothing in the artifact flagging it)."""
    samples = list(samples)
    info: dict = {"outliers_rerun": [], "rerun_values": []}
    for _ in range(max_reruns):
        med = float(np.median(samples))
        dev = [abs(s - med) / med for s in samples]
        worst = int(np.argmax(dev))
        if dev[worst] <= tol:
            break
        info["outliers_rerun"].append(round(samples[worst], 2))
        samples.pop(worst)
        new = float(sample_fn())
        info["rerun_values"].append(round(new, 2))
        samples.append(new)
    med = float(np.median(samples))
    residual = [s for s in samples if abs(s - med) / med > tol]
    if not info["outliers_rerun"] and not residual:
        info["verdict"] = "clean"
    elif not residual:
        info["verdict"] = "outliers_replaced"
    else:
        info["verdict"] = "unstable"
        info["residual_outliers"] = [round(s, 2) for s in residual]
    info["tol_pct"] = tol * 100
    return samples, info


def _summarize(
    name: str, unit: str, per_chip_samples: list[float],
    adjudication: dict | None = None,
) -> dict:
    per_chip_samples = sorted(per_chip_samples)
    per_chip = float(np.median(per_chip_samples))
    spread = {
        "n_chains": len(per_chip_samples),
        "min": round(per_chip_samples[0], 2),
        "max": round(per_chip_samples[-1], 2),
        "all": [round(s, 2) for s in per_chip_samples],
    }
    if adjudication is not None:
        spread.update(adjudication)
    return {
        "metric": name,
        "value": round(per_chip, 2),
        "unit": unit,
        "vs_baseline": round(per_chip / BASELINE_PER_CHIP, 3),
        "spread": spread,
    }


def bench_inference(which: str, dtype) -> dict:
    from poco_tpu.config import model_config_from_hparams, update_hparams
    from poco_tpu.models.poco import POCO, init_poco
    from poco_tpu.smpl.assets import synthetic_smpl_model

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
    # long chain: t_iter = (t_N - t_1) / (N - 1). Median over several
    # chains with the spread reported — the device sits behind a shared
    # tunnel, so single windows can be polluted by other tenants.
    def one_chain() -> float:
        t0 = time.perf_counter()
        chained_run(1)
        dt1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        chained_run(ITERS)
        dt_n = time.perf_counter() - t0
        return BATCH / (max(dt_n - dt1, 1e-6) / max(ITERS - 1, 1))

    samples = [one_chain() for _ in range(N_CHAINS)]
    samples, adjudication = _adjudicate_chains(samples, one_chain)

    # The jitted forward runs on exactly ONE device (no sharding), so
    # per-chip throughput is batch/time regardless of how many chips the
    # host exposes.
    return _summarize(
        f"poco_{which}_crops_per_sec_per_chip", "crops/s/chip", samples,
        adjudication,
    )


def bench_train_step(which: str, dtype) -> dict:
    from poco_tpu.config import (
        loss_config_from_hparams,
        model_config_from_hparams,
        update_hparams,
    )
    from poco_tpu.models.poco import POCO, init_poco, make_dummy_batch
    from poco_tpu.smpl.assets import synthetic_smpl_model
    from poco_tpu.train.state import create_train_state, make_optimizer
    from poco_tpu.train.step import make_train_step

    # 128/chip is the recommended production batch on v5e (measured +39%
    # crops/s over the reference's V100-era 64/GPU; BENCHMARKS.md r3).
    B = int(os.environ.get("POCO_BENCH_TRAIN_BATCH", "128"))
    hparams = update_hparams(f"configs/poco_{which}.yaml")
    model = POCO(cfg=model_config_from_hparams(hparams), dtype=dtype)
    smpl = synthetic_smpl_model(num_verts=6890)
    variables = init_poco(model, jax.random.PRNGKey(0), smpl, batch_size=1)
    state = create_train_state(model, variables, make_optimizer(lr=1e-4))
    # donate=True is the Trainer's production configuration (train/
    # trainer.py:132). The state is THREADED through every step below —
    # never copied: round-3's protocol re-copied the full ~840 MB
    # params+Adam tree per timed window (thousands of small tunnel
    # transfers), which was the dominant source of its ±12% spread
    # (BENCHMARKS.md r4 adjudication).
    loss_cfg = loss_config_from_hparams(hparams)
    train_step = make_train_step(model, loss_cfg, donate=True)
    batch = make_dummy_batch(model.cfg, B, include_gt=True)
    batch.update(
        pose=jnp.zeros((B, 72), jnp.float32),
        betas=jnp.zeros((B, 10), jnp.float32),
        has_smpl=jnp.ones((B,), jnp.float32),
        has_pose_3d=jnp.ones((B,), jnp.float32),
        keypoints=jnp.zeros((B, 49, 3), jnp.float32),
    )
    if loss_cfg.keypoint2d_noncrop:
        # The CLIFF recipe supervises full-image keypoints
        # (KEYPOINT_2D_NONCROP, losses.py:224-237); the dataset supplies
        # this key in real training.
        batch["keypoints_fullimg"] = jnp.zeros((B, 49, 3), jnp.float32)
    rng = jax.random.PRNGKey(1)
    state_box = [state]

    def run(n):
        s = state_box[0]
        m = None
        for _ in range(n):
            s, m = train_step(s, batch, smpl, rng)
        state_box[0] = s
        # Scalar fetch blocks on the whole chain (states are
        # sequentially dependent through donation).
        return float(m["loss/total_loss"])

    run(2)  # compile + warm

    def one_chain() -> float:
        t0 = time.perf_counter()
        run(2)
        d2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(12)
        d12 = time.perf_counter() - t0
        return B / (max(d12 - d2, 1e-9) / 10)

    samples = [one_chain() for _ in range(N_CHAINS)]
    samples, adjudication = _adjudicate_chains(samples, one_chain)
    return _summarize(
        f"poco_{which}_train_step_crops_per_sec_per_chip",
        "crops/s/chip", samples, adjudication,
    )


def bench_serving_loopback() -> dict:
    """Weather-proof serving-PATH regression number (VERDICT r4 #5).

    Runs tools/bench_serving.py --loopback in a subprocess: tiny backbone
    forced onto XLA:CPU, in-process localhost HTTP — no axon tunnel in
    the loop (the tunnel RTT swings 20x between sessions, so the chip
    serving numbers cannot trend round over round; BENCHMARKS.md
    "Serving under load"). The subprocess isolates the platform override
    from this process's TPU backend. Protocol measured to the ≤5%-spread
    bar on this 1-core host: 1 sequential client x 8-crop requests,
    window 0 (no dead coalescence wait), GC off during windows, median
    of 5 with bench-discipline outlier re-runs.
    """
    import subprocess
    import sys

    cmd = [
        sys.executable, "tools/bench_serving.py", "--loopback",
        "--combos", "1x8", "--requests-per-client", "150",
        "--repeats", "5", "--window-ms", "0",
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=900,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        summary = None
        for line in proc.stdout.splitlines():
            if '"combo"' in line:
                summary = json.loads(line)
        if proc.returncode != 0 or summary is None:
            raise RuntimeError(
                f"rc={proc.returncode} stderr={proc.stderr[-400:]}"
            )
    except Exception as e:  # noqa: BLE001 — never cost the chip metrics
        return {
            "metric": "serving_loopback_crops_per_sec",
            "value": None, "unit": "crops/s",
            "error": f"{type(e).__name__}: {e}"[:400],
        }
    runs = sorted(summary["runs"])
    spread = {
        "n_chains": len(runs),
        "min": round(runs[0], 2),
        "max": round(runs[-1], 2),
        "all": [round(s, 2) for s in runs],
        "spread_pct": summary.get("spread_pct"),
        "verdict": summary.get("verdict"),
        "tol_pct": summary.get("tol_pct"),
    }
    if summary.get("outliers_rerun"):
        spread["outliers_rerun"] = summary["outliers_rerun"]
        spread["rerun_values"] = summary["rerun_values"]
    return {
        "metric": "serving_loopback_crops_per_sec",
        "value": summary["median_crops_per_s"],
        "unit": "crops/s",
        # Its own trend anchor: the serving path has no per-chip
        # baseline (the reference has no serving surface); r5 sets the
        # first value, later rounds trend against it.
        "vs_baseline": None,
        "spread": spread,
    }


def _await_backend(max_tries: int = 5, sleep_s: float = 60.0) -> None:
    """Retry backend init through transient tunnel outages.

    The axon TPU tunnel can drop and return (observed: multi-hour
    outage 2026-08-17); the driver runs this script exactly once per
    round, so a single failed init must not cost the round's benchmark
    artifact. Bounded: ~5 minutes of retries, then the original error.
    """
    for attempt in range(max_tries):
        try:
            jax.devices()
            return
        except RuntimeError:
            if attempt == max_tries - 1:
                raise
            print(
                f"backend init failed (attempt {attempt + 1}/{max_tries}),"
                f" retrying in {sleep_s:.0f}s",
                flush=True,
            )
            time.sleep(sleep_s)


def main():
    only = os.environ.get("POCO_BENCH_ONLY", "")
    if only == "serving_loopback":
        # CPU-only by construction — must not require the TPU tunnel
        # (this metric exists precisely for tunnel-outage weather).
        print(json.dumps(bench_serving_loopback()))
        return
    _await_backend()
    dtype = (
        jnp.bfloat16
        if os.environ.get("POCO_BENCH_BF16", "1") == "1"
        else jnp.float32
    )
    if only in ("train", "train_cliff"):
        print(json.dumps(bench_train_step("cliff", dtype)))
        return
    if only == "train_pare":
        print(json.dumps(bench_train_step("pare", dtype)))
        return
    if only in ("cliff", "pare"):
        print(json.dumps(bench_inference(only, dtype)))
        return

    headline = bench_inference("cliff", dtype)
    extras = [
        bench_inference("pare", dtype),
        bench_train_step("cliff", dtype),
        bench_train_step("pare", dtype),
        bench_serving_loopback(),
    ]
    headline["extra_metrics"] = extras
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
