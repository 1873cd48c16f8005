"""Multi-process (multi-host-shaped) training correctness.

The reference gets multi-node training from PyTorch-Lightning DDP
(/root/reference/train.py:81-96, NCCL ranks + rank-0 gating in
pocolib/utils/train_utils.py:161-184) and never tests it. Here the
TPU-native equivalent — one SPMD program over a global mesh spanning
several JAX processes (SURVEY §5.8) — is tested for METRIC EQUALITY:
the same tiny-smoke training run must produce the same per-step losses,
validation metrics, and final parameters whether it runs as one process
owning 8 virtual CPU devices or as two processes owning 4 each
(jax.distributed over Gloo, per-process loader shards).

Subprocess-based: the JAX distributed runtime can only be initialized
once per process, so each topology runs in fresh interpreters.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def smoke_data():
    if not os.path.exists(
        os.path.join(REPO, "data", "dataset_extras", "smoke_train.npz")
    ):
        subprocess.run(
            [sys.executable, "tools/make_smoke_data.py", "--n", "8"],
            cwd=REPO, check=True,
        )
    return os.path.join(REPO, "data")


def _worker_env() -> dict:
    env = dict(os.environ)
    # the worker sets its own device count; drop the test-process flags
    env.pop("XLA_FLAGS", None)
    return env


def _run_single(outdir: str, data_dir: str) -> dict:
    subprocess.run(
        [sys.executable, WORKER, "--nprocs", "1", "--devices", "8",
         "--outdir", outdir, "--data_dir", data_dir],
        cwd=REPO, check=True, env=_worker_env(), timeout=1200,
    )
    with open(os.path.join(outdir, "results.json")) as f:
        return json.load(f)


def _run_pair(outdir: str, data_dir: str) -> dict:
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--nprocs", "2", "--proc_id", str(i),
             "--port", str(port), "--devices", "4",
             "--outdir", outdir, "--data_dir", data_dir],
            cwd=REPO, env=_worker_env(),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, (
            f"worker failed (rc={p.returncode}):\n{out[-4000:]}"
        )
    with open(os.path.join(outdir, "results.json")) as f:
        return json.load(f)


def test_partial_topology_env_fails_fast(monkeypatch):
    """A launcher that loses POCO_COORDINATOR/POCO_NUM_PROCESSES but
    keeps POCO_PROCESS_ID must NOT fall back to independent
    single-process runs (every host would believe it is rank 0)."""
    from poco_tpu.parallel import distributed as dist

    monkeypatch.delenv("POCO_COORDINATOR", raising=False)
    monkeypatch.delenv("POCO_NUM_PROCESSES", raising=False)
    monkeypatch.setenv("POCO_PROCESS_ID", "1")
    with pytest.raises(ValueError, match="POCO_PROCESS_ID is set"):
        dist.maybe_initialize()
    # coordinator+id without num_processes: incomplete, also fatal
    monkeypatch.setenv("POCO_COORDINATOR", "host0:7701")
    with pytest.raises(ValueError, match="incomplete"):
        dist.maybe_initialize()


@pytest.mark.slow
def test_two_process_training_matches_single(smoke_data, tmp_path):
    single = _run_single(str(tmp_path / "single"), smoke_data)
    pair = _run_pair(str(tmp_path / "pair"), smoke_data)

    assert single["process_count"] == 1 and single["n_devices"] == 8
    assert pair["process_count"] == 2 and pair["n_devices"] == 8

    # Same number of optimizer steps (global batch semantics preserved).
    assert len(pair["losses"]) == len(single["losses"]) > 0

    # Per-step training losses: identical math modulo collective
    # reduction order (Gloo ring vs single-process all-reduce).
    np.testing.assert_allclose(
        pair["losses"], single["losses"], rtol=2e-4,
        err_msg="per-step training losses diverge between 1-proc and "
                "2-proc runs",
    )

    # Validation metrics computed through the collective-gather path.
    for key in ("mpjpe", "pa_mpjpe", "v2v"):
        if key in single["val"]:
            np.testing.assert_allclose(
                pair["val"][key], single["val"][key], rtol=2e-4,
                err_msg=f"val {key} diverges",
            )

    # Final parameters (post-update, replicated) agree.
    np.testing.assert_allclose(
        pair["param_sum"], single["param_sum"], rtol=1e-5,
        err_msg="final parameter checksum diverges",
    )


def _run_eval_cli(outdir: str, data_dir: str, nprocs: int,
                  devices: int) -> dict:
    """Drive the real eval.py CLI under an n-process CPU topology."""
    os.makedirs(outdir, exist_ok=True)
    out_json = os.path.join(outdir, "report.json")
    base_env = _worker_env()
    base_env["POCO_TPU_PLATFORM"] = "cpu"
    base_env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices}"
    )
    cmd = [
        sys.executable, "eval.py", "--cfg", "configs/tiny_smoke.yaml",
        "--dataset", "smoke", "--data_dir", data_dir,
        "--batch_size", "8", "--out", out_json,
    ]
    if nprocs == 1:
        subprocess.run(cmd, cwd=REPO, check=True, env=base_env,
                       timeout=1200)
    else:
        port = _free_port()
        procs = []
        for i in range(nprocs):
            env = dict(base_env)
            env["POCO_COORDINATOR"] = f"localhost:{port}"
            env["POCO_NUM_PROCESSES"] = str(nprocs)
            env["POCO_PROCESS_ID"] = str(i)
            procs.append(subprocess.Popen(
                cmd, cwd=REPO, env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            ))
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=1200)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out.decode(errors="replace"))
        for p, out in zip(procs, outs):
            assert p.returncode == 0, (
                f"eval worker failed (rc={p.returncode}):\n{out[-4000:]}"
            )
        # rank-0 gating: exactly one process printed the report
        printed = [o for o in outs if '"summary"' in o]
        assert len(printed) == 1, "report must print on rank 0 only"
    with open(out_json) as f:
        return json.load(f)


@pytest.mark.slow
def test_two_process_eval_matches_single(smoke_data, tmp_path):
    """eval.py --dist contract (reference eval.py:28-34 is single-GPU
    only; SURVEY §5.8 / BASELINE configs[5] want the sharded eval):
    the full report — summary metrics AND pw3d splits — from
    2 processes x 4 devices equals the 1 process x 8 devices one."""
    single = _run_eval_cli(str(tmp_path / "sp"), smoke_data, 1, 8)
    pair = _run_eval_cli(str(tmp_path / "mp"), smoke_data, 2, 4)

    for key in ("mpjpe", "pa_mpjpe", "v2v"):
        np.testing.assert_allclose(
            pair["summary"][key], single["summary"][key], rtol=2e-4,
            err_msg=f"summary {key} diverges 1-proc vs 2-proc",
        )
    assert pair["splits"].keys() == single["splits"].keys()
    for split, row in single["splits"].items():
        for key, val in row.items():
            if isinstance(val, (int, float)):
                np.testing.assert_allclose(
                    pair["splits"][split][key], val, rtol=2e-4,
                    err_msg=f"split {split}/{key} diverges",
                )
