"""Cluster launch helper: grid-search array jobs as shell scripts.

The reference submits HTCondor array jobs, one per grid-search
experiment, each running `train.py --cfg_id $Process`
(pocolib/utils/cluster.py:28-82). HTCondor is site-specific; the
TPU-native equivalent emits a portable launcher script (plain bash loop
or SLURM array file) with the same contract: N experiments from one
YAML, one process per cfg_id.
"""

from __future__ import annotations

import os
import stat

import yaml


def num_experiments(cfg_file: str) -> int:
    from ..config import get_grid_search_configs

    with open(cfg_file) as f:
        cfg = yaml.safe_load(f)
    experiments, _ = get_grid_search_configs(cfg)
    return len(experiments)


def write_launcher(
    cfg_file: str,
    out_dir: str = "scripts",
    script: str = "train.py",
    scheduler: str = "bash",
    tpu_topology: str = "",
) -> str:
    """Write a launcher running every grid-search experiment.

    Args:
        scheduler: "bash" (sequential local loop) or "slurm" (array job).
    Returns the launcher path.
    """
    n = num_experiments(cfg_file)
    os.makedirs(out_dir, exist_ok=True)
    name = os.path.splitext(os.path.basename(cfg_file))[0]

    if scheduler == "slurm":
        path = os.path.join(out_dir, f"{name}.sbatch")
        body = (
            "#!/bin/bash\n"
            f"#SBATCH --array=0-{n - 1}\n"
            f"#SBATCH --job-name={name}\n"
            + (f"#SBATCH --constraint={tpu_topology}\n" if tpu_topology else "")
            + f"python {script} --cfg {cfg_file} --cfg_id $SLURM_ARRAY_TASK_ID\n"
        )
    else:
        path = os.path.join(out_dir, f"{name}.sh")
        body = (
            "#!/bin/bash\nset -e\n"
            f"for i in $(seq 0 {n - 1}); do\n"
            f"  python {script} --cfg {cfg_file} --cfg_id $i\n"
            "done\n"
        )
    with open(path, "w") as f:
        f.write(body)
    os.chmod(path, os.stat(path).st_mode | stat.S_IXUSR)
    return path


def write_multihost_launcher(
    cfg_file: str,
    num_hosts: int,
    out_dir: str = "scripts",
    script: str = "train.py",
    coordinator_port: int = 7701,
) -> str:
    """Write the multi-host (multi-process) training launcher.

    One JAX process per host, all forming ONE SPMD program over the
    global mesh (parallel/distributed.py). Contract: run the emitted
    script on every host as `./<name>.multihost.sh <host_index>
    <coordinator_hostname>`; host 0's hostname is the coordinator. On a
    TPU pod runtime none of this is needed — `python train.py --dist`
    auto-detects the topology.

    Reference analogue: PL DDP's NCCL rank spawn
    (/root/reference/train.py:81-96, config.py:152-154).
    """
    os.makedirs(out_dir, exist_ok=True)
    name = os.path.splitext(os.path.basename(cfg_file))[0]
    path = os.path.join(out_dir, f"{name}.multihost.sh")
    body = (
        "#!/bin/bash\n"
        "# usage (on EVERY host, i = 0..N-1): "
        f"./{os.path.basename(path)} <i> <host0-hostname>\n"
        "set -e\n"
        'PROC_ID="${1:?process id (0..'
        f"{num_hosts - 1}"
        ')}"\n'
        'COORD_HOST="${2:?coordinator hostname (host 0)}"\n'
        f'export POCO_COORDINATOR="$COORD_HOST:{coordinator_port}"\n'
        f"export POCO_NUM_PROCESSES={num_hosts}\n"
        'export POCO_PROCESS_ID="$PROC_ID"\n'
        f"python {script} --cfg {cfg_file}\n"
    )
    with open(path, "w") as f:
        f.write(body)
    os.chmod(path, os.stat(path).st_mode | stat.S_IXUSR)
    return path
