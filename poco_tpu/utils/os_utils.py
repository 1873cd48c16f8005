"""Reproducibility helpers: code snapshot into the logdir.

Reference contract: pocolib/utils/os_utils.py:9-31.
"""

from __future__ import annotations

import os
import os.path as osp
import shutil


def project_root() -> str:
    return osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


def copy_code(
    output_folder: str,
    curr_folder: str | None = None,
    code_folder: str = "code",
) -> str:
    """Snapshot the framework sources into <logdir>/code for exact
    reproducibility of a run."""
    curr_folder = curr_folder or project_root()
    dst = osp.join(output_folder, code_folder)
    os.makedirs(dst, exist_ok=True)
    for item in ("poco_tpu", "train.py", "eval.py", "demo.py", "bench.py"):
        src = osp.join(curr_folder, item)
        if not osp.exists(src):
            continue
        target = osp.join(dst, item)
        if osp.isdir(src):
            shutil.copytree(
                src, target, dirs_exist_ok=True,
                ignore=shutil.ignore_patterns("__pycache__"),
            )
        else:
            shutil.copy2(src, target)
    return dst
