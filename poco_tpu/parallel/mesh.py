"""Device mesh and sharding helpers.

The reference scales with PyTorch-Lightning DDP over NCCL
(train.py:81-96, pocolib/utils/train_utils.py:161-184). The TPU-native
equivalent is one SPMD program: a 1-D `jax.sharding.Mesh` over all chips,
the batch dimension sharded along it ("data"), parameters replicated, and
XLA inserting the gradient/metric collectives (psum over ICI).

POCO has no sequence axis (fixed 224px crops — SURVEY.md §5.7), so data
parallelism over the crop batch is the full parallelism story; these
helpers also expose a second "model" axis for optional tensor sharding of
the backbone at very large batch-per-chip counts.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    devices: list | None = None,
) -> Mesh:
    """A ("data", "model") mesh; model axis size 1 = pure data parallel."""
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by mp={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    """Device-put a host batch with the leading dim sharded over chips."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "ndim") and x.ndim > 0 else x,
        batch,
    )


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_smpl_params(smpl, mesh: Mesh):
    """Shard the SMPL weights over the "model" axis (vertex dimension).

    The body model is the one genuinely tensor-shardable component of
    this workload: every LBS stage is an einsum over the vertex dimension
    (V = 6890), so placing V on the "model" axis splits the blendshape /
    skinning matmuls across chips and XLA inserts the gathers for the
    few cross-shard reads (vertex keypoints, extra-joint regression).
    With model axis size 1 this is a no-op (pure data parallelism, the
    reference's only strategy — SURVEY §2.5).
    """
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return smpl.replace(
        v_template=put(smpl.v_template, P(MODEL_AXIS, None)),
        shapedirs=put(smpl.shapedirs, P(MODEL_AXIS, None, None)),
        posedirs=put(smpl.posedirs, P(None, MODEL_AXIS)),
        j_regressor=put(smpl.j_regressor, P(None, MODEL_AXIS)),
        lbs_weights=put(smpl.lbs_weights, P(MODEL_AXIS, None)),
        j_regressor_extra=put(smpl.j_regressor_extra, P(None, MODEL_AXIS)),
        faces=put(smpl.faces, P()),
    )


def pad_to_multiple(
    arr: np.ndarray, multiple: int, axis: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Pad the batch axis to a multiple of the mesh size.

    Returns (padded, valid_mask). Per-image detection counts vary at demo
    time (reference tester.py:178); padded fixed-size batches with
    validity masks avoid XLA recompilation (SURVEY.md §7.3).
    """
    n = arr.shape[axis]
    target = -(-n // multiple) * multiple
    pad = target - n
    mask = np.ones(target, bool)
    if pad:
        widths = [(0, 0)] * arr.ndim
        widths[axis] = (0, pad)
        arr = np.pad(arr, widths, mode="edge")
        mask[n:] = False
    return arr, mask
