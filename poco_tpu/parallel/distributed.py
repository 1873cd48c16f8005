"""Multi-process (multi-host) runtime helpers.

The reference is multi-node out of the box through PyTorch-Lightning DDP
(/root/reference/train.py:81-96, config.py:152-154: NCCL ranks, rank-0
gating via pocolib/utils/train_utils.py:161-184). The TPU-native
equivalent (SURVEY.md §5.8) is still ONE SPMD program — a global
`jax.sharding.Mesh` spanning every chip of every process — plus:

  * `jax.distributed.initialize(...)` before first device use, so the
    processes form one runtime (ICI within a slice, DCN across slices;
    Gloo on CPU for tests);
  * each process feeds only its local shard of the global batch
    (`jax.make_array_from_process_local_data`), replacing DDP's
    per-rank loaders;
  * `process_index() == 0` gates logging / checkpoint sidecars /
    result dumps, replacing `is_main_process()`;
  * cross-process reductions ride the same XLA collectives the
    single-process path already uses (psum inside the jitted step).

Launch contract (documented in README + utils/cluster.py): either run
under a TPU pod runtime where `jax.distributed.initialize()` needs no
arguments, or set

    POCO_COORDINATOR=host:port  POCO_NUM_PROCESSES=N  POCO_PROCESS_ID=i

(one process per host). `maybe_initialize()` is a no-op when none of
these are present, so single-process behavior is unchanged.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

_initialized = False


def maybe_initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
    auto: bool = False,
) -> bool:
    """Initialize the JAX distributed runtime if configured.

    Explicit arguments win; otherwise the POCO_* env vars are used;
    `auto=True` (train.py --dist) initializes with no arguments, letting
    JAX detect the pod topology from the TPU runtime. With none of
    these this is a no-op (single-process run). Returns True when
    running multi-process.
    """
    global _initialized

    coordinator = coordinator or os.environ.get("POCO_COORDINATOR")
    if num_processes is None and os.environ.get("POCO_NUM_PROCESSES"):
        num_processes = int(os.environ["POCO_NUM_PROCESSES"])
    if process_id is None and os.environ.get("POCO_PROCESS_ID"):
        process_id = int(os.environ["POCO_PROCESS_ID"])

    if coordinator is None and num_processes is None and not auto:
        # No topology configured: single-process run. Deciding this
        # must not touch jax — initialize() is illegal after any call
        # that spins up the XLA backend (even jax.process_count()).
        # A dangling POCO_PROCESS_ID alone is a broken launcher (the
        # coordinator/num_processes vars were lost): every host would
        # silently train independently, each believing it is rank 0.
        if process_id is not None:
            raise ValueError(
                "POCO_PROCESS_ID is set but POCO_COORDINATOR / "
                "POCO_NUM_PROCESSES are not — refusing to fall back to "
                "independent single-process runs; fix the launcher env"
            )
        return False
    partial = (coordinator is None or num_processes is None
               or process_id is None)
    any_set = (coordinator is not None or num_processes is not None
               or process_id is not None)
    if partial and (not auto or any_set):
        # auto=True only means "let JAX detect the pod topology" when NO
        # explicit topology is present. A partially-set POCO_* env (e.g.
        # a stale POCO_COORDINATOR with no POCO_NUM_PROCESSES) must fail
        # fast, not leak a mix of explicit and None args into
        # jax.distributed.initialize.
        raise ValueError(
            "incomplete multi-process topology: need ALL of "
            "POCO_COORDINATOR, POCO_NUM_PROCESSES, POCO_PROCESS_ID "
            "(or, with --dist, none of them for pod auto-detection) "
            f"(got coordinator={coordinator!r}, "
            f"num_processes={num_processes!r}, process_id={process_id!r})"
        )

    # The platform override must land BEFORE the distributed runtime
    # forms: initializing with the (tunneled, single-chip) TPU plugin
    # visible makes N processes claim the same physical chip and hang.
    # POCO_TPU_PLATFORM=cpu + the POCO_* topology is the supported way
    # to run multi-process CLIs on CPU (tests, TPU-less hosts).
    from ..utils.comp_cache import force_platform_from_env

    force_platform_from_env()

    import jax

    if _initialized:
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return jax.process_count() > 1


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    """Rank-0 gate (reference train_utils.py:167-170)."""
    import jax

    return jax.process_index() == 0


def local_shard_bounds(global_batch: int) -> tuple[int, int]:
    """Row range [lo, hi) of the global batch owned by this process.

    The global mesh lists devices process-major (jax.devices() orders by
    process index), so with the batch axis sharded over the whole mesh,
    process p owns the p-th contiguous slice of rows.
    """
    import jax

    n, p = jax.process_count(), jax.process_index()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{n} processes"
        )
    per = global_batch // n
    return p * per, (p + 1) * per


def global_batch_from_local(
    local_batch: dict[str, Any], mesh, global_batch: int
) -> dict[str, Any]:
    """Assemble global sharded arrays from this process's local rows.

    Every process passes its own shard (local rows only); the result is
    a dict of global `jax.Array`s with the leading dim sharded over the
    mesh's data axis — the multi-process replacement for
    `parallel.mesh.shard_batch`.
    """
    import jax

    from .mesh import batch_sharding

    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, (global_batch,) + x.shape[1:]
        )

    return {k: put(v) for k, v in local_batch.items()}


def allgather(tree: Any) -> Any:
    """Gather a (possibly multi-process global) tree to every process.

    tiled=True assembles each global sharded array into its full value
    (rather than stacking per-process copies) — the semantics every
    caller here wants (trainer._fetch, eval runner metric fetches).
    Reference analogue: the rank-0 accumulation save_results.py
    disables for NUM_GPUS>1 — here eval metrics survive multi-process.
    Collective: every process must call it at the same point.
    """
    import jax

    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)


def barrier(name: str = "poco_sync") -> None:
    """Cross-process sync point (reference train_utils.py:173-184)."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
