"""Dataset mixing: ratio-sampled multi-dataset training.

Reference contracts:
  * EFTMixedDataset — "h36m_coco_mpii_0.5_0.3_0.2" DSL parsed into
    datasets + cumulative ratios, per-item random dataset pick
    (pocolib/dataset/eft_dataset.py:11-37);
  * MixedDataset — the legacy SPIN 6-dataset 30/60/10 partition
    (pocolib/dataset/mixed_dataset.py:12-36);
  * STAGE_DATASETS — "0+h36m_1.0,10+h36m_coco_0.5_0.5" per-epoch
    curriculum switching (pocolib/core/trainer.py:640-654).
"""

from __future__ import annotations

import inspect

import numpy as np


def parse_datasets_and_ratios(spec: str) -> tuple[list[str], list[float]]:
    """'h36m_coco_0.6_0.4' -> (['h36m', 'coco'], [0.6, 0.4])."""
    parts = spec.split("_")
    n = len(parts) // 2
    names, ratios = parts[:n], [float(p) for p in parts[n:]]
    if len(names) != len(ratios):
        raise ValueError(f"dataset/ratio mismatch in {spec!r}")
    return names, ratios


def parse_stage_datasets(spec: str) -> dict[int, str]:
    """'0+h36m_1.0,10+h36m_coco_0.5_0.5' -> {0: 'h36m_1.0', 10: ...}."""
    stages = {}
    for part in spec.split(","):
        if not part:
            continue
        epoch, ds = part.split("+", 1)
        stages[int(epoch)] = ds
    return stages


def stage_for_epoch(stages: dict[int, str], epoch: int) -> str | None:
    """The curriculum spec active at `epoch` (latest stage <= epoch)."""
    active = None
    for start in sorted(stages):
        if epoch >= start:
            active = stages[start]
    return active


class RatioMixedDataset:
    """Ratio-sampled mixture; length = max member length.

    Each __getitem__ draws a dataset by cumulative ratio and indexes it
    modulo its length (reference eft_dataset.py:30-34).
    """

    def __init__(self, datasets: list, ratios: list[float], seed: int = 0):
        if len(datasets) != len(ratios):
            raise ValueError("dataset/ratio mismatch")
        self.datasets = datasets
        self.cum_ratios = np.cumsum(np.asarray(ratios, np.float64))
        self.rng = np.random.RandomState(seed)
        self.length = max(len(d) for d in datasets)

    def __len__(self) -> int:
        return self.length

    def _pick(self) -> int:
        p = self.rng.rand()
        for i, edge in enumerate(self.cum_ratios):
            if p <= edge:
                return i
        return len(self.datasets) - 1

    def __getitem__(self, index: int):
        i = self._pick()
        return self.datasets[i][index % len(self.datasets[i])]

    def get_batch(self, indices, keep=None) -> dict:
        """Whole-batch fast path: draw the per-item dataset choices, then
        let each member batch its share natively (PocoDataset.get_batch —
        the threaded C++ decode path); reassemble in request order.

        Without this, every mixed-dataset run (the reference's standard
        DATASETS_AND_RATIOS training setup) silently fell back to
        per-item cv2 decode.

        keep: optional positions (slice or index list) to materialize,
        for sharded multi-process loading. Dataset picks are drawn for
        EVERY index (so the global batch composition is identical on
        all processes and to a single-process run), member datasets
        consume their per-row randomness over their full global share,
        and only the kept rows are decoded. The result then carries
        '_global_row_names' (member dataset_name per GLOBAL row).
        """
        from .dataset import collate

        indices = [int(i) for i in indices]
        choices = [self._pick() for _ in indices]
        if keep is None:
            sel = list(range(len(indices)))
            gnames = None
        else:
            gnames = [
                getattr(self.datasets[c], "dataset_name", f"ds{c}")
                for c in choices
            ]
            sel = (
                list(range(len(indices)))[keep]
                if isinstance(keep, slice)
                else [int(k) for k in keep]
            )
        slot = {k: j for j, k in enumerate(sel)}  # global pos -> out row
        items: list = [None] * len(sel)
        for di, ds in enumerate(self.datasets):
            pos = [k for k, c in enumerate(choices) if c == di]
            if not pos:
                continue
            local = [indices[k] % len(ds) for k in pos]
            kept = [r for r, k in enumerate(pos) if k in slot]
            sub_get = getattr(ds, "get_batch", None)
            if sub_get is not None and len(kept) == len(pos):
                # full share kept (single-process / keep=None): the
                # pre-keep call path, bit-identical member RNG use
                sub = sub_get(local)
                for j, k in enumerate(pos):
                    items[slot[k]] = {
                        key: sub[key][j] for key in sub
                    }
            elif sub_get is not None and (
                "keep" in inspect.signature(sub_get).parameters
            ):
                # partial share: member consumes randomness for its
                # WHOLE global share, materializes only kept rows
                sub = sub_get(local, keep=kept)
                keys = [k for k in sub if k != "_global_row_names"]
                for j, r in enumerate(kept):
                    items[slot[pos[r]]] = {key: sub[key][j] for key in keys}
            else:
                for r in kept:
                    items[slot[pos[r]]] = ds[local[r]]
        batch = collate(items)
        if gnames is not None:
            batch["_global_row_names"] = gnames
        return batch


def spin_mixed_partition(dataset_lengths: list[int]) -> list[float]:
    """The legacy SPIN 30% H36M / 60% ITW / 10% MPI-INF split
    (mixed_dataset.py:19-28). Expects the 6 canonical datasets in order
    [h36m, lsp-orig, mpii, lspet, coco, mpi-inf-3dhp]."""
    itw = sum(dataset_lengths[1:-1])
    return [0.3] + [0.6 * n / itw for n in dataset_lengths[1:-1]] + [0.1]
