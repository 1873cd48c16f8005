"""Training orchestration: the reference LitModule, re-expressed as a
plain JAX loop.

Reference contract: pocolib/core/trainer.py:28-708. Responsibilities and
their TPU-native forms:

  * model/loss/dataset construction from the hparams tree;
  * per-epoch stage curricula (STAGE_DATASETS) via dataset factories;
  * freeze schedules (FREEZE_PARAMS): the optimizer is rebuilt at the
    scheduled epochs with zero-LR partitions (reference rebuilds the
    torch optimizer, trainer.py:192-208);
  * GT-pose-conditioning row selection, done host-side per batch
    (reference poco_head.py:101-107 does numpy string matching);
  * data-parallel SPMD steps over the device mesh (replaces PL DDP);
  * validation -> composite best-model criterion
    0.5*(1.5*PA-MPJPE + MPJPE) with uncertainty-correlation tie-break
    (trainer.py:407-442);
  * orbax checkpointing + resume, JSONL metric logs, per-epoch val
    accuracy history (trainer.py:704-708), crops/sec telemetry.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    CfgNode,
    loss_config_from_hparams,
    model_config_from_hparams,
    parse_freeze_params,
    parse_module_lr,
)
from ..models.poco import POCO, init_poco
from ..ops.preprocess import normalize_image
from ..parallel import distributed as dist
from ..parallel.mesh import make_mesh, replicate_tree, shard_batch
from ..smpl.lbs import SmplParams
from .state import create_train_state, make_optimizer
from .step import make_train_step


def select_gt_pose_cond(
    dataset_names: list[str], cond_ds: str, ratio: float
) -> np.ndarray:
    """Boolean mask of rows whose uncert-head input is swapped to GT pose.

    Reference: poco_head.py:101-107 — the first `ratio` fraction of the
    rows belonging to `cond_ds` ('all' = every row).
    """
    names = np.asarray([str(n) for n in dataset_names])
    mask = np.zeros(len(names), bool)
    if cond_ds == "all":
        mask[:] = True
        return mask
    idx = np.nonzero(names == cond_ds)[0]
    idx = idx[: int(ratio * len(idx))]
    mask[idx] = True
    return mask


class Trainer:
    """End-to-end training driver.

    Args:
        hparams: config tree (poco_tpu.config).
        smpl: neutral SMPL weights used for GT generation + prediction.
        train_dataset_fn: (epoch) -> dataset; called per epoch so stage
            curricula can swap datasets (STAGE_DATASETS).
        val_dataset: evaluation dataset (or None).
    """

    def __init__(
        self,
        hparams: CfgNode,
        smpl: SmplParams,
        train_dataset_fn: Callable[[int], Any],
        val_dataset: Any = None,
        smpl_male: SmplParams | None = None,
        smpl_female: SmplParams | None = None,
        mesh=None,
        seed: int = 0,
    ):
        self.hparams = hparams
        self.smpl = smpl
        self.smpl_male = smpl_male or smpl
        self.smpl_female = smpl_female or smpl
        self.train_dataset_fn = train_dataset_fn
        self.val_dataset = val_dataset
        self.mesh = mesh or make_mesh()
        # Multi-process: the mesh spans every process's devices (one
        # SPMD program); host-side writes are rank-0-gated (reference
        # is_main_process(), train_utils.py:167-170).
        self.is_main = dist.is_main_process()
        self.n_procs = dist.process_count()
        self._fetch_head_cache: dict[int, object] = {}
        self.logdir = hparams.LOG_DIR
        os.makedirs(self.logdir, exist_ok=True)

        import jax.numpy as _jnp

        compute_dtype = (
            _jnp.bfloat16
            if int(hparams.TRAINING.get("PRECISION", 32)) == 16
            else _jnp.float32
        )
        self.model = POCO(
            cfg=model_config_from_hparams(hparams), dtype=compute_dtype
        )
        self.loss_cfg = loss_config_from_hparams(hparams)
        self.module_lr = parse_module_lr(hparams.OPTIMIZER.MODULE_LR)
        self.freeze_schedule = parse_freeze_params(
            hparams.TRAINING.FREEZE_PARAMS
        )

        rng = jax.random.PRNGKey(
            hparams.SEED_VALUE if hparams.SEED_VALUE >= 0 else seed
        )
        self.rng, init_rng = jax.random.split(rng)
        variables = init_poco(self.model, init_rng, smpl)

        # Warm starts (reference TRAINING.PRETRAINED per-submodule torch
        # checkpoint, poco.py:131-154 / PRETRAINED_LIT full checkpoint,
        # train.py:46-49): torch .pt files are converted, orbax dirs are
        # restored; shape mismatches are skipped tolerantly.
        pretrained = hparams.TRAINING.get("PRETRAINED") or hparams.TRAINING.get(
            "PRETRAINED_LIT"
        )
        if pretrained:
            variables = self._load_pretrained(variables, pretrained)
        tx = self._make_tx(frozen=tuple(self.freeze_schedule.get(0, ())))
        self.state = create_train_state(self.model, variables, tx)
        self.train_step = make_train_step(self.model, self.loss_cfg)

        from ..eval.uncert_stats import UncertStatsTracker

        self.uncert_stats = UncertStatsTracker(
            loss_ver=hparams.POCO.LOSS_VER if hparams.METHOD == "poco"
            else "mse",
        )
        self.best_metric = float("inf")
        self.best_corr = -float("inf")
        self.best_mpjpe_var = float("inf")
        self.epoch = 0
        self.val_history: list[dict] = []
        self._global_step = 0
        self._topk: list[tuple[float, str]] = []

        # Logger list (reference train.py:63-77 builds [tensorboard,
        # comet]; the comet slot ships commented out there). Backends
        # here: "tensorboard" and a dependency-free "csv" scalar logger,
        # both alongside the always-on JSONL stream — e.g.
        # PREF_LOGGER: "tensorboard,csv".
        pref = str(hparams.get("PREF_LOGGER", "")) if self.is_main else ""
        self._tb = None
        if "tensorboard" in pref:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=self.logdir)
            except Exception:
                self._tb = None
        self._csv = None
        if "csv" in pref:
            path = os.path.join(self.logdir, "metrics.csv")
            # resume-aware: adopt an existing header's columns
            self._csv_keys: list[str] = []
            if os.path.exists(path):
                with open(path) as f:
                    header = f.readline().strip()
                if header.startswith("global_step,"):
                    self._csv_keys = header.split(",")[1:]
            else:
                with open(path, "w") as f:
                    f.write("global_step\n")
            self._csv = open(path, "a", buffering=1)

        from .state import count_params

        self._log({"event": "params", **count_params(self.state.params)})

    def _load_pretrained(self, variables: dict, path: str) -> dict:
        if os.path.isdir(path):
            from ..utils.checkpoint_convert import restore_checkpoint_tree

            # Template-free restore: warm starts must tolerate payload
            # layout differences across versions (e.g. checkpoints that
            # do or don't carry opt_state) AND topology changes (a
            # pod-trained warm start on one chip, or vice versa).
            restored = restore_checkpoint_tree(path)
            out = dict(variables)
            for key in ("params", "batch_stats", "buffers"):
                if restored.get(key) is not None:
                    out[key] = jax.tree.map(
                        jnp.asarray, restored[key]
                    )
            self._log({"event": "warm_start", "path": path, "kind": "orbax"})
            return out
        from ..utils.checkpoint_convert import (
            convert_state_dict,
            load_torch_checkpoint,
            merge_converted,
        )

        sd = load_torch_checkpoint(path)
        converted = convert_state_dict(
            sd, head_type=self.model.cfg.head_name
        )
        merged, stats = merge_converted(variables, converted)
        self._log(
            {"event": "warm_start", "path": path, "kind": "torch", **stats}
        )
        return merged

    # ------------------------------------------------------------------
    def _make_tx(self, frozen: tuple[str, ...]):
        h = self.hparams.OPTIMIZER
        clip = self.hparams.TRAINING.GRAD_CLIP_VAL or None
        # remember the base LR this transformation closes over: the
        # in-place lr_scale is relative to it (_set_lr)
        self._tx_base_lr = getattr(self, "_current_lr", h.LR)
        return make_optimizer(
            lr=self._tx_base_lr, weight_decay=h.WD,
            module_lr=self.module_lr, frozen_modules=frozen, grad_clip=clip,
        )

    def _maybe_reduce_lr_on_plateau(self, metric: float) -> None:
        """ReduceLROnPlateau (reference trainer.py:606-626): halve the LR
        when the composite validation metric stops improving. Adam state
        (mu/nu/count) is LR-independent, so the optimizer transformation
        is rebuilt in place without resetting momentum."""
        h = self.hparams.OPTIMIZER
        if not hasattr(self, "_current_lr"):
            self._current_lr = h.LR
            self._plateau_best = float("inf")
            self._plateau_count = 0
        if metric < self._plateau_best - 1e-6:
            self._plateau_best = metric
            self._plateau_count = 0
            return
        self._plateau_count += 1
        patience = h.get("LR_PLATEAU_PATIENCE", 5)
        if self._plateau_count >= patience:
            new_lr = max(
                self._current_lr * h.get("LR_PLATEAU_FACTOR", 0.5),
                h.get("LR_MIN", 1e-7),
            )
            if new_lr < self._current_lr:
                self._current_lr = new_lr
                self._set_lr(new_lr)
                self._log({"event": "lr_plateau", "lr": new_lr})
            self._plateau_count = 0

    def _set_lr(self, new_lr: float) -> None:
        """Apply a new learning rate WITHOUT recompiling the train step.

        The fused optimizer carries a traced `lr_scale` in its state —
        writing it is a pure array update. Rebuilding the transformation
        (the fallback for the optax path) swaps a static field of the
        TrainState and forces jit to recompile the whole step: minutes
        over the axon tunnel, in the middle of training."""
        import jax.numpy as jnp

        opt_state = self.state.opt_state
        if isinstance(opt_state, dict) and "lr_scale" in opt_state:
            new_opt = dict(opt_state)
            new_opt["lr_scale"] = jnp.asarray(
                new_lr / getattr(
                    self, "_tx_base_lr", self.hparams.OPTIMIZER.LR
                ),
                jnp.float32,
            )
            self.state = self.state.replace(opt_state=new_opt)
            return
        frozen = ()
        for e in sorted(self.freeze_schedule):
            if e <= self.epoch:
                frozen = tuple(self.freeze_schedule[e])
        tx = self._make_tx(frozen)
        self.state = self.state.replace(tx=tx)

    def _apply_freeze_schedule(self, epoch: int) -> None:
        if epoch not in self.freeze_schedule:
            return
        frozen = tuple(self.freeze_schedule[epoch])
        tx = self._make_tx(frozen)
        # Rebuild the optimizer (reference trainer.py:192-208 re-creates
        # it when the freeze set changes; optimizer state restarts).
        self.state = self.state.replace(
            tx=tx, opt_state=tx.init(self.state.params)
        )
        self._log({"event": "freeze", "epoch": epoch, "frozen": list(frozen)})

    def _log(self, record: dict) -> None:
        if not self.is_main:
            return
        record["time"] = time.time()
        if not hasattr(self, "_metrics_file"):
            self._metrics_file = open(
                os.path.join(self.logdir, "metrics.jsonl"), "a"
            )
        self._metrics_file.write(json.dumps(record) + "\n")
        self._metrics_file.flush()
        if getattr(self, "_tb", None) is not None:
            step = getattr(self, "_global_step", 0)
            for k, v in record.items():
                if isinstance(v, (int, float)) and k not in ("time", "epoch", "step"):
                    self._tb.add_scalar(k, v, step)
        if getattr(self, "_csv", None) is not None:
            step = getattr(self, "_global_step", 0)
            scalars = {
                k: v for k, v in record.items()
                if isinstance(v, (int, float)) and not isinstance(v, bool)
            }
            if scalars:
                self._csv_write(step, scalars)

    def _csv_write(self, step: int, scalars: dict) -> None:
        """Append a row to metrics.csv, growing the header as new metric
        keys appear (the first records — e.g. the params-count event —
        must not freeze the column set for the whole run)."""
        new_keys = [k for k in sorted(scalars) if k not in self._csv_keys]
        path = os.path.join(self.logdir, "metrics.csv")
        if new_keys:
            # rewrite with the widened header, preserving existing rows
            old_keys = list(self._csv_keys)
            self._csv_keys = old_keys + new_keys
            self._csv.close()
            rows = []
            with open(path) as f:
                lines = [ln.rstrip("\n") for ln in f if ln.strip()]
            for ln in lines[1:] if lines else []:
                rows.append(ln.split(","))
            with open(path, "w") as f:
                f.write(",".join(["global_step"] + self._csv_keys) + "\n")
                for r in rows:
                    f.write(",".join(r + [""] * len(new_keys)) + "\n")
            self._csv = open(path, "a", buffering=1)
        row = [str(step)] + [
            str(scalars.get(k, "")) for k in self._csv_keys
        ]
        self._csv.write(",".join(row) + "\n")

    def _fetch(self, arr) -> np.ndarray:
        """Fetch a (possibly multi-process global) array to host numpy.

        Collective when multi-process — every process must call it at
        the same point; all of them receive the full value.
        """
        return np.asarray(dist.allgather(arr))

    def _fetch_head(self, arr, n: int) -> np.ndarray:
        """Fetch only the first `n` rows of a global batch array.

        Multi-process: slicing on device and replicating the tiny
        result moves n rows over DCN instead of the whole global batch
        (SAVE_IMAGES renders 4 rows; gathering batch x 224 x 224 x 3
        to every host to keep 4 is pure waste). Collective.
        """
        if self.n_procs == 1:
            return np.asarray(arr[:n])
        # Cache the jitted slice per n: a fresh jax.jit(lambda ...) every
        # call would never hit the jit cache, so each SAVE_IMAGES step
        # would pay retrace+compile round trips — a synchronized
        # collective stall on every host.
        fn = self._fetch_head_cache.get(n)
        if fn is None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            fn = jax.jit(lambda x: x[:n], out_shardings=repl)
            self._fetch_head_cache[n] = fn
        return np.asarray(fn(arr))

    def _cond_mask(self, host_batch: dict) -> np.ndarray:
        """GT-pose-conditioning row mask (reference poco_head.py:101-107).

        The selection is a property of the GLOBAL batch ("first ratio
        fraction of the cond-dataset rows"); computing it per loader
        shard would condition a different row set (and count) than a
        single-process run. Multi-process loaders therefore attach the
        global per-row dataset names ('_global_row_names', see
        DataLoader/get_batch keep=), from which every process computes
        the same global mask and keeps its shard's slice.
        """
        p = self.hparams.POCO
        if self.n_procs == 1:
            return select_gt_pose_cond(
                host_batch.get("dataset_name", []),
                p.GT_POSE_COND_DS, p.GT_POSE_COND_RATIO,
            )
        gnames = host_batch.get("_global_row_names")
        if gnames is None:
            raise RuntimeError(
                "GT_POSE_COND with multi-process training needs the "
                "loader's global row names ('_global_row_names'); use a "
                "dataset whose get_batch supports keep= (PocoDataset / "
                "RatioMixedDataset) or disable POCO.GT_POSE_COND"
            )
        gmask = select_gt_pose_cond(
            gnames, p.GT_POSE_COND_DS, p.GT_POSE_COND_RATIO
        )
        lo, hi = dist.local_shard_bounds(len(gnames))
        return gmask[lo:hi]

    def _device_batch(self, host_batch: dict) -> dict:
        p = self.hparams.POCO
        cond_mask = self._cond_mask(host_batch) if (
            self.hparams.METHOD == "poco" and p.GT_POSE_COND
        ) else None

        batch = {
            k: v for k, v in host_batch.items() if not isinstance(v, list)
        }
        if cond_mask is not None:
            batch["gt_pose_cond_mask"] = cond_mask

        # The batch axis must divide the mesh: pad by cycling real rows
        # (keeps loss statistics unchanged up to duplicate weighting).
        # Multi-process: `batch` holds only this process's rows (the
        # loader shard), so pad to the LOCAL device count and assemble
        # the global array from per-process shards.
        n = len(next(iter(batch.values())))
        n_dev = int(self.mesh.devices.size)
        pad = (-n) % max(n_dev // self.n_procs, 1)
        if pad:
            # cycle indices so pad > n (batch smaller than the mesh)
            # still fills completely
            idx = np.arange(n + pad) % n
            batch = {k: np.asarray(v)[idx] for k, v in batch.items()}

        if self.n_procs > 1:
            sharded = dist.global_batch_from_local(
                batch, self.mesh, (n + pad) * self.n_procs
            )
        else:
            sharded = shard_batch(
                {k: jnp.asarray(v) for k, v in batch.items()}, self.mesh
            )
        sharded["img"] = normalize_image(sharded["img"])
        return sharded

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> dict[str, float]:
        from ..data.dataset import DataLoader

        self._apply_freeze_schedule(epoch)
        dataset = self.train_dataset_fn(epoch)
        loader = DataLoader(
            dataset,
            batch_size=self.hparams.DATASET.BATCH_SIZE,
            shuffle=self.hparams.DATASET.SHUFFLE_TRAIN,
            seed=epoch,
            num_shards=self.n_procs,
            shard_index=dist.process_index(),
        )
        n_crops = 0
        t0 = time.perf_counter()
        last_metrics: dict[str, float] = {}

        # Profiling hook (replaces the reference's unused
        # DeviceStatsMonitor, train.py:78): set POCO_TPU_PROFILE_DIR to
        # capture a jax.profiler trace of this epoch's first steps.
        profile_dir = os.environ.get("POCO_TPU_PROFILE_DIR")
        if profile_dir and epoch == 0:
            jax.profiler.start_trace(profile_dir)

        with self.mesh:
            state = replicate_tree(self.state, self.mesh)
            smpl = replicate_tree(self.smpl, self.mesh)
            for step_i, host_batch in enumerate(loader):
                batch = self._device_batch(host_batch)
                self.rng, step_rng = jax.random.split(self.rng)
                state, metrics = self.train_step(
                    state, batch, smpl, step_rng
                )
                n_crops += host_batch["img"].shape[0] * self.n_procs
                self._global_step += 1
                if step_i % self.hparams.TRAINING.LOG_SAVE_INTERVAL == 0:
                    var_pose = metrics.pop("_var_pose", None)
                    viz = metrics.pop("_viz", None)
                    last_metrics = {
                        k: float(v) for k, v in metrics.items()
                        if not k.startswith("_")
                    }
                    self._log(
                        {"epoch": epoch, "step": step_i, **last_metrics}
                    )
                    # Per-joint uncertainty stats (reference
                    # poco_utils.accumulate_uncert, trainer.py:286-289).
                    # _fetch is collective: EVERY process calls it, only
                    # rank 0 consumes the result.
                    if var_pose is not None:
                        var_host = self._fetch(var_pose)
                        if self.is_main:
                            self.uncert_stats.update(var_host)
                    # Mesh comparison grids (reference TB image
                    # summaries, trainer.py:467-583). Host-side
                    # rendering is a rank-0 concern; the gathers are
                    # collective.
                    if (
                        self.hparams.TRAINING.get("SAVE_IMAGES")
                        and viz is not None
                    ):
                        n_viz = 4
                        imgs = self._fetch_head(batch["img"], n_viz)
                        pred_verts = self._fetch_head(
                            viz["pred_verts"], n_viz
                        )
                        pred_cam = self._fetch_head(viz["pred_cam"], n_viz)
                        gt_verts = self._fetch_head(viz["gt_verts"], n_viz)
                        if self.is_main:
                            from ..viz.train_viz import (
                                render_training_grid,
                                save_training_grid,
                            )

                            grid = render_training_grid(
                                imgs, pred_verts, pred_cam,
                                np.asarray(self.smpl.faces),
                                gt_verts=gt_verts,
                            )
                            save_training_grid(
                                grid, self.logdir,
                                f"train_e{epoch}_s{step_i}",
                            )
                if profile_dir and epoch == 0 and step_i == 4:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    profile_dir = None
            self.state = state
        if profile_dir and epoch == 0:
            jax.profiler.stop_trace()
        dt = time.perf_counter() - t0
        last_metrics["crops_per_sec"] = n_crops / max(dt, 1e-9)
        if self.uncert_stats.meters and any(
            m.count for m in self.uncert_stats.meters.values()
        ):
            self.uncert_stats.dump(self.logdir, f"train_e{epoch}")
            self.uncert_stats.reset()
        return last_metrics

    def validate(self, epoch: int) -> dict[str, float]:
        from ..eval.runner import run_eval

        if self.val_dataset is None:
            return {}
        result = run_eval(
            self.model, self.state.variables, self.val_dataset,
            smpl_neutral=self.smpl, smpl_male=self.smpl_male,
            smpl_female=self.smpl_female,
            batch_size=self.hparams.DATASET.BATCH_SIZE,
            mesh=self.mesh,
            loss_ver=self.hparams.POCO.LOSS_VER,
        )
        summary = result.summary()
        summary["epoch"] = epoch
        self.val_history.append(summary)
        if self.is_main:
            with open(
                os.path.join(self.logdir, "val_accuracy.json"), "w"
            ) as f:
                json.dump(self.val_history, f, indent=1)
        self._log({"event": "val", **summary})

        # Best-model selection (reference trainer.py:407-442): lower
        # composite metric wins; on a near-tie, higher uncert-error
        # correlation wins.
        metric = summary["best_model_metric"]
        corr = summary.get("uncert_mpjpe_corr", 0.0)
        is_best = metric < self.best_metric or (
            abs(metric - self.best_metric) < 0.1 and corr > self.best_corr
        )
        if is_best:
            self.best_metric = min(metric, self.best_metric)
            self.best_corr = max(corr, self.best_corr)
            self.save_checkpoint("best_model")
            if self.hparams.TESTING.SAVE_RESULTS and self.is_main:
                self._dump_results(result, epoch)
        # Var-MPJPE best model (mpjpe / predicted variance): the
        # checkpoint behind `--inf_model best_mpjpe_var`
        # (reference train_utils.py:132-133; the reference trainer logs
        # best_mpjpe_var but never saves the checkpoint — fixed here).
        mpjpe_var = summary.get("mpjpe_var")
        if mpjpe_var is not None and mpjpe_var < self.best_mpjpe_var:
            self.best_mpjpe_var = mpjpe_var
            self.save_checkpoint("best_model_mpjpe_var")
        self._retain_top_k(epoch, metric)
        self._maybe_reduce_lr_on_plateau(metric)
        return summary

    def _retain_top_k(self, epoch: int, metric: float, k: int = 5) -> None:
        """Keep the k best epoch checkpoints by validation metric
        (reference ModelCheckpoint save_top_k=5, train.py:56-61).
        The retention list persists across restarts via the trainer-state
        sidecar, so stale epoch checkpoints are pruned after a resume."""
        import shutil

        name = f"epoch_{epoch:03d}"
        self.save_checkpoint(name)
        self._topk.append((metric, name))
        self._topk.sort(key=lambda x: x[0])
        while len(self._topk) > k:
            _, worst = self._topk.pop()
            if not self.is_main:
                continue
            path = os.path.join(self.logdir, worst)
            if os.path.exists(path):
                shutil.rmtree(path, ignore_errors=True)
            # the host-side trainer-state sidecar rides along
            if os.path.exists(path + ".trainer.json"):
                os.remove(path + ".trainer.json")

    def _dump_results(self, result, epoch: int) -> None:
        """Per-sample eval dump (reference save_results.py:45-93)."""
        import joblib

        payload = {
            "imgname": result.imgnames,
            "mpjpe": result.mpjpe_mm,
            "pampjpe": result.pa_mpjpe_mm,
            "v2v": result.v2v_mm,
            "uncert": result.uncert,
            "epoch": epoch,
        }
        ds = self.hparams.DATASET.VAL_DS
        joblib.dump(
            payload,
            os.path.join(self.logdir, f"evaluation_results_{ds}.pkl"),
        )

    # ------------------------------------------------------------------
    def _trainer_state_dict(self) -> dict:
        """Host-side trainer state for full resume (reference: PL
        resume_from_checkpoint restores epoch/optimizer/callback state,
        train.py:94)."""
        return {
            "next_epoch": self.epoch + 1,
            "global_step": self._global_step,
            "best_metric": self.best_metric,
            "best_corr": self.best_corr,
            "best_mpjpe_var": self.best_mpjpe_var,
            "topk": [[float(m), n] for m, n in self._topk],
            "current_lr": getattr(self, "_current_lr", None),
            "plateau_best": getattr(self, "_plateau_best", None),
            "plateau_count": getattr(self, "_plateau_count", None),
            "val_history": self.val_history,
            "rng": np.asarray(self.rng).tolist(),
        }

    def save_checkpoint(self, name: str = "checkpoint") -> None:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.logdir, name))
        ckptr = ocp.StandardCheckpointer()
        payload = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "buffers": self.state.buffers,
            "step": self.state.step,
            "opt_state": self.state.opt_state,
        }
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        # Host-side trainer state rides in a sidecar next to the orbax
        # dir (not inside it — orbax owns that directory's layout).
        # Multi-process: orbax coordinates the array save across
        # processes (all of them call save); the sidecar is rank-0's.
        if self.is_main:
            with open(path + ".trainer.json", "w") as f:
                json.dump(self._trainer_state_dict(), f)

    def load_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)

        # 1) Trainer sidecar first: epoch / best trackers / plateau-LR /
        # top-k retention / rng. The LR must be known before the
        # optimizer template is built so opt_state restores consistently.
        sidecar = path + ".trainer.json"
        ts = None
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                ts = json.load(f)
            self.epoch = int(ts["next_epoch"])
            self._global_step = int(ts["global_step"])
            self.best_metric = float(ts["best_metric"])
            self.best_corr = float(ts["best_corr"])
            self.best_mpjpe_var = float(ts.get("best_mpjpe_var", np.inf))
            self._topk = [(float(m), str(n)) for m, n in ts["topk"]]
            self.val_history = list(ts["val_history"])
            if ts.get("current_lr") is not None:
                self._current_lr = float(ts["current_lr"])
                self._plateau_best = float(ts["plateau_best"])
                self._plateau_count = int(ts["plateau_count"])
            if ts.get("rng") is not None:
                self.rng = jnp.asarray(np.asarray(ts["rng"], np.uint32))
            # Rebuild the optimizer for the restored epoch (freeze
            # schedule + plateau LR) so the opt_state template matches.
            frozen = ()
            for e in sorted(self.freeze_schedule):
                if e <= max(self.epoch - 1, 0):
                    frozen = tuple(self.freeze_schedule[e])
            tx = self._make_tx(frozen)
            self.state = self.state.replace(
                tx=tx, opt_state=tx.init(self.state.params)
            )

        # Template-free restore + structural merge: checkpoints written
        # by other versions may lack payload entries (opt_state on very
        # old ones) or opt_state keys (lr_scale predates some runs). A
        # fixed template would reject either direction with a
        # tree-structure mismatch; merging into the freshly-initialized
        # state keeps defaults for anything the checkpoint doesn't
        # carry. Topology-tolerant: resuming on a different device
        # count than the run that wrote the checkpoint restores as host
        # numpy and re-places below.
        from ..utils.checkpoint_convert import restore_checkpoint_tree

        restored = restore_checkpoint_tree(path)

        from collections.abc import Mapping

        def _merge(tmpl, rest, path="", missing=None, extra=None):
            if missing is None:
                missing, extra = [], []
            if tmpl is None or rest is None:
                # only a real loss if the template subtree has leaves
                if tmpl is not None and jax.tree_util.tree_leaves(tmpl):
                    missing.append(path or "<root>")
                return tmpl
            if isinstance(tmpl, Mapping):
                if not isinstance(rest, Mapping):
                    missing.append(path or "<root>")
                    return dict(tmpl)
                for k in rest:
                    if k not in tmpl:
                        extra.append(f"{path}/{k}")
                return {
                    k: _merge(v, rest.get(k), f"{path}/{k}", missing, extra)
                    for k, v in tmpl.items()
                }
            if isinstance(rest, Mapping):
                # template leaf vs restored subtree: structural mismatch
                missing.append(path or "<root>")
                return tmpl
            arr = jnp.asarray(rest)
            if hasattr(tmpl, "shape") and arr.shape != tmpl.shape:
                missing.append(f"{path} (shape {arr.shape}!={tmpl.shape})")
                return tmpl
            return arr

        # Model state (params/batch_stats/buffers) must restore EXACTLY:
        # a key silently kept at fresh init would "resume" from
        # partially-garbage weights. Only opt_state gets the lenient
        # merge (optimizer-layout drift across versions is the reason
        # the template-free restore exists).
        merged, dropped = {}, {}
        for coll in ("params", "batch_stats", "buffers"):
            miss, ext = [], []
            merged[coll] = _merge(
                getattr(self.state, coll), restored.get(coll), coll,
                miss, ext,
            )
            if miss or ext:
                raise ValueError(
                    f"checkpoint {path!r} does not match the model: "
                    f"{coll} missing/mismatched={miss[:10]} "
                    f"extra={ext[:10]} (counts {len(miss)}/{len(ext)})"
                )
        self.state = self.state.replace(
            params=merged["params"],
            batch_stats=merged["batch_stats"],
            buffers=merged["buffers"],
            step=jnp.asarray(restored["step"]),
        )
        if restored.get("opt_state") is not None:
            miss, ext = [], []
            self.state = self.state.replace(
                opt_state=_merge(
                    self.state.opt_state, restored["opt_state"],
                    "opt_state", miss, ext,
                )
            )
            if miss or ext:
                dropped["opt_state"] = {"kept_init": miss, "ignored": ext}
            # the restored lr_scale was relative to the OLD tx's base
            # LR; the rebuilt tx bakes the restored plateau LR in, so
            # re-normalize the scale against the new base (=> 1.0)
            if hasattr(self, "_current_lr"):
                self._set_lr(self._current_lr)
        self._log({
            "event": "resume", "path": path,
            "epoch": self.epoch, "with_sidecar": ts is not None,
            **({"opt_state_layout_drift": dropped["opt_state"]}
               if dropped else {}),
        })

    # ------------------------------------------------------------------
    def fit(self, max_epochs: int | None = None) -> dict:
        max_epochs = max_epochs or self.hparams.TRAINING.MAX_EPOCHS
        check_every = self.hparams.TRAINING.CHECK_VAL_EVERY_N_EPOCH
        summary = {}
        for epoch in range(self.epoch, max_epochs):
            self.epoch = epoch
            train_metrics = self.train_epoch(epoch)
            self._log({"event": "epoch_end", "epoch": epoch, **train_metrics})
            if (epoch + 1) % check_every == 0:
                summary = self.validate(epoch)
            self.save_checkpoint("last")
        # Leave fit together: no process returns (and e.g. starts
        # reading checkpoints, or exits tearing down the coordinator)
        # while rank 0 is still writing (reference synchronize,
        # train_utils.py:173-184).
        if self.n_procs > 1:
            dist.barrier("poco_fit_end")
        return summary
