"""Training state: parameters, BN statistics, optimizer, schedules.

Replaces the reference's PyTorch-Lightning LitModule plumbing
(pocolib/core/trainer.py:28-208) with a plain flax/optax TrainState:

  * Adam with per-module learning-rate multipliers (reference MODULE_LR
    mini-DSL, trainer.py:591-605) via optax.multi_transform;
  * freeze schedules (reference FREEZE_PARAMS, train_utils.py:105-116)
    expressed as zero-LR partitions — the optimizer is *not* rebuilt every
    epoch; the schedule is a traced step input;
  * BN running statistics carried as `batch_stats` collection.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    buffers: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
        )

    @property
    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        if self.buffers is not None:
            v["buffers"] = self.buffers
        return v


MODULE_GROUPS = ("backbone_net", "head", "uncert_head", "flow_head")


def module_label_tree(params: Any) -> Any:
    """Label every leaf with its top-level module name for multi_transform."""

    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return top if top in MODULE_GROUPS else "other"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    module_lr: dict[str, float] | None = None,
    frozen_modules: tuple[str, ...] = (),
    grad_clip: float | None = None,
    fused: bool = True,
) -> optax.GradientTransformation:
    """Adam with per-module LR multipliers and frozen partitions.

    Args:
        module_lr: e.g. {"backbone_net": 0.1, "head": 0.1} — multiplier on
            the base LR (reference MODULE_LR "0.1_0.1_1.0_1.0",
            trainer.py:592-605).
        frozen_modules: module names whose gradients are zeroed (reference
            FREEZE_PARAMS, train_utils.py:92-116).
        fused: use the flat-buffer implementation (few large kernels /
            buffers instead of per-leaf ones — the TPU-fast path, update
            math identical; see make_fused_optimizer). False selects the
            optax multi_transform reference implementation.
    """
    if fused:
        return make_fused_optimizer(
            lr=lr, weight_decay=weight_decay, module_lr=module_lr,
            frozen_modules=frozen_modules, grad_clip=grad_clip,
        )
    module_lr = dict(module_lr or {})

    def adam_for(mult: float):
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.adam(lr * mult))
        return optax.chain(*chain)

    transforms = {"other": adam_for(1.0)}
    for mod in MODULE_GROUPS:
        if mod in frozen_modules:
            transforms[mod] = optax.set_to_zero()
        else:
            transforms[mod] = adam_for(module_lr.get(mod, 1.0))

    def labeler(params):
        labels = module_label_tree(params)
        # Frozen modules keep their own label; others collapse to theirs.
        return labels

    tx = optax.multi_transform(transforms, labeler)
    if grad_clip:
        # Clip on the WHOLE-model gradient norm before the per-module
        # partitions (the reference's PL gradient_clip_val semantics);
        # clipping inside each partition would use per-partition norms.
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def make_fused_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    module_lr: dict[str, float] | None = None,
    frozen_modules: tuple[str, ...] = (),
    grad_clip: float | None = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Flat-buffer Adam: one fused vector per top-level module group.

    Semantically equivalent to `make_optimizer` (same Adam math, same
    per-module LR multipliers, same freeze/clip behavior — see
    tests/test_train.py equivalence test), but the ~1600-leaf w48
    parameter tree collapses into <=5 raveled vectors: the optimizer is
    a handful of large fused elementwise kernels instead of thousands
    of per-leaf ones, and the optimizer state adds ~10 device buffers
    to the step dispatch instead of ~3200. Measured on the tunneled
    v5e: bare update 69 ms -> sub-ms-scale; see BENCHMARKS.md round-3
    training section.

    Frozen groups keep zero updates and frozen moments (the trainer
    rebuilds the optimizer at freeze boundaries, so moment semantics
    across a boundary match `make_optimizer`'s optax.set_to_zero).
    """
    from jax.flatten_util import ravel_pytree

    module_lr = dict(module_lr or {})

    def group_mult(k: str) -> float:
        if k in frozen_modules:
            return 0.0
        return module_lr.get(k if k in MODULE_GROUPS else "other", 1.0)

    def init(params):
        groups = {}
        for k, sub in params.items():
            flat, _ = ravel_pytree(sub)
            groups[k] = {
                "m": jnp.zeros_like(flat), "v": jnp.zeros_like(flat)
            }
        # lr_scale is a TRACED runtime multiplier on the base LR: the
        # plateau scheduler writes it in place instead of rebuilding the
        # transformation — an optimizer rebuild changes the step's
        # static structure and forces a full recompile (minutes over the
        # axon tunnel, mid-training).
        return {
            "count": jnp.zeros((), jnp.int32),
            "lr_scale": jnp.ones((), jnp.float32),
            "groups": groups,
        }

    def update(grads, state, params=None):
        count = state["count"] + 1
        c = count.astype(jnp.float32)
        eff_lr = lr * state.get("lr_scale", 1.0)
        scale = None
        if grad_clip:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-16))
        new_groups = {}
        updates = {}
        for k, gsub in grads.items():
            mult = group_mult(k)
            if mult == 0.0:
                updates[k] = jax.tree_util.tree_map(
                    lambda g: jnp.zeros_like(g), gsub
                )
                new_groups[k] = state["groups"][k]
                continue
            gflat, unravel = ravel_pytree(gsub)
            if scale is not None:
                gflat = gflat * scale
            if weight_decay and params is not None:
                # matches make_optimizer's chain order: clip ->
                # add_decayed_weights -> adam (L2-through-Adam, not
                # decoupled AdamW)
                pflat, _ = ravel_pytree(params[k])
                gflat = gflat + weight_decay * pflat
            m = b1 * state["groups"][k]["m"] + (1.0 - b1) * gflat
            v = b2 * state["groups"][k]["v"] + (1.0 - b2) * gflat * gflat
            mhat = m / (1.0 - b1 ** c)
            vhat = v / (1.0 - b2 ** c)
            upd = (-eff_lr * mult) * mhat / (jnp.sqrt(vhat) + eps)
            updates[k] = unravel(upd)
            new_groups[k] = {"m": m, "v": v}
        return updates, {
            "count": count,
            "lr_scale": state.get("lr_scale", jnp.ones((), jnp.float32)),
            "groups": new_groups,
        }

    return optax.GradientTransformation(init, update)


def create_train_state(
    model,
    variables: dict,
    tx: optax.GradientTransformation,
) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats"),
        buffers=variables.get("buffers"),
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def count_params(tree) -> dict[str, int]:
    """Per-module and total parameter counts (reference trainer.py:186-190)."""
    import numpy as np

    counts: dict[str, int] = {}
    total = 0
    for mod, sub in (tree.items() if isinstance(tree, dict) else []):
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(sub))
        counts[mod] = n
        total += n
    counts["total"] = total
    return counts


def check_finite(tree, where: str = "") -> None:
    """Raise if any leaf holds NaN/Inf (reference NaN probes,
    pare_head.py:803-807 / losses.py:353-354). Host-side debug helper —
    call on fetched metrics, not inside jit."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            name = "/".join(str(p) for p in path)
            raise FloatingPointError(f"non-finite values in {where}{name}")
