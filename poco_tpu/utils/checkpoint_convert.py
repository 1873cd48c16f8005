"""PyTorch checkpoint -> flax variables converter.

Converts reference POCO/HMR checkpoints (torch state_dicts saved by
pocolib — prefixes `backbone.`, `head.`, `uncert_head.`, `flow_head.`,
pocolib/models/poco.py:131-154) into this framework's variable tree:

    params:       {backbone_net, head, uncert_head, flow_head}
    batch_stats:  BN running mean/var
    buffers:      init_pose / init_shape / init_cam

Tensor layout rules:
    conv weight   OIHW -> HWIO
    linear weight (out, in) -> (in, out)
    BN weight/bias -> scale/bias; running_mean/var -> batch_stats
    LocallyConnected2d weight (1, out, in, H, W, 1) -> (H, W, out, in)

Name mapping mirrors the structural naming chosen in the flax modules
(see poco_tpu/models/backbones/hrnet.py — names were designed so this
conversion is a mechanical string transform).
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def convert_conv(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def convert_linear(w) -> np.ndarray:
    return _np(w).T


def convert_lc2d(w) -> np.ndarray:
    """(1, out, in, H, W, k*k=1) -> (H, W, out, in)."""
    w = _np(w)
    return w[0, :, :, :, :, 0].transpose(2, 3, 0, 1)


class _TreeBuilder:
    def __init__(self):
        self.params: dict = {}
        self.batch_stats: dict = {}
        self.buffers: dict = {}

    @staticmethod
    def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv(self, path, w, b=None):
        self._set(self.params, path + ["kernel"], convert_conv(w))
        if b is not None:
            self._set(self.params, path + ["bias"], _np(b))

    def linear(self, path, w, b=None):
        self._set(self.params, path + ["kernel"], convert_linear(w))
        if b is not None:
            self._set(self.params, path + ["bias"], _np(b))

    def bn(self, path, weight=None, bias=None, mean=None, var=None):
        if weight is not None:
            self._set(self.params, path + ["scale"], _np(weight))
        if bias is not None:
            self._set(self.params, path + ["bias"], _np(bias))
        if mean is not None:
            self._set(self.batch_stats, path + ["mean"], _np(mean))
        if var is not None:
            self._set(self.batch_stats, path + ["var"], _np(var))


def _group_state_dict(state_dict: dict) -> dict[str, dict[str, Any]]:
    """Group tensors by module path (strip the final param name)."""
    groups: dict[str, dict[str, Any]] = {}
    for key, value in state_dict.items():
        if "." not in key:
            groups.setdefault("", {})[key] = value
            continue
        mod, leaf = key.rsplit(".", 1)
        groups.setdefault(mod, {})[leaf] = value
    return groups


# ---------------------------------------------------------------------------
# Backbone name translation
# ---------------------------------------------------------------------------

def _hrnet_module_name(mod: str) -> tuple[str | None, list[str]]:
    """torch HRNet module path -> (kind, flax path under backbone_net).

    kind is "conv" / "bn" / None (skip, e.g. the unused pose final_layer
    or the cls classifier).
    """
    # stem
    m = re.fullmatch(r"conv(\d)", mod)
    if m:
        return "conv", [f"conv{m.group(1)}"]
    m = re.fullmatch(r"bn(\d)", mod)
    if m:
        return "bn", [f"bn{m.group(1)}"]

    # layer1.N.(conv|bn)K / downsample
    m = re.fullmatch(r"layer1\.(\d+)\.(conv|bn)(\d)", mod)
    if m:
        return m.group(2), ["layer1", m.group(1), f"{m.group(2)}{m.group(3)}"]
    m = re.fullmatch(r"layer1\.(\d+)\.downsample\.(\d)", mod)
    if m:
        kind = "conv" if m.group(2) == "0" else "bn"
        return kind, ["layer1", m.group(1),
                      "downsample_conv" if kind == "conv" else "downsample_bn"]

    # transitions: transition{T}.{i}(.{k})?.{0|1}
    m = re.fullmatch(r"transition(\d)\.(\d+)\.(\d+)", mod)
    if m:  # single conv3x3+bn:  .0 conv, .1 bn
        kind = "conv" if m.group(3) == "0" else "bn"
        tag = "conv0" if kind == "conv" else "bn0"
        return kind, [f"transition{m.group(1)}_{m.group(2)}_{tag}"]
    m = re.fullmatch(r"transition(\d)\.(\d+)\.(\d+)\.(\d+)", mod)
    if m:  # chained downsample: .k.{0|1}
        kind = "conv" if m.group(4) == "0" else "bn"
        tag = f"conv{m.group(3)}" if kind == "conv" else f"bn{m.group(3)}"
        return kind, [f"transition{m.group(1)}_{m.group(2)}_{tag}"]

    # stages: stage{S}.{M}.branches.{B}.{N}.(conv|bn)K / downsample
    m = re.fullmatch(
        r"stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.(conv|bn)(\d)", mod
    )
    if m:
        s, mm, b, n, kind, k = m.groups()
        return kind, [f"stage{s}_{mm}", f"branch{b}", n, f"{kind}{k}"]
    m = re.fullmatch(
        r"stage(\d)\.(\d+)\.branches\.(\d+)\.(\d+)\.downsample\.(\d)", mod
    )
    if m:
        s, mm, b, n, idx = m.groups()
        kind = "conv" if idx == "0" else "bn"
        return kind, [f"stage{s}_{mm}", f"branch{b}", n,
                      "downsample_conv" if kind == "conv" else "downsample_bn"]

    # fuse layers: stage{S}.{M}.fuse_layers.{i}.{j}.{...}
    m = re.fullmatch(
        r"stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)", mod
    )
    if m:  # j > i: Sequential[conv, bn, upsample]
        s, mm, i, j, idx = m.groups()
        kind = "conv" if idx == "0" else "bn"
        tag = "conv0" if kind == "conv" else "bn0"
        return kind, [f"stage{s}_{mm}", f"fuse_{i}_{j}_{tag}"]
    m = re.fullmatch(
        r"stage(\d)\.(\d+)\.fuse_layers\.(\d+)\.(\d+)\.(\d+)\.(\d+)", mod
    )
    if m:  # j < i: nested Sequential[k][conv|bn]
        s, mm, i, j, k, idx = m.groups()
        kind = "conv" if idx == "0" else "bn"
        tag = f"conv{k}" if kind == "conv" else f"bn{k}"
        return kind, [f"stage{s}_{mm}", f"fuse_{i}_{j}_{tag}"]

    # cls head: incre_modules.{i}.{n}.***
    m = re.fullmatch(r"incre_modules\.(\d+)\.(\d+)\.(conv|bn)(\d)", mod)
    if m:
        i, n, kind, k = m.groups()
        return kind, [f"incre{i}", n, f"{kind}{k}"]
    m = re.fullmatch(r"incre_modules\.(\d+)\.(\d+)\.downsample\.(\d)", mod)
    if m:
        i, n, idx = m.groups()
        kind = "conv" if idx == "0" else "bn"
        return kind, [f"incre{i}", n,
                      "downsample_conv" if kind == "conv" else "downsample_bn"]
    m = re.fullmatch(r"downsamp_modules\.(\d+)\.(\d)", mod)
    if m:
        i, idx = m.groups()
        kind = "conv" if idx == "0" else "bn"
        return kind, [f"downsamp{i}_conv" if kind == "conv" else f"downsamp{i}_bn"]
    m = re.fullmatch(r"final_layer\.(\d)", mod)
    if m:
        kind = "conv" if m.group(1) == "0" else "bn"
        return kind, ["final_conv" if kind == "conv" else "final_bn"]

    # pose merge convs: upsample_stage_{b}.{seq_idx}
    m = re.fullmatch(r"(upsample|downsample)_stage_(\d)\.(\d+)", mod)
    if m:
        dir_, b, idx = m.groups()
        idx = int(idx)
        if dir_ == "upsample":
            # Sequential repeats [Upsample, Conv, BN, ReLU]: conv at 4k+1.
            k, rem = divmod(idx - 1, 4)
            kind = "conv" if rem == 0 else "bn"
        else:
            # [Conv, BN, ReLU] repeats: conv at 3k.
            k, rem = divmod(idx, 3)
            kind = "conv" if rem == 0 else "bn"
        tag = f"conv{k}" if kind == "conv" else f"bn{k}"
        return kind, [f"{dir_}_stage_{b}_{tag}"]

    # ResNet trunk: layer{L}.{N}.***
    m = re.fullmatch(r"layer([2-4])\.(\d+)\.(conv|bn)(\d)", mod)
    if m:
        l, n, kind, k = m.groups()
        return kind, [f"layer{l}", n, f"{kind}{k}"]
    m = re.fullmatch(r"layer([2-4])\.(\d+)\.downsample\.(\d)", mod)
    if m:
        l, n, idx = m.groups()
        kind = "conv" if idx == "0" else "bn"
        return kind, [f"layer{l}", n,
                      "downsample_conv" if kind == "conv" else "downsample_bn"]

    # unused heads (pose-variant final_layer heatmap conv, cls classifier)
    if mod.startswith(("final_layer", "classifier")):
        return "skip", []
    return None, []


def _head_module_name(mod: str, head_type: str) -> tuple[str | None, list[str]]:
    """torch head module path -> (kind, flax path under "head")."""
    if head_type in ("cliff", "hmr"):
        m = re.fullmatch(r"(fc1|fc2|decpose|decshape|deccam)", mod)
        if m:
            return "linear", [m.group(1)]
        return None, []

    # pare head
    m = re.fullmatch(r"(keypoint|smpl)_deconv_layers\.(\d+)", mod)
    if m:
        branch, idx = m.groups()
        idx = int(idx)
        k, rem = divmod(idx, 3)  # [Conv, BN, ReLU] repeats
        kind = "conv" if rem == 0 else "bn"
        tag = f"conv{k}" if kind == "conv" else f"bn{k}"
        return kind, [f"{branch}_deconv_{tag}"]
    if mod == "keypoint_final_layer":
        return "conv", ["keypoint_final_layer"]
    if mod == "smpl_final_layer":
        return "conv", ["smpl_final_layer"]
    if mod in ("shape_mlp", "cam_mlp"):
        return "linear", [mod]
    if mod == "pose_mlp":
        return "lc2d", ["pose_mlp"]
    if mod == "uncert_mlp":
        return "lc2d", ["uncert_mlp"]
    m = re.fullmatch(r"(fc1|fc2|decpose|decshape|deccam)", mod)
    if m:
        return "linear", [m.group(1)]
    return None, []


def _uncert_module_name(mod: str) -> tuple[str | None, list[str]]:
    if mod == "uncert_fc_poseNet":
        return "linear", ["poseNet_fc"]
    if mod == "uncert_fc_featNet":
        return "linear", ["featNet_fc"]
    m = re.fullmatch(r"uncert_fc(\d+)", mod)
    if m:
        return "linear", [f"fc{m.group(1)}"]
    if mod == "uncert_lc2d":
        return "lc2d", ["lc2d"]
    return None, []


def _flow_module_name(mod: str) -> tuple[str | None, list[str]]:
    if mod == "cond_layer":
        return "linear", ["cond_layer"]
    m = re.fullmatch(r"flow\.(s|t)\.(\d+)\.(\d)", mod)
    if m:
        st, i, seq = m.groups()
        # Sequential [Linear, LeakyReLU, Linear, LeakyReLU, Linear(, Tanh)]
        fc = int(seq) // 2
        return "linear", ["flow", f"{st}{i}", f"fc{fc}"]
    if mod == "flow":
        # RealNVP's coupling-mask buffer (real_nvp.py:10) — deterministic
        # from (num_nf_rv, num_flow_layers, mask type), rebuilt at init.
        return "skip", []
    return None, []


def convert_state_dict(
    state_dict: dict,
    head_type: str = "cliff",
) -> dict[str, Any]:
    """Convert a reference POCO torch state_dict to flax variables.

    Args:
        state_dict: torch tensors keyed 'backbone.*', 'head.*',
            'uncert_head.*', 'flow_head.*' (model-level checkpoint) or the
            corresponding unprefixed sub-module dicts.
        head_type: "cliff" | "pare" | "hmr" (affects head name mapping).
    Returns:
        {"params": ..., "batch_stats": ..., "buffers": ...} with numpy
        leaves, mergeable over a freshly-initialized variable tree.
    """
    tb = _TreeBuilder()
    unmatched: list[str] = []
    groups = _group_state_dict(state_dict)

    for mod, leaves in groups.items():
        # route by top-level prefix
        if mod.startswith("backbone."):
            kind, path = _hrnet_module_name(mod[len("backbone."):])
            path = ["backbone_net"] + path
        elif mod.startswith("smpl.") or mod.startswith("smpl"):
            continue  # SMPL weights live outside the network tree
        elif mod.startswith("head."):
            sub = mod[len("head."):]
            if sub in ("init_pose", "init_shape", "init_cam"):
                continue
            kind, path = _head_module_name(sub, head_type)
            path = ["head"] + path
        elif mod.startswith("uncert_head."):
            kind, path = _uncert_module_name(mod[len("uncert_head."):])
            path = ["uncert_head"] + path
        elif mod.startswith("flow_head."):
            kind, path = _flow_module_name(mod[len("flow_head."):])
            path = ["flow_head"] + path
        elif mod in ("", "head") or mod in (
            "init_pose", "init_shape", "init_cam"
        ):
            # model-level buffers ('head' group = head.init_pose etc.)
            for name, val in leaves.items():
                if name in ("init_pose", "init_shape", "init_cam"):
                    tb.buffers.setdefault("head", {})[name] = _np(val).reshape(-1)
            continue
        else:
            unmatched.append(mod)
            continue

        if kind == "skip":
            continue
        if kind is None:
            if not mod.endswith(
                ("num_batches_tracked", "temperature", "mask", "pos_enc")
            ):
                unmatched.append(mod)
            continue

        if kind == "conv":
            tb.conv(path, leaves["weight"], leaves.get("bias"))
        elif kind == "linear":
            tb.linear(path, leaves["weight"], leaves.get("bias"))
        elif kind == "lc2d":
            tb._set(tb.params, path + ["weight"], convert_lc2d(leaves["weight"]))
        elif kind == "bn":
            tb.bn(
                path,
                leaves.get("weight"), leaves.get("bias"),
                leaves.get("running_mean"), leaves.get("running_var"),
            )

    # head-level buffers (init_pose etc.) found under 'head.' group roots
    for name in ("init_pose", "init_shape", "init_cam"):
        key = f"head.{name}"
        if key in state_dict:
            tb.buffers.setdefault("head", {})[name] = _np(
                state_dict[key]
            ).reshape(-1)

    return {
        "params": tb.params,
        "batch_stats": tb.batch_stats,
        "buffers": tb.buffers,
        "unmatched": unmatched,
    }


def merge_converted(
    variables: dict, converted: dict
) -> tuple[dict, dict]:
    """Overlay converted tensors onto an initialized variable tree.

    Shape-mismatched or missing leaves keep their initialized values
    (mirrors the reference's tolerant loading,
    pocolib/utils/train_utils.py:138-158).

    Returns:
        (merged_variables, stats) where stats counts loaded/skipped leaves.
    """
    import jax.numpy as jnp

    stats = {"loaded": 0, "skipped": 0}

    def overlay(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                stats["skipped"] += 1
                continue
            if isinstance(v, dict):
                out[k] = overlay(dst[k], v, f"{path}/{k}")
            else:
                if tuple(np.shape(dst[k])) == tuple(np.shape(v)):
                    out[k] = jnp.asarray(v, jnp.asarray(dst[k]).dtype)
                    stats["loaded"] += 1
                else:
                    stats["skipped"] += 1
        return out

    result = dict(variables)
    for col in ("params", "batch_stats", "buffers"):
        if col in variables and col in converted and converted[col]:
            result[col] = overlay(variables[col], converted[col])
    result_stats = dict(stats)
    return result, result_stats


def get_model_path(logdir: str, inf_model: str = "best") -> str:
    """Resolve a checkpoint inside a run logdir.

    Mirrors the reference's inference-time selection
    (train_utils.py:126-136, --inf_model demo flag): "best" ->
    best_model, "best_mpjpe_var" -> the uncertainty-tie-broken snapshot,
    anything else -> the newest checkpoint in the directory.
    """
    import glob
    import os

    candidates = {
        "best": os.path.join(logdir, "best_model"),
        "best_mpjpe_var": os.path.join(logdir, "best_model_mpjpe_var"),
        # camera-calibrated snapshot (tools/camera_bringup.py)
        "cam": os.path.join(logdir, "best_model_cam"),
        "best_cam": os.path.join(logdir, "best_model_cam"),
        "last": os.path.join(logdir, "last"),
        "latest": os.path.join(logdir, "last"),  # demo.py help alias
    }
    path = candidates.get(inf_model)
    if path and os.path.exists(path):
        return path

    def _is_checkpoint(c: str) -> bool:
        if c.endswith((".pt", ".ckpt")):
            return True
        # orbax checkpoint dirs carry metadata/manifest markers; plain
        # logdir folders (code/, images/, rendered/...) must not win the
        # newest-entry fallback
        return os.path.isdir(c) and any(
            os.path.exists(os.path.join(c, m))
            for m in ("_METADATA", "manifest.ocdbt", "d", "_CHECKPOINT_METADATA")
        )

    ckpts = sorted(
        (c for c in glob.glob(os.path.join(logdir, "*")) if _is_checkpoint(c)),
        key=os.path.getmtime,
    )
    if not ckpts:
        raise FileNotFoundError(f"no checkpoint in {logdir}")
    return ckpts[-1]


def restore_checkpoint_tree(path: str):
    """Template-free orbax restore that survives topology changes.

    `StandardCheckpointer().restore(path)` replays the SAVED shardings,
    so a checkpoint written on an 8-device mesh refuses to load on a
    single chip ("available devices are different from the devices used
    to save") — breaking the train-on-pod, eval/demo-on-one-chip
    workflow the reference supports trivially via torch.load
    (train_utils.py:126-136 loads any .pt anywhere). Fast path first
    (same topology: arrays land directly on their saved devices); on the
    topology-mismatch ValueError, re-restore every leaf as host numpy
    via per-leaf RestoreArgs — consumers re-place on device themselves
    (jit sharding / jnp.asarray / device_put).
    """
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    try:
        return ckptr.restore(path)
    except ValueError:
        import jax

        item = ckptr.metadata(path).item_metadata
        leaves, treedef = jax.tree_util.tree_flatten(item)
        restore_args = jax.tree_util.tree_unflatten(
            treedef,
            [ocp.RestoreArgs(restore_type=np.ndarray)] * len(leaves),
        )
        return ckptr.restore(path, restore_args=restore_args)


def load_torch_checkpoint(path: str) -> dict:
    """Read a torch checkpoint file into a flat state_dict
    (unwraps 'model' / 'state_dict' nesting, poco.py:134-136)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    # strip Lightning's 'model.' prefix if present
    if any(k.startswith("model.") for k in ckpt):
        ckpt = {
            (k[len("model."):] if k.startswith("model.") else k): v
            for k, v in ckpt.items()
        }
    return ckpt
