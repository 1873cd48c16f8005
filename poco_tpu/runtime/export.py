"""Ahead-of-time export & serving artifacts (StableHLO via jax.export).

The reference has no deployment story: every consumer rebuilds the model
from a yacs config and a torch checkpoint at startup
(/root/reference/pocolib/core/tester.py:55-111). For TPU serving we
instead lower the fused inference program (preprocessed 224px crops ->
backbone -> head -> SMPL LBS -> projection -> uncertainty) ahead of time
with `jax.export` and ship a self-contained artifact directory:

    meta.json           model cfg, batch buckets, dtypes, platforms,
                        SMPL static fields, jax version
    forward_b{N}.jexp   serialized StableHLO program per batch bucket
    variables.npz       flattened model variables (params / batch_stats /
                        buffers), bf16-safe
    smpl.npz            SMPL weight arrays baked with the artifact

Loading the artifact needs jax + numpy only — no flax module code, no
config parsing, no tracing: startup is a file read plus one executable
load per bucket. Programs are lowered for BOTH cpu and tpu by default,
so an artifact exported on a CPU build host serves unchanged on TPU.

Batch handling mirrors the demo runtime: requests are padded up to the
smallest bucket that fits (one compiled program per bucket, no dynamic
shapes — XLA sees static shapes only) and large requests are chunked by
the largest bucket.
"""

from __future__ import annotations

import json
import os
import os.path as osp
from dataclasses import asdict
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

META_NAME = "meta.json"
VARIABLES_NAME = "variables.npz"
SMPL_NAME = "smpl.npz"
FORMAT_VERSION = 1

# Outputs cast to fp16 on device when compact=True (rendering-grade;
# <=1 mm at body scale — same policy as PocoTester._forward_compact).
_HEAVY_KEYS = ("smpl_vertices", "smpl_joints3d", "smpl_joints2d")


# ----------------------------------------------------------------------
# flat <-> nested variable trees (npz-safe, bf16-safe)

def _flatten_tree(tree: dict, sep: str = "/") -> dict[str, np.ndarray]:
    """Nested dict -> {'a/b/c': array}. Plain Python (no flax) so the
    load side stays jax+numpy only; separator collisions are rejected
    at export time rather than silently corrupting the key space."""
    flat: dict[str, np.ndarray] = {}

    def rec(prefix: tuple[str, ...], node: Any) -> None:
        if hasattr(node, "items"):
            for k, v in node.items():
                k = str(k)
                if sep in k:
                    raise ValueError(
                        f"parameter name {k!r} contains separator {sep!r}"
                    )
                rec(prefix + (k,), v)
        else:
            flat[sep.join(prefix)] = np.asarray(node)

    rec((), tree)
    return flat


def _unflatten_tree(flat: dict[str, np.ndarray], sep: str = "/") -> dict:
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _plain_dict(tree: Any) -> Any:
    """FrozenDict -> plain nested dict (leaves untouched)."""
    if hasattr(tree, "items"):
        return {k: _plain_dict(v) for k, v in tree.items()}
    return tree


def _save_npz(path: str, flat: dict[str, np.ndarray]) -> dict[str, str]:
    """np.savez with bfloat16 support (stored as uint16 views).

    Returns the key->dtype map for entries that needed re-typing; the
    caller records it in meta.json.
    """
    retyped: dict[str, str] = {}
    out = {}
    for k, v in flat.items():
        v = np.asarray(v)
        if v.dtype.name == "bfloat16":
            retyped[k] = "bfloat16"
            v = v.view(np.uint16)
        out[k] = v
    np.savez(path, **out)
    return retyped


def _load_npz(path: str, retyped: dict[str, str]) -> dict[str, np.ndarray]:
    import ml_dtypes

    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    for k, dt in retyped.items():
        flat[k] = flat[k].view(ml_dtypes.bfloat16)
    return flat


# ----------------------------------------------------------------------
# export

def export_poco(
    model,
    variables: dict,
    smpl,
    out_dir: str,
    batch_sizes: tuple[int, ...] = (1, 32),
    platforms: tuple[str, ...] = ("cpu", "tpu"),
    compact: bool = False,
    data_parallel: int | None = None,
    uint8_input: bool = False,
) -> str:
    """Export `model.apply` inference to an AOT artifact directory.

    Args:
        model: a POCO flax module (models/poco.py).
        variables: its variables (params/batch_stats/buffers).
        smpl: SmplParams to bake with the artifact.
        out_dir: artifact directory (created).
        batch_sizes: static batch buckets, one exported program each.
        platforms: lowering platforms (default cpu+tpu: export anywhere,
            serve on TPU). Ignored for data-parallel exports, which are
            lowered on the target topology's own platform.
        compact: cast vertex/joint outputs to fp16 on device.
        data_parallel: shard each batch over this many devices (SPMD
            over a 1-D mesh, weights replicated, XLA partitioning baked
            into the artifact — one dispatch drives the whole slice).
            Requires the devices at export time AND at load time; every
            batch bucket must be divisible by it.
        uint8_input: the exported program takes RAW uint8 crops and
            normalizes on device (training constants baked in) — 4x
            smaller host->device uploads and no host normalize pass;
            the natural serving format (clients send camera crops).

    Returns out_dir.
    """
    from poco_tpu.models.poco import make_dummy_batch
    from poco_tpu.smpl.lbs import SmplParams

    os.makedirs(out_dir, exist_ok=True)
    batch_sizes = tuple(sorted(set(int(b) for b in batch_sizes)))
    if not batch_sizes or batch_sizes[0] < 1:
        raise ValueError(f"batch_sizes must be positive, got {batch_sizes}")

    smpl_arrays = {
        f: np.asarray(getattr(smpl, f))
        for f in (
            "v_template", "shapedirs", "posedirs", "j_regressor",
            "lbs_weights", "j_regressor_extra", "faces",
        )
    }
    parents = tuple(int(p) for p in smpl.parents)
    vertex_joint_ids = tuple(int(i) for i in smpl.vertex_joint_ids)

    def forward(variables, smpl_arrays, batch):
        sp = SmplParams(
            parents=parents,
            vertex_joint_ids=vertex_joint_ids,
            **smpl_arrays,
        )
        if uint8_input:
            from poco_tpu.ops.preprocess import normalize_image

            batch = dict(batch)
            # normalize_image expects [0, 255] (max_val default)
            batch["img"] = normalize_image(batch["img"].astype(jnp.float32))
        out = model.apply(variables, batch, sp, train=False)
        out = {k: v for k, v in out.items() if v is not None}
        if compact:
            for k in _HEAVY_KEYS:
                if k in out:
                    out[k] = out[k].astype(jnp.float16)
        return out

    var_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        _plain_dict(variables),
    )
    smpl_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), smpl_arrays
    )

    if data_parallel:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = jax.devices()
        if len(devs) < data_parallel:
            raise ValueError(
                f"data_parallel={data_parallel} but only {len(devs)} "
                "devices visible"
            )
        bad = [b for b in batch_sizes if b % data_parallel]
        if bad:
            raise ValueError(
                f"batch buckets {bad} not divisible by "
                f"data_parallel={data_parallel}"
            )
        mesh = Mesh(np.asarray(devs[:data_parallel]), ("data",))
        replicated = NamedSharding(mesh, P())
        batch_sharded = NamedSharding(mesh, P("data"))
        jit_forward = jax.jit(
            forward,
            in_shardings=(
                jax.tree.map(lambda _: replicated, var_spec),
                jax.tree.map(lambda _: replicated, smpl_spec),
                batch_sharded,
            ),
            out_shardings=batch_sharded,
        )
        # Sharded programs carry a concrete device assignment; lowering
        # is for the local topology's platform only.
        export_kwargs: dict[str, Any] = {}
        platforms = (jax.default_backend(),)
    else:
        jit_forward = jax.jit(forward)
        export_kwargs = {"platforms": list(platforms)}

    output_keys: list[str] = []
    for b in batch_sizes:
        batch = make_dummy_batch(model.cfg, batch_size=b, include_gt=False)
        batch_spec = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch
        )
        if uint8_input:
            batch_spec["img"] = jax.ShapeDtypeStruct(
                batch["img"].shape, np.uint8
            )
        exp = jax.export.export(jit_forward, **export_kwargs)(
            var_spec, smpl_spec, batch_spec
        )
        with open(osp.join(out_dir, f"forward_b{b}.jexp"), "wb") as f:
            f.write(exp.serialize())
        if not output_keys:
            out_tree = jax.eval_shape(forward, var_spec, smpl_spec, batch_spec)
            output_keys = sorted(out_tree.keys())

    flat_vars = _flatten_tree(variables)
    retyped = _save_npz(osp.join(out_dir, VARIABLES_NAME), flat_vars)
    smpl_retyped = _save_npz(osp.join(out_dir, SMPL_NAME), smpl_arrays)

    cfg = asdict(model.cfg)
    cfg = {k: (list(v) if isinstance(v, tuple) else v) for k, v in cfg.items()}
    meta = {
        "format_version": FORMAT_VERSION,
        "model_cfg": cfg,
        "compute_dtype": jnp.dtype(model.dtype).name,
        "batch_sizes": list(batch_sizes),
        "platforms": list(platforms),
        "compact": bool(compact),
        "uint8_input": bool(uint8_input),
        "data_parallel": int(data_parallel) if data_parallel else None,
        "batch_keys": sorted(
            make_dummy_batch(model.cfg, 1, include_gt=False).keys()
        ),
        "output_keys": output_keys,
        "variables_bf16_keys": retyped,
        "smpl_bf16_keys": smpl_retyped,
        "smpl_static": {
            "parents": list(parents),
            "vertex_joint_ids": list(vertex_joint_ids),
        },
        "jax_version": jax.__version__,
    }
    with open(osp.join(out_dir, META_NAME), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


# ----------------------------------------------------------------------
# load + serve

class ExportedPoco:
    """A loaded AOT artifact: padded/bucketed batch prediction.

    Needs only jax + numpy (the StableHLO programs embed the model; no
    flax module code or config parsing happens at load time).
    """

    def __init__(self, path: str):
        with open(osp.join(path, META_NAME)) as f:
            self.meta = json.load(f)
        if self.meta.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.meta.get('format_version')} != "
                f"supported {FORMAT_VERSION}"
            )
        self.path = path
        self.batch_sizes = sorted(self.meta["batch_sizes"])
        self.batch_keys = list(self.meta["batch_keys"])
        self.uint8_input = bool(self.meta.get("uint8_input", False))
        flat_vars = _load_npz(
            osp.join(path, VARIABLES_NAME),
            self.meta.get("variables_bf16_keys", {}),
        )
        self.variables = _unflatten_tree(flat_vars)
        self.smpl_arrays = dict(_load_npz(
            osp.join(path, SMPL_NAME), self.meta.get("smpl_bf16_keys", {})
        ))
        self._calls: dict[int, Any] = {}
        self._warm: set[int] = set()
        self._resident = False
        self._mesh_cache = None

    def _mesh(self):
        """1-D 'data' mesh over the first data_parallel local devices.

        A sharded export must run under a mesh of the export-time size;
        the concrete devices need not match (`in_shardings_jax` re-maps
        the baked HloShardings onto this mesh)."""
        if self._mesh_cache is None:
            from jax.sharding import Mesh

            dp = int(self.meta["data_parallel"])
            devs = jax.devices()
            if len(devs) < dp:
                raise ValueError(
                    f"artifact needs {dp} devices, host has {len(devs)}"
                )
            self._mesh_cache = Mesh(np.asarray(devs[:dp]), ("data",))
        return self._mesh_cache

    def _ensure_resident(self) -> None:
        """Move weights + SMPL to device once; requests then ship only
        the batch (per-call numpy trees would re-upload ~all model bytes
        over the host<->device link on every request)."""
        if not self._resident:
            if self.meta.get("data_parallel"):
                # Replicate weights over the artifact's mesh once; a
                # bare device_put would commit them to device 0 and
                # fight the program's baked-in replication.
                from jax.sharding import NamedSharding, PartitionSpec as P

                repl = NamedSharding(self._mesh(), P())
                self.variables = jax.device_put(self.variables, repl)
                self.smpl_arrays = jax.device_put(self.smpl_arrays, repl)
            else:
                self.variables = jax.device_put(self.variables)
                self.smpl_arrays = jax.device_put(self.smpl_arrays)
            self._resident = True

    def _call_for(self, bucket: int):
        fn = self._calls.get(bucket)
        if fn is None:
            with open(osp.join(self.path, f"forward_b{bucket}.jexp"), "rb") as f:
                exp = jax.export.deserialize(f.read())
            if self.meta.get("data_parallel"):
                # exp.*_shardings_jax return FLAT tuples aligned with the
                # flattened avals; jit wants them shaped like the call's
                # (args, kwargs) / outputs pytrees — unflatten via the
                # treedefs the export recorded.
                mesh = self._mesh()
                args_sh, kwargs_sh = jax.tree.unflatten(
                    exp.in_tree, list(exp.in_shardings_jax(mesh))
                )
                assert not kwargs_sh, "exported forward takes no kwargs"
                out_sh = jax.tree.unflatten(
                    exp.out_tree, list(exp.out_shardings_jax(mesh))
                )
                fn = jax.jit(
                    exp.call, in_shardings=args_sh, out_shardings=out_sh
                )
            else:
                fn = jax.jit(exp.call)
            self._calls[bucket] = fn
        return fn

    def warmup(self) -> None:
        """Dispatch every bucket once (compile + weight upload)."""
        self._ensure_resident()
        for b in self.batch_sizes:
            batch = {
                k: np.zeros((b,) + self._key_shape(k), self._key_dtype(k))
                for k in self.batch_keys
            }
            jax.block_until_ready(
                self._call_for(b)(self.variables, self.smpl_arrays, batch)
            )
            self._warm.add(b)

    def buckets_for(self, n: int) -> list[int]:
        """Bucket sequence a size-n request dispatches to (chunking rule)."""
        largest = self.batch_sizes[-1]
        return [
            next(
                (b for b in self.batch_sizes if b >= min(largest, n - s)),
                largest,
            )
            for s in range(0, n, largest)
        ]

    def is_warm(self, n: int) -> bool:
        """True when every program a size-n dispatch needs has already
        run once (deserialize + jit compile + weight upload done) — i.e.
        dispatching now returns quickly instead of stalling the caller
        on a synchronous compile. Serving uses this to decide whether to
        flush a completed wave before dispatching the next one."""
        return all(b in self._warm for b in self.buckets_for(n))

    def _key_shape(self, key: str) -> tuple[int, ...]:
        res = self.meta["model_cfg"]["img_res"]
        return {
            "img": (res, res, 3),
            "bbox_info": (3,),
            "focal_length": (),
            "scale": (),
            "center": (2,),
            "orig_shape": (2,),
        }[key]

    def _key_dtype(self, key: str):
        if key == "img" and self.uint8_input:
            return np.uint8
        return np.float32

    def predict_async(self, batch: dict[str, np.ndarray]) -> "PendingPrediction":
        """Dispatch inference without waiting for the outputs.

        Pads up to the smallest bucket that fits; chunks by the largest
        bucket when the request exceeds it. All chunk dispatches are
        enqueued (jax dispatch is async); the returned handle's
        `.result()` fetches host numpy. Splitting dispatch from fetch
        lets a serving loop overlap wave N's device->host download with
        wave N+1's upload+compute (MicroBatcher does exactly that).
        """
        missing = [k for k in self.batch_keys if k not in batch]
        if missing:
            raise KeyError(f"batch missing keys {missing}")
        n = int(np.shape(batch[self.batch_keys[0]])[0])
        if n == 0:
            raise ValueError("empty batch")
        if self.uint8_input and np.asarray(batch["img"]).dtype != np.uint8:
            raise ValueError(
                "artifact was exported with uint8_input=True (on-device "
                f"normalize); got img dtype {np.asarray(batch['img']).dtype}"
                " — send raw uint8 crops"
            )
        self._ensure_resident()
        largest = self.batch_sizes[-1]
        chunks: list[tuple[dict, int]] = []
        for start in range(0, n, largest):
            chunk = {
                k: np.asarray(batch[k])[start : start + largest]
                for k in self.batch_keys
            }
            m = int(chunk[self.batch_keys[0]].shape[0])
            bucket = next(
                (b for b in self.batch_sizes if b >= m), largest
            )
            if m < bucket:
                chunk = {
                    k: np.concatenate(
                        [v, np.repeat(v[-1:], bucket - m, axis=0)], axis=0
                    )
                    for k, v in chunk.items()
                }
            out = self._call_for(bucket)(
                self.variables, self.smpl_arrays, chunk
            )
            self._warm.add(bucket)
            chunks.append((out, m))
        return PendingPrediction(chunks)

    def predict(self, batch: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        """Run inference on a host batch of any size (dispatch + fetch)."""
        return self.predict_async(batch).result()


class PendingPrediction:
    """Handle to in-flight dispatches; `.result()` fetches host numpy."""

    def __init__(self, chunks: list[tuple[dict, int]]):
        self._chunks = chunks

    def result(self) -> dict[str, np.ndarray]:
        # Start every device->host copy before consuming any:
        # np.asarray alone fetches the keys SEQUENTIALLY, one
        # synchronous round trip each — measured 373 ms/request for
        # 12 output keys over a tunneled chip vs 49 ms overlapped
        # (BENCHMARKS.md "Serving under load").
        for out, _ in self._chunks:
            for v in out.values():
                if hasattr(v, "copy_to_host_async"):
                    v.copy_to_host_async()
        outs = [
            {k: np.asarray(v)[:m] for k, v in out.items()}
            for out, m in self._chunks
        ]
        if len(outs) == 1:
            return outs[0]
        return {
            k: np.concatenate([o[k] for o in outs], axis=0)
            for k in outs[0]
        }


def load_exported(path: str) -> ExportedPoco:
    return ExportedPoco(path)
