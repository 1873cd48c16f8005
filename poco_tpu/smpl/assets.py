"""SMPL model asset loading: pkl/npz readers and a synthetic test model.

Real SMPL weights are license-gated and not shipped; this module can load
them from either the standard `.pkl` distribution (chumpy arrays are
unpickled without chumpy via a stub unpickler) or a plain `.npz`. For tests
and CI, :func:`synthetic_smpl_model` builds a structurally-faithful small
model (valid kinematic tree, normalized regressors/skinning weights) that
exercises every code path of the LBS pipeline deterministically.

Reference contract: the asset schema consumed by smplx's SMPL as used in
pocolib/models/head/smpl_head.py:12-34.
"""

from __future__ import annotations

import io
import os
import pickle
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..constants import (
    SMPL_NUM_BETAS,
    SMPL_NUM_JOINTS,
    SMPL_PARENTS,
    SMPL_VERTEX_JOINT_IDS,
)
from .lbs import SmplParams

NUM_EXTRA_JOINTS = 9  # J_regressor_extra rows (49-joint convention)


class _ChumpyStubUnpickler(pickle.Unpickler):
    """Unpickle SMPL pkl files without chumpy installed.

    chumpy arrays subclass ndarray; we substitute a plain ndarray subclass
    so `np.asarray` recovers the data.
    """

    def find_class(self, module: str, name: str) -> Any:
        if module.startswith("chumpy"):
            return _ChArray
        if module == "scipy.sparse.csc" and name == "csc_matrix":
            from scipy.sparse import csc_matrix

            return csc_matrix
        return super().find_class(module, name)


class _ChArray(np.ndarray):
    """Minimal stand-in for chumpy.Ch — data lives in the ndarray base."""

    def __setstate__(self, state):  # chumpy pickles a dict state
        if isinstance(state, dict):
            pass
        else:
            super().__setstate__(state)


def _to_np(x: Any) -> np.ndarray:
    import scipy.sparse as sp

    if sp.issparse(x):
        return np.asarray(x.todense())
    return np.asarray(x)


def load_smpl_pkl(path: str) -> dict[str, np.ndarray]:
    """Load a standard SMPL .pkl into plain numpy arrays."""
    with open(path, "rb") as f:
        data = _ChumpyStubUnpickler(io.BytesIO(f.read()), encoding="latin1").load()
    return {k: _to_np(v) if not isinstance(v, (str, int, float)) else v
            for k, v in data.items()}


def _params_from_dict(
    d: dict[str, np.ndarray],
    j_regressor_extra: np.ndarray | None,
    dtype=jnp.float32,
) -> SmplParams:
    v_template = np.asarray(d["v_template"], np.float32)
    num_verts = v_template.shape[0]
    shapedirs = np.asarray(d["shapedirs"], np.float32)[..., :SMPL_NUM_BETAS]
    posedirs = np.asarray(d["posedirs"], np.float32)
    if posedirs.ndim == 3:  # (V, 3, 207) -> (207, V*3)
        posedirs = posedirs.reshape(num_verts * 3, -1).T
    j_regressor = np.asarray(_to_np(d["J_regressor"]), np.float32)
    weights = np.asarray(d["weights"], np.float32)
    parents = d.get("kintree_table")
    if parents is not None:
        parents = np.asarray(parents)[0].astype(np.int64)
        parents[0] = -1
        parents = parents.astype(np.int32)
    else:
        parents = SMPL_PARENTS
    faces = np.asarray(d.get("f", np.zeros((0, 3))), np.int32)
    if j_regressor_extra is None:
        j_regressor_extra = np.zeros((NUM_EXTRA_JOINTS, num_verts), np.float32)
    vids = (
        SMPL_VERTEX_JOINT_IDS
        if num_verts > SMPL_VERTEX_JOINT_IDS.max()
        else SMPL_VERTEX_JOINT_IDS % num_verts
    )
    return SmplParams(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        j_regressor=jnp.asarray(j_regressor, dtype),
        lbs_weights=jnp.asarray(weights, dtype),
        parents=tuple(int(x) for x in parents),
        j_regressor_extra=jnp.asarray(j_regressor_extra, dtype),
        vertex_joint_ids=tuple(int(x) for x in vids),
        faces=jnp.asarray(faces, jnp.int32),
    )


def load_smpl_model(
    model_path: str,
    extra_regressor_path: str | None = None,
    dtype=jnp.float32,
) -> SmplParams:
    """Load SMPL weights from .pkl or .npz, plus the extra-joint regressor.

    Args:
        model_path: SMPL model file (`.pkl` standard distribution or `.npz`).
        extra_regressor_path: npy file with the (9, V) extra joint regressor
            (the reference's J_regressor_extra, smpl_head.py:18-19).
    """
    if model_path.endswith(".npz"):
        d = dict(np.load(model_path, allow_pickle=True))
    else:
        d = load_smpl_pkl(model_path)
    extra = None
    if extra_regressor_path and os.path.exists(extra_regressor_path):
        extra = np.load(extra_regressor_path).astype(np.float32)
    return _params_from_dict(d, extra, dtype)


def synthetic_smpl_model(
    num_verts: int = 432,
    num_betas: int = SMPL_NUM_BETAS,
    seed: int = 0,
    dtype=jnp.float32,
) -> SmplParams:
    """Deterministic structurally-valid small SMPL model for tests/benches.

    The geometry is random but the structure is faithful: a real kinematic
    tree, row-normalized joint regressors, softmax skinning weights
    concentrated on few joints, and small blendshape magnitudes, so LBS
    behaves like the real model numerically (no degenerate transforms).
    """
    rng = np.random.RandomState(seed)
    v_template = rng.uniform(-1.0, 1.0, (num_verts, 3)).astype(np.float32)
    shapedirs = (0.03 * rng.randn(num_verts, 3, num_betas)).astype(np.float32)
    posedirs = (0.01 * rng.randn(207, num_verts * 3)).astype(np.float32)

    j_reg = rng.rand(SMPL_NUM_JOINTS, num_verts).astype(np.float32) ** 4
    j_reg /= j_reg.sum(axis=1, keepdims=True)

    w = rng.randn(num_verts, SMPL_NUM_JOINTS).astype(np.float32) * 2.0
    w = np.exp(w - w.max(axis=1, keepdims=True))
    w /= w.sum(axis=1, keepdims=True)

    extra = rng.rand(NUM_EXTRA_JOINTS, num_verts).astype(np.float32) ** 4
    extra /= extra.sum(axis=1, keepdims=True)

    faces = rng.randint(0, num_verts, (2 * num_verts, 3)).astype(np.int32)

    return SmplParams(
        v_template=jnp.asarray(v_template, dtype),
        shapedirs=jnp.asarray(shapedirs, dtype),
        posedirs=jnp.asarray(posedirs, dtype),
        j_regressor=jnp.asarray(j_reg, dtype),
        lbs_weights=jnp.asarray(w, dtype),
        parents=tuple(int(x) for x in SMPL_PARENTS),
        j_regressor_extra=jnp.asarray(extra, dtype),
        vertex_joint_ids=tuple(int(x) for x in SMPL_VERTEX_JOINT_IDS % num_verts),
        faces=jnp.asarray(faces, jnp.int32),
    )


def resolve_smpl_params(
    model_dir: str | None = None,
    gender: str = "neutral",
    dtype=jnp.float32,
) -> SmplParams:
    """Load real SMPL weights if available, else the synthetic test model.

    Looks for `SMPL_{GENDER}.{pkl,npz}` under `model_dir` (or the
    `POCO_TPU_SMPL_DIR` environment variable).
    """
    model_dir = model_dir or os.environ.get("POCO_TPU_SMPL_DIR", "")

    def _find(g: str) -> str | None:
        for ext in ("npz", "pkl"):
            for name in (
                f"SMPL_{g.upper()}.{ext}",
                f"smpl_{g.lower()}.{ext}",
                f"basicmodel_{g[0].lower()}_lbs_10_207_0_v1.1.0.{ext}",
            ):
                path = os.path.join(model_dir, name)
                if os.path.exists(path):
                    return path
        return None

    if model_dir:
        path = _find(gender)
        if path is None and gender != "neutral":
            # a missing gendered file must NOT silently become random
            # synthetic geometry — fall back to the real neutral model
            # (with a notice), which keeps metrics meaningful
            path = _find("neutral")
            if path is not None:
                print(
                    f"SMPL {gender} model not found in {model_dir}; "
                    "using the neutral model for gendered GT"
                )
        if path is not None:
            extra = os.path.join(model_dir, "J_regressor_extra.npy")
            return load_smpl_model(path, extra, dtype)
        print(
            f"no SMPL weights found in {model_dir}; using the SYNTHETIC "
            "test model — metrics will not be meaningful"
        )
    return synthetic_smpl_model(dtype=dtype)
