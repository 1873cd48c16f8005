"""poco-tpu: TPU-native human-mesh-recovery with per-prediction confidence.

A from-scratch JAX/XLA re-creation of the POCO framework (3DV 2024):
SMPL pose/shape/camera estimation with per-joint uncertainty from a
RealNVP confidence flow, PARE and CLIFF regressor heads over HRNet
backbones, 3DPW-style evaluation sharded across TPU chips, and an
image/video demo whose crop->backbone->head->SMPL->confidence path
compiles into a single XLA program.

Quick start:

    from poco_tpu import build_poco_cliff, init_poco, synthetic_smpl_model
    import jax

    model = build_poco_cliff()
    smpl = synthetic_smpl_model(num_verts=6890)   # or resolve_smpl_params()
    variables = init_poco(model, jax.random.PRNGKey(0), smpl)
    out = jax.jit(model.apply)(variables, batch, smpl)

See PARITY.md for the component-by-component mapping to the reference
framework and SURVEY.md for the architecture blueprint.
"""

from .models.poco import (
    POCO,
    PocoConfig,
    build_hmr,
    build_poco_cliff,
    build_poco_pare,
    init_poco,
    make_dummy_batch,
)
from .smpl.assets import (
    load_smpl_model,
    resolve_smpl_params,
    synthetic_smpl_model,
)
from .smpl.lbs import SmplParams, smpl_forward

__version__ = "0.1.0"

__all__ = [
    "POCO",
    "PocoConfig",
    "SmplParams",
    "build_hmr",
    "build_poco_cliff",
    "build_poco_pare",
    "init_poco",
    "load_smpl_model",
    "make_dummy_batch",
    "resolve_smpl_params",
    "smpl_forward",
    "synthetic_smpl_model",
]
