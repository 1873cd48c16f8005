"""JAX SMPL body model: batched LBS, assets, projection heads."""

from .assets import load_smpl_model, resolve_smpl_params, synthetic_smpl_model
from .lbs import SmplOutput, SmplParams, lbs, smpl_forward
from .model import smpl_49, smpl_head, smplcam_head
