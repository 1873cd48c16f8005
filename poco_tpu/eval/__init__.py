"""Evaluation: batched metrics, sharded runner, uncertainty post-processing."""

from .metrics import mpjpe, pa_mpjpe, procrustes_align, vertex_error
from .runner import EvalResult, pw3d_split_report, run_eval
from .uncertainty import global_uncert, kinematic_uncert, prepare_uncert
