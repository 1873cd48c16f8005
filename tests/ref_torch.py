"""Import the actual reference torch modules (/root/reference/pocolib).

The reference depends on four packages absent from this image (yacs,
loguru, flatten_dict, torchvision) plus a mean-SMPL-params npz asset.
None of them affect the numerics under test, so this module installs
minimal stand-ins in sys.modules and synthesizes the npz, letting the
real reference code — hrnet_cls.py, hrnet.py, cliff_head.py,
pare_head.py, poco_head.py, nf_head.py — run unmodified at full width.

Used by tests/test_fullwidth_parity.py to retire the "never verified
against the actual reference network" risk: every parity test elsewhere
uses hand-built tiny clones; these run the reference's own code.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

_REFERENCE_ROOT = "/root/reference"
_installed = False


class _CfgNode(dict):
    """Just enough of yacs.config.CfgNode for the reference backbones."""

    def __init__(self, d=None, **kw):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = _CfgNode(v) if isinstance(v, dict) else v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v

    def clone(self):
        import copy

        return copy.deepcopy(self)

    def merge_from_file(self, f):  # pragma: no cover - unused in tests
        pass

    def freeze(self):
        pass

    def defrost(self):
        pass


def install_reference_stubs() -> None:
    """Install sys.modules stand-ins and put /root/reference on sys.path."""
    global _installed
    if _installed:
        return

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    yacs_config = stub("yacs.config", CfgNode=_CfgNode)
    stub("yacs", config=yacs_config)

    class _Logger:
        def __getattr__(self, k):
            return lambda *a, **kw: None

    stub("loguru", logger=_Logger())
    stub("pytorch_lightning")  # train_utils imports it at module level

    def _flatten(d, reducer="tuple"):  # pragma: no cover - unused in tests
        raise NotImplementedError("flatten_dict stub")

    stub("flatten_dict", flatten=_flatten, unflatten=_flatten)

    def _no_url(*a, **kw):
        raise RuntimeError("no network in tests")

    tvmu = stub("torchvision.models.utils", load_state_dict_from_url=_no_url)
    tvm = stub("torchvision.models", utils=tvmu)
    stub("torchvision", models=tvm)

    # smplx: only referenced as a base class / type at import time here
    # (the SMPL stage is excluded from these tests — see test docstring).
    class _SmplBase:
        pass

    smplx_bm = stub("smplx.body_models", SMPLOutput=dict)
    smplx_lbs = stub("smplx.lbs", vertices2joints=_no_url)
    stub("smplx", SMPL=_SmplBase, body_models=smplx_bm, lbs=smplx_lbs)

    if _REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, _REFERENCE_ROOT)
    _installed = True


def write_mean_params(path: str, seed: int = 7) -> str:
    """Synthesize data/smpl_mean_params.npz (pose 6d x24, shape 10, cam 3).

    The real asset is license-gated; the heads only need *some* buffer
    values and the converter carries them across, so deterministic
    random values exercise the identical code path.
    """
    rng = np.random.RandomState(seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(
        path,
        pose=(rng.randn(144) * 0.05).astype(np.float32),
        shape=(rng.randn(10) * 0.02).astype(np.float64),  # ref casts this one
        cam=np.array([0.9, 0.0, 0.0], np.float32),
    )
    return path


def import_reference_modules(tmp_path) -> types.SimpleNamespace:
    """Import the reference model modules, patching the mean-params path.

    Returns a namespace with the factories/classes used by the parity
    tests. Must be called with a pytest tmp_path (or any writable dir).
    """
    install_reference_stubs()
    mean_path = write_mean_params(str(tmp_path / "data" / "smpl_mean_params.npz"))

    import importlib

    from pocolib.models.backbone.hrnet import hrnet_w32
    from pocolib.models.backbone.hrnet_cls import hrnet_w48_cls
    from pocolib.models.head.nf_head import flow_head
    from pocolib.models.head.poco_head import poco_head
    from pocolib.utils.geometry import batch_rodrigues

    cliff_mod = importlib.import_module("pocolib.models.head.cliff_head")
    hmr_mod = importlib.import_module("pocolib.models.head.hmr_head")
    pare_mod = importlib.import_module("pocolib.models.head.pare_head")

    # SMPL_MEAN_PARAMS is bound into each head module at import time as a
    # relative path; point the bindings at the synthesized asset.
    cliff_mod.SMPL_MEAN_PARAMS = mean_path
    pare_mod.SMPL_MEAN_PARAMS = mean_path
    hmr_mod.SMPL_MEAN_PARAMS = mean_path

    return types.SimpleNamespace(
        hrnet_w32=hrnet_w32,
        hrnet_w48_cls=hrnet_w48_cls,
        cliff_head=cliff_mod.cliff_head,
        hmr_head=hmr_mod.hmr_head,
        pare_head=pare_mod.pare_head,
        poco_head=poco_head,
        nf_head=flow_head,
        batch_rodrigues=batch_rodrigues,
        mean_params_path=mean_path,
    )


def randomize_bn_stats(module, seed: int = 0) -> None:
    """Give every BN layer non-trivial affine params."""
    import torch
    import torch.nn as tnn

    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            m.weight.data = torch.rand(m.weight.shape, generator=g) + 0.5
            m.bias.data = torch.randn(m.bias.shape, generator=g) * 0.05


def calibrate_bn(module, *inputs) -> None:
    """Set BN running stats to the actual activation statistics.

    Randomly chosen running stats diverge from the true layer statistics
    and compound multiplicatively over a 70-layer net (activations reach
    1e10); one train-mode pass with momentum=1 pins running mean/var to
    the calibration batch so eval-mode activations stay O(1) — the
    regime the parity tolerances are meant for.
    """
    import torch
    import torch.nn as tnn

    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
            m.momentum = 1.0
    module.train()
    with torch.no_grad():
        module(*inputs)
    module.eval()
