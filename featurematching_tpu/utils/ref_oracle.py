"""Load the reference implementation (/root/reference) as a torch CPU oracle.

Used by the parity tests and the trained-quality parity experiment
(benchmarks/trained_parity.py). The reference imports three packages absent
from this image — timm, loguru, kornia — so minimal shims provide exactly the
symbols its modules touch, implemented to the upstream-documented semantics
(inference behavior only; DropPath is identity, which matches the reference's
drop_path_rate for the modules we drive).

Nothing here runs on TPU; this is host-side test/benchmark support.
"""

from __future__ import annotations

import importlib
import sys
import types

REF = "/root/reference"


def install_timm_shim() -> None:
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    shim = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x  # eval-mode identity

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0, std)
        return tensor

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    shim.models = models
    sys.modules["timm"] = shim
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def install_loguru_shim() -> None:
    if "loguru" in sys.modules:
        return
    shim = types.ModuleType("loguru")

    class _Logger:
        def warning(self, *a, **k):
            pass

        info = debug = error = warning

    shim.logger = _Logger()
    sys.modules["loguru"] = shim


def install_kornia_shim() -> None:
    """kornia isn't in this image; provide the two symbols the reference's
    fine matching uses, implemented to kornia's documented semantics:
    create_meshgrid (x,y order, [-1,1] inclusive) and
    dsnt.spatial_expectation2d (probability-weighted grid expectation)."""
    if "kornia" in sys.modules:
        return
    import torch as _t

    kornia = types.ModuleType("kornia")
    geometry = types.ModuleType("kornia.geometry")
    subpix = types.ModuleType("kornia.geometry.subpix")
    dsnt = types.ModuleType("kornia.geometry.subpix.dsnt")
    utils = types.ModuleType("kornia.utils")
    grid_mod = types.ModuleType("kornia.utils.grid")

    def create_meshgrid(H, W, normalized_coordinates=True, device=None, dtype=None):
        if normalized_coordinates:
            xs = _t.linspace(-1.0, 1.0, W, device=device, dtype=dtype)
            ys = _t.linspace(-1.0, 1.0, H, device=device, dtype=dtype)
        else:
            xs = _t.arange(W, device=device, dtype=dtype or _t.float32)
            ys = _t.arange(H, device=device, dtype=dtype or _t.float32)
        gy, gx = _t.meshgrid(ys, xs, indexing="ij")
        return _t.stack([gx, gy], dim=-1)[None]  # [1, H, W, 2] (x, y)

    def spatial_expectation2d(heatmap, normalized_coordinates=True):
        B, N, H, W = heatmap.shape
        grid = create_meshgrid(
            H, W, normalized_coordinates, heatmap.device, heatmap.dtype
        ).reshape(1, 1, H * W, 2)
        return (heatmap.reshape(B, N, H * W, 1) * grid).sum(2)  # [B, N, 2]

    grid_mod.create_meshgrid = create_meshgrid
    utils.create_meshgrid = create_meshgrid  # `from kornia.utils import create_meshgrid`
    dsnt.spatial_expectation2d = spatial_expectation2d
    subpix.dsnt = dsnt
    geometry.subpix = subpix
    utils.grid = grid_mod
    kornia.geometry = geometry
    kornia.utils = utils
    sys.modules["kornia"] = kornia
    sys.modules["kornia.geometry"] = geometry
    sys.modules["kornia.geometry.subpix"] = subpix
    sys.modules["kornia.geometry.subpix.dsnt"] = dsnt
    sys.modules["kornia.utils"] = utils
    sys.modules["kornia.utils.grid"] = grid_mod


def install_shims() -> None:
    install_timm_shim()
    install_loguru_shim()
    install_kornia_shim()


def load_ref_module(relpath: str):
    """Import a reference module as part of its package (relative imports)."""
    install_shims()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    modname = relpath.replace("/", ".").removesuffix(".py")
    return importlib.import_module(modname)


def sd_numpy(module) -> dict:
    # .numpy() on a CPU tensor ALIASES the parameter storage — in-place
    # optimizer updates would silently mutate the snapshot. Copy.
    return {
        k: v.detach().cpu().numpy().copy() for k, v in module.state_dict().items()
    }
