"""Shared kernel-tuning knobs: chunk budgets + Mosaic scoped-VMEM limits.

Round-5 finding: several hot train kernels had their chunk sizes capped by
Mosaic's DEFAULT 16 MB scoped-VMEM budget (pallas_swin_block_grad bwd chunk
16 @ C=64, pallas_coarse_grad bwd 480 rows, pallas_fine_stage 64 windows —
each documented as "one step up OOMs"). A v5e core has 128 MB of VMEM; the
16 MB default exists to leave double-buffering headroom, not as a hardware
wall. `vmem_params(mb)` lets a kernel raise the limit when its sweep says a
bigger working set wins, and `TUNE`-style dicts make the chunk budgets
overridable at trace time so one process can A/B configurations
(benchmarks/chunk_sweep.py) without the tunnel's ±8% cross-process noise.
"""

from __future__ import annotations

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS_TPU = True
except Exception:  # pragma: no cover
    _HAS_PALLAS_TPU = False


def vmem_params(mb: int):
    """CompilerParams raising the scoped-VMEM limit to `mb` MiB (0/None ->
    keep the Mosaic default)."""
    if not mb or not _HAS_PALLAS_TPU:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=int(mb) << 20)
