"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's torch.distributed plumbing (/root/reference/utils/comm.py).

The reference wraps NCCL/gloo process groups with pickled object gathers
(comm.py:95-219). Here distribution is declarative: build a Mesh, shard the
batch over the 'data' axis, replicate params, and jit/GSPMD inserts the
gradient psum and any resharding collectives over ICI. Metric aggregation is
an in-graph mean over the global batch — no host pickle path exists at all.

Axis conventions:
  'data'  — batch sharding (DP). Always present.
  'model' — reserved for tensor/sequence sharding of the [L, S] correlation
            stage at higher resolutions (SURVEY.md §5 long-context notes).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    arr = np.array(devices[:use]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place every leaf with its leading (batch) axis sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
