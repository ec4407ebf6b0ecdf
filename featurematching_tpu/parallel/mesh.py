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


def make_global_mesh(per_host_batch: int, n_model: int = 1) -> Mesh:
    """('data', 'model') mesh spanning ALL processes, with each host's devices
    contiguous along 'data' so `shard_batch` maps host b's local batch to
    global rows [b*bs : (b+1)*bs]. The per-host 'data' extent is
    gcd(per_host_batch, local_device_count) so the local batch always divides
    onto the local mesh slice."""
    import math

    local_n = max(1, math.gcd(per_host_batch, jax.local_device_count()))
    devs: list = []
    for p in range(jax.process_count()):
        pdevs = [d for d in jax.devices() if d.process_index == p]
        devs.extend(pdevs[:local_n])
    return make_mesh(
        n_data=local_n * jax.process_count(), n_model=n_model, devices=devs
    )


def spans_processes(mesh: Mesh) -> bool:
    return len({d.process_index for d in mesh.devices.flat}) > 1


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place every leaf with its leading (batch) axis sharded over 'data'.

    Multi-process: each host passes its LOCAL batch; the result is a global
    array of leading dim bs*process_count (host_local_array_to_global_array
    over DCN — the jax analog of DistributedSampler + NCCL scatter)."""
    if spans_processes(mesh):
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            batch, mesh, P("data")
        )
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh (all processes
    must hold identical values — same-seed init or restored checkpoint)."""
    if spans_processes(mesh):
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(tree, mesh, P())
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def unshard_rows(tree: Any, mesh: Mesh) -> Any:
    """Inverse of shard_batch: global 'data'-sharded arrays -> this host's
    local rows as numpy."""
    if spans_processes(mesh):
        from jax.experimental import multihost_utils

        tree = multihost_utils.global_array_to_host_local_array(
            tree, mesh, P("data")
        )
    return jax.device_get(tree)
