"""Cross-host/chip aggregation — the TPU-native utils/comm.py.

The reference wrapped torch.distributed with pickled-object gathers over a
gloo side-group (/root/reference/utils/comm.py:83-219) to aggregate val
metrics across ranks (lightning_new.py:291-295). Here:

  * in-graph reductions (`psum_scalars`) ride ICI inside jit — gradients and
    streaming train metrics never touch the host;
  * host-level aggregation of fixed-shape eval arrays uses
    `multihost_utils.process_allgather` over DCN — no pickle, no padding
    protocol, because everything is already fixed-shape by design;
  * `synchronize` is a barrier; `shared_random_seed` agrees on a seed without
    an object gather (comm.py:222-233 equivalent).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def world_size() -> int:
    return jax.process_count()


def rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Barrier across hosts (comm.py:68-80 equivalent)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("featurematching_tpu.synchronize")


def all_gather_arrays(tree: Any) -> Any:
    """Gather identical-shape array pytrees from every host -> leading
    process axis. Replaces the pickled all_gather (comm.py:95-146)."""
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: np.asarray(x)[None], tree)
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree)


def reduce_scalars(scalars: Dict[str, float], average: bool = True) -> Dict[str, float]:
    """Host-level scalar reduction (comm.py reduce_dict:236-265)."""
    keys = sorted(scalars.keys())
    vec = np.asarray([float(scalars[k]) for k in keys], np.float64)
    gathered = all_gather_arrays(vec)  # [P, K]
    red = gathered.mean(0) if average else gathered.sum(0)
    return {k: float(v) for k, v in zip(keys, red)}


def psum_scalars(scalars: Dict[str, jnp.ndarray], axis: str) -> Dict[str, jnp.ndarray]:
    """In-graph psum over a mesh axis (for use inside shard_map bodies)."""
    return {k: jax.lax.psum(v, axis) for k, v in scalars.items()}


def shared_random_seed() -> int:
    """All hosts agree on one seed (comm.py:222-233)."""
    seed = np.random.randint(2**31)
    gathered = all_gather_arrays(np.asarray([seed], np.int64))
    return int(gathered.reshape(-1)[0])


def gather_concat_arrays(arr: np.ndarray) -> np.ndarray:
    """Concatenate per-host arrays whose leading dim may DIFFER across hosts.

    Unlike `all_gather_arrays` (equal shapes required), this first agrees on
    the max count, zero-pads, gathers, then trims each host's slice back to
    its true count — so ±1-batch val shards (BatchLoader strided sharding)
    aggregate exactly. Replaces the reference's pickled padded gather
    (/root/reference/utils/comm.py:113-174) with fixed-dtype arrays.
    """
    arr = np.asarray(arr)
    if jax.process_count() == 1:
        return arr
    counts = all_gather_arrays(np.asarray([arr.shape[0]], np.int64)).reshape(-1)
    n_max = int(counts.max())
    pad = np.zeros((n_max - arr.shape[0],) + arr.shape[1:], arr.dtype)
    padded = np.concatenate([arr, pad], 0) if n_max > arr.shape[0] else arr
    gathered = all_gather_arrays(padded)  # [P, n_max, ...]
    return np.concatenate(
        [gathered[p, : int(c)] for p, c in enumerate(counts)], 0
    )


def gather_metric_lists(metrics: Dict[str, List]) -> Dict[str, List]:
    """Concatenate per-host metric lists (fixed-shape numeric entries) across
    hosts — the eval-epoch aggregation path (lightning_new.py:291-295).

    Lists must have equal length on every host (pad eval shards to equal
    batch counts — BatchLoader's strided sharding guarantees +-1; callers
    drop_last for exactness).
    """
    if jax.process_count() == 1:
        return metrics
    out: Dict[str, List] = {}
    for k, v in metrics.items():
        arr = np.asarray(v)
        gathered = all_gather_arrays(arr)
        out[k] = list(gathered.reshape(-1, *arr.shape[1:]))
    return out
