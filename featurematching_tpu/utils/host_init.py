"""Host-side parameter initialization for tunnel-attached accelerators.

On relay/tunnel platforms (axon), DOWNLOADING large program outputs is ~0.5
MB/s while UPLOADS run ~15 MB/s — so materializing ~90 MB of params via an
on-device `model.init` costs minutes, but building them on the host and
`device_put`-ing costs seconds. `host_init_variables` gets the variable
pytree structure from `jax.eval_shape` (no device execution) and fills it
with numpy: LeCun-normal kernels, zeros for biases/means, ones for
scales/vars. Used by bench.py and the driver entry where only *plausible*
weights are needed; training/demo quality paths keep the exact flax init.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _fill(path: str, shape, dtype, rng: np.random.Generator) -> np.ndarray:
    name = path.split("/")[-1].lower()
    if "scale" in name or name == "var":
        return np.ones(shape, dtype)
    if "bias" in name or name == "mean":
        return np.zeros(shape, dtype)
    arr = rng.standard_normal(shape).astype(np.float32)
    if len(shape) >= 2:
        fan_in = int(np.prod(shape[:-1]))
        arr *= 1.0 / np.sqrt(max(fan_in, 1))
    else:
        arr *= 0.02
    return arr.astype(dtype)


def host_init_variables(model, rng_key, *init_args, seed: int = 0, **init_kwargs) -> Any:
    """Structure-faithful random variables without device execution."""
    shapes = jax.eval_shape(model.init, rng_key, *init_args, **init_kwargs)
    rng = np.random.default_rng(seed)

    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    leaves = []
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        leaves.append(_fill(name, leaf.shape, leaf.dtype, rng))
    host_tree = jax.tree_util.tree_unflatten(treedef, leaves)
    return jax.device_put(host_tree)
