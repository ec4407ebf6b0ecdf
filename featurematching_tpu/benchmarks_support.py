"""Support glue for benchmarks/profile_inference.py --train.

Builds the jitted flagship train step (fwd + bwd + adamw, fused Pallas
blocks) around an existing variables tree so the device-op profiler can
trace a training iteration the same way it traces the inference forward.
"""

from __future__ import annotations

import numpy as np


def make_train_callable(cfg, variables, img0, img1):
    """Returns (fwd, fetch): fwd() runs one train step on a synthetic
    supervised batch at img0's shape; fetch(result) host-syncs a scalar."""
    import jax
    import jax.numpy as jnp
    import optax

    from featurematching_tpu.data.synthetic import synthetic_batch
    from featurematching_tpu.models.matcher import Matcher
    from featurematching_tpu.train.step import TrainState, make_opt_state, make_train_step

    B, H, W = img0.shape[0], img0.shape[1], img0.shape[2]
    rng = np.random.default_rng(0)
    b = synthetic_batch(rng, batch_size=B, image_size=(H, W))
    batch_dev = {k: jnp.asarray(v) for k, v in b.items()}

    model = Matcher(cfg.model)
    tx = optax.adamw(1e-4, weight_decay=0.1)
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=make_opt_state(tx, params),
        tx=tx,
    )
    step = jax.jit(make_train_step(model, cfg))
    key = jax.random.PRNGKey(1)

    holder = {"state": state}

    def fwd():
        holder["state"], metrics = step(holder["state"], batch_dev, key)
        return metrics

    def fetch(metrics):
        return float(metrics["loss"])

    return fwd, fetch
