"""Optimizer/scheduler factory as optax chains.

Replaces /root/reference/optimizers/__init__.py:5-42 (adam/adamw +
MultiStepLR/CosineAnnealing/ExponentialLR) and the manual per-step warmup
inside Lightning.optimizer_step (lightning_new.py:320-339) with a single
optax schedule: warmup composes with the decay schedule instead of mutating
param-group LRs imperatively.

LR scaling follows the reference's canonical rule (config.py:100-108):
true_lr = canonical_lr * global_batch_size / canonical_bs.
"""

from __future__ import annotations

import optax

from featurematching_tpu.config import OptimizerConfig


def build_lr_schedule(
    cfg: OptimizerConfig, global_batch_size: int, steps_per_epoch: int
) -> optax.Schedule:
    true_lr = cfg.canonical_lr * global_batch_size / cfg.canonical_bs

    if cfg.scheduler == "multistep":
        # MultiStepLR(milestones in epochs, gamma) — config.py:118-121
        boundaries = {
            int(m * steps_per_epoch): cfg.mslr_gamma for m in cfg.mslr_milestones
        }
        decay = optax.piecewise_constant_schedule(true_lr, boundaries)
    elif cfg.scheduler == "cosine":
        decay = optax.cosine_decay_schedule(
            true_lr, decay_steps=cfg.cosa_tmax * steps_per_epoch
        )
    elif cfg.scheduler == "exponential":
        decay = lambda step: true_lr * cfg.elr_gamma**step  # noqa: E731
    else:
        raise ValueError(f"unknown scheduler {cfg.scheduler!r}")

    if cfg.warmup_steps <= 0:
        return decay

    if cfg.warmup_type == "constant":
        base = cfg.warmup_ratio * true_lr

        def sched(step):
            import jax.numpy as jnp

            return jnp.where(step < cfg.warmup_steps, base, decay(step))

        return sched

    # linear warmup from warmup_ratio*lr to the decay schedule
    # (lightning_new.py:325-330)
    def sched(step):
        import jax.numpy as jnp

        frac = jnp.minimum(step / cfg.warmup_steps, 1.0)
        warm = cfg.warmup_ratio * true_lr + frac * (
            true_lr - cfg.warmup_ratio * true_lr
        )
        return jnp.where(step < cfg.warmup_steps, warm, decay(step))

    return sched


def build_optimizer(
    cfg: OptimizerConfig, global_batch_size: int, steps_per_epoch: int
) -> optax.GradientTransformation:
    sched = build_lr_schedule(cfg, global_batch_size, steps_per_epoch)
    if cfg.name == "adamw":
        opt = optax.adamw(sched, weight_decay=cfg.adamw_decay)
    elif cfg.name == "adam":
        opt = optax.chain(
            optax.add_decayed_weights(cfg.adam_decay) if cfg.adam_decay else optax.identity(),
            optax.adam(sched),
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.name!r}")
    chain = [opt]
    if cfg.gradient_clipping and cfg.gradient_clipping > 0:
        # reference clips by NORM via PL gradient_clip_val (config.py:152)
        chain = [optax.clip_by_global_norm(cfg.gradient_clipping), opt]
    return optax.chain(*chain)
