"""Training/eval runner: the explicit loop replacing pl.Trainer.

Re-design of /root/reference/lightning_new.py:187-339 (Lightning module) plus
the external pl.Trainer the reference relied on (SURVEY.md L5: the launcher
lived out-of-repo). One process per host; devices on each host participate
via the ('data','model') mesh; metric aggregation happens in-graph.

Checkpointing is orbax (async-capable), monitoring auc@5/10/20 like the
reference's ModelCheckpoint (lightning_new.py:310-312), and covers the
failure-recovery capability (SURVEY.md §5: resume via restore).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from featurematching_tpu.config import Config
from featurematching_tpu.data.loader import BatchLoader
from featurematching_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from featurematching_tpu.train.optimizer import build_optimizer
from featurematching_tpu.train.step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from featurematching_tpu.utils.logging import MetricWriter, get_logger
from featurematching_tpu.utils.metrics import (
    aggregate_metrics,
    compute_pose_errors,
    compute_symmetrical_epipolar_errors,
)


class CheckpointManager:
    """Thin orbax wrapper saving params/opt_state/step."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: TrainState) -> None:
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self.mngr.save(step, args=self._ocp.args.StandardSave(payload))
        self.mngr.wait_until_finished()

    def restore(self, state: TrainState, step: Optional[int] = None) -> TrainState:
        step = self.mngr.latest_step() if step is None else step
        if step is None:
            return state
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self.mngr.restore(
            step, args=self._ocp.args.StandardRestore(template)
        )
        return state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()


class Runner:
    def __init__(
        self,
        cfg: Config,
        train_loader: BatchLoader,
        val_loader: Optional[BatchLoader] = None,
        workdir: str = "runs/default",
        resume: bool = True,
    ):
        self.cfg = cfg
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.workdir = workdir
        self.log = get_logger()
        self.writer = MetricWriter(os.path.join(workdir, "logs"))
        self.ckpt = CheckpointManager(os.path.join(workdir, "ckpt"))

        # the 'data' axis cannot exceed what the per-host batch divides into
        import math

        n_data = math.gcd(cfg.trainer.batch_size, jax.local_device_count())
        self.mesh = make_mesh(n_data=n_data)
        global_bs = cfg.trainer.batch_size * jax.process_count()

        try:
            sample = next(iter(train_loader.epoch(0)))
        except StopIteration:
            raise ValueError(
                "train_loader yields no batches — dataset empty after "
                "filtering, or batch_size exceeds the per-host shard"
            ) from None
        sample = jax.tree.map(jnp.asarray, sample)
        self.tx = build_optimizer(
            cfg.trainer.optimizer, global_bs, cfg.trainer.steps_per_epoch
        )
        self.model, self.state = create_train_state(
            cfg, self.tx, jax.random.PRNGKey(cfg.trainer.seed), sample
        )
        if resume:
            prev = self.ckpt.latest_step()
            if prev is not None:
                self.state = self.ckpt.restore(self.state)
                self.log.info(f"resumed from checkpoint step {prev}")
        self.state = replicate(self.state, self.mesh)

        self.train_step = jax.jit(make_train_step(self.model, cfg))
        self.eval_step = jax.jit(make_eval_step(self.model, cfg))
        self.best_auc = -1.0

    def fit(self, num_epochs: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        num_epochs = num_epochs or cfg.trainer.num_epochs
        rng = jax.random.PRNGKey(cfg.trainer.seed + 1)
        last_val: Dict[str, float] = {}
        for epoch in range(num_epochs):
            for batch in self.train_loader.epoch(epoch):
                rng, step_rng = jax.random.split(rng)
                sbatch = shard_batch(
                    jax.tree.map(jnp.asarray, batch), self.mesh
                )
                self.state, metrics = self.train_step(self.state, sbatch, step_rng)
                step = int(jax.device_get(self.state.step))
                if step % 50 == 0:
                    scalars = {k: float(v) for k, v in metrics.items()}
                    self.writer.write(step, {f"train/{k}": v for k, v in scalars.items()})
                    self.log.info(
                        f"epoch {epoch} step {step}: "
                        + " ".join(f"{k}={v:.4f}" for k, v in scalars.items())
                    )
            if self.val_loader is not None:
                last_val = self.validate(epoch)
        return last_val

    def validate(self, epoch: int = 0) -> Dict[str, float]:
        """Val epoch: losses + epipolar/pose metrics + AUC aggregation
        (lightning_new.py:266-312)."""
        agg = {"identifiers": [], "R_errs": [], "t_errs": [], "epi_errs": []}
        losses = []
        key = jax.random.PRNGKey(0)
        for bi, batch in enumerate(self.val_loader.epoch(0)):
            jbatch = jax.tree.map(jnp.asarray, batch)
            out, loss = self.eval_step(self.state, jbatch)
            losses.append(float(loss.loss))
            epi = compute_symmetrical_epipolar_errors(
                out.fine.mkpts0_f, out.fine.mkpts1_f, out.coarse.mask,
                jbatch["T_0to1"], jbatch["K0"], jbatch["K1"],
            )
            key, k2 = jax.random.split(key)
            pose = compute_pose_errors(
                out.fine.mkpts0_f, out.fine.mkpts1_f, out.coarse.mask,
                jbatch["T_0to1"], jbatch["K0"], jbatch["K1"], k2,
                pixel_thr=self.cfg.trainer.ransac.pixel_thr,
                num_hypotheses=self.cfg.trainer.ransac.num_hypotheses,
            )
            epi_np = np.asarray(epi)
            mask_np = np.asarray(out.coarse.mask)
            for b in range(epi_np.shape[0]):
                agg["identifiers"].append(int(batch["pair_id"][b]))
                agg["epi_errs"].append(epi_np[b][mask_np[b]])
            agg["R_errs"].extend(np.asarray(pose["R_errs"]).tolist())
            agg["t_errs"].extend(np.asarray(pose["t_errs"]).tolist())

        results = aggregate_metrics(agg, self.cfg.trainer.ransac.epi_err_thr)
        results["val/loss"] = float(np.mean(losses)) if losses else float("nan")
        step = int(jax.device_get(self.state.step))
        self.writer.write(step, {f"val/{k}": v for k, v in results.items()})
        self.log.info(f"val epoch {epoch}: {results}")

        mean_auc = float(
            np.mean([results.get(f"auc@{t}", 0.0) for t in (5, 10, 20)])
        )
        if mean_auc >= self.best_auc:
            self.best_auc = mean_auc
            self.ckpt.save(step, jax.device_get(self.state))
        return results
