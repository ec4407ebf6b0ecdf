"""Process-aware logging + scalar metric writing.

Replaces the reference's loguru + rank-zero shim + TensorBoard plumbing
(/root/reference/utils/misc.py:30-39, lightning_new.py:236-312). Multi-host
aware via jax.process_index() instead of torch.distributed ranks.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, Optional


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def get_logger(name: str = "featurematching_tpu") -> logging.Logger:
    """Rank-zero console logger; non-zero hosts log at WARNING+ only."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s | %(levelname)s | %(name)s | %(message)s", "%H:%M:%S"
            )
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO if is_main_process() else logging.WARNING)
    return logger


class MetricWriter:
    """Append-only JSONL scalar writer + optional TensorBoard.

    JSONL is the source of truth (greppable, survives without TB deps);
    TensorBoard summaries are written when `tensorboard` is importable.
    """

    def __init__(self, logdir: str):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # cpu torch is baked in

            self._tb = SummaryWriter(logdir)
        except Exception:
            self._tb = None

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        if not is_main_process():
            return
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
