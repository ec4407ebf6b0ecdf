"""Checkpoint loading shared by the inference apps.

The Runner saves the FULL train state (params, batch_stats, opt_state, step);
orbax's StandardRestore rejects subset templates, so apps restore the on-disk
tree without a template and extract the model variables.
"""

from __future__ import annotations

import os
from typing import Dict, Optional


def load_matcher_variables(ckpt_dir: str, step: Optional[int] = None) -> Dict:
    """Restore {'params', 'batch_stats'} from a Runner checkpoint directory.

    Accepts either the workdir's `ckpt/` directory or the workdir itself.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(ckpt_dir)
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    if os.path.isdir(os.path.join(path, "ckpt")) and not any(
        n.isdigit() for n in os.listdir(path)
    ):
        path = os.path.join(path, "ckpt")

    mngr = ocp.CheckpointManager(path)
    if step is None:
        step = mngr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint steps under {path}")
    restored = mngr.restore(step)  # no template: on-disk structure
    params = restored["params"]
    batch_stats = restored.get("batch_stats", {}) or {}
    return {"params": params, "batch_stats": batch_stats}
