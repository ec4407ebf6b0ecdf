"""Profiling scopes and throughput timers.

Replaces /root/reference/utils/profiler.py (PL profilers + cuda.synchronize
brackets) and demo/utils.py:14-53 (AverageTimer) with:
  * `profile_trace` — a jax.profiler trace context writing TensorBoard-viewable
    traces (the TPU-native equivalent of PyTorchProfiler);
  * `annotate` — named TraceAnnotation scopes around pipeline stages
    (equivalent of InferenceProfiler's bracketed actions);
  * `Timer` — EMA wall-clock stage timer with an explicit completion barrier.

Completion-barrier note: on tunnel-attached platforms (axon) block_until_ready
can be a no-op, so `sync()` fetches a scalar to the host — the only reliable
barrier there. On local CPU/TPU that fetch is equivalent and cheap.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def sync(tree) -> None:
    """Reliable completion barrier: host-fetch one scalar per leaf tree."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        x = leaves[0]
        if hasattr(x, "astype"):
            float(jnp.sum(x.astype(jnp.float32)))


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation for a pipeline stage (shows up in traces)."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """EMA stage timer (demo/utils.py AverageTimer semantics, no smoothing lag
    on the first sample)."""

    def __init__(self, smoothing: float = 0.3):
        self.smoothing = smoothing
        self.times: Dict[str, float] = {}
        self.will_print: Dict[str, bool] = {}
        self.reset()

    def reset(self) -> None:
        self.start = time.perf_counter()
        self.last = self.start

    def update(self, name: str, result=None) -> None:
        now_ = time.perf_counter()
        if result is not None:
            sync(result)
            now_ = time.perf_counter()
        dt = now_ - self.last
        if name in self.times:
            self.times[name] = self.smoothing * dt + (1 - self.smoothing) * self.times[name]
        else:
            self.times[name] = dt
        self.will_print[name] = True
        self.last = now_

    def print(self, text: str = "Timer") -> None:
        total = 0.0
        parts = []
        for name, t in self.times.items():
            if self.will_print.get(name):
                parts.append(f"{name}={t:.3f}")
                total += t
        fps = 1.0 / total if total > 0 else 0.0
        print(f"[{text}] " + " ".join(parts) + f" total={total:.3f} sec ({fps:.1f} FPS)")
        self.reset()
