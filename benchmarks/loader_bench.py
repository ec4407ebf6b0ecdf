"""Host-side loader throughput: native C++ cache loader vs Python BatchLoader.

The reference ships a C++/torch DataLoader path for its training input
pipeline; our TPU-native equivalent is `native/fmtpu_loader.cpp` (mmap'd
schema cache + threadpool gather + prefetch ring) exposed through
`featurematching_tpu.data.native_cache`. This benchmark quantifies it against
the pure-Python `BatchLoader` on identical data (CPU/host only — no TPU).

Run: python benchmarks/loader_bench.py
Measured 2026-08 (this container, 64 samples of 7.4 MB, batch 8, 8 threads):
    python loader:  ~4.8 samples/s
    native loader: ~36.5 samples/s  (7.6x)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from featurematching_tpu.data.loader import BatchLoader
from featurematching_tpu.data.native_cache import NativeBatchLoader, write_cache


class _SyntheticPairs:
    """64 pair-samples shaped like the SCARED training records (~7.4 MB each)."""

    def __init__(self, n: int):
        self.n = n
        rng = np.random.default_rng(0)
        self.img = rng.random((480, 640, 3)).astype(np.float32)

    def __len__(self) -> int:
        return self.n

    def __getitem__(self, i: int):
        return {
            "image0": self.img,
            "image1": self.img,
            "gt_kp0": np.zeros((512, 2), np.float32),
            "gt_kp1": np.zeros((512, 2), np.float32),
            "gt_mask": np.ones((512,), bool),
            "pair_id": np.int32(i),
        }


def main() -> None:
    n, batch = 64, 8
    ds = _SyntheticPairs(n)
    tmp = tempfile.mkdtemp(prefix="fmtpu_loader_bench_")
    cache = os.path.join(tmp, "pairs.fmtp")
    write_cache(cache, ds)

    py = BatchLoader(ds, batch, process_index=0, process_count=1)
    t0 = time.perf_counter()
    n_py = sum(b["image0"].shape[0] for b in py.epoch(0))
    dt_py = time.perf_counter() - t0

    nl = NativeBatchLoader(cache, batch, num_threads=8)
    t0 = time.perf_counter()
    n_nat = sum(b["image0"].shape[0] for b in nl.epoch(0))
    dt_nat = time.perf_counter() - t0
    nl.close()

    assert n_py == n_nat == n, (n_py, n_nat)
    print(
        json.dumps(
            {
                "metric": "loader_samples_per_s",
                "python": round(n / dt_py, 1),
                "native": round(n / dt_nat, 1),
                "speedup": round(dt_py / dt_nat, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
