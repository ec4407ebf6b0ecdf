"""Peak-memory evidence for the sequence-parallel matching rewrite.

VERDICT round 3 (weak #4): the round-3 sharded correlation materialized
per-shard [B, L, S/D] f32 sim/logconf tensors (~0.7 GB/pair/chip at the
highres_eval point) — exactly what ops/pallas_dual_softmax.py exists to
avoid. Round 4 rewired dual_softmax_match_stats_sharded to run the SAME
fused two-pass kernels per shard. This script puts numbers on the claim via
XLA's own compile-time memory analysis (no execution, so it can run while
sized far beyond eval batch sizes):

  * impl='xla' (the round-3 formulation, kept as the CPU-mesh reference)
    compiled on the 8-device virtual mesh -> per-device temp bytes
  * impl='pallas' single-shard equivalent (dual_softmax_match_stats on the
    [L, S_local] tile a model=2 shard owns) compiled for the real TPU ->
    temp bytes (the two-pass kernel's HBM temps are the O(L)+O(S) stats
    rows; all [row_tile, S] work lives in scoped VMEM)

    python benchmarks/sharded_memory.py [--tpu]   # --tpu adds the device run
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fmt(n):
    return f"{n / 1e9:.3f} GB" if n > 1e8 else f"{n / 1e6:.1f} MB"


def cpu_mesh_xla(L, S, C, B, n_dev=8):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_dev}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from featurematching_tpu.ops.sharded_matching import (
        dual_softmax_match_stats_sharded,
    )
    from featurematching_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=n_dev // 2, n_model=2)
    f0 = jnp.zeros((B, L, C), jnp.bfloat16)
    f1 = jnp.zeros((B, S, C), jnp.bfloat16)
    fn = jax.jit(
        lambda a, b: dual_softmax_match_stats_sharded(
            a, b, mesh, 0.1, batch_axis="data", impl="xla"
        )
    )
    mem = fn.lower(f0, f1).compile().memory_analysis()
    return dict(
        impl="xla-mesh(4,2)",
        temp=int(mem.temp_size_in_bytes),
        args=int(mem.argument_size_in_bytes),
        out=int(mem.output_size_in_bytes),
    )


def tpu_single_shard(L, S_local, C, B):
    """The fused two-pass kernel over the [L, S_local] tile one model-shard
    owns — per-chip memory of the round-4 sharded path (identical kernels;
    the only extras are O(L) row-stat collectives)."""
    import jax
    import jax.numpy as jnp

    from featurematching_tpu.ops.pallas_dual_softmax import dual_softmax_match_stats

    f0 = jnp.zeros((B, L, C), jnp.bfloat16)
    f1 = jnp.zeros((B, S_local, C), jnp.bfloat16)
    fn = jax.jit(lambda a, b: dual_softmax_match_stats(a, b, temperature=0.1))
    mem = fn.lower(f0, f1).compile().memory_analysis()
    return dict(
        impl="pallas-single-shard",
        temp=int(mem.temp_size_in_bytes),
        args=int(mem.argument_size_in_bytes),
        out=int(mem.output_size_in_bytes),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    # highres_eval_config operating point: 1280x960 at 1/8 -> 120*160 tokens
    L = S = 120 * 160
    C, D = 64, 2
    rows = []
    if args.tpu:
        # one pair on one chip owning one model shard
        rows.append(tpu_single_shard(L, S // D, C, B=1))
    else:
        # B=4 = one pair per 'data' shard; analysis is per-device, so the
        # reported temp is per-pair-per-chip
        rows.append(cpu_mesh_xla(L, S, C, B=4))
    for r in rows:
        print(
            f"[sharded_memory] {r['impl']}: temp {fmt(r['temp'])} "
            f"args {fmt(r['args'])} out {fmt(r['out'])}"
        )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(L=L, S=S, C=C, model_shards=D, rows=rows), f, indent=1)


if __name__ == "__main__":
    main()
