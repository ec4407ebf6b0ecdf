"""Device A/B: fused streaming coarse transformer vs the XLA flax stack.

Validates the Mosaic lowering + bf16 numerics of
ops/pallas_coarse_transformer.py (interpret tests cannot exercise bf16 on
XLA:CPU) and measures the stage speedup at the flagship operating point
([4, 4800, 256] bf16, 8 alternating self/cross layers).

Run on the TPU (one device process at a time — docs/ROADMAP.md):
    python benchmarks/coarse_ab.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    cache_dir = os.path.expanduser("~/.cache/fmtpu_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from featurematching_tpu.models.transformer import LocalFeatureTransformer
    from featurematching_tpu.ops.pallas_coarse_transformer import (
        coarse_transformer_fused,
    )

    B, N, C, h = 4, 4800, 256, 8
    names = ("self", "cross") * 4
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    tf = LocalFeatureTransformer(C, h, names, "linear", dtype)
    variables = jax.jit(tf.init, backend="cpu")(
        jax.random.PRNGKey(0), jnp.zeros((1, N, C)), jnp.zeros((1, N, C))
    )
    params = jax.device_put(jax.tree.map(np.asarray, variables))
    f0 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32) * 0.5).astype(dtype)
    f1 = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32) * 0.5).astype(dtype)

    flax_fn = jax.jit(lambda p, a, b: tf.apply(p, a, b))
    fused_fn = jax.jit(
        lambda p, a, b: coarse_transformer_fused(a, b, p["params"], names, h)
    )

    r0, r1 = flax_fn(params, f0, f1)
    g0, g1 = fused_fn(params, f0, f1)
    d0 = float(jnp.max(jnp.abs(r0.astype(jnp.float32) - g0.astype(jnp.float32))))
    d1 = float(jnp.max(jnp.abs(r1.astype(jnp.float32) - g1.astype(jnp.float32))))
    m = float(jnp.max(jnp.abs(r0.astype(jnp.float32))))
    print(f"max |diff|: {d0:.4f} / {d1:.4f} (activation magnitude ~{m:.1f})")
    assert d0 < 0.2 and d1 < 0.2, "fused coarse transformer diverges"

    def bench(fn, iters=20):
        float(jnp.sum(fn(params, f0, f1)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(params, f0, f1)
        float(jnp.sum(r[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1000

    for name, fn in [("flax/xla", flax_fn), ("fused", fused_fn)]:
        print(f"{name:9s} {bench(fn):7.2f} ms/call")

    if "--grad" not in sys.argv:
        return

    # ---- fwd+bwd A/B (the training-path slice) ----
    from featurematching_tpu.ops.pallas_coarse_grad import (
        coarse_transformer_train,
    )

    def loss_flax(p, a, b):
        r0, r1 = tf.apply(p, a, b)
        return jnp.sum(r0.astype(jnp.float32) ** 2) + jnp.sum(
            r1.astype(jnp.float32) ** 2
        )

    def loss_fused(p, a, b):
        r0, r1 = coarse_transformer_train(
            a, b, p["params"], names, h, None, False
        )
        return jnp.sum(r0.astype(jnp.float32) ** 2) + jnp.sum(
            r1.astype(jnp.float32) ** 2
        )

    # device-mode numerical check of the fused backward (the interpret-mode
    # tests only cover f32 on XLA:CPU; this validates the bf16 flash-style
    # recompute path on real hardware before trusting its timings)
    gf = jax.jit(jax.grad(loss_flax))(params, f0, f1)
    gp = jax.jit(jax.grad(loss_fused))(params, f0, f1)
    worst_rel, worst_name = 0.0, ""
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gf),
        jax.tree_util.tree_leaves_with_path(gp),
    ):
        a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
        scale = float(jnp.max(jnp.abs(a32))) + 1e-6
        rel = float(jnp.max(jnp.abs(a32 - b32))) / scale
        if rel > worst_rel:
            worst_rel, worst_name = rel, jax.tree_util.keystr(path)
    print(f"grad max scaled |diff|: {worst_rel:.4f} at {worst_name}")
    assert worst_rel < 0.05, (
        f"fused backward diverges from flax autodiff: {worst_rel:.4f} "
        f"at {worst_name}"
    )

    def bench_grad(loss, iters=15):
        g = jax.jit(jax.grad(loss))
        r = g(params, f0, f1)
        float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = g(params, f0, f1)
        float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters * 1000

    for name, loss in [("flax grad", loss_flax), ("fused grad", loss_fused)]:
        print(f"{name:10s} {bench_grad(loss):7.2f} ms/call (fwd+bwd)")


if __name__ == "__main__":
    main()
