"""Device A/B: fused fine-stage kernel, fold-softargmax mode vs plain mode.

Validates the Mosaic lowering of the folded correlation+softmax (interpret
tests cannot do that) and measures the saved window-writeback + XLA-chain
time at the flagship operating point ([4096, 49, 64] bf16 windows).

Run on the TPU (one device process at a time — docs/ROADMAP.md):
    python benchmarks/fold_ab.py
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
    from featurematching_tpu.ops.pallas_fine_stage import fine_stage_fused

    B_, N, C, nhead = 4096, 49, 64, 8
    layer_names = ("self", "cross")
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    tf = LocalFeatureTransformer(C, nhead, layer_names, "linear", dtype)
    w0h = rng.standard_normal((B_, N, C)).astype(np.float32)
    w1h = rng.standard_normal((B_, N, C)).astype(np.float32)
    variables = jax.jit(tf.init, backend="cpu")(
        jax.random.PRNGKey(0), jnp.zeros((2, N, C)), jnp.zeros((2, N, C))
    )
    params = jax.device_put(
        jax.tree.map(np.asarray, variables)["params"]
    )
    mix0 = {
        "kernel": jnp.asarray(rng.standard_normal((N, 1)).astype(np.float32) * 0.3),
        "bias": jnp.asarray(rng.standard_normal((1,)).astype(np.float32)),
    }
    mix1 = {
        "kernel": jnp.asarray(rng.standard_normal((N, 1)).astype(np.float32) * 0.3),
        "bias": jnp.asarray(rng.standard_normal((1,)).astype(np.float32)),
    }
    w0 = jnp.asarray(w0h).astype(dtype)
    w1 = jnp.asarray(w1h).astype(dtype)

    @jax.jit
    def plain(w0, w1):
        a0, a1, m0, m1 = fine_stage_fused(
            w0, w1, params, mix0, mix1, layer_names, nhead
        )
        temp = 1.0 / (C**0.5)
        h0 = jax.nn.softmax(
            temp * jnp.einsum(
                "bc,brc->br", m0.astype(jnp.float32), a1.astype(jnp.float32)
            ),
            axis=-1,
        )
        h1 = jax.nn.softmax(
            temp * jnp.einsum(
                "bc,brc->br", m1.astype(jnp.float32), a0.astype(jnp.float32)
            ),
            axis=-1,
        )
        return h0, h1

    @jax.jit
    def folded(w0, w1):
        return fine_stage_fused(
            w0, w1, params, mix0, mix1, layer_names, nhead, fold_softargmax=True
        )

    # --- numerics (Mosaic vs XLA correlation/softmax) ---
    hp0, hp1 = plain(w0, w1)
    hf0, hf1 = folded(w0, w1)
    d0 = float(jnp.max(jnp.abs(hp0 - hf0)))
    d1 = float(jnp.max(jnp.abs(hp1 - hf1)))
    s0 = float(jnp.max(jnp.abs(jnp.sum(hf0, -1) - 1.0)))
    print(f"max |heat diff|: {d0:.3e} / {d1:.3e}; max |sum-1|: {s0:.2e}")
    assert d0 < 2e-3 and d1 < 2e-3, "fold mode diverges from XLA path"

    # --- timing (host-fetch sync; tunnel block_until_ready is a no-op) ---
    def bench(fn, iters=30):
        float(jnp.sum(fn(w0, w1)[0]))  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(w0, w1)
        float(jnp.sum(r[0]))
        return (time.perf_counter() - t0) / iters * 1000

    for name, fn in [("plain+xla", plain), ("folded", folded)]:
        ms = bench(fn)
        print(f"{name:10s} {ms:7.3f} ms/iter")


if __name__ == "__main__":
    main()
