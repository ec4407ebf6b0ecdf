"""Micro-bench the fused Swin block kernel across chunk sizes and shapes.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/swin_block_microbench.py

Shapes mirror the flagship 640x480 run (twin batch 8): stage0 2400x64x64,
stage1 640x64x128, stage2 160x64x256. Sync via scalar host fetch (tunnel
block_until_ready is a no-op — docs/ROADMAP.md).
"""

from __future__ import annotations

import os
import time

import numpy as np


def main() -> None:
    import jax

    cache_dir = os.path.expanduser("~/.cache/fmtpu_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from featurematching_tpu.ops.pallas_swin_block import swin_block_fused

    rng = np.random.default_rng(0)

    def params_for(C, heads, hid_mult=4):
        HID = C * hid_mult
        mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.02)
        return {
            "ln1_scale": mk(C) + 1.0, "ln1_bias": mk(C),
            "w_qkv": mk(C, 3 * C), "b_qkv": mk(3 * C),
            "rel_bias": mk(heads, 64, 64),
            "w_proj": mk(C, C), "b_proj": mk(C),
            "ln2_scale": mk(C) + 1.0, "ln2_bias": mk(C),
            "w_mlp1": mk(C, HID), "b_mlp1": mk(HID),
            "w_mlp2": mk(HID, C), "b_mlp2": mk(C),
        }

    ITERS = 20
    for (B_, N, C, heads, nW) in [
        (2400, 64, 64, 4, 300),
        (640, 64, 128, 8, 80),
        (160, 64, 256, 16, 20),
    ]:
        x = jnp.asarray(rng.standard_normal((B_, N, C)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        p = params_for(C, heads)
        mask_np = np.where(
            rng.random((nW, N, N)) > 0.5, 0.0, -100.0
        ).astype(np.float32)
        chunks = {64: (16, 32, 48), 128: (4, 8, 10), 256: (2, 4, 5)}[C]
        for has_mask in (False, True):
            mask = jnp.asarray(mask_np) if has_mask else None
            row = []
            for chunk in chunks:
                if B_ % chunk:
                    row.append((chunk, None))
                    continue
                REP = 10  # sequential applications inside ONE dispatch

                def chained(x, m, chunk=chunk):
                    for _ in range(REP):
                        x = swin_block_fused(x, m, p, heads, chunk=chunk)
                    return x

                fn = jax.jit(chained)
                out = fn(x, mask)
                float(jnp.sum(out.astype(jnp.float32)))  # compile+sync
                t0 = time.perf_counter()
                for _ in range(ITERS):
                    out = fn(x, mask)
                float(jnp.sum(out.astype(jnp.float32)))
                dt = (time.perf_counter() - t0) / ITERS / REP * 1000
                row.append((chunk, dt))
            cells = " ".join(
                f"c{c}={'--' if d is None else f'{d:.3f}ms'}" for c, d in row
            )
            print(f"[{B_:5d},{N},{C:3d}] h{heads:2d} mask={int(has_mask)}  {cells}",
                  flush=True)


if __name__ == "__main__":
    main()
