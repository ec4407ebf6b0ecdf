"""Ablation bench: which part of the fused Swin block kernel costs what.

Builds kernel variants with pieces disabled and times them chained (one
dispatch, REP sequential applications) at the flagship stage shapes.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/swin_block_ablate.py
"""

from __future__ import annotations

import functools
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
    from jax.experimental import pallas as pl

    from featurematching_tpu.ops.pallas_swin_block import _erf_approx

    rng = np.random.default_rng(0)

    def kernel(
        x_ref,
        ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref, wproj_ref, bproj_ref,
        ln2s_ref, ln2b_ref, wm1_ref, bm1_ref, wm2_ref, bm2_ref,
        out_ref,
        *, num_heads, parts,
    ):
        CH, N, C = x_ref.shape
        h = num_heads
        d = C // h
        x = x_ref[...]
        dtype = x.dtype

        def ln(v, s_ref, b_ref):
            v32 = v.astype(jnp.float32)
            mu = jnp.mean(v32, axis=-1, keepdims=True)
            var = jnp.mean((v32 - mu) ** 2, axis=-1, keepdims=True)
            out = (v32 - mu) * jax.lax.rsqrt(var + 1e-6)
            return (out * s_ref[...] + b_ref[...]).astype(dtype)

        hx = ln(x, ln1s_ref, ln1b_ref) if "ln" in parts else x
        if "qkv" in parts:
            hx2 = hx.reshape(CH * N, C)
            qkv = (
                jax.lax.dot_general(
                    hx2, wqkv_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bqkv_ref[...].astype(jnp.float32)
            ).astype(dtype).reshape(CH, N, 3 * C)
            q = qkv[:, :, :C]
            k = qkv[:, :, C : 2 * C]
            v = qkv[:, :, 2 * C :]
        else:
            q = k = v = hx

        if "attn" in parts:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, C), 2)
            kbig = jnp.concatenate(
                [jnp.where((lane // d) == hi, k, jnp.zeros_like(k)) for hi in range(h)],
                axis=1,
            )
            s = jax.lax.dot_general(
                q, kbig,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * (d**-0.5)
            s = s + bias_ref[...]
            if "softmax" in parts:
                ps = [
                    jax.nn.softmax(s[:, :, hi * N : (hi + 1) * N], axis=-1)
                    for hi in range(h)
                ]
                p = (ps[0] if h == 1 else jnp.concatenate(ps, axis=-1)).astype(dtype)
            else:
                p = s.astype(dtype)
            vbig = jnp.concatenate(
                [jnp.where((lane // d) == hi, v, jnp.zeros_like(v)) for hi in range(h)],
                axis=1,
            )
            acc = jax.lax.dot_general(
                p, vbig,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        else:
            acc = q

        if "proj" in parts:
            o2 = acc.reshape(CH * N, C)
            o2 = (
                jax.lax.dot_general(
                    o2, wproj_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bproj_ref[...].astype(jnp.float32)
            ).astype(dtype)
            x = x + o2.reshape(CH, N, C)
        else:
            x = x + acc

        if "mlp" in parts:
            h2 = (ln(x, ln2s_ref, ln2b_ref) if "ln" in parts else x).reshape(
                CH * N, C
            )
            y = (
                jax.lax.dot_general(
                    h2, wm1_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bm1_ref[...].astype(jnp.float32)
            )
            if "gelu" in parts:
                y = y * 0.5 * (1.0 + _erf_approx(y * 0.7071067811865476))
            y = y.astype(dtype)
            y = (
                jax.lax.dot_general(
                    y, wm2_ref[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + bm2_ref[...].astype(jnp.float32)
            ).astype(dtype)
            out_ref[...] = x + y.reshape(CH, N, C)
        else:
            out_ref[...] = x

    def build(B_, N, C, heads, chunk, parts):
        HID = 4 * C
        kfn = functools.partial(kernel, num_heads=heads, parts=parts)
        return pl.pallas_call(
            kfn,
            grid=(B_ // chunk,),
            in_specs=[
                pl.BlockSpec((chunk, N, C), lambda g: (g, 0, 0)),
                pl.BlockSpec((C,), lambda g: (0,)),
                pl.BlockSpec((C,), lambda g: (0,)),
                pl.BlockSpec((C, 3 * C), lambda g: (0, 0)),
                pl.BlockSpec((3 * C,), lambda g: (0,)),
                pl.BlockSpec((N, heads * N), lambda g: (0, 0)),
                pl.BlockSpec((C, C), lambda g: (0, 0)),
                pl.BlockSpec((C,), lambda g: (0,)),
                pl.BlockSpec((C,), lambda g: (0,)),
                pl.BlockSpec((C,), lambda g: (0,)),
                pl.BlockSpec((C, HID), lambda g: (0, 0)),
                pl.BlockSpec((HID,), lambda g: (0,)),
                pl.BlockSpec((HID, C), lambda g: (0, 0)),
                pl.BlockSpec((C,), lambda g: (0,)),
            ],
            out_specs=pl.BlockSpec((chunk, N, C), lambda g: (g, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B_, N, C), jnp.bfloat16),
        )

    ALL = frozenset({"ln", "qkv", "attn", "softmax", "proj", "mlp", "gelu"})
    VARIANTS = [
        ("full", ALL),
        ("io_only", frozenset()),
        ("no_attn", ALL - {"attn", "softmax"}),
        ("no_softmax", ALL - {"softmax"}),
        ("no_mlp", ALL - {"mlp", "gelu"}),
        ("no_gelu", ALL - {"gelu"}),
        ("no_ln", ALL - {"ln"}),
    ]

    ITERS, REP = 10, 10
    for (B_, N, C, heads, chunk) in [
        (2400, 64, 64, 4, 32),
        (640, 64, 128, 8, 8),
        (160, 64, 256, 16, 2),
    ]:
        x = jnp.asarray(
            rng.standard_normal((B_, N, C)).astype(np.float32)
        ).astype(jnp.bfloat16)
        HID = 4 * C
        mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.02)
        args = [
            mk(C) + 1.0, mk(C), mk(C, 3 * C).astype(jnp.bfloat16), mk(3 * C),
            mk(N, heads * N), mk(C, C).astype(jnp.bfloat16), mk(C),
            mk(C) + 1.0, mk(C), mk(C, HID).astype(jnp.bfloat16), mk(HID),
            mk(HID, C).astype(jnp.bfloat16), mk(C),
        ]
        print(f"== [{B_},{N},{C}] h{heads} chunk{chunk} ==", flush=True)
        for name, parts in VARIANTS:
            call = build(B_, N, C, heads, chunk, parts)

            def chained(x):
                for _ in range(REP):
                    x = call(x, *args)
                return x

            fn = jax.jit(chained)
            out = fn(x)
            float(jnp.sum(out.astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(x)
            float(jnp.sum(out.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / ITERS / REP * 1000
            print(f"   {name:12s} {dt:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
