"""Conf-matrix-free sparse focal loss: value and gradient parity vs the
materialized reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from featurematching_tpu.ops.sparse_focal_loss import (
    naive_sparse_focal_loss,
    sparse_focal_loss,
)


def setup(rng, B=2, L=96, S=96, C=16, G=24):
    f0 = jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((B, S, C)).astype(np.float32))
    gi = jnp.asarray(rng.integers(0, L, (B, G)), jnp.int32)
    gj = jnp.asarray(rng.integers(0, S, (B, G)), jnp.int32)
    mask = jnp.asarray(rng.random((B, G)) < 0.8)
    inv_temp = 1.0 / (C * 0.1)
    return f0, f1, gi, gj, mask, inv_temp


class TestSparseFocalLoss:
    def test_value_matches_naive(self, rng):
        f0, f1, gi, gj, mask, it = setup(rng)
        a = float(sparse_focal_loss(f0, f1, gi, gj, mask, it, tile=32))
        b = float(naive_sparse_focal_loss(f0, f1, gi, gj, mask, it))
        np.testing.assert_allclose(a, b, rtol=1e-4)

    def test_grad_matches_naive(self, rng):
        f0, f1, gi, gj, mask, it = setup(rng)

        ga = jax.grad(
            lambda a, b: sparse_focal_loss(a, b, gi, gj, mask, it, tile=32),
            argnums=(0, 1),
        )(f0, f1)
        gb = jax.grad(
            lambda a, b: naive_sparse_focal_loss(a, b, gi, gj, mask, it),
            argnums=(0, 1),
        )(f0, f1)
        np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]), rtol=2e-3, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]), rtol=2e-3, atol=1e-6)

    def test_grad_matches_naive_nonsquare_and_ragged_tile(self, rng):
        f0, f1, gi, gj, mask, it = setup(rng, L=80, S=112, G=16)
        ga = jax.grad(
            lambda a, b: sparse_focal_loss(a, b, gi, gj, mask, it, tile=48),
            argnums=(0, 1),
        )(f0, f1)
        gb = jax.grad(
            lambda a, b: naive_sparse_focal_loss(a, b, gi, gj, mask, it),
            argnums=(0, 1),
        )(f0, f1)
        np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]), rtol=2e-3, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]), rtol=2e-3, atol=1e-6)

    def test_pallas_kernels_match_xla_tiling(self, rng):
        """Round-5 TPU path: the pass-1 LSE reuse + the fused backward
        kernel (interpret mode) must match the XLA tilings."""
        from featurematching_tpu.ops.sparse_focal_loss import (
            _logsumexps,
            _lses_pallas,
            _sfl_bwd_pallas,
        )

        B, L, S, C, G = 2, 96, 96, 16, 24
        f0, f1, gi, gj, mask, it = setup(rng, B=B, L=L, S=S, C=C, G=G)
        lr_p, lc_p = _lses_pallas(f0, f1, it, interpret=True)
        for b in range(B):
            lr_x, lc_x = _logsumexps(f0[b], f1[b], it, tile=32)
            np.testing.assert_allclose(np.asarray(lr_p[b]), np.asarray(lr_x), rtol=2e-5)
            np.testing.assert_allclose(np.asarray(lc_p[b]), np.asarray(lc_x), rtol=2e-5)

        a_r = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32)) * 0.1
        a_c = jnp.asarray(rng.standard_normal((B, S)).astype(np.float32)) * 0.1
        df0, df1 = _sfl_bwd_pallas(
            f0, f1, a_r, lr_p, a_c, lc_p, it, row_tile=32, interpret=True
        )
        # dense reference of the softmax backward terms
        sim = jnp.einsum("blc,bsc->bls", f0, f1) * it
        p_row = jnp.exp(sim - lr_p[:, :, None])
        p_col = jnp.exp(sim - lc_p[:, None, :])
        dsim = -(a_r[:, :, None] * p_row + a_c[:, None, :] * p_col)
        df0_ref = jnp.einsum("bls,bsc->blc", dsim, f1) * it
        df1_ref = jnp.einsum("bls,blc->bsc", dsim, f0) * it
        np.testing.assert_allclose(
            np.asarray(df0), np.asarray(df0_ref), rtol=3e-3, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(df1), np.asarray(df1_ref), rtol=3e-3, atol=2e-5
        )

    def test_masked_rows_no_gradient(self, rng):
        """Fully-masked GT rows contribute nothing."""
        f0, f1, gi, gj, _, it = setup(rng)
        mask0 = jnp.zeros_like(gi, bool).at[:, 0].set(True)
        g = jax.grad(
            lambda a: sparse_focal_loss(a, f1, gi, gj, mask0, it, tile=32)
        )(f0)
        assert np.isfinite(np.asarray(g)).all()
        # compare against naive with identical mask
        gn = jax.grad(
            lambda a: naive_sparse_focal_loss(a, f1, gi, gj, mask0, it)
        )(f0)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gn), rtol=2e-3, atol=1e-6)
