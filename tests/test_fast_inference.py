"""Fast inference engine must reproduce the linen Matcher on the same
variables (fused Swin-block kernels in interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from featurematching_tpu.config import default_config
from featurematching_tpu.models import Matcher
from featurematching_tpu.models.fast_inference import make_fast_matcher_fn


class TestFastInference:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = default_config()
        mcfg = dataclasses.replace(
            cfg.model, compute_dtype="float32",
            match_coarse=dataclasses.replace(
                cfg.model.match_coarse, thr=1e-6, max_matches=32
            ),
            swin=dataclasses.replace(cfg.model.swin, fused_attention="off"),
        )
        model = Matcher(mcfg)
        rng = np.random.default_rng(0)
        img0 = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
        img1 = jnp.asarray(np.roll(np.asarray(img0), 8, axis=2))
        variables = model.init(jax.random.PRNGKey(0), img0, img1)
        return mcfg, model, variables, img0, img1

    def test_outputs_match_linen_model(self, setup):
        mcfg, model, variables, img0, img1 = setup
        ref = model.apply(variables, img0, img1)
        fast = make_fast_matcher_fn(mcfg, interpret=True)(variables, img0, img1)

        # identical match sets
        rm = np.asarray(ref.coarse.mask[0])
        fm = np.asarray(fast.coarse.mask[0])
        ref_set = set(
            zip(np.asarray(ref.coarse.i_ids[0])[rm], np.asarray(ref.coarse.j_ids[0])[rm])
        )
        fast_set = set(
            zip(np.asarray(fast.coarse.i_ids[0])[fm], np.asarray(fast.coarse.j_ids[0])[fm])
        )
        assert ref_set == fast_set
        # coarse features numerically close (fused LN/matmul reassociation)
        np.testing.assert_allclose(
            np.asarray(fast.feat_c0), np.asarray(ref.feat_c0), rtol=5e-3, atol=5e-3
        )
        # fine keypoints close at matching rows
        if rm.any() and (rm == fm).all():
            np.testing.assert_allclose(
                np.asarray(fast.fine.mkpts0_f[0])[fm],
                np.asarray(ref.fine.mkpts0_f[0])[rm],
                rtol=1e-2, atol=5e-2,
            )

    def test_batch_generality(self, setup):
        """Match sets must agree per-pair at batch > 1 (odd batch exercises
        the 2B concat split and the row-chunked kernels' tail handling —
        the serving batch is a free knob, benchmarks/batch_sweep.py)."""
        mcfg, model, variables, img0, img1 = setup
        rng = np.random.default_rng(7)
        B = 3
        a = jnp.asarray(rng.random((B, 64, 64, 3)).astype(np.float32))
        b = jnp.asarray(np.roll(np.asarray(a), 8, axis=2))
        ref = model.apply(variables, a, b)
        fast = make_fast_matcher_fn(mcfg, interpret=True)(variables, a, b)
        for i in range(B):
            rm = np.asarray(ref.coarse.mask[i])
            fm = np.asarray(fast.coarse.mask[i])
            ref_set = set(
                zip(
                    np.asarray(ref.coarse.i_ids[i])[rm],
                    np.asarray(ref.coarse.j_ids[i])[rm],
                )
            )
            fast_set = set(
                zip(
                    np.asarray(fast.coarse.i_ids[i])[fm],
                    np.asarray(fast.coarse.j_ids[i])[fm],
                )
            )
            assert ref_set == fast_set, f"pair {i} match set diverged"
