"""End-to-end single-pair match regression against stored golden outputs
(SURVEY.md §4 recommendation (c)): any unintentional numerics change across
refactors/rounds shows up as a diff against the frozen artifact.

Regenerate intentionally with:
    python -m tests.test_golden_regression --regenerate
"""

import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "matcher_tiny.npz")


def _compute_outputs():
    from featurematching_tpu.config import tiny_test_config
    from featurematching_tpu.models import Matcher

    cfg = tiny_test_config()
    model = Matcher(cfg.model)
    rng = np.random.default_rng(1234)
    img0 = jnp.asarray(rng.random((1, 64, 96, 1)).astype(np.float32))
    img1 = jnp.asarray(np.roll(np.asarray(img0), 8, axis=2))
    variables = model.init(jax.random.PRNGKey(42), img0, img1)
    out = model.apply(variables, img0, img1)
    return {
        "i_ids": np.asarray(out.coarse.i_ids),
        "j_ids": np.asarray(out.coarse.j_ids),
        "mask": np.asarray(out.coarse.mask),
        "mconf": np.asarray(out.coarse.mconf),
        "mkpts0_f": np.asarray(out.fine.mkpts0_f),
        "mkpts1_f": np.asarray(out.fine.mkpts1_f),
        "feat_c0_sum": np.asarray(jnp.sum(out.feat_c0, axis=(1, 2))),
    }


class TestGoldenRegression:
    @pytest.mark.slow
    def test_matches_stored_golden(self):
        assert os.path.exists(GOLDEN), (
            "golden file missing — run `python -m tests.test_golden_regression"
            " --regenerate`"
        )
        got = _compute_outputs()
        want = dict(np.load(GOLDEN))
        np.testing.assert_array_equal(got["i_ids"], want["i_ids"])
        np.testing.assert_array_equal(got["j_ids"], want["j_ids"])
        np.testing.assert_array_equal(got["mask"], want["mask"])
        np.testing.assert_allclose(got["mconf"], want["mconf"], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            got["mkpts0_f"], want["mkpts0_f"], rtol=1e-4, atol=5e-3
        )
        np.testing.assert_allclose(
            got["mkpts1_f"], want["mkpts1_f"], rtol=1e-4, atol=5e-3
        )
        np.testing.assert_allclose(
            got["feat_c0_sum"], want["feat_c0_sum"], rtol=1e-3
        )


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--regenerate", action="store_true")
    args = p.parse_args()
    if args.regenerate:
        # goldens are defined on the CPU backend at fp32 highest precision
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_default_matmul_precision", "highest")
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, **_compute_outputs())
        print(f"wrote {GOLDEN}")
