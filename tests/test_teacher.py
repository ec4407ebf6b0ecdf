"""Frozen-teacher deep-match pseudo-GT source (data/teacher.py).

Covers the reference's two labeler capabilities with one offline tool:
the frozen coarse-only LoFTR teacher (lightning_new.py:200-211) and the
SIFT ∪ deep-match union pseudo-GT recipe (unity_data.py:215-235).
"""

import dataclasses as dc
import os

import numpy as np
import pytest

from featurematching_tpu.config import tiny_test_config
from featurematching_tpu.data.pseudo_gt import (
    build_match_cache,
    extract_sift_cache,
    load_match_cache,
)
from featurematching_tpu.data.teacher import deep_match_paths, make_teacher_fn

cv2 = pytest.importorskip("cv2")


def _texture(rng, h, w):
    """Blurred random texture: SIFT-detectable structure."""
    img = rng.integers(0, 255, (h, w), np.uint8)
    return cv2.GaussianBlur(img, (0, 0), 1.5)


def _tiny_teacher(thr=1e-8):
    cfg = tiny_test_config()
    cfg = dc.replace(cfg, model=dc.replace(cfg.model, coarse_only=True))
    return make_teacher_fn(cfg=cfg, thr=thr)


class TestTeacherFn:
    @pytest.mark.slow
    def test_identical_images_give_diagonal_matches(self, rng):
        img = _texture(rng, 64, 64)
        fn = _tiny_teacher()
        k0, k1 = fn(img, img)
        # untrained net + near-zero thr on identical images: mutual-NN picks
        # exact self-correspondences (tiny untrained nets can collapse to a
        # single "sink" cell, so only the diagonal property is asserted)
        assert len(k0) >= 1
        np.testing.assert_allclose(k0, k1)

    @pytest.mark.slow
    def test_pad_to_multiple_filters_pad_matches(self, rng):
        # non-multiple size pads to 64x64 (coarse stride 8); every surviving
        # keypoint must lie inside the ORIGINAL bounds (count is not asserted:
        # an untrained tiny net's sink cell may itself sit in the pad)
        img = _texture(rng, 60, 60)
        fn = _tiny_teacher()
        k0, k1 = fn(img, img)
        for k in (k0, k1):
            assert (k[:, 0] < 60).all() and (k[:, 1] < 60).all()


class TestUnionCache:
    def test_union_beats_sift_only(self, rng, tmp_path):
        # two frames, identical content (identity homography keeps everything)
        frames = tmp_path / "Frames"
        frames.mkdir()
        img = _texture(rng, 64, 64)
        for name in ("f000", "f001"):
            cv2.imwrite(str(frames / f"{name}.png"), img)
        paths = {s: str(frames / f"{s}.png") for s in ("f000", "f001")}

        extract_sift_cache(
            list(paths.values()), str(tmp_path / "keypoints"), max_keypoints=64
        )
        pairs = [("f000", "f001")]

        sift_counts = build_match_cache(
            str(tmp_path / "keypoints"), pairs, str(tmp_path / "matches_sift")
        )
        union_counts = build_match_cache(
            str(tmp_path / "keypoints"), pairs, str(tmp_path / "matches_union"),
            deep_fn=deep_match_paths(_tiny_teacher()), image_paths=paths,
        )
        name = "f000__f001.npz"
        assert union_counts[name] > sift_counts[name]

        kp0, kp1 = load_match_cache(str(tmp_path / "matches_union" / name))
        assert kp0.shape == kp1.shape and kp0.shape[1] == 2
        # identity pair: every surviving inlier is a self-correspondence
        np.testing.assert_allclose(kp0, kp1, atol=1e-3)

    @pytest.mark.slow

    def test_cli_union_source(self, rng, tmp_path):
        # the real CLI path with the default loftr_tiny teacher profile
        from featurematching_tpu.apps.build_cache import main

        frames = tmp_path / "Frames"
        frames.mkdir()
        img = _texture(rng, 64, 64)
        for name in ("f000", "f001"):
            cv2.imwrite(str(frames / f"{name}.png"), img)

        assert main(["sift", str(tmp_path), "--layout", "unity",
                     "--max-keypoints", "64"]) == 0
        assert main(["matches", str(tmp_path), "--layout", "unity",
                     "--source", "union", "--teacher-thr", "1e-8"]) == 0
        kp0, kp1 = load_match_cache(str(tmp_path / "matches" / "f000__f001.npz"))
        assert len(kp0) >= 8
