"""Data-layer tests: pair enumeration, pseudo-GT pipeline (SIFT+MNN+RANSAC),
dataset readers over synthetic on-disk fixture trees, and the batch loader."""

import json
import os

import numpy as np
import pytest

from featurematching_tpu.data.pairs import (
    FramePair,
    compute_rel_pose,
    enumerate_pairs,
    pad_keypoint_pairs,
)
from featurematching_tpu.data.pseudo_gt import (
    build_match_cache,
    detect_sift,
    extract_sift_cache,
    match_mnn,
    pseudo_gt_for_pair,
)
from featurematching_tpu.data.loader import (
    BatchLoader,
    ConcatDataset,
    scene_balanced_indices,
    train_val_split,
)
from featurematching_tpu.data.scared import (
    ScaredPairDataset,
    convert_K,
    discover_keyframe_roots,
)


class TestPairs:
    def test_enumerate_gaps(self):
        pairs = enumerate_pairs(10, data_enhance=(1, 3))
        gaps1 = [p for p in pairs if p.gap == 1]
        gaps3 = [p for p in pairs if p.gap == 3]
        assert len(gaps1) == 9 and len(gaps3) == 7
        assert all(p.idx1 == p.idx0 + p.gap for p in pairs)

    def test_lighting_subsample_quota(self):
        n = 100
        pairs = enumerate_pairs(n, (1,), lighting_subsample=True, seed=0)
        quota = int(n * np.log(n) * 0.08)
        assert len(pairs) == quota

    def test_deterministic(self):
        a = enumerate_pairs(50, (1, 2), lighting_subsample=True, seed=7)
        b = enumerate_pairs(50, (1, 2), lighting_subsample=True, seed=7)
        assert a == b

    def test_rel_pose_convention(self, rng):
        p0 = np.eye(4)
        p0[:3, 3] = [1, 0, 0]
        p1 = np.eye(4)
        p1[:3, 3] = [2, 0, 0]
        T = compute_rel_pose(p0, p1)
        # reference convention: inv(inv(p1) @ p0)
        np.testing.assert_allclose(T, np.linalg.inv(np.linalg.inv(p1) @ p0))

    def test_pad(self):
        kp = np.arange(10, dtype=np.float32).reshape(5, 2)
        a, b, m = pad_keypoint_pairs(kp, kp + 1, 8)
        assert a.shape == (8, 2) and m.sum() == 5 and not m[5:].any()
        a, b, m = pad_keypoint_pairs(kp, kp, 3)
        assert m.sum() == 3


def checkerboard_texture(H, W, rng, n_blobs=60):
    """A feature-rich texture SIFT can latch onto."""
    img = (rng.random((H, W)) * 60).astype(np.uint8)
    for _ in range(n_blobs):
        x, y = rng.integers(10, W - 10), rng.integers(10, H - 10)
        r = int(rng.integers(3, 9))
        img[max(0, y - r) : y + r, max(0, x - r) : x + r] = rng.integers(100, 255)
    return img


class TestPseudoGT:
    def test_sift_and_mnn_on_shifted_image(self, rng):
        img = checkerboard_texture(240, 320, rng)
        shifted = np.roll(img, 7, axis=1)
        kp0, d0 = detect_sift(img)
        kp1, d1 = detect_sift(shifted)
        assert len(kp0) > 30
        p0, p1 = pseudo_gt_for_pair(kp0, d0, kp1, d1)
        assert len(p0) > 20
        dx = p1[:, 0] - p0[:, 0]
        assert abs(np.median(dx) - 7) < 1.0, f"median dx {np.median(dx)}"

    def test_mnn_is_mutual(self, rng):
        d0 = rng.standard_normal((40, 16)).astype(np.float32)
        perm = rng.permutation(40)
        d1 = d0[perm] + rng.standard_normal((40, 16)).astype(np.float32) * 0.01
        m = match_mnn(d0, d1)
        assert len(m) == 40
        np.testing.assert_array_equal(perm[m[:, 1]], m[:, 0])


def write_scared_fixture(root, n_frames=6, H=96, W=128, seed=0):
    """Build a synthetic SCARED-format keyframe tree with real SIFT caches."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "raw_images", "Left"), exist_ok=True)
    os.makedirs(os.path.join(root, "frame_data"), exist_ok=True)
    import cv2

    base = checkerboard_texture(H, W, rng)
    K = np.array([[1000.0, 0, 640], [0, 1000.0, 512], [0, 0, 1]])
    paths = []
    for i in range(n_frames):
        img = np.roll(base, 3 * i, axis=1)
        p = os.path.join(root, "raw_images", "Left", f"{i:06d}.png")
        cv2.imwrite(p, img)
        paths.append(p)
        pose = np.eye(4)
        pose[:3, 3] = [0.01 * i, 0, 0]
        with open(os.path.join(root, "frame_data", f"{i:06d}.json"), "w") as f:
            json.dump(
                {
                    "camera-pose": pose.tolist(),
                    "camera-calibration": {
                        "KL": K.tolist(),
                        "DL": [0, 0, 0, 0, 0],
                        "KR": K.tolist(),
                        "DR": [0, 0, 0, 0, 0],
                    },
                },
                f,
            )
    # offline caches
    extract_sift_cache(paths, os.path.join(root, "keypoints"))
    stems = [f"{i:06d}" for i in range(n_frames)]
    pair_stems = [(stems[i], stems[i + 1]) for i in range(n_frames - 1)]
    counts = build_match_cache(
        os.path.join(root, "keypoints"), pair_stems, os.path.join(root, "matches")
    )
    return counts


class TestScaredDataset:
    def test_end_to_end_fixture(self, tmp_path, rng):
        root = str(tmp_path / "dataset_1" / "keyframe_1")
        counts = write_scared_fixture(root)
        assert all(c > 10 for c in counts.values()), counts

        ds = ScaredPairDataset(
            root, data_enhance=(1,), img_size=(128, 96), num_gt=64, min_gt_matches=5
        )
        assert len(ds) == 5
        s = ds[0]
        assert s["image0"].shape == (96, 128, 3)
        assert s["gt_kp0"].shape == (64, 2)
        assert s["gt_mask"].any()
        # GT keypoints in bounds
        valid = s["gt_mask"]
        assert (s["gt_kp0"][valid] >= 0).all()
        assert (s["gt_kp0"][valid][:, 0] < 128).all()
        # pose: frame spacing 0.01 along x in the reference convention
        assert np.isfinite(s["T_0to1"]).all()
        np.testing.assert_allclose(
            s["K0"][0, 0], 1000.0 * 128 / 1280.0, rtol=1e-5
        )

    def test_precomputed_fine_mtx_matches_in_graph(self, tmp_path, rng):
        """Legacy fine_mtx-precomputed variant (scared_new.py:252-268 era):
        the host-side scatter must equal the in-graph supervision exactly."""
        import jax.numpy as jnp

        from featurematching_tpu.data.scared import ScaredPairDataset
        from featurematching_tpu.matching.supervision import (
            compute_supervision_coarse,
        )

        root = str(tmp_path / "kf1")
        write_scared_fixture(root)
        ds = ScaredPairDataset(
            root, img_size=(128, 96), min_gt_matches=1,
            precompute_fine_mtx=True,
        )
        assert len(ds) > 0
        found_nonzero = False
        for idx in range(min(3, len(ds))):
            sample = ds[idx]
            assert sample["fine_mtx_0"].shape == ((96 // 8) * (128 // 8), 2)
            sup = compute_supervision_coarse(
                jnp.asarray(sample["gt_kp0"])[None],
                jnp.asarray(sample["gt_kp1"])[None],
                jnp.asarray(sample["gt_mask"])[None],
                (96 // 8, 128 // 8), (96 // 8, 128 // 8),
            )
            np.testing.assert_array_equal(
                sample["fine_mtx_0"], np.asarray(sup.fine_mtx_0[0])
            )
            np.testing.assert_array_equal(
                sample["fine_mtx_1"], np.asarray(sup.fine_mtx_1[0])
            )
            np.testing.assert_array_equal(
                sample["spv_i_ids"], np.asarray(sup.spv_i_ids[0])
            )
            np.testing.assert_array_equal(
                sample["spv_mask"], np.asarray(sup.spv_mask[0])
            )
            found_nonzero |= bool(sample["spv_mask"].any())
        assert found_nonzero  # fixture produces real supervision targets

    def test_discover_roots(self, tmp_path):
        root = str(tmp_path / "dataset_1" / "keyframe_1")
        write_scared_fixture(root, n_frames=2)
        found = discover_keyframe_roots(str(tmp_path))
        assert found == [root]

    def test_min_inlier_filtering(self, tmp_path, rng):
        root = str(tmp_path / "d" / "k")
        write_scared_fixture(root)
        ds_all = ScaredPairDataset(root, img_size=(128, 96), min_gt_matches=0)
        ds_strict = ScaredPairDataset(root, img_size=(128, 96), min_gt_matches=10**6)
        assert len(ds_strict) == 0 and len(ds_all) == 5


class TestLoader:
    class FakeDataset:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"x": np.full((2, 2), i, np.float32), "i": np.int32(i)}

    def test_batches_and_shapes(self):
        ds = self.FakeDataset(10)
        loader = BatchLoader(ds, batch_size=4, shuffle=False, process_index=0, process_count=1)
        batches = list(loader.epoch(0))
        assert len(batches) == 2
        assert batches[0]["x"].shape == (4, 2, 2)

    def test_host_sharding_disjoint(self):
        ds = self.FakeDataset(16)
        seen = []
        for pi in range(2):
            loader = BatchLoader(
                ds, batch_size=4, shuffle=True, seed=3, process_index=pi, process_count=2
            )
            for b in loader.epoch(0):
                seen.append(set(b["i"].tolist()))
        all_items = set().union(*seen)
        assert len(all_items) == 16  # full coverage, no overlap
        assert sum(len(s) for s in seen) == 16

    def test_train_val_split(self):
        tr, va = train_val_split(list(range(20)), 0.15, seed=0)
        assert len(tr) == 17 and len(va) == 3
        assert set(tr) | set(va) == set(range(20))

    def test_scene_balanced(self):
        idx = scene_balanced_indices([5, 50, 0], 10, seed=0)
        assert len(idx) == 20  # 2 non-empty scenes x 10
        assert (idx < 55).all()

    def test_concat(self):
        a, b = self.FakeDataset(3), self.FakeDataset(4)
        cd = ConcatDataset([a, b])
        assert len(cd) == 7
        assert int(cd[5]["i"]) == 2  # second dataset index 2


class TestSyntheticTwoPlane:
    """The two-plane synthetic scene (data/synthetic.py): GT must satisfy the
    epipolar constraint exactly, and must NOT be explainable by one homography
    (the parallax is the whole point — it is what makes essential-matrix pose
    recovery on this fixture well-conditioned)."""

    def _batch(self, seed=3):
        from featurematching_tpu.data.synthetic import synthetic_batch

        rng = np.random.default_rng(seed)
        return synthetic_batch(
            rng, batch_size=2, image_size=(96, 128), channels=1, num_gt=160,
            rot_scale=0.08, trans_scale=0.15, n_planes=2,
        )

    def test_gt_epipolar_consistency(self):
        b = self._batch()
        for i in range(2):
            K = b["K0"][i]
            T = b["T_0to1"][i]
            t, R = T[:3, 3], T[:3, :3]
            E = np.array(
                [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]
            ) @ R
            m = b["gt_mask"][i]
            assert m.sum() >= 100
            p0 = np.linalg.solve(
                K, np.concatenate([b["gt_kp0"][i][m], np.ones((m.sum(), 1))], -1).T
            ).T
            p1 = np.linalg.solve(
                K, np.concatenate([b["gt_kp1"][i][m], np.ones((m.sum(), 1))], -1).T
            ).T
            resid = np.abs(np.sum(p1 * (p0 @ E.T), -1))
            assert resid.max() < 1e-5

    def test_not_a_single_homography(self):
        b = self._batch()
        for i in range(2):
            m = b["gt_mask"][i]
            p0 = b["gt_kp0"][i][m]
            p1 = b["gt_kp1"][i][m]
            # DLT fit of ONE homography to all GT; residual must be large
            A = []
            for (x, y), (u, v) in zip(p0, p1):
                A.append([x, y, 1, 0, 0, 0, -u * x, -u * y, -u])
                A.append([0, 0, 0, x, y, 1, -v * x, -v * y, -v])
            _, _, vt = np.linalg.svd(np.asarray(A))
            Hm = vt[-1].reshape(3, 3)
            ph = (Hm @ np.concatenate([p0, np.ones((len(p0), 1))], -1).T).T
            pred = ph[:, :2] / ph[:, 2:3]
            resid = np.linalg.norm(pred - p1, axis=-1)
            assert np.percentile(resid, 90) > 1.0  # > 1px: real parallax

    def test_images_and_shapes(self):
        b = self._batch()
        assert b["image0"].shape == (2, 96, 128, 1)
        assert b["image1"].shape == (2, 96, 128, 1)
        for k in ("image0", "image1"):
            assert np.isfinite(b[k]).all()
            assert 0.0 <= b[k].min() and b[k].max() <= 1.0 + 1e-6
