"""Native C++ loader tests: build, cache roundtrip, gather, prefetch ring."""

import numpy as np
import pytest

from featurematching_tpu.data.native_cache import (
    NativeBatchLoader,
    build_library,
    write_cache,
)


class FakeDS:
    def __init__(self, n=20):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {
            "image0": rng.random((8, 12, 1)).astype(np.float32),
            "gt_kp0": rng.random((6, 2)).astype(np.float32),
            "gt_mask": (rng.random(6) < 0.5),
            "pair_id": np.int32(i),
        }


needs_native = pytest.mark.skipif(
    build_library() is None, reason="g++ toolchain unavailable"
)


@needs_native
class TestNativeLoader:
    def test_cache_roundtrip_gather(self, tmp_path):
        ds = FakeDS(20)
        cache = str(tmp_path / "train.fmtp")
        write_cache(cache, ds)
        loader = NativeBatchLoader(cache, batch_size=4, num_threads=4)
        assert loader.n == 20
        batch = loader.gather([3, 7, 11])
        for k in ("image0", "gt_kp0", "gt_mask", "pair_id"):
            assert k in batch
        for row, want_i in enumerate([3, 7, 11]):
            want = ds[want_i]
            np.testing.assert_allclose(batch["image0"][row], want["image0"])
            np.testing.assert_array_equal(batch["gt_mask"][row], want["gt_mask"])
            assert int(batch["pair_id"][row]) == want_i
        loader.close()

    def test_out_of_range_zero_filled(self, tmp_path):
        ds = FakeDS(4)
        cache = str(tmp_path / "c.fmtp")
        write_cache(cache, ds)
        loader = NativeBatchLoader(cache, batch_size=2)
        batch = loader.gather([0, 9999])
        assert np.all(batch["image0"][1] == 0)
        loader.close()

    def test_prefetch_epoch_covers_all(self, tmp_path):
        ds = FakeDS(16)
        cache = str(tmp_path / "e.fmtp")
        write_cache(cache, ds)
        loader = NativeBatchLoader(cache, batch_size=4, num_threads=2)
        seen = []
        for batch in loader.epoch(0, shuffle=True, seed=1):
            assert batch["image0"].shape == (4, 8, 12, 1)
            seen.extend(batch["pair_id"].tolist())
        assert sorted(seen) == list(range(16))
        # second epoch works after the first (ring reset)
        n2 = sum(1 for _ in loader.epoch(1))
        assert n2 == 4
        loader.close()

    def test_matches_python_loader_content(self, tmp_path):
        """Byte-identical data through the native path vs direct dataset."""
        ds = FakeDS(8)
        cache = str(tmp_path / "m.fmtp")
        write_cache(cache, ds)
        loader = NativeBatchLoader(cache, batch_size=8)
        batch = loader.gather(list(range(8)))
        for i in range(8):
            np.testing.assert_array_equal(batch["gt_kp0"][i], ds[i]["gt_kp0"])
        loader.close()
