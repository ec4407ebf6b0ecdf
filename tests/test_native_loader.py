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


@needs_native
class TestHostSharding:
    def test_strided_shard_partition(self, tmp_path):
        ds = FakeDS(20)
        cache = str(tmp_path / "c.fmtp")
        write_cache(cache, ds)
        seen = []
        for pi in range(2):
            ld = NativeBatchLoader(
                cache, batch_size=2, process_index=pi, process_count=2
            )
            assert len(ld) == 5
            ids = []
            for b in ld.epoch(0, shuffle=True, seed=3):
                ids.extend(b["pair_id"].tolist())
            seen.append(set(ids))
        # the two hosts' shards are disjoint and cover everything
        assert seen[0] & seen[1] == set()
        assert seen[0] | seen[1] == set(range(20))

    def test_same_global_order_as_python_loader(self, tmp_path):
        from featurematching_tpu.data.loader import BatchLoader

        ds = FakeDS(16)
        cache = str(tmp_path / "c.fmtp")
        write_cache(cache, ds)
        nat = NativeBatchLoader(cache, 2, process_index=1, process_count=2)
        py = BatchLoader(
            ds, 2, seed=0, process_index=1, process_count=2
        )
        nat_ids = [b["pair_id"].tolist() for b in nat.epoch(4, seed=0)]
        py_ids = [b["pair_id"].tolist() for b in py.epoch(4)]
        assert nat_ids == py_ids


class TestMakeLoader:
    def test_prefers_native_when_cache_exists(self, tmp_path):
        from featurematching_tpu.data.loader import BatchLoader, make_loader

        ds = FakeDS(8)
        cache = str(tmp_path / "c.fmtp")
        ld = make_loader(ds, 2, cache_path=cache)  # no cache yet -> python
        assert isinstance(ld, BatchLoader)
        ld = make_loader(ds, 2, cache_path=cache, build_cache=True)
        if NativeBatchLoader.available():
            assert isinstance(ld, NativeBatchLoader)
            ids = sorted(
                i for b in ld.epoch(0, shuffle=False) for i in b["pair_id"]
            )
            assert ids == list(range(8))
        else:
            assert isinstance(ld, BatchLoader)

    def test_no_cache_path_gives_python_loader(self):
        from featurematching_tpu.data.loader import BatchLoader, make_loader

        ld = make_loader(FakeDS(4), 2)
        assert isinstance(ld, BatchLoader)
