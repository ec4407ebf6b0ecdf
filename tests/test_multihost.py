"""Real multi-process collectives: two coordinated CPU processes exercise
parallel.collectives over jax.distributed (the DCN path the reference covered
with gloo pickle gathers)."""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    jax.distributed.initialize(
        "localhost:" + port, num_processes=nproc, process_id=pid
    )
    sys.path.insert(0, "__REPO__")
    import numpy as np
    from featurematching_tpu.parallel import collectives as cc

    assert cc.world_size() == nproc and cc.rank() == pid
    cc.synchronize()
    g = cc.all_gather_arrays(np.full((2,), float(pid + 1)))
    assert g.shape == (nproc, 2) and np.allclose(g[:, 0], [1.0, 2.0]), g
    red = cc.reduce_scalars({"a": float(pid)})
    assert abs(red["a"] - 0.5) < 1e-9, red
    got = cc.gather_metric_lists({"x": [pid * 10, pid * 10 + 1]})
    assert sorted(got["x"]) == [0, 1, 10, 11], got
    seed = cc.shared_random_seed()
    g2 = cc.all_gather_arrays(np.asarray([seed], np.int64))
    assert (g2 == g2[0]).all()
    print("OK", pid)
    """
).replace("__REPO__", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


VALIDATE_WORKER = textwrap.dedent(
    """
    import os, sys, json, dataclasses
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    workdir = sys.argv[4]
    jax.distributed.initialize(
        "localhost:" + port, num_processes=nproc, process_id=pid
    )
    sys.path.insert(0, "__REPO__")
    import numpy as np
    from featurematching_tpu.config import tiny_test_config
    from featurematching_tpu.data.loader import BatchLoader
    from featurematching_tpu.data.synthetic import synthetic_batch
    from featurematching_tpu.train.runner import Runner

    class DS:
        def __init__(self, n, seed):
            rng = np.random.default_rng(seed)
            b = synthetic_batch(rng, batch_size=n, image_size=(64, 96),
                                channels=1, num_gt=64)
            self.samples = [
                {k: v[i] for k, v in b.items()} | {"pair_id": np.int32(i)}
                for i in range(n)
            ]
        def __len__(self):
            return len(self.samples)
        def __getitem__(self, i):
            return self.samples[i]

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        trainer=dataclasses.replace(
            cfg.trainer, batch_size=2, steps_per_epoch=2, num_epochs=1,
            ransac=dataclasses.replace(cfg.trainer.ransac, num_hypotheses=64),
        ),
    )
    tl = BatchLoader(DS(8, 0), 2)
    # n=7 val pairs: host shards are 4 vs 3 -> 2 vs 1 batches (ragged), so this
    # exercises padded collective rounds + gather_concat_arrays trimming
    vl = BatchLoader(DS(7, 1), 2, shuffle=False)
    assert {len(tl), len(vl)} <= {1, 2}, (len(tl), len(vl))
    runner = Runner(cfg, tl, vl, workdir=workdir + f"/rank{pid}")
    saves = []
    runner.ckpt.save = lambda step, state, **kw: saves.append(int(step))
    results = runner.validate(0)
    line = json.dumps(
        {k: round(float(v), 12) for k, v in sorted(results.items())},
        sort_keys=True,
    )
    print("RESULTS", line)
    print("SAVED", len(saves))
    print("OK", pid)
    """
).replace("__REPO__", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


FIT_WORKER = textwrap.dedent(
    """
    import os, sys, json, dataclasses
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    workdir = sys.argv[4]
    if nproc > 1:
        jax.distributed.initialize(
            "localhost:" + port, num_processes=nproc, process_id=pid
        )
    sys.path.insert(0, "__REPO__")
    import numpy as np
    from featurematching_tpu.config import tiny_test_config
    from featurematching_tpu.data.loader import BatchLoader
    from featurematching_tpu.data.synthetic import synthetic_batch
    from featurematching_tpu.train.runner import Runner

    class DS:
        def __init__(self, n, seed):
            rng = np.random.default_rng(seed)
            b = synthetic_batch(rng, batch_size=n, image_size=(64, 96),
                                channels=1, num_gt=64)
            self.samples = [
                {k: v[i] for k, v in b.items()} | {"pair_id": np.int32(i)}
                for i in range(n)
            ]
        def __len__(self):
            return len(self.samples)
        def __getitem__(self, i):
            return self.samples[i]

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        trainer=dataclasses.replace(
            cfg.trainer, batch_size=4 // nproc, steps_per_epoch=2,
            num_epochs=1, val_plot_pairs=0,
            ransac=dataclasses.replace(cfg.trainer.ransac, num_hypotheses=64),
        ),
    )
    tl = BatchLoader(DS(8, 0), 4 // nproc)
    vl = BatchLoader(DS(8, 1), 4 // nproc, shuffle=False)
    runner = Runner(cfg, tl, vl, workdir=workdir + f"/rank{pid}")
    runner.ckpt.save = lambda step, state, **kw: None
    runner.fit(1)
    results = runner.validate(0)
    # RANSAC-based pose metrics draw different hypothesis keys per batch
    # LAYOUT (2 hosts batch the same global rows in a different order), so
    # only the deterministic aggregations are compared across world sizes
    det = {
        k: round(float(v), 6)
        for k, v in sorted(results.items())
        if not k.startswith("auc")
    }
    print("RESULTS", json.dumps(det, sort_keys=True))
    print("OK", pid)
    """
).replace("__REPO__", os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
class TestMultihostCollectives:
    def test_two_process_collectives(self, tmp_path):
        worker = tmp_path / "worker.py"
        worker.write_text(WORKER)
        port = _free_port()
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # fresh backends per process
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i), "2", str(port)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            )
            for i in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode())
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
            assert f"OK {i}" in out

    def test_two_process_validate_identical(self, tmp_path):
        """Ragged val shards (2 vs 1 batches): both ranks must aggregate the
        SAME metrics and make the SAME best-checkpoint decision
        (VERDICT round-1 item 5; reference lightning_new.py:291-295)."""
        worker = tmp_path / "val_worker.py"
        worker.write_text(VALIDATE_WORKER)
        port = _free_port()
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i), "2", str(port),
                 str(tmp_path)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            )
            for i in range(2)
        ]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out.decode())
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
            assert f"OK {i}" in out
        res = [
            [l for l in out.splitlines() if l.startswith("RESULTS ")][0]
            for out in outs
        ]
        assert res[0] == res[1], f"rank results diverge:\n{res[0]}\n{res[1]}"
        saved = [
            [l for l in out.splitlines() if l.startswith("SAVED ")][0]
            for out in outs
        ]
        assert saved[0] == saved[1] == "SAVED 1"

    def test_two_process_fit_matches_single_process(self, tmp_path):
        """End-to-end Runner.fit + validate on 2 processes must aggregate the
        SAME deterministic metrics as the identical single-process run (same
        global batch sets per step; the strided loader split changes only the
        in-batch row order). This is the capability check for the reference's
        comm.py metric gathers (lightning_new.py:291-295) replaced by
        in-graph psum + DCN collectives (VERDICT round-2 item 5)."""
        worker = tmp_path / "fit_worker.py"
        worker.write_text(FIT_WORKER)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)

        def run(nproc):
            port = _free_port()
            procs = [
                subprocess.Popen(
                    [sys.executable, str(worker), str(i), str(nproc), str(port),
                     str(tmp_path / f"w{nproc}")],
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
                )
                for i in range(nproc)
            ]
            outs = []
            for p in procs:
                out, _ = p.communicate(timeout=900)
                outs.append(out.decode())
            for i, (p, out) in enumerate(zip(procs, outs)):
                assert p.returncode == 0, f"nproc={nproc} proc {i}:\n{out[-4000:]}"
                assert f"OK {i}" in out
            return [
                json.loads(
                    [l for l in out.splitlines() if l.startswith("RESULTS ")][0][8:]
                )
                for out in outs
            ]

        two = run(2)
        one = run(1)
        assert two[0] == two[1], f"rank results diverge:\n{two[0]}\n{two[1]}"
        assert one[0].keys() == two[0].keys()
        for k in one[0]:
            a, b = one[0][k], two[0][k]
            assert abs(a - b) <= 1e-4 * max(1.0, abs(a)), (k, a, b)
