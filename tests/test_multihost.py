"""Real multi-process collectives: two coordinated CPU processes exercise
parallel.collectives over jax.distributed (the DCN path the reference covered
with gloo pickle gathers)."""

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
