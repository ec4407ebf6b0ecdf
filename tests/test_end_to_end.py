"""Full user story through the CLIs: build caches on a synthetic SCARED tree,
train for an epoch, evaluate, and match a pair with the demo — everything a
reference user would do, driven end-to-end."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
class TestFullUserStory:
    @pytest.mark.slow
    def test_cache_train_evaluate(self, tmp_path, rng):
        from tests.test_data import write_scared_fixture

        root = str(tmp_path / "dataset_1" / "keyframe_1")
        write_scared_fixture(root, n_frames=8, H=96, W=128, seed=1)

        # 1. offline caches via the CLI (rebuild from scratch)
        import shutil

        from featurematching_tpu.apps.build_cache import main as cache_main

        shutil.rmtree(os.path.join(root, "keypoints"))
        shutil.rmtree(os.path.join(root, "matches"))
        assert cache_main(["sift", root]) == 0
        assert cache_main(["matches", root, "--gaps", "1"]) == 0

        # 2. train via the CLI (tiny: 1 epoch over 7 pairs)
        from featurematching_tpu.apps.train import main as train_main

        workdir = str(tmp_path / "run")
        rc = train_main(
            ["scared", root, "--workdir", workdir, "--epochs", "1",
             "--batch", "2", "--size", "128", "96", "--num-gt", "64", "--min-inliers", "5",
             "--val-fraction", "0.3"]
        )
        assert rc == 0
        assert os.path.exists(os.path.join(workdir, "logs", "metrics.jsonl"))
        ckpt_dir = os.path.join(workdir, "ckpt")
        assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)

        # 3. evaluate via the CLI on the same data
        from featurematching_tpu.apps.evaluate import main as eval_main

        out = str(tmp_path / "metrics.json")
        rc = eval_main(
            ["scared", root, "--batch", "2", "--size", "128", "96",
             "--out", out, "--limit", "4", "--ckpt", ckpt_dir]
        )
        assert rc == 0
        with open(out) as f:
            res = json.load(f)
        assert set(res) >= {"auc@5", "auc@10", "auc@20", "prec@5e-04"}

        # 4. demo pair match on two fixture frames
        from featurematching_tpu.apps.demo import main as demo_main

        img_dir = os.path.join(root, "raw_images", "Left")
        frames = sorted(os.listdir(img_dir))
        vis = str(tmp_path / "vis.png")
        rc = demo_main(
            ["pair", os.path.join(img_dir, frames[0]),
             os.path.join(img_dir, frames[1]), "--size", "128", "96",
             "--thr", "0.001", "--out", vis, "--ckpt", ckpt_dir]
        )
        assert rc == 0 and os.path.exists(vis)
