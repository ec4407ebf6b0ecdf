"""Sequence SfM CLI: run the matcher over an image sequence, chain two-view
poses, optionally pose-graph-optimize, and export the trajectory.

    python -m featurematching_tpu.apps.sfm SOURCE --intrinsics fx fy cx cy \
        [--ckpt DIR] [--out traj.txt] [--size 640 480] [--gray] \
        [--skip 1] [--max-frames 100] [--thr 0.2] [--pgo] [--windowed W] \
        [--loop-closure]

SOURCE as in the demo CLI (directory / glob / video / camera index).
Output: TUM trajectory format (`t tx ty tz qx qy qz qw`, camera-to-world),
consumable by standard ATE evaluation tools.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("source")
    p.add_argument("--intrinsics", type=float, nargs=4, metavar=("FX", "FY", "CX", "CY"),
                   required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out", default="trajectory.txt")
    p.add_argument("--size", type=int, nargs=2, default=(640, 480))
    p.add_argument("--gray", action="store_true")
    p.add_argument("--skip", type=int, default=1)
    p.add_argument("--max-frames", type=int, default=100)
    p.add_argument("--thr", type=float, default=0.2)
    p.add_argument("--pixel-thr", type=float, default=1.0)
    p.add_argument("--pgo", action="store_true",
                   help="run pose-graph optimization over consecutive edges")
    p.add_argument("--windowed", type=int, default=0, metavar="W",
                   help="use the keyframe-map pipeline with scale propagation "
                        "and sliding-window BA over the last W frames "
                        "(0 = plain two-view chaining)")
    p.add_argument("--loop-closure", action="store_true",
                   help="detect revisits (global-descriptor retrieval + "
                        "geometric verification) and pose-graph-correct the "
                        "windowed trajectory; implies --windowed 5 unless set")
    p.add_argument("--loop-sim-thresh", type=float, default=0.88)
    p.add_argument("--loop-min-gap", type=int, default=10)
    p.add_argument("--loop-min-inliers", type=int, default=30)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from featurematching_tpu.apps.demo import PairMatcher, VideoStreamer
    from featurematching_tpu.geometry.se3 import invert_se3, matrix_to_quat
    from featurematching_tpu.sfm.pipeline import run_sequence

    fx, fy, cx, cy = args.intrinsics
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)

    frames = list(
        VideoStreamer(
            args.source, tuple(args.size), args.gray, args.skip, args.max_frames
        ).frames()
    )
    if len(frames) < 2:
        raise SystemExit(f"need >= 2 frames, got {len(frames)} from {args.source}")
    print(f"{len(frames)} frames loaded")

    matcher = PairMatcher(args.ckpt, args.gray, tuple(args.size), args.thr)

    def matcher_fn(i0, i1):
        mk0, mk1, conf = matcher.match(frames[i0], frames[i1])
        K_cap = 1024
        p0 = np.zeros((K_cap, 2), np.float32)
        p1 = np.zeros((K_cap, 2), np.float32)
        m = np.zeros((K_cap,), bool)
        n = min(len(mk0), K_cap)
        p0[:n] = mk0[:n]
        p1[:n] = mk1[:n]
        m[:n] = True
        return p0, p1, m

    if args.loop_closure:
        from featurematching_tpu.sfm.loop_closure import (
            image_descriptor,
            run_sequence_loop_closed,
        )

        traj, loop_edges = run_sequence_loop_closed(
            matcher_fn, list(range(len(frames))), K,
            descriptor_fn=lambda i: image_descriptor(frames[i]),
            window=args.windowed or 5, pixel_thr=args.pixel_thr,
            min_gap=args.loop_min_gap, sim_thresh=args.loop_sim_thresh,
            min_inliers=args.loop_min_inliers,
        )
        print(
            f"loop closure: {len(loop_edges)} accepted edge(s) "
            + ", ".join(f"{e.i}->{e.j} ({e.n_inliers} inl)" for e in loop_edges)
        )
    elif args.windowed > 0:
        from featurematching_tpu.sfm.windowed import run_sequence_windowed

        traj = run_sequence_windowed(
            matcher_fn, list(range(len(frames))), K,
            pixel_thr=args.pixel_thr, window=args.windowed,
        )
    else:
        traj = run_sequence(
            matcher_fn, list(range(len(frames))), K,
            pixel_thr=args.pixel_thr,
        )
    poses = traj.poses  # world->cam chain

    if args.pgo:
        from featurematching_tpu.sfm.pose_graph import PoseGraph, optimize_pose_graph

        N = len(poses)
        edges_i = np.arange(N - 1, dtype=np.int32)
        edges_j = edges_i + 1
        Z = np.stack(
            [poses[i + 1] @ np.linalg.inv(poses[i]) for i in range(N - 1)]
        ).astype(np.float32)
        graph = PoseGraph(
            poses=jnp.asarray(poses),
            edge_i=jnp.asarray(edges_i),
            edge_j=jnp.asarray(edges_j),
            measurements=jnp.asarray(Z),
            weights=jnp.ones(N - 1, jnp.float32),
        )
        opt, costs = optimize_pose_graph(graph, iters=8)
        poses = np.asarray(opt)
        print(f"pose graph: cost {float(costs[0]):.3e} -> {float(costs[-1]):.3e}")

    # export TUM format (camera-to-world)
    with open(args.out, "w") as f:
        for t, T_wc in enumerate(poses):
            T_cw = np.asarray(invert_se3(jnp.asarray(T_wc)))
            q = np.asarray(matrix_to_quat(jnp.asarray(T_cw[:3, :3])))
            tx, ty, tz = T_cw[:3, 3]
            f.write(
                f"{t} {tx:.6f} {ty:.6f} {tz:.6f} "
                f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
            )
    n_ok = int(np.asarray(traj.valid).sum())
    print(f"wrote {args.out}: {len(poses)} poses ({n_ok} tracked)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
