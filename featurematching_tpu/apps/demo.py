"""Pair-matching demo CLI — the inference app.

Re-design of /root/reference/demo/demo.py (main_demo) + demo/utils.py
(VideoStreamer). Usage:

    python -m featurematching_tpu.apps.demo pair IMG0 IMG1 \
        [--ckpt DIR] [--out out.png] [--thr 0.2] [--gray] [--pose]

    python -m featurematching_tpu.apps.demo stream SOURCE \
        [--ckpt DIR] [--out-dir outdir] [--skip 1] [--max-frames N]

SOURCE follows the reference VideoStreamer conventions (demo/utils.py:56-133):
a video file, a directory of images, a glob pattern, or a camera index.
"""

from __future__ import annotations

import argparse
import glob
import os
import time
from typing import Iterator, Optional, Tuple

import numpy as np


def load_image(path: str, size: Tuple[int, int], gray: bool) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    img = cv2.resize(img, size).astype(np.float32) / 255.0
    return img[..., None] if img.ndim == 2 else img[..., ::-1].copy()


class VideoStreamer:
    """Frames from video / image dir / glob / camera / IP stream
    (demo/utils.py:56-195).

    IP/RTSP sources (`http...` / `rtsp...`) are read by a background daemon
    thread into a latest-frame slot, so the consumer always sees the
    freshest frame instead of a stale decode queue — the reference's
    threaded IP reader (demo/utils.py:172-195).
    """

    def __init__(self, source: str, size: Tuple[int, int], gray: bool, skip: int = 1,
                 max_frames: int = 1_000_000):
        self.size = size
        self.gray = gray
        self.skip = max(1, skip)
        self.max_frames = max_frames
        self._paths = None
        self._cap = None
        self._ip_thread = None
        self._ip_running = False
        self._ip_frame = None  # (seq, ndarray) latest-frame slot
        if os.path.isdir(source):
            self._paths = sorted(
                p for p in glob.glob(os.path.join(source, "*"))
                if p.lower().endswith((".png", ".jpg", ".jpeg"))
            )
        elif any(ch in source for ch in "*?[") and not source.startswith(
            ("http", "rtsp")
        ):
            self._paths = sorted(glob.glob(source))
        else:
            import cv2

            self._cap = cv2.VideoCapture(int(source) if source.isdigit() else source)
            if isinstance(source, str) and source.startswith(("http", "rtsp")):
                self._start_ip_thread()

    def _start_ip_thread(self):
        import threading

        self._ip_running = True

        def pump():
            seq = 0
            while self._ip_running:
                ok, frame = self._cap.read()
                if not ok:
                    self._ip_running = False
                    return
                seq += 1
                self._ip_frame = (seq, frame)  # atomic slot swap (GIL)

        self._ip_thread = threading.Thread(target=pump, daemon=True)
        self._ip_thread.start()

    def close(self):
        self._ip_running = False
        if self._ip_thread is not None:
            self._ip_thread.join(timeout=2.0)
        if self._cap is not None:
            self._cap.release()

    def frames(self) -> Iterator[np.ndarray]:
        import cv2

        count = 0
        if self._paths is not None:
            for i, p in enumerate(self._paths):
                if i % self.skip:
                    continue
                if count >= self.max_frames:
                    return
                count += 1
                yield load_image(p, self.size, self.gray)
        elif self._ip_thread is not None:
            import time

            last_seq = 0
            while count < self.max_frames:
                slot = self._ip_frame
                if slot is None or slot[0] == last_seq:
                    if not self._ip_running:
                        return  # stream ended / reader died
                    time.sleep(0.001)  # wait for a fresh frame
                    continue
                last_seq, frame = slot
                count += 1
                yield self._convert(frame, cv2)
        else:
            i = -1
            while count < self.max_frames:
                ok, frame = self._cap.read()
                if not ok:
                    return
                i += 1
                if i % self.skip:
                    continue
                count += 1
                yield self._convert(frame, cv2)

    def _convert(self, frame: np.ndarray, cv2) -> np.ndarray:
        if self.gray:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        frame = cv2.resize(frame, self.size).astype(np.float32) / 255.0
        return frame[..., None] if frame.ndim == 2 else frame[..., ::-1].copy()


class PairMatcher:
    """Jit-compiled matcher handle for apps. Loads orbax params if given."""

    def __init__(self, ckpt_dir: Optional[str] = None, gray: bool = False,
                 image_size: Tuple[int, int] = (640, 480), thr: float = 0.2,
                 max_matches: int = 1024, compute_dtype: Optional[str] = None):
        import dataclasses

        import jax
        import jax.numpy as jnp

        import featurematching_tpu as fm
        from featurematching_tpu.models import Matcher

        cfg = fm.default_config()
        mcfg = cfg.model
        overrides = dict(
            input_channels=1 if gray else 3,
            match_coarse=dataclasses.replace(
                mcfg.match_coarse, thr=thr, max_matches=max_matches
            ),
        )
        if compute_dtype:
            overrides["compute_dtype"] = compute_dtype
        elif jax.default_backend() == "cpu":
            overrides["compute_dtype"] = "float32"
        mcfg = dataclasses.replace(mcfg, **overrides)

        self.model = Matcher(mcfg)
        self.image_size = image_size
        W, H = image_size
        dummy = jnp.zeros((1, H, W, 1 if gray else 3), jnp.float32)
        self.variables = jax.jit(self.model.init)(jax.random.PRNGKey(0), dummy, dummy)
        if ckpt_dir:
            from featurematching_tpu.utils.checkpoints import (
                load_matcher_variables,
            )

            self.variables = load_matcher_variables(ckpt_dir)

        # serving path: the fused-kernel engine on accelerators (equality-
        # tested against Matcher.apply); linen path on CPU
        if mcfg.backbone_type == "swin_v1" and jax.default_backend() != "cpu":
            from featurematching_tpu.models.fast_inference import (
                make_fast_matcher_fn,
            )

            fast = make_fast_matcher_fn(mcfg)
            self._fwd = jax.jit(lambda v, a, b: fast(v, a, b))
        else:
            self._fwd = jax.jit(lambda v, a, b: self.model.apply(v, a, b))

    def match(self, img0: np.ndarray, img1: np.ndarray):
        """Returns (mkpts0 [M, 2], mkpts1 [M, 2], mconf [M]) — valid rows only."""
        import jax.numpy as jnp

        out = self._fwd(
            self.variables, jnp.asarray(img0[None]), jnp.asarray(img1[None])
        )
        mask = np.asarray(out.coarse.mask[0])
        mk0 = np.asarray(out.fine.mkpts0_f[0])[mask][:, :2]
        mk1 = np.asarray(out.fine.mkpts1_f[0])[mask][:, :2]
        conf = np.asarray(out.coarse.mconf[0])[mask]
        return mk0, mk1, conf


def draw_matches(img0, img1, mk0, mk1, margin: int = 10) -> np.ndarray:
    """Fast side-by-side match plot (demo/demo.py:61-92)."""
    import cv2

    to_u8 = lambda x: (np.clip(x, 0, 1) * 255).astype(np.uint8)  # noqa: E731
    a = to_u8(img0[..., 0] if img0.shape[-1] == 1 else img0 @ [0.299, 0.587, 0.114])
    b = to_u8(img1[..., 0] if img1.shape[-1] == 1 else img1 @ [0.299, 0.587, 0.114])
    H = max(a.shape[0], b.shape[0])
    W = a.shape[1] + b.shape[1] + margin
    out = np.full((H, W), 255, np.uint8)
    out[: a.shape[0], : a.shape[1]] = a
    out[: b.shape[0], a.shape[1] + margin :] = b
    out = np.stack([out] * 3, -1)
    off = a.shape[1] + margin
    for (x0, y0), (x1, y1) in zip(mk0.round().astype(int), mk1.round().astype(int)):
        cv2.line(out, (x0, y0), (x1 + off, y1), (0, 200, 0), 1, cv2.LINE_AA)
        cv2.circle(out, (x0, y0), 2, (0, 0, 230), -1, cv2.LINE_AA)
        cv2.circle(out, (x1 + off, y1), 2, (0, 0, 230), -1, cv2.LINE_AA)
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_pair = sub.add_parser("pair", help="match two images")
    p_pair.add_argument("img0")
    p_pair.add_argument("img1")
    p_pair.add_argument("--ckpt", default=None)
    p_pair.add_argument("--out", default="matches.png")
    p_pair.add_argument("--thr", type=float, default=0.2)
    p_pair.add_argument("--gray", action="store_true")
    p_pair.add_argument("--size", type=int, nargs=2, default=(640, 480))

    p_stream = sub.add_parser("stream", help="match consecutive stream frames")
    p_stream.add_argument("source")
    p_stream.add_argument("--ckpt", default=None)
    p_stream.add_argument("--out-dir", default="stream_out")
    p_stream.add_argument("--thr", type=float, default=0.2)
    p_stream.add_argument("--gray", action="store_true")
    p_stream.add_argument("--size", type=int, nargs=2, default=(640, 480))
    p_stream.add_argument("--skip", type=int, default=1)
    p_stream.add_argument("--max-frames", type=int, default=100)

    args = parser.parse_args(argv)
    import cv2

    if args.cmd == "pair":
        matcher = PairMatcher(args.ckpt, args.gray, tuple(args.size), args.thr)
        img0 = load_image(args.img0, tuple(args.size), args.gray)
        img1 = load_image(args.img1, tuple(args.size), args.gray)
        t0 = time.perf_counter()
        mk0, mk1, conf = matcher.match(img0, img1)
        dt = time.perf_counter() - t0
        print(f"{len(mk0)} matches in {dt * 1000:.1f} ms (incl. compile on first call)")
        vis = draw_matches(img0, img1, mk0, mk1)
        cv2.imwrite(args.out, vis)
        print(f"wrote {args.out}")
        return 0

    matcher = PairMatcher(args.ckpt, args.gray, tuple(args.size), args.thr)
    os.makedirs(args.out_dir, exist_ok=True)
    prev = None
    n = 0
    t_start = time.perf_counter()
    for frame in VideoStreamer(
        args.source, tuple(args.size), args.gray, args.skip, args.max_frames
    ).frames():
        if prev is not None:
            mk0, mk1, conf = matcher.match(prev, frame)
            vis = draw_matches(prev, frame, mk0, mk1)
            cv2.imwrite(os.path.join(args.out_dir, f"match_{n:06d}.png"), vis)
            n += 1
        prev = frame
    dt = time.perf_counter() - t_start
    if n:
        print(f"{n} pairs in {dt:.2f}s ({n / dt:.2f} pairs/s incl. IO+compile)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
