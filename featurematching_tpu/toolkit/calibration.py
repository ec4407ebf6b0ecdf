"""Chessboard mono/stereo calibration + yaml persistence + undistortion.

Capability port of /root/reference/datasets/scared_toolkits/scaredtk/
calibrator.py:8-261 (Calibrator/MonoCalibrator/StereoCalibrator/undistort)
and the img_distort.py preprocessing (stereo split + undistort + resize,
/root/reference/datasets/img_distort.py:31-68). OpenCV host tooling.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


class Calibrator:
    """Shared chessboard detection + cv2.FileStorage yaml persistence."""

    def __init__(self, chessboard_size: Tuple[int, int], tile_size: float):
        self.chessboard_size = tuple(chessboard_size)
        self.tile_size = tile_size
        self.calib: Dict[str, Optional[np.ndarray]] = {}

    def _chessboard_points(self) -> np.ndarray:
        n = self.chessboard_size[0] * self.chessboard_size[1]
        objp = np.zeros((n, 3), np.float32)
        objp[:, :2] = (
            np.mgrid[0 : self.chessboard_size[0], 0 : self.chessboard_size[1]]
            .T.reshape(-1, 2)
        )
        return objp * self.tile_size

    def _find_corners(self, img: np.ndarray):
        import cv2

        gray = img if img.ndim == 2 else cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        found, corners = cv2.findChessboardCorners(gray, self.chessboard_size)
        if not found:
            return None
        criteria = (cv2.TermCriteria_EPS + cv2.TermCriteria_COUNT, 100, 1e-4)
        return cv2.cornerSubPix(gray, corners, (5, 5), (-1, -1), criteria)

    def save(self, path) -> None:
        import cv2

        Path(path).parent.mkdir(parents=True, exist_ok=True)
        fs = cv2.FileStorage(str(path), cv2.FILE_STORAGE_WRITE)
        for k, v in self.calib.items():
            if v is not None:
                fs.write(k, v)
        fs.release()

    def load(self, path) -> Dict[str, np.ndarray]:
        import cv2

        if not Path(path).is_file():
            raise FileNotFoundError(str(path))
        fs = cv2.FileStorage(str(path), cv2.FILE_STORAGE_READ)
        out = {}
        for k in ("K1", "K2", "D1", "D2", "R", "T", "R1", "R2", "P1", "P2", "Q", "K", "D"):
            node = fs.getNode(k)
            if not node.empty():
                out[k] = node.mat()
        # legacy M1/M2 aliases (reference calibrator.py:54-61)
        for legacy, canon in (("M1", "K1"), ("M2", "K2")):
            if canon not in out:
                node = fs.getNode(legacy)
                if not node.empty():
                    out[canon] = node.mat()
        fs.release()
        self.calib.update(out)
        return out


class MonoCalibrator(Calibrator):
    """cv2.calibrateCamera over a list of chessboard images."""

    def calibrate(self, images: Sequence[np.ndarray]) -> Dict[str, np.ndarray]:
        import cv2

        objp = self._chessboard_points()
        obj_pts, img_pts = [], []
        shape = None
        for img in images:
            corners = self._find_corners(img)
            if corners is not None:
                obj_pts.append(objp)
                img_pts.append(corners)
                shape = img.shape[:2][::-1]
        if not obj_pts:
            raise RuntimeError("no chessboards found")
        err, K, D, _, _ = cv2.calibrateCamera(obj_pts, img_pts, shape, None, None)
        self.calib = {"K": K, "D": D, "error": np.array([err])}
        return self.calib


class StereoCalibrator(Calibrator):
    """cv2.stereoCalibrate + stereoRectify over left/right chessboard pairs."""

    def calibrate(
        self,
        left_images: Sequence[np.ndarray],
        right_images: Sequence[np.ndarray],
    ) -> Dict[str, np.ndarray]:
        import cv2

        objp = self._chessboard_points()
        obj_pts, l_pts, r_pts = [], [], []
        shape = None
        for li, ri in zip(left_images, right_images):
            cl = self._find_corners(li)
            cr = self._find_corners(ri)
            if cl is not None and cr is not None:
                obj_pts.append(objp)
                l_pts.append(cl)
                r_pts.append(cr)
                shape = li.shape[:2][::-1]
        if not obj_pts:
            raise RuntimeError("no stereo chessboards found")
        err, K1, D1, K2, D2, R, T, _, _ = cv2.stereoCalibrate(
            obj_pts, l_pts, r_pts, None, None, None, None, shape
        )
        R1, R2, P1, P2, Q, _, _ = cv2.stereoRectify(K1, D1, K2, D2, shape, R, T)
        self.calib = {
            "K1": K1, "D1": D1, "K2": K2, "D2": D2, "R": R, "T": T,
            "R1": R1, "R2": R2, "P1": P1, "P2": P2, "Q": Q,
            "error": np.array([err]),
        }
        return self.calib

    def compute_rectification(
        self, image_size_hw: Tuple[int, int], alpha: float = -1.0
    ) -> Dict[str, np.ndarray]:
        """(Re)derive R1/R2/P1/P2/Q for a given image size and free-scaling
        alpha (reference calibrator.py:198-212 — which passes (h, w) to
        cv2.stereoRectify; OpenCV documents (w, h), used correctly here)."""
        import cv2

        for k in ("K1", "D1", "K2", "D2", "R", "T"):
            if self.calib.get(k) is None:
                raise ValueError(f"calibration missing {k}; load() or calibrate() first")
        h, w = image_size_hw
        R1, R2, P1, P2, Q, roi1, roi2 = cv2.stereoRectify(
            self.calib["K1"], self.calib["D1"],
            self.calib["K2"], self.calib["D2"],
            (w, h),
            self.calib["R"].astype(np.float64),
            self.calib["T"].astype(np.float64).reshape(3, 1),
            alpha=alpha,
        )
        self.calib.update({"R1": R1, "R2": R2, "P1": P1, "P2": P2, "Q": Q})
        self._rect_alpha = alpha
        self._rect_maps = None
        return self.calib

    def rectify(
        self, left: np.ndarray, right: np.ndarray, alpha: float = -1.0
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Stereo-rectify an image pair; caches remap tables per (size, alpha)
        (reference calibrator.py:214-242)."""
        import cv2

        size_hw = left.shape[:2]
        if (
            getattr(self, "_rect_maps", None) is None
            or getattr(self, "_rect_alpha", None) != alpha
            or getattr(self, "_rect_size", None) != size_hw
        ):
            if self.calib.get("R1") is None or getattr(self, "_rect_alpha", None) != alpha:
                self.compute_rectification(size_hw, alpha)
            h, w = size_hw
            self._rect_maps = (
                cv2.initUndistortRectifyMap(
                    self.calib["K1"], self.calib["D1"], self.calib["R1"],
                    self.calib["P1"], (w, h), cv2.CV_32FC1,
                ),
                cv2.initUndistortRectifyMap(
                    self.calib["K2"], self.calib["D2"], self.calib["R2"],
                    self.calib["P2"], (w, h), cv2.CV_32FC1,
                ),
            )
            self._rect_size = size_hw
        (lx, ly), (rx, ry) = self._rect_maps
        return (
            cv2.remap(left, lx, ly, cv2.INTER_LINEAR),
            cv2.remap(right, rx, ry, cv2.INTER_LINEAR),
        )


def undistort(img: np.ndarray, K: np.ndarray, D: np.ndarray, new_K: bool = False):
    """cv2 undistortion, optionally with an optimal new camera matrix
    (reference calibrator.py:247-261). Returns (undistorted, K_used)."""
    import cv2

    if new_K:
        h, w = img.shape[:2]
        K_new, _ = cv2.getOptimalNewCameraMatrix(K, D, (w, h), 1, (w, h))
        return cv2.undistort(img, K, D, None, K_new), K_new
    return cv2.undistort(img, K, D), K


def split_and_undistort_stereo(
    stacked: np.ndarray,
    calib: Dict[str, np.ndarray],
    out_size: Tuple[int, int] = (640, 480),
):
    """SCARED raw frames stack left over right; split, undistort each side
    with its calibration, resize (img_distort.py:31-68)."""
    import cv2

    h = stacked.shape[0] // 2
    left, right = stacked[:h], stacked[h:]
    left_u, _ = undistort(left, calib["K1"], calib["D1"])
    right_u, _ = undistort(right, calib["K2"], calib["D2"])
    return (
        cv2.resize(left_u, out_size),
        cv2.resize(right_u, out_size),
    )
