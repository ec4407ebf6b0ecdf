"""SCARED ground-truth and geometry file IO.

Capability port of /root/reference/datasets/scared_toolkits/scaredtk/io.py:
pose sequences from json, tar-streamed img3d archives, stacked-stereo video,
ply/obj/tiff/subpixel-png/KITTI-flow read-write. tifffile/plyfile are not in
this image, so: tiff goes through imageio, and PLY is a minimal hand-rolled
binary/ascii writer-reader (the format subset SCARED uses).
"""

from __future__ import annotations

import json
import os
import tarfile
from collections import OrderedDict
from pathlib import Path
from typing import Union

import numpy as np

PathLike = Union[str, Path]


# --- poses ------------------------------------------------------------------

def load_pose_sequence(filepath: PathLike) -> "OrderedDict[int, np.ndarray]":
    """frame_data.tar.gz or a directory of frame json files -> {idx: 4x4 pose}.

    (reference io.py:19-43 reads the tar of per-frame json dicts with key
    'camera-pose')
    """
    poses: "OrderedDict[int, np.ndarray]" = OrderedDict()
    filepath = Path(filepath)
    if filepath.is_dir():
        for i, name in enumerate(sorted(os.listdir(filepath))):
            if not name.endswith(".json"):
                continue
            with open(filepath / name) as f:
                poses[i] = np.asarray(json.load(f)["camera-pose"])
        return poses
    with tarfile.open(filepath) as tar:
        members = sorted(
            (m for m in tar.getmembers() if m.name.endswith(".json")),
            key=lambda m: m.name,
        )
        for i, m in enumerate(members):
            data = json.load(tar.extractfile(m))
            poses[i] = np.asarray(data["camera-pose"])
    return poses


class Img3dTarLoader:
    """Stream scene_points tiff frames out of a SCARED tar archive without
    extracting it (reference io.py:46-103)."""

    def __init__(self, tar_path: PathLike):
        self.tar = tarfile.open(tar_path)
        self.members = sorted(
            (m for m in self.tar.getmembers() if m.name.endswith((".tiff", ".tif"))),
            key=lambda m: m.name,
        )

    def __len__(self) -> int:
        return len(self.members)

    def __getitem__(self, idx: int) -> np.ndarray:
        import imageio.v2 as imageio

        fh = self.tar.extractfile(self.members[idx])
        return np.asarray(imageio.imread(fh.read(), format="tiff"))

    def close(self) -> None:
        self.tar.close()


class StereoVideoCapture:
    """Reads a stacked (top/bottom) stereo video, returning split L/R frames
    (reference io.py:106-147)."""

    def __init__(self, path: PathLike):
        import cv2

        self.cap = cv2.VideoCapture(str(path))

    def read(self):
        ok, frame = self.cap.read()
        if not ok:
            return False, (None, None)
        h = frame.shape[0] // 2
        return True, (frame[:h], frame[h:])

    def release(self) -> None:
        self.cap.release()


# --- img3d (tiff) -----------------------------------------------------------

def load_img3d(path: PathLike) -> np.ndarray:
    """HxWx3 float tiff; zeros (unknown) are mapped to NaN like the reference
    loader (io.py:198-227)."""
    import imageio.v2 as imageio

    img3d = np.asarray(imageio.imread(str(path))).astype(np.float64)
    unknown = np.all(img3d == 0, axis=-1)
    img3d[unknown] = np.nan
    return img3d


def save_img3d(path: PathLike, img3d: np.ndarray) -> Path:
    """NaNs are stored as zeros (io.py:265-293)."""
    import imageio.v2 as imageio

    out = np.nan_to_num(img3d.astype(np.float32))
    imageio.imwrite(str(path), out)
    return Path(path)


# --- subpixel png -----------------------------------------------------------

def save_subpix_png(path: PathLike, img: np.ndarray, scale_factor: float = 256.0) -> Path:
    """Store float maps as 16-bit png scaled by `scale_factor` (io.py:296-335);
    NaN/negative -> 0."""
    import cv2

    scaled = np.nan_to_num(img, nan=0.0) * scale_factor
    scaled[scaled < 0] = 0
    cv2.imwrite(str(path), scaled.astype(np.uint16))
    return Path(path)


def load_subpix_png(path: PathLike, scale_factor: float = 256.0) -> np.ndarray:
    """16-bit png -> float map; zeros -> NaN (io.py:230-262)."""
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_ANYDEPTH)
    if img is None:
        raise FileNotFoundError(path)
    out = img.astype(np.float64) / scale_factor
    out[img == 0] = np.nan
    return out


# --- ply / obj --------------------------------------------------------------

def save_ptcloud_as_ply(path: PathLike, ptcloud: np.ndarray) -> Path:
    """Minimal ascii PLY writer (replaces plyfile; io.py:338-373)."""
    pts = np.asarray(ptcloud, np.float64)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(pts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n"
        )
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")
    return Path(path)


def load_ply_as_ptcloud(path: PathLike) -> np.ndarray:
    """Minimal ascii PLY reader (io.py:150-167)."""
    with open(path) as f:
        line = f.readline().strip()
        assert line == "ply", f"not a ply file: {path}"
        n = 0
        while True:
            line = f.readline().strip()
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            if line == "end_header":
                break
        pts = np.loadtxt(f, max_rows=n)
    return pts.reshape(-1, 3) if n else np.zeros((0, 3))


def load_scared_obj(path: PathLike) -> np.ndarray:
    """Vertices of a SCARED .obj file (io.py:170-195)."""
    pts = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                pts.append([float(x) for x in line.split()[1:4]])
    return np.asarray(pts, np.float64)


# --- KITTI flow -------------------------------------------------------------

def save_flow_kitti(path: PathLike, flow: np.ndarray) -> Path:
    """KITTI flow png: 16-bit, (u,v)*64 + 2^15, valid in 3rd channel
    (io.py:376-401)."""
    import cv2

    h, w = flow.shape[:2]
    out = np.zeros((h, w, 3), np.uint16)
    valid = ~np.isnan(flow).any(axis=-1)
    scaled = np.nan_to_num(flow) * 64.0 + 2**15
    out[..., 2] = np.clip(scaled[..., 0], 0, 65535).astype(np.uint16)  # u (BGR)
    out[..., 1] = np.clip(scaled[..., 1], 0, 65535).astype(np.uint16)  # v
    out[..., 0] = valid.astype(np.uint16)
    cv2.imwrite(str(path), out)
    return Path(path)


def read_flow_kitti(path: PathLike) -> np.ndarray:
    import cv2

    img = cv2.imread(str(path), cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    u = (img[..., 2].astype(np.float64) - 2**15) / 64.0
    v = (img[..., 1].astype(np.float64) - 2**15) / 64.0
    flow = np.stack([u, v], axis=-1)
    flow[img[..., 0] == 0] = np.nan
    return flow


def save_flow_tiff(path: PathLike, flow: np.ndarray) -> Path:
    import imageio.v2 as imageio

    imageio.imwrite(str(path), flow.astype(np.float32))
    return Path(path)


def read_flow_tiff(path: PathLike) -> np.ndarray:
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(str(path)))
