"""Trained-quality parity experiment: train the REFERENCE (torch CPU) and
featurematching_tpu from IDENTICAL initial weights on an IDENTICAL frozen
synthetic fixture, then evaluate both with the SAME cv2-RANSAC pose/AUC
machinery (reference utils/metrics.py:79-159, lightning_new.py:277-312).

Design notes
------------
* Operating point: tiny ResNetFPN_8_2 (grayscale — the reference's conv1 is
  hardcoded to 1 input channel, resnet_fpn.py:63), LoFTR coarse 2x(self,cross)
  linear attention, fine window 7 (the reference hardcodes Linear(49,1) mixers
  and unfold padding=2), dense focal loss, no pose head, PE off (the reference
  net.py:66-70 comments positional encoding out).
* Both frameworks start from the SAME torch random init (convert_matcher) and
  see the SAME pair order (shared seeded permutation per epoch). The
  reference's training-time fine sampling is deterministic (it feeds exactly
  the GT spv ids, coarse_matching_new.py get_coarse_match), so both
  trajectories differ only by framework numerics.
* Fixture GT is pre-deduplicated to one pair per coarse cell in BOTH images so
  the reference's kp1-only np.unique dedup (data_preprocessing.py:10-28) and
  our dual dedup (matching/supervision.py) are both no-ops — identical
  supervision targets.
* Evaluation is a single shared numpy/cv2 implementation applied to each
  framework's predicted matches: symmetric epipolar distance (metrics.py:33-53)
  and cv2.findEssentialMat(RANSAC, thr=1.0px)+recoverPose (metrics.py:79-109),
  aggregated with utils.metrics.error_auc / epidist_prec (metrics.py:162-196).

Run:  python benchmarks/trained_parity.py [--steps-per-epoch N] [--epochs E]
Emits JSON results and a markdown table row for BASELINE.md.

Flagship mode (round 3)
-----------------------
`--arch flagship` runs the REAL architecture the reference trains
(/root/reference/config.py:8,22-43): Swin-T U-Net backbone (embed 64,
depths [2,2,6], window 8), coarse LoFTR d=256 h=8 4x(self,cross) linear
attention, fine d=64 window 7, sparse focal supervision (the reference Loss
reads sparse_spvs from MATCH_COARSE, loss.py:15, default True). DropPath is
zeroed on BOTH sides (it is the only train-time stochasticity and would
otherwise compare two random draws instead of two frameworks). Because the
reference side takes hours on torch CPU, the two sides can run in separate
processes:

  # torch side (CPU, background):
  python benchmarks/trained_parity.py --arch flagship --scene two_plane \
      --side ref --state /tmp/init_s7.npz --out ref_s7.json ...
  # our side (TPU device, production bf16 fused-kernel path):
  python benchmarks/trained_parity.py --arch flagship --scene two_plane \
      --side ours --state /tmp/init_s7.npz --ref-json ref_s7.json \
      --ours-platform device --out flagship_s7.json ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Dict, List, Sequence

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------------------
# fixture
# ---------------------------------------------------------------------------

H, W = 96, 128
COARSE = 8
NUM_GT = 160  # padded GT capacity (ours); actual rows vary per pair


def make_fixture(
    seed: int, n_train: int, n_val: int, scene: str = "plane"
) -> List[Dict[str, np.ndarray]]:
    """Frozen list of pairs. Each: img0/img1 [H,W] f32 in [0,1], kp0/kp1
    [M,2] (x,y) full-res with unique coarse cells in both images, K, T_0to1,
    T_1to0.

    scene='plane': the original single-homography pairs. NOTE this is the
    planar-degenerate case for essential-matrix recovery — pose AUC@5/10 is
    near zero for ANY matcher on such scenes (scene property, not framework).
    scene='two_plane': two planes at different depths with larger motion;
    VAL pairs are additionally oracle-gated (cv2 RANSAC on the clean GT
    keypoints must recover the pose to < 2 deg) so that pose AUC measures
    match quality, not scene solvability. Both frameworks always see the
    SAME frozen pairs either way."""
    from featurematching_tpu.data.synthetic import synthetic_batch

    kw = (
        dict(n_planes=2, rot_scale=0.08, trans_scale=0.15)
        if scene == "two_plane"
        else {}
    )
    rng = np.random.default_rng(seed)
    pairs = []
    while len(pairs) < n_train + n_val:
        b = synthetic_batch(
            rng, batch_size=1, image_size=(H, W), channels=1, num_gt=NUM_GT, **kw
        )
        kp0 = b["gt_kp0"][0][b["gt_mask"][0]]
        kp1 = b["gt_kp1"][0][b["gt_mask"][0]]
        # pre-dedup: one pair per coarse cell in image1 AND image0
        wc = W // COARSE
        c0 = (kp0[:, 0] // COARSE).astype(np.int64) + wc * (kp0[:, 1] // COARSE).astype(np.int64)
        c1 = (kp1[:, 0] // COARSE).astype(np.int64) + wc * (kp1[:, 1] // COARSE).astype(np.int64)
        _, i1 = np.unique(c1, return_index=True)
        kp0, kp1, c0 = kp0[i1], kp1[i1], c0[i1]
        _, i0 = np.unique(c0, return_index=True)
        kp0, kp1 = kp0[i0], kp1[i0]
        pair = dict(
            img0=b["image0"][0, :, :, 0],
            img1=b["image1"][0, :, :, 0],
            kp0=kp0.astype(np.float32),
            kp1=kp1.astype(np.float32),
            K=b["K0"][0],
            T_0to1=b["T_0to1"][0],
            T_1to0=b["T_1to0"][0],
        )
        if scene == "two_plane" and len(pairs) >= n_train:
            # oracle gate (val pairs only): clean GT keypoints must yield
            # the pose — rejects cv2-side cheirality flips / tiny baselines
            ret = estimate_pose_cv2(
                np.ascontiguousarray(kp0, np.float64),
                np.ascontiguousarray(kp1, np.float64),
                pair["K"],
            )
            if ret is None:
                continue
            t_err, R_err = relative_pose_error(pair["T_0to1"], *ret)
            if max(t_err, R_err) > 2.0:
                continue
        pairs.append(pair)
    return pairs


# ---------------------------------------------------------------------------
# shared evaluation (numpy + cv2) — reference utils/metrics.py formulas
# ---------------------------------------------------------------------------

def symmetric_epipolar_distance(pts0, pts1, E, K0, K1):
    """Squared symmetric epipolar distance in normalized coords
    (reference metrics.py:33-53)."""
    p0 = (pts0 - K0[[0, 1], [2, 2]][None]) / K0[[0, 1], [0, 1]][None]
    p1 = (pts1 - K1[[0, 1], [2, 2]][None]) / K1[[0, 1], [0, 1]][None]
    p0 = np.concatenate([p0, np.ones_like(p0[:, :1])], -1)
    p1 = np.concatenate([p1, np.ones_like(p1[:, :1])], -1)
    Ep0 = p0 @ E.T
    p1Ep0 = np.sum(p1 * Ep0, -1)
    Etp1 = p1 @ E
    return p1Ep0**2 * (
        1.0 / (Ep0[:, 0] ** 2 + Ep0[:, 1] ** 2 + 1e-18)
        + 1.0 / (Etp1[:, 0] ** 2 + Etp1[:, 1] ** 2 + 1e-18)
    )


def relative_pose_error(T_0to1, R, t):
    """(t_err_deg, R_err_deg) — reference metrics.py:15-30 with
    ignore_gt_t_thr=0."""
    t_gt = T_0to1[:3, 3]
    n = np.linalg.norm(t) * np.linalg.norm(t_gt)
    t_err = np.rad2deg(np.arccos(np.clip(np.dot(t, t_gt) / (n + 1e-18), -1.0, 1.0)))
    t_err = min(t_err, 180.0 - t_err)
    R_gt = T_0to1[:3, :3]
    cos = (np.trace(R.T @ R_gt) - 1) / 2
    R_err = np.rad2deg(np.abs(np.arccos(np.clip(cos, -1.0, 1.0))))
    return t_err, R_err


def estimate_pose_cv2(kpts0, kpts1, K0):
    """cv2.findEssentialMat(RANSAC, 0.999, thr=1.0 px) + recoverPose best-of
    (reference metrics.py:79-109). Returns (R, t) or None."""
    import cv2

    if len(kpts0) < 5:
        return None
    focal = 0.5 * (K0[0, 0] + K0[1, 1])
    pp = (K0[0, 2], K0[1, 2])
    E, mask = cv2.findEssentialMat(
        kpts0, kpts1, focal, pp, cv2.RANSAC, 0.999, 1.0
    )
    if E is None:
        return None
    best = None
    best_n = 0
    for _E in np.split(E, len(E) // 3):
        n, R, t, _ = cv2.recoverPose(_E, kpts0, kpts1, np.eye(3), 1e9, mask=mask.copy())
        if n > best_n:
            best, best_n = (R, t[:, 0]), n
    return best


def evaluate_matches(
    per_pair_matches: Sequence[np.ndarray], val_pairs: Sequence[dict]
) -> Dict[str, float]:
    """per_pair_matches[i]: [M_i, 4] (x0,y0,x1,y1) predicted matches for val
    pair i. Returns auc@{5,10,20} + prec@5e-4 + avg match count."""
    from featurematching_tpu.utils.metrics import epidist_prec, error_auc

    pose_errs, epi_per_pair = [], []
    for m, pair in zip(per_pair_matches, val_pairs):
        K, T = pair["K"], pair["T_0to1"]
        tx = np.array(
            [
                [0, -T[2, 3], T[1, 3]],
                [T[2, 3], 0, -T[0, 3]],
                [-T[1, 3], T[0, 3], 0],
            ]
        )
        E_gt = tx @ T[:3, :3]
        if len(m):
            epi_per_pair.append(
                symmetric_epipolar_distance(m[:, :2], m[:, 2:], E_gt, K, K)
            )
        else:
            epi_per_pair.append(np.array([]))
        ret = estimate_pose_cv2(
            np.ascontiguousarray(m[:, :2], np.float64),
            np.ascontiguousarray(m[:, 2:], np.float64),
            K,
        )
        if ret is None:
            pose_errs.append(np.inf)
        else:
            t_err, R_err = relative_pose_error(T, *ret)
            pose_errs.append(max(t_err, R_err))
    out = error_auc(pose_errs)
    out.update(epidist_prec(epi_per_pair, (5e-4,)))
    out["n_matches"] = float(np.mean([len(m) for m in per_pair_matches]))
    return out


def evaluate_head_poses(
    per_pair_T: Sequence[np.ndarray], val_pairs: Sequence[dict]
) -> Dict[str, float]:
    """Pose-HEAD metrics: angular R/t errors of the predicted T_0to1 vs GT
    (the reference's compute_pose_errors_new path, utils/metrics.py:112-121),
    aggregated to head_auc@{5,10,20} + medians. One shared implementation
    applied to both frameworks' head outputs."""
    from featurematching_tpu.utils.metrics import error_auc

    errs, r_errs, t_errs = [], [], []
    for T_pred, pair in zip(per_pair_T, val_pairs):
        T = pair["T_0to1"]
        t_err, R_err = relative_pose_error(T, T_pred[:3, :3], T_pred[:3, 3])
        errs.append(max(t_err, R_err))
        r_errs.append(R_err)
        t_errs.append(t_err)
    out = {f"head_{k}": v for k, v in error_auc(errs).items()}
    out["head_R_med"] = float(np.median(r_errs))
    out["head_t_med"] = float(np.median(t_errs))
    return out


# ---------------------------------------------------------------------------
# reference side (torch CPU)
# ---------------------------------------------------------------------------

TINY = dict(
    backbone="resnet",
    initial_dim=32,
    block_dims=(32, 48, 64),
    coarse_d=64,
    coarse_heads=4,
    coarse_layers=("self", "cross") * 2,
    fine_d=32,
    fine_heads=4,
    fine_layers=("self", "cross"),
    sparse_spvs=False,  # round-2 protocol: dense focal
)

# the architecture the reference actually trains: /root/reference/config.py:8,22-43
# (Swin defaults: swin_backbone_modify_unetarchecture.py:549-567). sparse_spvs
# True because the reference Loss reads it from MATCH_COARSE (loss.py:15).
FLAGSHIP = dict(
    backbone="swin",
    coarse_d=256,
    coarse_heads=8,
    coarse_layers=("self", "cross") * 4,
    fine_d=64,
    fine_heads=8,
    fine_layers=("self", "cross"),
    sparse_spvs=True,
)

# diagnostic hybrid: ResNet backbone + the flagship-depth coarse stack —
# separates "Swin-UNet is hard to train at bs=1" from "the 8-layer post-norm
# coarse transformer is hard to train at bs=1"
RESNET_FLAGSHIP = dict(
    backbone="resnet",
    initial_dim=128,
    block_dims=(128, 196, 256),
    coarse_d=256,
    coarse_heads=8,
    coarse_layers=("self", "cross") * 4,
    fine_d=128,
    fine_heads=8,
    fine_layers=("self", "cross"),
    sparse_spvs=True,
)

ARCHS = {"tiny": TINY, "flagship": FLAGSHIP, "resnet_flagship": RESNET_FLAGSHIP}


def _quat_xyzw(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> unit quaternion (x, y, z, w), w >= 0 — the shared
    GT-target convention for the pose protocol (the reference repo contains
    NO producer for its loss's `quot_0to1` key; this is the harness's)."""
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(R).as_quat()  # (x, y, z, w)
    return (q if q[3] >= 0 else -q).astype(np.float32)


def ref_module_config(arch: dict, pose: str = "none") -> dict:
    t = arch
    pose_new = {
        # reference config.py:58-66 (POSE_NEW namespace), size = coarse grid
        "d_model": 256,
        "nhead": 8,
        "layer_names": ["cross", "cross", "cross", "cross"],
        "attention": "linear",
        "size": [H // 8, W // 8],
        "axis_w": 1,
        "trans_w": 1,
    }
    return {
        "pose_new": pose_new,
        "backbone_type": "ResNetFPN" if t["backbone"] == "resnet" else "swin",
        "input_channel": 1,
        "resolution": (8, 2),
        "fine_window_size": 7,
        "fine_concat_coarse_feat": True,
        "resnetfpn": {
            "initial_dim": t.get("initial_dim", 128),
            "block_dims": list(t.get("block_dims", (128, 196, 256))),
        },
        "coarse": {
            "d_model": t["coarse_d"],
            "nhead": t["coarse_heads"],
            "layer_names": list(t["coarse_layers"]),
            "attention": "linear",
        },
        "match_coarse": {
            "match_type": "dual_softmax",
            "thr": 0.2,
            "border_rm": 2,
            "dsmax_temperature": 0.1,
            "train_coarse_percent": 1.0,
            "train_pad_num_gt_min": 200,
            "sparse_spvs": t["sparse_spvs"],
        },
        "fine": {
            "d_model": t["fine_d"],
            "nhead": t["fine_heads"],
            "layer_names": list(t["fine_layers"]),
            "attention": "linear",
        },
        "pose_net_flag": pose,
        "loss": {
            "coarse_type": "focal",
            "coarse_weight": 1.0,
            "sparse_spvs": t["sparse_spvs"],
            "focal_alpha": 0.25,
            "focal_gamma": 2.0,
            "pos_weight": 1.0,
            "neg_weight": 1.0,
            "pose_net_flag": pose,
            "pose_loss_cal_flag": pose,
            "fine_weight": 1.0,
            "fine_correct_thr": 1.0,
            "r_weight": 1.0,
            "t_weight": 1.0,
        },
    }


def ref_batch(pair: dict, torch) -> dict:
    return {
        "image0": torch.from_numpy(pair["img0"])[None, None],
        "image1": torch.from_numpy(pair["img1"])[None, None],
        "origin_kp0": torch.from_numpy(pair["kp0"])[None],
        "origin_kp1": torch.from_numpy(pair["kp1"])[None],
        "T_0to1": torch.from_numpy(pair["T_0to1"])[None],
        "T_1to0": torch.from_numpy(pair["T_1to0"])[None],
        "K0": torch.from_numpy(pair["K"])[None],
        "K1": torch.from_numpy(pair["K"])[None],
        # pose-protocol GT quats (the reference loss reads quot_0to1/quot_1to0
        # but nothing in its repo produces them — harness supplies, both sides)
        "quot_0to1": torch.from_numpy(_quat_xyzw(pair["T_0to1"][:3, :3]))[None],
        "quot_1to0": torch.from_numpy(_quat_xyzw(pair["T_1to0"][:3, :3]))[None],
        "pair_names": ("fixture",),
    }


def run_reference(
    pairs, n_train, order, lr, seed, arch=TINY, state_path="", warmup=0, clip=0.0,
    pose="none", init_from="",
):
    """Train + evaluate the reference. Returns (metrics, losses, init_sd).

    If state_path is given, the shared init is saved BEFORE training starts,
    so the ours-side process can train in parallel from the same weights.
    If init_from is given, the matcher warm-starts from that reference-format
    state-dict npz (e.g. the TPU-pretrained Swin warm init exported by
    benchmarks/swin_pretrain.py via make_deconverter) instead of torch init."""
    import torch

    from featurematching_tpu.utils.ref_oracle import load_ref_module, sd_numpy

    net_mod = load_ref_module("network/net.py")
    pre_mod = load_ref_module("datasets/data_preprocessing.py")
    sup_mod = load_ref_module("network/utils/supervision_new.py")
    loss_mod = load_ref_module("losses/loss.py")

    mcfg = ref_module_config(arch, pose)
    torch.manual_seed(seed)
    matcher = net_mod.net(mcfg)
    # controlled experiment: DropPath is the only train-time stochasticity in
    # the Swin flagship (reference default drop_path_rate=0.2, swin_…py:563)
    # — zero it on BOTH sides so frameworks are compared, not random draws
    for m in matcher.modules():
        if type(m).__name__ == "DropPath":
            m.drop_prob = 0.0
    loss_fn = loss_mod.Loss({"module": mcfg})
    if init_from:
        warm = dict(np.load(init_from))
        matcher.load_state_dict(
            {k: torch.from_numpy(np.asarray(v)) for k, v in warm.items()},
            strict=True,
        )
        print(f"[ref] warm-started from {init_from}", file=sys.stderr, flush=True)
    init_sd = sd_numpy(matcher)
    if state_path:
        np.savez_compressed(state_path, **init_sd)
        print(f"[ref] shared init saved to {state_path}", file=sys.stderr, flush=True)

    sup_cfg = {"MODULE": {"RESOLUTION": (8, 2)}}
    opt = torch.optim.Adam(matcher.parameters(), lr=lr)

    def trainval(pair, train: bool):
        data = ref_batch(pair, torch)
        pre_mod.data_preprocess(data)
        sup_mod.compute_supervision_coarse(data, sup_cfg)
        matcher(data)
        sup_mod.compute_supervision_fine(data)
        loss_fn(data)
        return data

    # leave host cores free (4-core box); 2 lets two ref seeds run concurrently
    torch.set_num_threads(int(os.environ.get("FMTPU_REF_THREADS", "3")))
    losses = []
    matcher.train()
    loss_fn.train()
    t0 = time.time()
    for n, idx in enumerate(order):
        if warmup:
            # linear warmup, mirrored exactly on the ours side (the reference's
            # own recipe warms up for 4800 steps, lightning_new.py:320-339)
            for g in opt.param_groups:
                g["lr"] = lr * min(1.0, (n + 1) / warmup)
        data = trainval(pairs[idx], train=True)
        if pose == "new":
            # the reference's commented-out `loss += loss_pose` (loss.py:169)
            # re-enabled with grads, using its exact formula (loss.py:155-165)
            mse_s = torch.nn.MSELoss(reduction="sum")
            mse_m = torch.nn.MSELoss(reduction="mean")
            q = mse_s(data["quot_0to1"].float(), data["quot_pred"][:, 0, :].float())
            qi = mse_s(data["quot_1to0"].float(), data["quot_pred"][:, 1, :].float())
            tl = mse_m(
                data["T_0to1"][0, :3, 3:].T.float(),
                data["translate_pred"][:, 0, :].float(),
            )
            tli = mse_m(
                data["T_1to0"][0, :3, 3:].T.float(),
                data["translate_pred"][:, 1, :].float(),
            )
            loss_pose = (q + qi) / 2 + torch.log((tl + tli) / 2 + 1)
            data["loss"] = data["loss"] + loss_pose
        opt.zero_grad()
        data["loss"].backward()
        if clip:
            # the reference trainer's own grad clip (config.py:152)
            torch.nn.utils.clip_grad_norm_(matcher.parameters(), clip)
        opt.step()
        losses.append(float(data["loss"].detach()))
        if n % 50 == 0 or n == len(order) - 1:
            print(
                f"[ref] step {n + 1}/{len(order)} loss={losses[-1]:.4f} "
                f"({time.time() - t0:.0f}s)",
                file=sys.stderr,
                flush=True,
            )

    matcher.eval()
    loss_fn.eval()
    per_pair, head_T = [], []
    with torch.no_grad():
        for pair in pairs[n_train:]:
            data = trainval(pair, train=False)
            m0 = data["mkpts0_f"][:, :2].numpy()
            m1 = data["mkpts1_f"][:, :2].numpy()
            per_pair.append(np.concatenate([m0, m1], -1))
            if pose == "new":
                head_T.append(data["T_0to1_pred"][0].numpy())
    metrics = evaluate_matches(per_pair, pairs[n_train:])
    if head_T:
        metrics.update(evaluate_head_poses(head_T, pairs[n_train:]))
    return metrics, losses, init_sd


# ---------------------------------------------------------------------------
# our side (jax CPU, same init / data / optimizer)
# ---------------------------------------------------------------------------

def our_config(arch=TINY, dtype="float32", fused="auto", pose="none",
               pose_t_weight=None):
    import dataclasses as dc

    from featurematching_tpu.config import Config

    t = arch
    cfg = Config()
    swin_kw = dict(drop_path_rate=0.0)  # droppath zeroed on both sides
    if fused != "auto":
        swin_kw.update(fused_block=fused, fused_attention=fused)
    backbone_kw = (
        dict(
            backbone_type="resnet_fpn",
            resnet_fpn=dc.replace(
                cfg.model.resnet_fpn,
                initial_dim=t["initial_dim"],
                block_dims=tuple(t["block_dims"]),
            ),
        )
        if t["backbone"] == "resnet"
        else dict(
            backbone_type="swin_v1",
            swin=dc.replace(cfg.model.swin, **swin_kw),
        )
    )
    m = dc.replace(
        cfg.model,
        input_channels=1,
        coarse=dc.replace(
            cfg.model.coarse,
            d_model=t["coarse_d"],
            nhead=t["coarse_heads"],
            layer_names=tuple(t["coarse_layers"]),
            attention="linear",
            **({} if fused == "auto" else dict(fused_train=fused)),
        ),
        fine=dc.replace(
            cfg.model.fine,
            d_model=t["fine_d"],
            nhead=t["fine_heads"],
            layer_names=tuple(t["fine_layers"]),
            attention="linear",
            **({} if fused == "auto" else dict(fused_train=fused)),
        ),
        match_coarse=dc.replace(
            cfg.model.match_coarse,
            max_matches=256 if t["backbone"] == "resnet" else 1024,
            max_gt_matches=NUM_GT,
        ),
        loss=dc.replace(
            cfg.model.loss,
            sparse_spvs=t["sparse_spvs"],
            # pose protocol: actually train the head (harness re-adds the
            # reference's commented-out accumulation on the torch side too)
            pose_in_total=pose != "none",
            **(
                {} if pose_t_weight is None
                else dict(t_weight=pose_t_weight)
            ),
        ),
        pose=dc.replace(cfg.model.pose, flag=pose),
        compute_dtype=dtype,
        positional_encoding=False,  # reference net.py:66-70 comments PE out
        **backbone_kw,
    )
    return dc.replace(cfg, model=m)


def our_batch(pair: dict) -> Dict[str, np.ndarray]:
    m = len(pair["kp0"])
    kp0 = np.zeros((1, NUM_GT, 2), np.float32)
    kp1 = np.zeros((1, NUM_GT, 2), np.float32)
    mask = np.zeros((1, NUM_GT), bool)
    kp0[0, :m], kp1[0, :m], mask[0, :m] = pair["kp0"], pair["kp1"], True
    return {
        "image0": pair["img0"][None, :, :, None],
        "image1": pair["img1"][None, :, :, None],
        "gt_kp0": kp0,
        "gt_kp1": kp1,
        "gt_mask": mask,
        "T_0to1": pair["T_0to1"][None],
        "T_1to0": pair["T_1to0"][None],
        "K0": pair["K"][None],
        "K1": pair["K"][None],
    }


def run_ours(
    pairs, n_train, order, lr, init_sd, arch=TINY, dtype="float32", fused="auto",
    warmup=0, clip=0.0, pose="none", pose_t_weight=None,
):
    import jax
    import jax.numpy as jnp
    import optax

    from featurematching_tpu.models.matcher import Matcher
    from featurematching_tpu.train.step import (
        TrainState,
        make_eval_step,
        make_opt_state,
        make_train_step,
    )
    from featurematching_tpu.utils.torch_convert import convert_matcher

    cfg = our_config(arch, dtype, fused, pose, pose_t_weight=pose_t_weight)
    model = Matcher(cfg.model)
    sample = our_batch(pairs[0])

    # same initial weights as the reference run
    params, stats = convert_matcher(
        init_sd,
        coarse_layers=len(arch["coarse_layers"]),
        fine_layers=len(arch["fine_layers"]),
    )
    # structural sanity vs a fresh init — loud failure over silent drift
    ref_vars = jax.eval_shape(
        lambda: Matcher(cfg.model).init(
            jax.random.PRNGKey(0), jnp.asarray(sample["image0"]), jnp.asarray(sample["image1"])
        )
    )
    got_n = len(jax.tree_util.tree_leaves(params))
    ref_n = len(jax.tree_util.tree_leaves(ref_vars["params"]))
    assert got_n == ref_n, f"converted params leaves {got_n} != init {ref_n}"

    if warmup:
        # same linear warmup as the ref side: lr_n = lr * min(1, (n+1)/warmup)
        # (optax schedules see count=0 on the first update)
        tx = optax.adam(lambda count: lr * jnp.minimum(1.0, (count + 1) / warmup))
    else:
        tx = optax.adam(lr)
    if clip:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    params = jax.tree.map(jnp.asarray, params)
    stats = jax.tree.map(jnp.asarray, stats)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=stats,
        opt_state=make_opt_state(tx, params),
        tx=tx,
    )

    train_step = jax.jit(make_train_step(model, cfg))
    eval_step = jax.jit(make_eval_step(model, cfg))
    rng = jax.random.PRNGKey(0)  # droppath zeroed (run_reference) — unused

    # the fixture is small: stage every distinct train batch on device ONCE
    # (the axon tunnel uploads at ~15 MB/s — per-step uploads would dominate)
    staged = [jax.device_put(our_batch(p)) for p in pairs[:n_train]]
    losses = []
    t0 = time.time()
    for n, idx in enumerate(order):
        state, metrics = train_step(state, staged[idx], rng)
        losses.append(float(metrics["loss"]))
        if n % 50 == 0 or n == len(order) - 1:
            print(
                f"[ours] step {n + 1}/{len(order)} loss={losses[-1]:.4f} "
                f"({time.time() - t0:.0f}s)",
                file=sys.stderr,
                flush=True,
            )

    per_pair, head_T = [], []
    for pair in pairs[n_train:]:
        out, _ = eval_step(state, our_batch(pair))
        mask = np.asarray(out.fine_ids[2][0])
        m0 = np.asarray(out.fine.mkpts0_f[0, :, :2])[mask]
        m1 = np.asarray(out.fine.mkpts1_f[0, :, :2])[mask]
        per_pair.append(np.concatenate([m0, m1], -1))
        if pose in ("new", "new_fixed") and out.T_0to1_pred is not None:
            head_T.append(np.asarray(out.T_0to1_pred[0], np.float64))
    metrics = evaluate_matches(per_pair, pairs[n_train:])
    if head_T:
        metrics.update(evaluate_head_poses(head_T, pairs[n_train:]))
    return metrics, losses


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _print_table(result):
    keys = ["auc@5", "auc@10", "auc@20", "prec@5e-04", "n_matches", "final_loss"]
    if any("head_auc@10" in result.get(n, {}) for n in ("reference", "ours")):
        keys += ["head_auc@10", "head_auc@20", "head_R_med", "head_t_med"]
    print("\n| framework | " + " | ".join(keys) + " |")
    print("|---|" + "---|" * len(keys))
    for name in ("reference", "ours"):
        if name not in result:
            continue
        row = result[name]
        print(
            f"| {name} | "
            + " | ".join(f"{row.get(k, float('nan')):.4f}" for k in keys)
            + " |"
        )


def main():
    global H, W, NUM_GT

    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", choices=tuple(ARCHS), default="tiny")
    ap.add_argument("--size", type=int, nargs=2, default=None, help="H W")
    ap.add_argument("--num-gt", type=int, default=None)
    ap.add_argument("--train-pairs", type=int, default=48)
    ap.add_argument("--val-pairs", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--warmup", type=int, default=0,
                    help="linear lr warmup steps, mirrored on both sides")
    ap.add_argument("--clip", type=float, default=0.0,
                    help="global grad-norm clip, mirrored on both sides "
                         "(the reference trainer uses 0.5, config.py:152)")
    ap.add_argument("--pose", choices=("none", "new", "new_fixed"), default="none",
                    help="train the quaternion pose head on BOTH sides "
                         "(re-adds the reference's commented-out loss "
                         "accumulation, loss.py:169); requires coarse_d=256. "
                         "'new_fixed' is OURS-ONLY (the repaired per-direction "
                         "L2 head has no reference counterpart; use --side "
                         "ours + --ref-json to compare against a 'new' run)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--scene", choices=("plane", "two_plane"), default="plane")
    ap.add_argument("--sparse", choices=("arch", "on", "off"), default="arch",
                    help="override the arch's sparse_spvs (diagnostics)")
    ap.add_argument("--side", choices=("both", "ref", "ours"), default="both")
    ap.add_argument("--state", default="", help="npz path for the shared torch init")
    ap.add_argument("--init-from", default="",
                    help="warm-start BOTH sides from this reference-format "
                         "state-dict npz (swin_pretrain.py export)")
    ap.add_argument("--ref-json", default="", help="--side ours: merge this ref result")
    ap.add_argument("--ours-platform", choices=("cpu", "device"), default="cpu")
    ap.add_argument("--ours-dtype", choices=("auto", "float32", "bfloat16"), default="auto")
    ap.add_argument("--pose-t-weight", type=float, default=None,
                    help="ours-side ablation: override loss t_weight for the "
                         "pose head (the translation-signal probe)")
    ap.add_argument("--ours-fused", choices=("auto", "on", "off"), default="auto",
                    help="force the fused Pallas train kernels on/off (NaN isolation)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    if args.pose == "new_fixed" and args.side != "ours":
        ap.error("--pose new_fixed is ours-only; use --side ours (+ --ref-json)")
    arch = dict(ARCHS[args.arch])
    if args.sparse != "arch":
        arch["sparse_spvs"] = args.sparse == "on"
    if args.size:
        H, W = args.size
    elif args.arch == "flagship":
        H, W = 256, 320
    NUM_GT = args.num_gt or (512 if args.arch == "flagship" else 160)
    dtype = args.ours_dtype
    if dtype == "auto":
        dtype = "bfloat16" if args.ours_platform == "device" else "float32"

    import jax

    if args.ours_platform == "cpu":
        # force jax onto host CPU before first backend use: the axon TPU tunnel
        # is single-tenant and this mode must not contend with device benches
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    else:
        # production TPU path: persistent compile cache (first Mosaic compiles
        # over the tunnel take minutes; cached reruns are seconds)
        cache_dir = os.path.expanduser("~/.cache/fmtpu_jax")
        os.makedirs(cache_dir, exist_ok=True)
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    pairs = make_fixture(args.seed, args.train_pairs, args.val_pairs, args.scene)
    rng = np.random.default_rng(args.seed + 1)
    order = (
        np.concatenate(
            [rng.permutation(args.train_pairs) for _ in range(args.epochs)]
        )
        if args.epochs
        else np.zeros((0,), np.int64)  # --epochs 0: init-save/eval-only run
    )

    result = {"config": vars(args), "steps": len(order)}

    if args.side in ("both", "ref"):
        t0 = time.time()
        ref_metrics, ref_losses, init_sd = run_reference(
            pairs, args.train_pairs, order, args.lr, seed=args.seed, arch=arch,
            state_path=args.state, warmup=args.warmup, clip=args.clip,
            pose=args.pose, init_from=args.init_from,
        )
        result["reference"] = {
            **ref_metrics,
            "final_loss": float(np.mean(ref_losses[-8:])),
            "train_s": time.time() - t0,
        }
        result["loss_curve_ref"] = ref_losses
    else:
        init_sd = dict(np.load(args.init_from or args.state))
        if args.ref_json:
            with open(args.ref_json) as f:
                prev = json.load(f)
            result["reference"] = prev["reference"]
            result["loss_curve_ref"] = prev.get("loss_curve_ref", [])

    if args.side in ("both", "ours"):
        t0 = time.time()
        our_metrics, our_losses = run_ours(
            pairs, args.train_pairs, order, args.lr, init_sd, arch=arch,
            dtype=dtype, fused=args.ours_fused, warmup=args.warmup,
            clip=args.clip, pose=args.pose,
            pose_t_weight=args.pose_t_weight,
        )
        result["ours"] = {
            **our_metrics,
            "final_loss": float(np.mean(our_losses[-8:])),
            "train_s": time.time() - t0,
        }
        result["loss_curve_ours"] = our_losses

    print(json.dumps({k: v for k, v in result.items() if not k.startswith("loss_curve")}, indent=2))
    _print_table(result)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
