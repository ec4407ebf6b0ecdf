#!/bin/bash
# Round-5 quality campaigns (VERDICT #4/#6): harden the Swin-warm and pose
# headline claims — >=4 / >=3 seeds, 256 val pairs (the 24-pair sets let one
# pair decide auc@10).
#
# Two phases so the single-tenant TPU never runs two device processes:
#   ref   — torch-CPU reference runs (safe alongside device work, nice'd)
#   ours  — TPU runs (serialize with any other device job!)
#
#   bash benchmarks/run_r5_campaigns.sh ref
#   bash benchmarks/run_r5_campaigns.sh ours
set -e
cd "$(dirname "$0")/.."
export FMTPU_REF_THREADS="${FMTPU_REF_THREADS:-2}"  # leave cores for device dispatch

VAL=256
SWIN_SEEDS="7 21 35 50"
POSE_SEEDS="7 21 35"

phase="$1"

if [ "$phase" = "ref" ]; then
  for s in $SWIN_SEEDS; do
    [ -f benchmarks/swinwarm_ref_v256_s$s.json ] && continue
    nice -n 19 python benchmarks/trained_parity.py --arch flagship \
      --scene two_plane --side ref --seed $s --val-pairs $VAL \
      --train-pairs 64 --epochs 16 --lr 1e-4 --clip 0.5 \
      --init-from ckpts/swin_warm_s7.npz --state ckpts/swinwarm_init_s$s.npz \
      --out benchmarks/swinwarm_ref_v256_s$s.json
  done
  for s in $POSE_SEEDS; do
    [ -f benchmarks/pose_ref_v256_s$s.json ] && continue
    nice -n 19 python benchmarks/trained_parity.py --arch resnet_flagship \
      --scene two_plane --side ref --seed $s --val-pairs $VAL \
      --train-pairs 64 --epochs 48 --lr 6e-4 --warmup 480 --clip 0.5 \
      --pose new --num-gt 256 --state ckpts/pose_init_s$s.npz \
      --out benchmarks/pose_ref_v256_s$s.json
  done
elif [ "$phase" = "ours" ]; then
  for s in $SWIN_SEEDS; do
    [ -f benchmarks/swinwarm_ours_v256_s$s.json ] && continue
    python benchmarks/trained_parity.py --arch flagship \
      --scene two_plane --side ours --seed $s --val-pairs $VAL \
      --train-pairs 64 --epochs 16 --lr 1e-4 --clip 0.5 \
      --init-from ckpts/swin_warm_s7.npz --state ckpts/swinwarm_init_s$s.npz \
      --ours-platform device \
      --ref-json benchmarks/swinwarm_ref_v256_s$s.json \
      --out benchmarks/swinwarm_ours_v256_s$s.json
  done
  for s in $POSE_SEEDS; do
    [ -f benchmarks/pose_newfixed_v256_s$s.json ] && continue
    python benchmarks/trained_parity.py --arch resnet_flagship \
      --scene two_plane --side ours --seed $s --val-pairs $VAL \
      --train-pairs 64 --epochs 48 --lr 6e-4 --warmup 480 --clip 0.5 \
      --pose new_fixed --num-gt 256 --state ckpts/pose_init_s$s.npz \
      --ours-platform device \
      --ref-json benchmarks/pose_ref_v256_s$s.json \
      --out benchmarks/pose_newfixed_v256_s$s.json
  done
else
  echo "usage: $0 ref|ours" >&2
  exit 1
fi
