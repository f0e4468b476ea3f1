#!/usr/bin/env bash
# THE pinned flagship-checkpoint recipe (bench workload comparability).
#
# bench.py's trained workload is a function of this checkpoint; any round
# whose checkpoints_flagship/ is missing must rerun THIS exact command
# before benching (VERDICT r03 item 3).  Seed is fixed inside
# train_flagship.py (seed_everything(42)); data is the GC10 annotations
# shipped with the reference; pixels are the learnable synthetic renderer
# (data/synthetic.py) — the only pixels available in this environment.
#
# Quality flags are the recalibrated recipe measured best on every gate
# (docs/PERF.md "dropout recipe A/B").  ~20 s/epoch on a healthy tunnel;
# budget 1-3 h wall clock depending on tunnel stalls.
#
# Training runs in checkpoints_run/ (live dir, GC'd by max_to_keep=1);
# the FINAL full-state checkpoint is copied read-only into
# checkpoints_flagship/ — the git-pinned artifact bench.py restores.
# Never point a live run at the pinned dir (ADVICE r04: the run's
# CheckpointManager would delete the tracked checkpoint).
set -euo pipefail
cd "$(dirname "$0")/.."
# --zoom-crop 0 pins the historical recipe: train_flagship.py now
# defaults to 0.5 (quality winner, docs/PERF.md round-5 gates), but THIS
# script must keep producing the same workload the cross-round bench
# numbers were measured on.  The quality-best recipe simply omits the
# flag (or see checkpoints_zoom/).
python scripts/train_flagship.py \
  --epochs 150 --batch 64 \
  --coord-sigma 2.0 --diff-giou --grad-clip 1.0 \
  --pos-dropout 0.05 --layer-dropout 0 --patch-dropout 0 \
  --zoom-crop 0 \
  --out checkpoints_run "$@"

step=$(ls checkpoints_run | grep -E '^[0-9]+$' | sort -n | tail -1)
[ -n "$step" ] || { echo "no checkpoint produced in checkpoints_run/"; exit 1; }
mkdir -p checkpoints_flagship
rm -rf "checkpoints_flagship/${step}.tmp"
cp -r "checkpoints_run/$step" "checkpoints_flagship/${step}.tmp"
find checkpoints_flagship -maxdepth 1 -type d -regex '.*/[0-9]+' -exec rm -rf {} +
mv "checkpoints_flagship/${step}.tmp" "checkpoints_flagship/$step"
echo "pinned checkpoints_flagship/$step (remember to git add it)"
