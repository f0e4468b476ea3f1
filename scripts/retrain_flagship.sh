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
set -euo pipefail
cd "$(dirname "$0")/.."
exec python scripts/train_flagship.py \
  --epochs 150 --batch 64 \
  --coord-sigma 2.0 --diff-giou --grad-clip 1.0 \
  --pos-dropout 0.05 --layer-dropout 0 --patch-dropout 0 \
  --out checkpoints_flagship "$@"
