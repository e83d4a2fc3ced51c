#!/bin/bash
# Live run of the never-exercised `weizmann` named config with the
# round-4 default epoch_shuffle=True (reference SerialIterator semantics;
# VERDICT r3 next-round #5) on a synthetic stand-in store (the real
# Weizmann corpus is unavailable offline). 10k steps ~= 4 min on a
# healthy chip.
#
# Usage: bash scripts/weizmann_run.sh [STEPS] [OUT]
set -e -o pipefail
STEPS=${1:-10000}
OUT=${2:-/tmp/weizmann10k_r4}
STORE=/tmp/synth96w

if [ ! -d "$STORE" ]; then
  python scripts/make_synthetic_store.py --out "$STORE" \
    --clips 90 --frames 32 --size 96   # 90 clips ~ Weizmann's 10x9 corpus
fi

timeout "${CELL_TIMEOUT:-1800}" python train.py --config weizmann \
  --data-dir "$STORE" --total-steps "$STEPS" --no-resume \
  --out-dir "$OUT" --set train.eval_every=2000 train.label_smoothing=0.1 \
  2>&1 | tail -5
