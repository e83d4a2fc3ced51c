#!/bin/bash
# Balance-lever sweep (VERDICT r3 next-round #3): find a committed recipe
# that bounds loss_gen on long runs, or show via the multi-signal eval
# panel (fvd_proxy + gen_spread_ratio + dv_margin) that the drift is
# benign. Four 30k-step cells on the synthetic 96-clip store, sequential
# (one chip, one CPU core — see docs/PERFORMANCE.md on contention).
#
# Usage: bash scripts/balance_sweep.sh [STEPS] [OUTROOT]
set -e -o pipefail
STEPS=${1:-30000}
OUT=${2:-/tmp/balance_r4}
STORE=/tmp/synth96

if [ ! -d "$STORE" ]; then
  python scripts/make_synthetic_store.py --out "$STORE" \
    --clips 96 --frames 32 --size 96
fi

run() {
  name=$1; shift
  echo "=== cell $name ==="
  # timeout: a hung tunnel (docs/PERFORMANCE.md third failure mode) must
  # cost one cell, not wedge the whole sweep.
  timeout "${CELL_TIMEOUT:-2700}" python train.py --config mug \
    --data-dir "$STORE" \
    --total-steps "$STEPS" --no-resume --out-dir "$OUT/$name" \
    --set train.eval_every=2000 "$@" \
    2>&1 | tail -3 || echo "!!! cell $name failed/timed out (rc $?)"
}

# r3 recipe (known: loss_gen drifts to 12-17 while Ds pin at the floor)
run base_s01  train.label_smoothing=0.1
# D on half cadence: weakens D, G sees a beatable opponent
run dhalf_s01 train.label_smoothing=0.1 train.d_update_every=2
# TTUR with G faster than D
run ttur_s01  train.label_smoothing=0.1 \
              train.g_learning_rate=0.0004 train.d_learning_rate=0.0001
# stronger one-sided smoothing alone
run s02       train.label_smoothing=0.2
echo "=== sweep done -> $OUT ==="
