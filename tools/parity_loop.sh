#!/usr/bin/env bash
# De-flake gauntlet (VERDICT r3 item 6): run the train-step + trajectory
# parity suites N consecutive times; exit nonzero on the first red run.
# Usage: bash tools/parity_loop.sh [N]   (default 20)
set -u
cd "$(dirname "$0")/.."
N=${1:-20}
LOG=${PARITY_LOOP_LOG:-/tmp/parity_loop.log}
: > "$LOG"
for i in $(seq 1 "$N"); do
  start=$(date +%s)
  if ! python -m pytest tests/test_train_step_parity.py \
      tests/test_train_trajectory_parity.py -q >> "$LOG" 2>&1; then
    echo "RUN $i/$N: FAILED (see $LOG)"
    exit 1
  fi
  echo "RUN $i/$N: green ($(( $(date +%s) - start ))s)"
done
echo "ALL $N RUNS GREEN"
