#!/bin/bash
# Round-2 capture session F: QED follow-ups after r2e.
#   1. qed-2m retry with a 90-min stage timeout (r2e rc=124 was a
#      remote-compile timeout at 40 min on a day the helper ran ~1.75x
#      slower than r2c; tools/qed_lower_size.py shows the program
#      itself SHRANK vs r2d, so the code is not the cause).
#   2. Fresh qed_micro primitive table on the new data-movement code
#      (sampler one-hot, sort compaction, row-batched gathers) to
#      attribute the remaining 101 ms/step of the emission-only path.
# Usage: bash tools/tpu_capture_r2f.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r2f.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

say "r2f capture starting"
run_stage qed-micro 2400 python tools/qed_micro.py
run_stage qed-2m-retry 5400 python bench.py --verbose --qed \
  --particles 2097152 --steps 50 --steps-per-program 25
say "r2f capture complete"
