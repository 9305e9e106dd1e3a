#!/bin/bash
# Fused-kernel knob COMBO sweep (the 2026-08-19 single-knob A/Bs at
# 8.39M f32: blk4096 +11%, W8 +6%, nopacked +6.6% — each measured
# alone on the packed/blk2048 default).  This crosses them to pick the
# bench + CLI default.  Usage: bash tools/tpu_combo_sweep.sh [log]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_combo.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

say "combo sweep starting"
run_stage p-b4096-w8   1200 python bench.py --verbose --fused-block 4096 --fused-window 8
run_stage np-b4096     1200 python bench.py --verbose --no-packed --fused-block 4096
run_stage np-b4096-w8  1200 python bench.py --verbose --no-packed --fused-block 4096 --fused-window 8
run_stage p-b8192      1200 python bench.py --verbose --fused-block 8192
run_stage p-b8192-w8   1200 python bench.py --verbose --fused-block 8192 --fused-window 8
run_stage np-b8192     1200 python bench.py --verbose --no-packed --fused-block 8192
run_stage p-b4096-m6   1200 python bench.py --verbose --fused-block 4096 --migrate-every 6
say "combo sweep complete"
