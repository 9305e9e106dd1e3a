#!/bin/bash
# Round-4 capture session G: misfit-deposit sub-part isolation.  All
# three fallback-deposit formulations cost ~1.9 ms/step at 256 rows in
# the scan micro while takes/scatters are free — locate the pathology
# (tap values? one-hot contraction? carried-slab accumulate?).
# Usage: bash tools/tpu_capture_r4g.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r4g.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

for i in $(seq 1 480); do
  grep -q "r4f capture done" /tmp/tpu_r4f.log 2>/dev/null && break
  sleep 30
done

say "r4g capture starting: $(git -C /root/repo log --oneline -1)"

run_stage misfit-parts 3600 python tools/misfit_micro.py --steps 100 \
  --stages compact,takes,push,vals,matmul,slabadd

say "r4g capture done"
