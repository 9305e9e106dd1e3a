#!/bin/bash
# Round-4 capture session K: 1e8 with the r4i cadence win (R=384) and
# a bounded misfit capacity; plus the new-defaults confirm.
# Usage: bash tools/tpu_capture_r4k.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r4k.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

for i in $(seq 1 600); do
  grep -q "r4j capture done" /tmp/tpu_r4j.log 2>/dev/null && break
  sleep 30
done

say "r4k capture starting: $(git -C /root/repo log --oneline -1)"

run_stage bench-1e8-r384 4800 python bench.py --verbose \
  --particles 1e8 --steps 400 --steps-per-program 200 \
  --capacity-factor 1.1 --fused-resort 384
# misfit capacity at 1e8 defaults to 3052 rows (particles/32768); the
# chain scales with rows — try the 8.39M-proven 2x-margin bound
run_stage bench-1e8-r384-m2048 4800 python bench.py --verbose \
  --particles 1e8 --steps 400 --steps-per-program 200 \
  --capacity-factor 1.1 --fused-resort 384 --misfit-capacity 2048

say "r4k capture done"
