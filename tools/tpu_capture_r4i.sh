#!/bin/bash
# Round-4 capture session I: sort-cadence stretch.  At R=384 the
# dispersion term (ceil(0.95*0.019*384) = 7) still fits the W=16
# window (gap+6+disp = 14 <= 16), so halving the sort frequency is
# free on paper — the r3 "cadence is not a lever" result was measured
# when steps-per-program clamped the effective cadence (250-step
# programs sort once per program regardless of R).  1024-step
# programs actually honour R.
# Usage: bash tools/tpu_capture_r4i.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r4i.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

for i in $(seq 1 600); do
  grep -q "r4h capture done" /tmp/tpu_r4h.log 2>/dev/null && break
  sleep 30
done

say "r4i capture starting: $(git -C /root/repo log --oneline -1)"

# deferred migration follows R (migrate-every defaults to R)
run_stage bench-r384 2400 python bench.py --verbose --fused-resort 384
run_stage bench-r320 2400 python bench.py --verbose --fused-resort 320

say "r4i capture done"
