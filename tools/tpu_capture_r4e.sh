#!/bin/bash
# Round-4 capture session E: narrow-window A/B on the slab-deposit
# tree.  W=16 at the bench defaults carries 5 cells of 8-rounding
# headroom (formula needs 11); W=8 halves the kernel's select-sum
# gather cost (r2e kernel sweep: -0.53 ms/step) but rides the misfit
# fallback for dispersion-tail strays — now cheap (slab deposit).
# Losses void the bench, so a W8 capture is self-policing.
# Usage: bash tools/tpu_capture_r4e.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r4e.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

for i in $(seq 1 360); do
  grep -q "r4d capture done" /tmp/tpu_r4d.log 2>/dev/null && break
  sleep 30
done

say "r4e capture starting: $(git -C /root/repo log --oneline -1)"

run_stage bench-w8-m1024 2400 python bench.py --verbose \
  --fused-window 8 --misfit-capacity 1024
run_stage bench-w8-m2048 2400 python bench.py --verbose \
  --fused-window 8 --misfit-capacity 2048
# control: default window, enlarged misfit capacity alone (isolates
# the capacity cost from the window saving)
run_stage bench-w16-m1024 2400 python bench.py --verbose \
  --misfit-capacity 1024

say "r4e capture done"
