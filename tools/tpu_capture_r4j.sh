#!/bin/bash
# Round-4 capture session J: QED matrix on the event-capacity +
# range-screen + walk-prefetch tree, plus the qed-8m retry (the VMEM
# stack failure was the length-1-scan closed_call, fixed in sim).
# Usage: bash tools/tpu_capture_r4j.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r4j.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

for i in $(seq 1 600); do
  grep -q "r4i capture done" /tmp/tpu_r4i.log 2>/dev/null && break
  sleep 30
done

say "r4j capture starting: $(git -C /root/repo log --oneline -1)"

run_stage qed-2m 3000 python bench.py --verbose --qed \
  --particles 2097152 --steps 50 --steps-per-program 25
run_stage qed-2m-cb 2400 python bench.py --verbose --qed --no-deposition \
  --no-absorption --particles 2097152 --steps 50 --steps-per-program 25
run_stage qed-8m 5400 python bench.py --verbose --qed \
  --steps 20 --steps-per-program 5

say "r4j capture done"
