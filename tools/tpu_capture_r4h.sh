#!/bin/bash
# Round-4 capture session H: 1e8 program-length ladder.  The first
# clean 1e8 capture (r4d: 1.054e9) ran 100-step programs — 10x the
# per-program fixed cost of the 8.39M default (1024).  At ~95 ms/step
# a 200-step program is ~19 s of device time, still under the ~30 s
# watchdog.
# Usage: bash tools/tpu_capture_r4h.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r4h.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

for i in $(seq 1 480); do
  grep -q "r4g capture done" /tmp/tpu_r4g.log 2>/dev/null && break
  sleep 30
done

say "r4h capture starting: $(git -C /root/repo log --oneline -1)"

run_stage bench-1e8-spp200 4800 python bench.py --verbose \
  --particles 1e8 --steps 400 --steps-per-program 200 \
  --capacity-factor 1.1

say "r4h capture done"
