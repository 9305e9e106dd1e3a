#!/bin/bash
# Round-4 capture session A (2026-08-20/21): misfit-chain attribution,
# deferred-migration A/B, then scale.
# Usage: bash tools/tpu_capture_r4.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r4a.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

say "r4a capture starting: $(git -C /root/repo log --oneline -1)"

# 1. misfit chain per-op attribution at bench shapes
run_stage misfit-micro 1800 python tools/misfit_micro.py --steps 100

# 2. r3-default confirm on this tree (kernel reach-bound added; M=3)
run_stage bench-m3 2400 python bench.py --verbose --migrate-every 3 \
  --fused-resort 256

# 3. deferred migration (new default): M = R = 192
run_stage bench-deferred 2400 python bench.py --verbose

# 4. deferred + long programs (1024 steps, ~8 s device time)
run_stage bench-deferred-s1024 2400 python bench.py --verbose --steps 1024
