#!/bin/bash
# Round-4 capture session C: re-run of r4b's unfinished stages (the
# r4b session died at bench-default warm-up).  Default confirm, 1e8
# capture, QED matrix on the bracketed-absorption tree, QED-8M.
# Usage: bash tools/tpu_capture_r4c.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r4c.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

say "r4c capture starting: $(git -C /root/repo log --oneline -1)"

# 1. current defaults end-to-end (deferred migration + one-hot fallback,
#    1024-step programs) — the BENCH_r04 configuration
run_stage bench-default 2400 python bench.py --verbose

# 2. the 1e8-row capture (VERDICT item 2): programs sized under the
#    ~30 s device watchdog; capacity slack 1.1 for HBM
run_stage bench-1e8 4800 python bench.py --verbose --particles 1e8 \
  --steps 200 --steps-per-program 100 --capacity-factor 1.1

# 3. QED matrix at 2.1M on the bracketed tree
run_stage qed-2m 3000 python bench.py --verbose --qed \
  --particles 2097152 --steps 50 --steps-per-program 25
run_stage qed-2m-cb 2400 python bench.py --verbose --qed --no-deposition \
  --no-absorption --particles 2097152 --steps 50 --steps-per-program 25
# emission-active A/B: the one-hot MXU sampler may have inverted the
# r2 verdict — full-length sampling avoids the (EC, 8) row gather
run_stage qed-2m-cb-fullem 2400 python bench.py --verbose --qed \
  --no-deposition --no-absorption --particles 2097152 --steps 50 \
  --steps-per-program 25 --emission-active 0

# 4. QED at 8.39M (VERDICT item 6): any rc=0 number
run_stage qed-8m 4800 python bench.py --verbose --qed \
  --steps 20 --steps-per-program 5

say "r4c capture done"
