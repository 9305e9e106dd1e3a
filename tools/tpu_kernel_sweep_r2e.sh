#!/bin/bash
# Fused-kernel block/window sweep + step attribution (r2e follow-on).
# Motivation: at blk4096 the bench step runs 2048 kernel programs; if
# Mosaic's per-program overhead is ~1 us that alone is ~2 ms of the
# 8.2 ms step.  Sweep block (program count) and window (VPU gather
# cost) on the kernel in isolation, then re-run the phase ladder to
# attribute the current 8.2 ms step (the last ladder predates lite +
# blk4096 + reciprocal-sharing).
# Usage: bash tools/tpu_kernel_sweep_r2e.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_sweep_r2e.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

say "r2e kernel sweep starting"

# kernel in isolation: block x window
run_stage k-4096-16 900 python tools/kernel_bench.py --lite --block 4096 --window 16
run_stage k-8192-16 900 python tools/kernel_bench.py --lite --block 8192 --window 16
run_stage k-16384-16 900 python tools/kernel_bench.py --lite --block 16384 --window 16
run_stage k-32768-16 900 python tools/kernel_bench.py --lite --block 32768 --window 16
run_stage k-8192-24 900 python tools/kernel_bench.py --lite --block 8192 --window 24
run_stage k-4096-8 900 python tools/kernel_bench.py --lite --block 4096 --window 8

# attribution at the winner-independent baseline
run_stage k-4096-16-depskip 900 python tools/kernel_bench.py --lite --block 4096 --window 16 --dep-skip

# step attribution ladder on the current tree
run_stage phase-ladder 3600 python tools/phase_bench.py

say "r2e kernel sweep complete"
