#!/bin/bash
# Round-2 capture session G: non-QED step config A/Bs, informed by the
# r2e kernel sweep + phase ladder (BASELINE.md):
#   kernel 4.58 ms of an 8.2 ms bench step; outside it sort 2.28,
#   glue ~2.0, misfit 1.31, migration 0.67, fields 0.31 ms/step.
#   Block size is FLAT at the kernel level (per-program overhead is
#   not the bottleneck); W=8 saves 0.5 ms.
# Stages attack the two biggest knobs end-to-end:
#   resort cadence (sort is a multi-operand payload sort ~580 ms per
#   sort at 8.4M, amortized /R) and window 8.  Subblocks ride along as
#   a cheap confirm at both the kernel and step level.
# Usage: bash tools/tpu_capture_r2g.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r2g.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

say "r2g capture starting"
run_stage resort-512 1500 python bench.py --verbose --fused-resort 512
run_stage resort-1024 1500 python bench.py --verbose --fused-resort 1024
run_stage window-8 1500 python bench.py --verbose --fused-window 8
run_stage combo-w8-r1024 1500 python bench.py --verbose \
  --fused-window 8 --fused-resort 1024
run_stage subblocks-4 1500 python bench.py --verbose --fused-subblocks 4
run_stage k-subblocks-4 900 python tools/kernel_bench.py --lite \
  --block 4096 --window 16 --subblocks 4
say "r2g capture complete"

# ---- emission-only (colliding_beams physics) attribution ladder ----
# 101 ms/step at 2.1M (r2e); micro table accounts for only ~22 ms
# (sample 5.4 + compact 6 + insert ~8 + rate 1.5 + kernel ~1.2).
# Candidates: photon-buffer migration (migrate_compact at 2.6M rows
# every 3rd step), maintenance sorts (resort 64), active-set scaling.
CB="--qed --particles 2097152 --steps 50 --steps-per-program 25 --no-deposition --no-absorption"
run_stage cb-base 1800 python bench.py --verbose $CB
run_stage cb-nomig 1800 python bench.py --verbose $CB --no-migration
run_stage cb-resort256 1800 python bench.py --verbose $CB --fused-resort 256
run_stage cb-active16k 1800 python bench.py --verbose $CB --emission-active 16384
say "r2g + emission ladder complete"
