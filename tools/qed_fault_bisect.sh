#!/bin/bash
# Bisect the QED-on-TPU device fault (first seen 2026-08-19: every
# `bench.py --qed` variant dies with UNAVAILABLE "kernel fault" on the
# v5e while all non-QED benches pass; the round-2 QED path had never
# touched hardware before).  Stages go smallest-first so the first
# fault localizes cheaply.  Usage: bash tools/qed_fault_bisect.sh [log]
set -u
cd /root/repo
LOG=${1:-/tmp/qed_bisect.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

say "qed fault bisect starting"
# 0. sanity: tiny non-QED
run_stage tiny-base 900 python bench.py --verbose \
  --particles 262144 --nx 256 --steps 50
# 1. tiny full QED (fault expected if scale-independent)
run_stage tiny-qed 900 python bench.py --verbose --qed \
  --particles 262144 --nx 256 --steps 50
# 2. emission only
run_stage tiny-emit 900 python bench.py --verbose --qed --no-absorption \
  --particles 262144 --nx 256 --steps 50
# 3. compactions off (full-buffer walks are fine at this size)
run_stage tiny-qed-nocompact 900 python bench.py --verbose --qed \
  --absorption-active 0 --emission-active 0 \
  --particles 262144 --nx 256 --steps 50
# 4. unfused pipeline (is the fused kernel implicated at all?)
run_stage tiny-qed-nofused 900 python bench.py --verbose --qed --no-fused \
  --particles 262144 --nx 256 --steps 50
# 5. scale ramp: if tiny passes, the fault may be a per-program wall-time
# watchdog (a slow QED step x 250-step compiled block), not an illegal
# access.  Ramp size and steps separately.
run_stage mid-qed-s10 1200 python bench.py --verbose --qed \
  --particles 2097152 --steps 10
run_stage mid-qed-s50 1200 python bench.py --verbose --qed \
  --particles 2097152 --steps 50
run_stage big-qed-s10 1500 python bench.py --verbose --qed --steps 10
say "qed fault bisect complete"
