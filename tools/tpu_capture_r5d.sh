#!/bin/bash
# Round-5 capture session D (launch after r5c):
#   1. two-stream-m8192 — loss-source bisect: r5c's full-duration
#                         two_stream still lost 282k pushes in ONE
#                         saturation block (down from 15.1M).  Raising
#                         ONLY the misfit capacity tells whether the
#                         fallback overflow (vs deposit-reach) is the
#                         remaining binding bound.
#   2. qed-8m-nofused   — QED at bench scale via the unfused pipeline
#                         (skipped unless the chipless AOT validated).
#   3. bench-1e8        — defaults retry with balanced chunks.
#   4. bench-w12        — narrow-window A/B (losses void).
#   5. bench-sub32      — 262k rows/program A/B.
#   6. qed-2m-blk4096   — QED kernel block A/B under the shape-sized
#                         VMEM limit (the old flat-64MB limit forced
#                         blk2048).
# Usage: bash tools/tpu_capture_r5d.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r5d.log}
OUTD=/tmp/tpu_capture_runs
mkdir -p "$OUTD"
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

for i in $(seq 1 600); do
  grep -q "r5c capture done" /tmp/tpu_r5c.log 2>/dev/null && break
  sleep 30
done

say "r5d capture starting: $(git -C /root/repo log --oneline -1)"

TS=$OUTD/two_stream_m8192
rm -rf "$TS"; mkdir -p "$TS"
{ cat examples/two_stream.yaml; printf "\ntpu:\n fused_misfit_capacity: 8192\n"; } \
  > "$TS/two_stream_m8192.yaml"
run_stage two-stream-m8192 7200 python -m opal_tpu "$TS/two_stream_m8192.yaml"
grep -c "warning: buffer" "$LOG" >> "$LOG" 2>&1 || true

if grep -q '"metric": "aot-compile"' /tmp/aot_qed8m_nofused.json 2>/dev/null; then
  run_stage qed-8m-nofused 5400 python bench.py --verbose --qed \
    --no-fused --steps 20 --steps-per-program 5
else
  say "SKIP qed-8m-nofused: chipless AOT not validated"
fi

run_stage bench-1e8 4800 python bench.py --verbose --particles 1e8

run_stage bench-w12 2400 python bench.py --verbose --fused-window 12

run_stage bench-sub32 2400 python bench.py --verbose --fused-subblocks 32

run_stage qed-2m-blk4096 3600 python bench.py --verbose --qed \
  --particles 2097152 --steps 50 --steps-per-program 25 \
  --fused-block 4096

say "r5d capture done"
