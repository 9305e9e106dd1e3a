#!/bin/bash
# Round-4 capture session F: emission active-set sizing ladder
# (emission-only = colliding_beams physics).  The auto EC = cap/8 =
# 327k rows pays ~16 ms/step of row gather+scatter; the machinery
# scales with EC, and a backlog note (counted deferral) flags an
# undersized EC loudly.  Full-length EC=0 measured 3.2x SLOWER
# (r4c qed-2m-cb-fullem), so compaction stays — the question is how
# small EC can go.
# Usage: bash tools/tpu_capture_r4f.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r4f.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

for i in $(seq 1 480); do
  grep -q "r4e capture done" /tmp/tpu_r4e.log 2>/dev/null && break
  sleep 30
done

say "r4f capture starting: $(git -C /root/repo log --oneline -1)"

run_stage qed-cb-ec128k 2400 python bench.py --verbose --qed \
  --no-deposition --no-absorption --particles 2097152 --steps 50 \
  --steps-per-program 25 --emission-active 131072
run_stage qed-cb-ec64k 2400 python bench.py --verbose --qed \
  --no-deposition --no-absorption --particles 2097152 --steps 50 \
  --steps-per-program 25 --emission-active 65536
run_stage qed-cb-ec32k 2400 python bench.py --verbose --qed \
  --no-deposition --no-absorption --particles 2097152 --steps 50 \
  --steps-per-program 25 --emission-active 32768

say "r4f capture done"
