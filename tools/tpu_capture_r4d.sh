#!/bin/bash
# Round-4 capture session D: slab-deposit misfit fallback A/B, 1e8
# retry with donated buffers, absorption-pass attribution on the
# bracketed tree.  Waits for r4c to release the chip first.
# Usage: bash tools/tpu_capture_r4d.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r4d.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

# wait (up to 2 h) for the r4c capture to finish with the chip
for i in $(seq 1 240); do
  grep -q "r4c capture done" /tmp/tpu_r4c.log 2>/dev/null && break
  sleep 30
done

say "r4d capture starting: $(git -C /root/repo log --oneline -1)"

# 1. misfit fallback ladder with the slab deposit (vs 1.9 ms one-hot)
run_stage misfit-micro-slab 2400 python tools/misfit_micro.py --steps 100 \
  --stages compact,takes,push,depositslab,scatters

# 2. end-to-end defaults on the slab-deposit tree
run_stage bench-default 2400 python bench.py --verbose

# 3. 1e8 retry with donated run buffers (VERDICT item 2)
run_stage bench-1e8 4800 python bench.py --verbose --particles 1e8 \
  --steps 200 --steps-per-program 100 --capacity-factor 1.1

# 4. absorption-pass attribution at the current (bracketed) tree:
#    where do the 157 ms/step of qed-2m live now?
run_stage absorb-micro 2400 python tools/absorb_micro.py
run_stage absorb-micro-ablate 3600 python tools/absorb_micro.py \
  --ablate walk,kicks,insert,scatter,book

say "r4d capture done"
