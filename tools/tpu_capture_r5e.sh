#!/bin/bash
# Round-5 capture session E (launch after r5d): absorption working-set
# A/Bs + the in-situ ablation ladder the r5c micro could not provide
# (its segtab/sort8 stages measure the PRE-r4 formulations, not the
# bracketed+screened real path).
#   1. micro-sorted / micro-scrambled — the sorted active-set index A/B
#   2. micro-ablate-walk              — full minus the walk+prefetch
#   3. micro-ablate-post              — full minus everything after the
#                                       walk (kicks/insert/scatter/book)
#   4. qed-2m                         — end-to-end em+abs+dep on the
#                                       sorted-active default
# Usage: bash tools/tpu_capture_r5e.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r5e.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

for i in $(seq 1 600); do
  grep -q "r5d capture done" /tmp/tpu_r5d.log 2>/dev/null && break
  sleep 30
done

say "r5e capture starting: $(git -C /root/repo log --oneline -1)"

run_stage micro-sorted 1800 python tools/absorb_micro.py --cases full
run_stage micro-scrambled 1800 python tools/absorb_micro.py \
  --cases full --no-sorted-active
run_stage micro-ablate-walk 1800 python tools/absorb_micro.py \
  --cases full --ablate walk
run_stage micro-ablate-post 1800 python tools/absorb_micro.py \
  --cases full --ablate kicks,insert,scatter,book

run_stage qed-2m 3000 python bench.py --verbose --qed \
  --particles 2097152 --steps 50 --steps-per-program 25

say "r5e capture done"
