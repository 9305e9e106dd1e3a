#!/bin/bash
# Round-5 capture session A (verdict items 1a, 4, 5 + lineage):
#   1. qed-8m        — the r4 VMEM-reservation fix (ops/fused.py:158,
#                      commit 4c7df34) has NEVER run on a chip; any
#                      rc=0 number unblocks the QED-at-scale story.
#   2. bench-1e8     — defaults-only north-star-scale capture on the
#                      new auto-sizing (R384/m2048/cap1.1/steps400
#                      folded in; target >= 1.18e9 without hand flags).
#   3. bench-default — 8.39M lineage confirm (r4k: 1.2724e9).
#   4. qed-2m        — em+abs+dep baseline for the >=3e7 work
#                      (r4j: 1.762e7).
#   5. two-stream-full — the FULL reference deck (63k steps) at the
#                      shipped CLI defaults: VERDICT item 4.
# Usage: bash tools/tpu_capture_r5a.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r5a.log}
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

say "r5a capture starting: $(git -C /root/repo log --oneline -1)"

run_stage qed-8m 5400 python bench.py --verbose --qed \
  --steps 20 --steps-per-program 5

run_stage bench-1e8-defaults 4800 python bench.py --verbose \
  --particles 1e8

run_stage bench-default 2400 python bench.py --verbose

run_stage qed-2m 3000 python bench.py --verbose --qed \
  --particles 2097152 --steps 50 --steps-per-program 25

TS=$OUTD/two_stream_full
rm -rf "$TS"; mkdir -p "$TS"
cp examples/two_stream.yaml "$TS/two_stream_full.yaml"
run_stage two-stream-full 7200 python -m opal_tpu "$TS/two_stream_full.yaml"
python - "$TS" >> "$LOG" 2>&1 <<'EOF'
import sys, pathlib
d = pathlib.Path(sys.argv[1])
tots = []
for i in range(100):
    f = d / f"{i}_energy.dat"
    if not f.exists():
        break
    vals = {}
    for ln in f.read_text().splitlines():
        p = ln.split()
        if len(p) >= 2:
            vals[p[0]] = float(p[-1])
    tots.append(sum(vals.values()))
print("two_stream full ledger totals:", tots)
if len(tots) >= 2 and tots[0]:
    drift = max(abs(t - tots[0]) for t in tots) / abs(tots[0])
    print("max relative energy drift:", drift)
EOF

say "r5a capture done"
