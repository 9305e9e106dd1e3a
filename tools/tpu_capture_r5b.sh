#!/bin/bash
# Round-5 capture session B: the span-bounded dynamic gather on
# hardware (A/B vs the static unroll), the 1e8 defaults retry, and the
# two-stream-full rerun (r5a's attempt died on the weak-i64 Mosaic
# lowering bug, fixed in 7815b17).
# Usage: bash tools/tpu_capture_r5b.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r5b.log}
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

say "r5b capture starting: $(git -C /root/repo log --oneline -1)"

run_stage bench-dyngather 2400 python bench.py --verbose

run_stage bench-static-gather 2400 python bench.py --verbose \
  --static-gather

run_stage bench-1e8-defaults 4800 python bench.py --verbose \
  --particles 1e8

TS=$OUTD/two_stream_full_b
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

say "r5b capture done"
