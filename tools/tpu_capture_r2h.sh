#!/bin/bash
# Round-2 capture session H: follow-ons from r2g.
#   - sort_micro: re-price payload sort vs single-key + row-batched
#     permutation gather at 8.4M (the 2.28 ms/step sort phase; longer
#     cadences lose more in edge-window growth than they save).
#   - block 8192 at PINNED W=16/W=8 end-to-end (the old combo sweep
#     conflated block growth with auto-W growth; kernel-only says
#     8192x16 is 0.28 ms faster than 4096x16).
#   - f64 two_stream retry with the watchdog-safe auto block size
#     (the 2026-08-20 crash was a 1000-step f64 program tripping the
#     device wall-time kill).
# Usage: bash tools/tpu_capture_r2h.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r2h.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

say "r2h capture starting"
run_stage sort-micro 1800 python tools/sort_micro.py
run_stage blk8192-w16 1500 python bench.py --verbose \
  --fused-block 8192 --fused-window 16
run_stage blk8192-w8 1500 python bench.py --verbose \
  --fused-block 8192 --fused-window 8

TS=/tmp/tpu_capture_runs/two_stream_f64
rm -rf "$TS"; mkdir -p "$TS"
cp examples/two_stream.yaml "$TS/"
run_stage two-stream-f64 5400 python -m opal_tpu "$TS/two_stream.yaml" --f64
python - >> "$LOG" 2>&1 <<'PYEOF'
import glob, os
d = "/tmp/tpu_capture_runs/two_stream_f64"
fs = sorted(glob.glob(os.path.join(d, "*_energy.dat")),
            key=lambda p: int(os.path.basename(p).split("_")[0]))
def tot(p):
    return sum(float(l.split()[1]) for l in open(p) if l.split())
if fs:
    t0, t1 = tot(fs[0]), tot(fs[-1])
    print(f"two_stream f64 energy: first={t0:.6e} last={t1:.6e} "
          f"rel drift={(t1 - t0) / t0:.3e} over {len(fs)} outputs")
PYEOF
say "r2h capture complete"
