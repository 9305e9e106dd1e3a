#!/bin/bash
# Round-2 capture session F: QED follow-ups after r2e.
#   1. qed-2m retry with a 90-min stage timeout (r2e rc=124 was a
#      remote-compile timeout at 40 min on a day the helper ran ~1.75x
#      slower than r2c; tools/qed_lower_size.py shows the program
#      itself SHRANK vs r2d, so the code is not the cause).
#   2. Fresh qed_micro primitive table on the new data-movement code
#      (sampler one-hot, sort compaction, row-batched gathers) to
#      attribute the remaining 101 ms/step of the emission-only path.
# Usage: bash tools/tpu_capture_r2f.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r2f.log}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }
run_stage() {
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

say "r2f capture starting"
run_stage qed-micro 2400 python tools/qed_micro.py
run_stage qed-2m-retry 5400 python bench.py --verbose --qed \
  --particles 2097152 --steps 50 --steps-per-program 25
say "r2f capture complete"

# two_stream FULL duration at FULL f64 (the reference's precision):
# the parity reference point for the mixed-precision default's
# full-duration drift (-5.9e-5, r2e)
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
say "r2f (incl. f64 two_stream) complete"
