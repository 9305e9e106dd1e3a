#!/bin/bash
# Round-2 capture session E (2026-08-20): the r2d host was recycled
# (fresh /tmp, cold compile cache).  Covers the measurements still
# outstanding after r2d:
#   1. bench-default A/B of the reciprocal-sharing commit (4dd1170):
#      r2c's 1.026e9 was captured on PRE-reciprocal code; the current
#      default path has never been timed.
#   2. The QED 2.1M matrix on the NEW data-movement code (one-hot MXU
#      sampler tables f43d1bc, compacted-working-space absorb d6cceb2,
#      sort-based compaction + row-batched gathers 95aac09) vs the r2d
#      baselines: qed-2m 9.3e5, qed-2m-cb 4.76e6 pushes/s.
#   3. qed-2m-nodep (r2d hit a transient tunnel error, never measured).
#   4. two_stream FULL duration at DEFAULT mixed precision: the
#      energy-drift closure for VERDICT item 7 (r2d ran out of session).
# Usage: bash tools/tpu_capture_r2e.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r2e.log}
OUTD=/tmp/tpu_capture_runs
mkdir -p "$OUTD"
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache

say() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

run_stage() {  # run_stage <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  say "=== STAGE $name: $*"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  say "=== STAGE $name rc=$?"
}

say "r2e capture starting"

# 1. non-QED default: confirm the 1.026e9 lineage on the current tree
run_stage bench-default 1800 python bench.py --verbose

# 2. QED matrix at 2.1M on the new data-movement code
run_stage qed-2m 2400 python bench.py --verbose --qed \
  --particles 2097152 --steps 50 --steps-per-program 25
run_stage qed-2m-nodep 2400 python bench.py --verbose --qed \
  --particles 2097152 --steps 50 --steps-per-program 25 --no-deposition
run_stage qed-2m-cb 2400 python bench.py --verbose --qed \
  --particles 2097152 --steps 50 --steps-per-program 25 \
  --no-deposition --no-absorption

# 3. two_stream FULL duration, DEFAULT (mixed) precision: the
#    full-duration energy-drift number VERDICT item 7 asks for
TS=$OUTD/two_stream
rm -rf "$TS"; mkdir -p "$TS"
cp examples/two_stream.yaml "$TS/"
run_stage two-stream-full 3600 python -m opal_tpu "$TS/two_stream.yaml"
python - >> "$LOG" 2>&1 <<'EOF'
import glob, os
d = "/tmp/tpu_capture_runs/two_stream"
fs = sorted(glob.glob(os.path.join(d, "*_energy.dat")),
            key=lambda p: int(os.path.basename(p).split("_")[0]))
def tot(p):
    return sum(float(l.split()[1]) for l in open(p) if l.split())
if fs:
    t0, t1 = tot(fs[0]), tot(fs[-1])
    print(f"two_stream energy: first={t0:.6e} last={t1:.6e} "
          f"rel drift={(t1 - t0) / t0:.3e} over {len(fs)} outputs")
EOF

say "r2e capture complete"
