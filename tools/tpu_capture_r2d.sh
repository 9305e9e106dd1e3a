#!/bin/bash
# Round-2 capture session D (2026-08-19): the machine hosting r2c was
# recycled after stages 1-2 (bench-default 1.026e9 confirmed, mxu-gather
# dead-end recorded), so this session covers the stages that never ran:
#   - the QED bench matrix on hardware (bounded steps-per-program),
#   - full-duration colliding_beams + two_stream through the CLI at
#     default (mixed) precision.
# Usage: bash tools/tpu_capture_r2d.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_r2d.log}
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

say "r2d capture starting"

# 1. QED matrix at 2.1M, 50-step blocks split into 25-step programs
run_stage qed-2m 2400 python bench.py --verbose --qed \
  --particles 2097152 --steps 50 --steps-per-program 25
run_stage qed-2m-nodep 2400 python bench.py --verbose --qed \
  --particles 2097152 --steps 50 --steps-per-program 25 --no-deposition
run_stage qed-2m-cb 2400 python bench.py --verbose --qed \
  --particles 2097152 --steps 50 --steps-per-program 25 \
  --no-deposition --no-absorption
run_stage qed-2m-m1 2400 python bench.py --verbose --qed \
  --particles 2097152 --steps 50 --steps-per-program 25 --migrate-every 1

# 2. QED at full bench scale, shorter programs
run_stage qed-8m 2400 python bench.py --verbose --qed \
  --steps 30 --steps-per-program 10

# 3. colliding_beams FULL duration (reference deck, npc=100) through
#    the CLI at DEFAULT (mixed) precision
CB=$OUTD/colliding_beams
rm -rf "$CB"; mkdir -p "$CB"
cp examples/colliding_beams.yaml "$CB/"
run_stage colliding-beams-full 3600 \
  python -m opal_tpu "$CB/colliding_beams.yaml"
say "colliding_beams outputs:"; ls -la "$CB" >> "$LOG" 2>&1
for f in "$CB"/*_energy.dat; do
  [ -e "$f" ] && { say "--- $f"; cat "$f" >> "$LOG"; }
done

# 4. two_stream FULL duration, DEFAULT (mixed) precision: the
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

say "r2d capture complete"
