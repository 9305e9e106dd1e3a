#!/bin/bash
# Resume of tools/tpu_capture.sh from the bench-qed-auto stage (the
# 2026-08-19 02:00 session captured bench-default and bench-nopacked,
# then hit a device error during bench-qed-auto — concurrent prototype
# traffic on the same chip is the suspected cause — and died with the
# driver session at bench-qed-full).
# Usage: bash tools/tpu_capture_resume.sh [logfile]
set -u
cd /root/repo
LOG=${1:-/tmp/tpu_capture2.log}
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

say "capture resume session starting"

# retry the faulted stage first
run_stage bench-qed-auto 1800 python bench.py --verbose --qed
# QED compaction A/B (walk the whole buffers)
run_stage bench-qed-full 1800 python bench.py --verbose --qed \
  --absorption-active 0 --emission-active 0
# colliding_beams-shaped QED: deposition off -> fused dep_skip path
run_stage bench-qed-nodep 1800 python bench.py --verbose --qed --no-deposition
# exact colliding_beams physics: emission only, deposition off,
# lazy photon chi (no per-step photon field gather)
run_stage bench-qed-cb 1800 python bench.py --verbose --qed \
  --no-deposition --no-absorption
# 2M-particle continuity point
run_stage bench-2m 1200 python bench.py --verbose --particles 2097152

# packed-kernel knob A/Bs
run_stage bench-w8 1200 python bench.py --verbose --fused-window 8
run_stage bench-blk4096 1200 python bench.py --verbose --fused-block 4096
run_stage bench-resort512 1200 python bench.py --verbose --fused-resort 512
run_stage bench-m6 1200 python bench.py --verbose --migrate-every 6
# QED migration-cadence A/B (halo-aware pairing lifted the M=1 pin)
run_stage bench-qed-m1 1500 python bench.py --verbose --qed --migrate-every 1

# colliding_beams FULL duration (reference deck, npc=100)
CB=$OUTD/colliding_beams
rm -rf "$CB"; mkdir -p "$CB"
cp examples/colliding_beams.yaml "$CB/"
run_stage colliding-beams-full 2400 \
  python -m opal_tpu "$CB/colliding_beams.yaml"
say "colliding_beams outputs:"; ls -la "$CB" >> "$LOG" 2>&1
for f in "$CB"/*_energy.dat; do
  [ -e "$f" ] && { say "--- $f"; cat "$f" >> "$LOG"; }
done

# two_stream FULL duration, DEFAULT (mixed) precision: energy drift
TS=$OUTD/two_stream
rm -rf "$TS"; mkdir -p "$TS"
cp examples/two_stream.yaml "$TS/"
run_stage two-stream-full 3000 python -m opal_tpu "$TS/two_stream.yaml"
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

say "capture resume session complete"
