"""Aggregate per-op device time from a JAX profiler xplane.pb trace.

Usage: python tools/xplane_opstats.py /path/to/trace_dir [top_n]

Parses the XSpace proto (via tensorflow's bundled xplane_pb2), finds
TPU device planes, and sums XEvent durations grouped by event name —
a self-contained replacement for the tensorboard profile UI, used to
find which HLO fusions dominate a step.
"""
import os
import sys
import glob
import collections

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = glob.glob(os.path.join(root, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        sys.exit(f"no xplane.pb under {root}")
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        totals = collections.Counter()
        counts = collections.Counter()
        plane_total = 0
        for line in plane.lines:
            # XLA Ops / XLA Modules lines carry the op-level events
            if line.name not in ("XLA Ops", "Steps", "XLA Modules", "Framework Ops"):
                pass
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                totals[name] += ev.duration_ps
                counts[name] += 1
                plane_total += ev.duration_ps
        if not totals:
            continue
        print(f"=== plane: {plane.name}  (XLA Ops total {plane_total/1e12*1e3:.1f} ms)")
        for name, ps in totals.most_common(top_n):
            print(f"{ps/1e9:10.3f} ms  x{counts[name]:<6d} {name[:110]}")


if __name__ == "__main__":
    main()
