"""Audit a tpu_capture log: per-stage verdicts at a glance.

The r2b lesson: ``bench.py`` deliberately exits 0 with a degraded
``{"error": ...}`` JSON line when the run fails (the driver needs a
JSON line, not a traceback), so a capture stage can log ``rc=0`` while
having measured nothing.  This scans a capture log and prints one line
per stage: rc, the bench JSON verdict (value or error), and any
watchdog/compile fault signatures.

Usage: python tools/capture_audit.py [/tmp/tpu_r2c.log]
"""

from __future__ import annotations

import json
import re
import sys

STAGE_RE = re.compile(r"=== STAGE (\S+): (.*)")
RC_RE = re.compile(r"=== STAGE (\S+) rc=(\d+)")
FAULTS = (
    ("legalize", "Mosaic legalization failure"),
    ("Ran out of memory in memory space vmem", "scoped-VMEM OOM"),
    ("tpu_compile_helper", "remote compile failure"),
    ("UNAVAILABLE: TPU device error", "device fault / watchdog"),
    ("buffer-overflow particle losses", "buffer overflow losses"),
)


def audit(path: str) -> int:
    stages: list[dict] = []
    cur = None
    for line in open(path, errors="replace"):
        m = STAGE_RE.search(line)
        if m and " rc=" not in line:
            cur = {"name": m.group(1), "cmd": m.group(2), "rc": None,
                   "json": None, "faults": set(), "notes": []}
            stages.append(cur)
            continue
        m = RC_RE.search(line)
        if m and cur is not None and m.group(1) == cur["name"]:
            cur["rc"] = int(m.group(2))
            continue
        if cur is None:
            continue
        if line.startswith("{") and '"metric"' in line:
            try:
                cur["json"] = json.loads(line)
            except json.JSONDecodeError:
                pass
        for sig, label in FAULTS:
            if sig in line:
                cur["faults"].add(label)
        if line.startswith("# device=") or "energy:" in line:
            cur["notes"].append(line.strip())

    bad = 0
    for s in stages:
        j = s["json"]
        if j is not None and j.get("error"):
            verdict = f"ERROR: {j['error'][:90]}"
        elif j is not None:
            verdict = f"{j.get('value'):.4g} {j.get('unit', '')}"
        elif s["rc"] == 0:
            verdict = "ok (no bench JSON)"
        elif s["rc"] is None:
            verdict = "RUNNING/KILLED"
        else:
            verdict = f"FAILED rc={s['rc']}"
        flag = " !!" if (
            (j and j.get("error")) or (s["rc"] not in (0, None))
            or s["faults"]
        ) else ""
        bad += bool(flag)
        print(f"{s['name']:24s} rc={s['rc']!s:5s} {verdict}{flag}")
        for f in sorted(s["faults"]):
            print(f"{'':24s}   fault: {f}")
        for n in s["notes"]:
            print(f"{'':24s}   {n[:110]}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(audit(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_r2c.log"))
