"""Direct ground-truth comparison: opal_tpu vs the mini-reference.

VERDICT r4 item 8: every validation so far was self-consistency or an
independent analytic oracle; this tool performs the first DIRECT
comparison of field-energy curves and final spectra against a
reference-faithful evolver.  ``tools/mini_ref.cc`` independently
re-implements the reference's exact discrete system (serial, f64,
reference loop order ``main.rs:238-267``); this driver

1. builds a two_stream-style deck through the SAME ``cli.build`` the
   CLI uses (so initialization, windows, capacities are the product
   path), f64, 1 device;
2. dumps the initial electron state to a binary file;
3. runs the mini-reference on it;
4. steps opal_tpu over the same window, recording field/kinetic energy
   at the same cadence;
5. compares the curves (relative error per record) and the final px
   spectra (L1 distance of normalized histograms).

The two-stream instability is chaotic: round-off differences grow
exponentially (~e^{gamma t}) once the instability develops, so
agreement at rtol 1e-5 is physically meaningful over the seeded linear
phase; the tool reports where (if anywhere) the curves decouple and
compares growth thereafter.  Both sides run f64 from bit-identical
initial conditions; summation-order differences (sorted segmented
deposition vs per-particle order) are the only rounding divergence.

Usage:
    JAX_PLATFORMS=cpu python tools/ref_compare.py [--deck PATH]
        [--steps N] [--record K] [--nx N] [--npc N] [--out DIR]

Prints one JSON line with the max relative field-energy error over the
clean window and the spectrum distance.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import struct
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAGIC = 0x4F50414C


def build_binary() -> str:
    exe = "/tmp/mini_ref"
    src = Path(__file__).with_name("mini_ref.cc")
    if (not os.path.exists(exe)
            or os.path.getmtime(exe) < src.stat().st_mtime):
        subprocess.run(
            ["g++", "-O3", "-march=native", str(src), "-o", exe],
            check=True,
        )
    return exe


def dump_state(path, st, geom, dx, dt, charge, mass, record_every):
    import numpy as np

    nx = geom.nx
    alive = np.asarray(st.alive)
    # device-local cell -> global cell (each device owns a contiguous
    # row block of capacity rows; see species.initialize)
    n_rows = alive.shape[0]
    cap = n_rows // geom.n_devices
    dev = np.arange(n_rows) // cap
    cell = (np.asarray(st.cell).astype(np.int64)
            + dev * geom.n_loc - geom.left_pad)[alive]
    cols = [np.asarray(getattr(st, c), np.float64)[alive]
            for c in ("x", "ux", "uy", "uz", "weight")]
    n = cell.shape[0]
    with open(path, "wb") as f:
        f.write(struct.pack("<4q", MAGIC, n, nx, record_every))
        f.write(struct.pack("<4d", dx, dt, charge, mass))
        f.write(cell.tobytes())
        for c in cols:
            f.write(c.tobytes())
    return n


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--deck", default="examples/two_stream.yaml")
    p.add_argument("--devices", type=int, default=1,
                   help="opal_tpu device count — >1 turns this into a "
                        "MULTI-DEVICE equivalence oracle: shard_map "
                        "halo exchange, migration and psum reductions "
                        "vs the serial ground truth")
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--record", type=int, default=50)
    p.add_argument("--nx", type=int, default=0,
                   help="shrink the deck to this nx (0 = as-is)")
    p.add_argument("--npc", type=int, default=0)
    p.add_argument("--out", default=None)
    p.add_argument("--chunk", type=int, default=0,
                   help="steps per compiled program (default: --record)")
    args = p.parse_args(argv)

    import jax

    env_platforms = os.environ.get("JAX_PLATFORMS", "")
    if env_platforms and "cpu" in env_platforms.split(","):
        jax.config.update("jax_platforms", env_platforms)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from opal_tpu.cli import build

    outdir = Path(args.out or tempfile.mkdtemp(prefix="ref_compare_"))
    outdir.mkdir(parents=True, exist_ok=True)

    deck_src = Path(args.deck).read_text()
    if args.nx:
        deck_src = deck_src.replace("nx: 1000", f"nx: {args.nx}")
    if args.npc:
        deck_src = deck_src.replace("npc: 100", f"npc: {args.npc}")
    deck = outdir / "deck.yaml"
    deck.write_text(deck_src)

    sim, species, rp = build(
        deck, n_devices=args.devices, dtype=jnp.float64,
        field_dtype=jnp.float64,
    )
    geom = sim.geom
    est = species["electron"]
    spec = sim.specs["electron"]
    state_bin = outdir / "state.bin"
    n = dump_state(
        state_bin, est, geom, geom.dx, sim.options.dt,
        spec.charge, spec.mass, args.record,
    )
    print(f"# {n} electrons, nx={geom.nx}, steps={args.steps}",
          file=sys.stderr)

    # ---- mini-reference ------------------------------------------------
    exe = build_binary()
    subprocess.run(
        [exe, str(state_bin), str(args.steps), str(outdir / "ref")],
        check=True,
    )
    ref = np.genfromtxt(outdir / "ref.csv", delimiter=",", names=True)

    # ---- opal_tpu ------------------------------------------------------
    E, B, J, rho = sim.init_fields()
    counters = sim.zero_counters()
    key = jax.random.key(rp.get("seed", 0))
    t = rp["tstart"]
    chunk = args.chunk or args.record
    rows = []
    done = 0
    while True:
        rows.append((
            done,
            sim.em_field_energy(E, B),
            sim.total_kinetic_energy("electron", species["electron"]),
        ))
        if done >= args.steps:
            break
        nsteps = min(chunk, args.steps - done)
        key, sub = jax.random.split(key)
        out = sim.run(E, B, J, rho, species, float(t), sub, counters,
                      nsteps)
        E, B, J, rho, species, t, counters = out[:7]
        done += nsteps
    opal = np.array(rows)

    # ---- compare -------------------------------------------------------
    m = min(len(ref), len(opal))
    fe_ref = np.array([ref["field_J"]]).reshape(-1)[:m]
    fe_opal = opal[:m, 1]
    ke_ref = np.array([ref["kinetic_J"]]).reshape(-1)[:m]
    ke_opal = opal[:m, 2]
    tot_ref = fe_ref + ke_ref
    tot_opal = fe_opal + ke_opal
    # relative error normalized by the KINETIC scale for the field
    # energy's seed window (field energy starts at 0 from noise — a
    # pure ratio there is meaningless), and by the value itself once
    # the field energy is dynamically significant
    scale = np.maximum(np.abs(fe_ref), 1e-9 * np.abs(ke_ref[0]))
    fe_err = np.abs(fe_opal - fe_ref) / scale
    ke_err = np.abs(ke_opal - ke_ref) / np.abs(ke_ref)
    tot_err = np.abs(tot_opal - tot_ref) / np.abs(tot_ref)

    # chaos onset: first record where the field curve decouples beyond
    # 1e-4; everything before is the direct-comparison window
    bad = np.nonzero(fe_err > 1e-4)[0]
    clean_end = int(bad[0]) if bad.size else m

    # final spectra: px histograms over identical bins
    fin = np.fromfile(outdir / "ref_final.bin", np.float64)
    nx = geom.nx
    ux_ref = fin[6 * nx:6 * nx + n]
    alive = np.asarray(species["electron"].alive)
    ux_opal = np.asarray(species["electron"].ux, np.float64)[alive]
    lo = min(ux_ref.min(), ux_opal.min())
    hi = max(ux_ref.max(), ux_opal.max())
    bins = np.linspace(lo, hi, 65)
    h_ref, _ = np.histogram(ux_ref, bins=bins)
    h_opal, _ = np.histogram(ux_opal, bins=bins)
    l1 = float(np.abs(h_ref - h_opal).sum() / max(1, h_ref.sum()))

    result = {
        "metric": "ref-compare",
        "deck": str(args.deck),
        "n": int(n),
        "nx": int(geom.nx),
        "steps": int(args.steps),
        "records": int(m),
        "clean_records": clean_end,
        "max_field_rel_err_clean": float(np.max(fe_err[:clean_end]))
        if clean_end else None,
        "max_ke_rel_err_clean": float(np.max(ke_err[:clean_end]))
        if clean_end else None,
        "max_total_rel_err": float(np.max(tot_err)),
        "final_field_J": [float(fe_ref[-1]), float(fe_opal[-1])],
        "final_ke_J": [float(ke_ref[-1]), float(ke_opal[-1])],
        "spectrum_l1": l1,
        "devices": args.devices,
        "out": str(outdir),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
