"""Compile the bench step and print optimized-HLO op statistics.

Builds the same Simulation as bench.py defaults (overridable via the
same flags), lowers + compiles sim.run, then walks the optimized HLO
text and aggregates bytes by op kind — fusions, copies, sorts,
collectives — to show where the per-step device time must go without
running (or profiling) anything on the chip.
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DT_BYTES = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "pred": 1, "s64": 8,
            "u8": 1, "bf16": 2, "s8": 1, "u64": 8, "f16": 2}

SHAPE_RE = re.compile(r"(f32|f64|s32|u32|s64|u64|u8|s8|pred|bf16|f16)\[([0-9,]*)\]")


def shape_bytes(text):
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DT_BYTES[dt]
    return total


def main(argv=None):
    import bench

    # reuse bench's setup path up to Simulation by invoking main in a
    # mode that only builds?  bench has no such mode -- rebuild here.
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=float, default=8.0 * 2**20)
    p.add_argument("--nx", type=int, default=1024)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--qed", action="store_true",
                   help="emission+absorption on with a photon "
                        "population (bench.py --qed workload)")
    p.add_argument("--absorption-active", type=int, default=0)
    p.add_argument("--emission-active", type=int, default=0)
    p.add_argument("--no-deposition", dest="deposition",
                   action="store_false", default=True,
                   help="colliding_beams-shaped step (fused dep_skip)")
    p.add_argument("--no-absorption", dest="absorption",
                   action="store_false", default=True,
                   help="with --qed: emission only (colliding_beams shape)")
    # step-shape knobs mirroring bench.py's r4 defaults (deferred
    # migration: M = R = 192, blk8192 x sub16 x W16, misfit 256)
    p.add_argument("--fused-block", type=int, default=8192)
    p.add_argument("--fused-subblocks", type=int, default=16)
    p.add_argument("--fused-window", type=int, default=16)
    p.add_argument("--fused-resort", type=int, default=192)
    p.add_argument("--migrate-every", type=int, default=192)
    p.add_argument("--misfit-capacity", type=int, default=256)
    args = p.parse_args(argv)

    import jax

    # Honour an explicit JAX_PLATFORMS=cpu even when the site's TPU
    # plugin hook pre-registered itself as the default platform (same
    # guard as bench.py -- without it this tool hangs/fails on a
    # wedged tunnel instead of compiling on CPU).
    env_platforms = os.environ.get("JAX_PLATFORMS", "")
    if env_platforms and "cpu" in env_platforms.split(","):
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass

    import jax.numpy as jnp

    from opal_tpu import constants as const
    from opal_tpu.grid import GridGeometry
    from opal_tpu.sim import SimOptions, Simulation
    from opal_tpu.species import SpeciesSpec, initialize_device

    ndev = len(jax.devices())
    nx = args.nx - args.nx % ndev
    npc = max(1, int(args.particles) // nx)
    n_particles = nx * npc
    dx = 500.0
    dt = 0.95 * dx / const.SPEED_OF_LIGHT
    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=ndev)
    if args.qed:
        dx = 1.0e-8
        dt = 0.95 * dx / const.SPEED_OF_LIGHT
        geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=ndev)
    opts = SimOptions(
        dt=dt, current_deposition=args.deposition,
        migration_capacity=512, fused_pusher=True,
        fused_window=args.fused_window, fused_block=args.fused_block,
        fused_subblocks=args.fused_subblocks,
        fused_misfit_capacity=args.misfit_capacity,
        fused_resort_every=args.fused_resort,
        migration_every=args.migrate_every,
        max_drift_cells_per_step=0.0095 if not args.qed else 0.95,
        migration_window=8192,
        photon_emission=args.qed,
        photon_absorption=args.qed and args.absorption,
        absorption_candidates=64,
        absorption_active_capacity=args.absorption_active,
        emission_active_capacity=args.emission_active,
    )
    espec = SpeciesSpec.electron()
    specs = {"electron": espec}
    if args.qed:
        specs["photon"] = SpeciesSpec.photon()
    sim = Simulation(geom, opts, specs, dtype=jnp.float32)

    drift = 2.5e-24 / (const.ELECTRON_MASS * const.SPEED_OF_LIGHT)
    cap = -(-int(n_particles // ndev * 1.25) // 2048) * 2048
    if args.qed:
        ux_fn = lambda x, u, n: -1000.0 * (1.0 + 0.01 * n)
    else:
        ux_fn = lambda x, u, n: drift * (1.0 + 0.001 * n) * jnp.sign(u - 0.5)
    state = initialize_device(
        espec, geom, sim.mesh, npc,
        density=lambda x: jnp.full_like(jnp.asarray(x), 20.0),
        ux=ux_fn,
        uy=lambda x, u, n: jnp.zeros_like(x),
        uz=lambda x, u, n: jnp.zeros_like(x),
        dt=dt, capacity_per_device=cap, seed=0, dtype=jnp.float32,
    )
    species = {"electron": state}
    if args.qed:
        zero_fn = lambda x, u, n: jnp.zeros_like(x)
        species["photon"] = initialize_device(
            SpeciesSpec.photon(), geom, sim.mesh, 0,
            density=lambda x: jnp.zeros_like(jnp.asarray(x)),
            ux=zero_fn, uy=zero_fn, uz=zero_fn,
            dt=dt, capacity_per_device=cap, seed=1, dtype=jnp.float32,
        )
    E, B, J, rho = sim.init_fields()
    counters = sim.zero_counters()
    key = jax.random.key(0)

    lowered = sim._run.lower(
        E, B, J, rho, species, jnp.float32(0.0), key, counters,
        nsteps=args.steps,
    )
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"optimized HLO: {len(txt) / 1e6:.1f} MB text", file=sys.stderr)

    # per-op aggregate: opcode -> (count, output bytes)
    agg = collections.Counter()
    agg_b = collections.Counter()
    biggest = []
    comp = "?"
    for line in txt.splitlines():
        mc = re.match(r"(?:ENTRY )?%?([\w.\-]+) (?:\([^)]*\))? ?->", line)
        if mc and line.rstrip().endswith("{"):
            comp = mc.group(1)
        m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = (\S+?)\[", line)
        if not m:
            m2 = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = (\w+)\(", line)
            if not m2:
                continue
            op = m2.group(1)
            out_b = 0
        else:
            op = None
        # parse "name = TYPE[shape]{layout} opcode(...)"
        m3 = re.match(
            r"\s*(?:ROOT )?%?[\w.\-]+ = ((?:\([^)]*\))|(?:\S+))\s+"
            r"([\w\-]+)\(", line
        )
        if not m3:
            continue
        shapes, op = m3.groups()
        out_b = shape_bytes(shapes)
        agg[op] += 1
        agg_b[op] += out_b
        if out_b > 4 << 20:
            biggest.append((out_b, op, f"[{comp}] " + line.strip()[:150]))

    print("\n== op totals (count, output GB) ==")
    for op, b in agg_b.most_common(args.top):
        print(f"{op:24s} n={agg[op]:5d}  out={b / 1e9: 8.3f} GB")

    # second pass: group output bytes by call-site (metadata op_name
    # trimmed to the segment after while/body, plus source line)
    loc = collections.Counter()
    for line in txt.splitlines():
        m3 = re.match(
            r"\s*(?:ROOT )?%?[\w.\-]+ = ((?:\([^)]*\))|(?:\S+))\s+"
            r"([\w\-]+)\(", line
        )
        if not m3:
            continue
        shapes, op = m3.groups()
        out_b = shape_bytes(shapes)
        if out_b < 1 << 20:
            continue
        mm = re.search(r'op_name="([^"]*)"', line)
        name = mm.group(1) if mm else "<none>"
        name = re.sub(r"^jit\(run\)/", "", name)
        name = re.sub(r"while/body/closed_call/", "", name)
        parts = name.split("/")
        key_ = "/".join(parts[:3])
        ms = re.search(r'source_file="([^"]*)".*source_line=(\d+)', line)
        src = (
            f'{ms.group(1).split("/")[-1]}:{ms.group(2)}' if ms else "?"
        )
        loc[(key_, src)] += out_b

    print("\n== bytes by call-site (>= 1 MB ops) ==")
    for (k, src), b in loc.most_common(60):
        print(f"{b / 1e6:9.1f} MB  {src:28s} {k}")

    biggest.sort(reverse=True)
    print("\n== biggest single outputs ==")
    seen = set()
    shown = 0
    for b, op, line in biggest:
        key_ = (op, b)
        if key_ in seen:
            continue
        seen.add(key_)
        print(f"{b / 1e6:8.1f} MB  {line}")
        shown += 1
        if shown >= args.top:
            break

    print("\n== copies/transposes >= 64 MB (all, with computation) ==")
    for b, op, line in biggest:
        if op in ("copy", "transpose") and b >= 64 << 20:
            print(f"{b / 1e6:8.1f} MB  {line}")


if __name__ == "__main__":
    main()
