"""Phase ladder for the fused bench step.

Times the REAL Simulation step at bench shapes under a sequence of
shims that remove one subsystem at a time, attributing the per-step
milliseconds to: conds+sort+migration+misfit, the field pipeline
(halo exchange, boundaries, Yee advance, current fold), and the
state glue around the kernel.  Compare the last rung with
tools/kernel_bench.py (the kernel alone) to get the glue cost.

Ladder (cumulative):
  full       the untouched step (= bench.py default)
  nocond     every lax.cond in sim.py resolves to its false branch at
             trace time: no sort, no migration exchange, no misfit
             fallback, and no cond buffer round-trips
  nofield    + halo exchange / boundary load / Yee advance / current
             fold replaced by shape-preserving no-ops

Each rung compiles its own program (~2-3 min on the tunnel).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(args, **opt_overrides):
    import jax
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
    # mirror bench.py's non-QED defaults (r3 adopted: blk8192 x sub16,
    # misfit 256, dispersion-aware auto window) so the ladder
    # attributes the SAME program the bench measures
    resort = 256
    block = 8192
    drift_u = 2.5e-24 / (const.ELECTRON_MASS * const.SPEED_OF_LIGHT)
    gap = -(-block // max(1, npc))
    disp = int(np.ceil(0.95 * 2.0 * drift_u * resort))
    window = -(-(gap + 6 + disp) // 8) * 8
    opts = SimOptions(
        dt=dt,
        migration_capacity=(
            -(-int(npc * 3 * 0.0095 * 1.5 + 384) // 8) * 8
        ),
        fused_pusher=True,
        fused_window=window,
        fused_block=block, fused_resort_every=resort,
        migration_every=3,
        fused_misfit_capacity=max(256, int(args.particles) // 32768),
        fused_subblocks=max(1, 131072 // block),
        fused_lite=-1,
        migration_window=max(
            4096, -(-int(npc * (0.0095 * resort + 3)) // 8) * 8
        ),
        **opt_overrides,
    )
    espec = SpeciesSpec.electron()
    sim = Simulation(geom, opts, {"electron": espec}, dtype=jnp.float32)
    drift = 2.5e-24 / (const.ELECTRON_MASS * const.SPEED_OF_LIGHT)
    cap = -(-int(n_particles // ndev * 1.25) // 8192) * 8192
    state = initialize_device(
        espec, geom, sim.mesh, npc,
        density=lambda x: jnp.full_like(jnp.asarray(x), 20.0),
        ux=lambda x, u, n: drift * (1.0 + 0.001 * n) * jnp.sign(u - 0.5),
        uy=lambda x, u, n: jnp.zeros_like(x),
        uz=lambda x, u, n: jnp.zeros_like(x),
        dt=dt, capacity_per_device=cap, seed=0, dtype=jnp.float32,
    )
    E, B, J, rho = sim.init_fields()
    return sim, (E, B, J, rho, {"electron": state})


def timeit(sim, stuff, steps):
    import jax
    import jax.numpy as jnp

    E, B, J, rho, species = stuff
    counters = sim.zero_counters()
    key = jax.random.key(0)
    t0 = time.monotonic()
    out = sim.run(E, B, J, rho, species, 0.0, key, counters, steps)
    jax.block_until_ready(out)
    compile_s = time.monotonic() - t0
    out = sim.run(E, B, J, rho, dict(out[4]), float(out[5]), key, out[6], steps)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    out = sim.run(E, B, J, rho, dict(out[4]), float(out[5]), key, out[6], steps)
    jax.block_until_ready(out)
    elapsed = time.monotonic() - t0
    return compile_s, 1e3 * elapsed / steps


class FalseCond:
    """lax shim: cond always traces its false branch inline."""

    def __init__(self, real):
        self._real = real

    def __getattr__(self, k):
        return getattr(self._real, k)

    def cond(self, pred, true_fn, false_fn, *ops):
        return false_fn(*ops)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=float, default=8.0 * 2**20)
    p.add_argument("--nx", type=int, default=1024)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--rungs", default="full,nomisfit,nomig,nosort,nofield")
    p.add_argument("--misfit-capacity", type=int, default=None)
    args = p.parse_args(argv)

    import jax.numpy as jnp
    from jax import lax as real_lax

    import opal_tpu.sim as S
    from opal_tpu.grid import HALO
    from opal_tpu.ops import maxwell
    from opal_tpu.parallel import halo

    results = {}
    for rung in args.rungs.split(","):
        saved = {}

        def patch(mod, name, val):
            saved[(mod, name)] = getattr(mod, name)
            setattr(mod, name, val)

        order = ["full", "nomisfit", "nomig", "nosort", "nofield"]
        lvl = order.index(rung)
        overrides = {}
        if args.misfit_capacity is not None:
            overrides["fused_misfit_capacity"] = args.misfit_capacity
        if lvl >= 1:  # drop the (unconditional) misfit fallback pass
            overrides["debug_skip_misfit"] = True
        if lvl >= 2:  # drop the migration phase (M=3: nothing inline)
            patch(S.Simulation, "_migrate_phase",
                  lambda self, carry, ai: carry)
        if lvl >= 3:  # drop the sort phase
            patch(S.Simulation, "_sort_phase",
                  lambda self, carry, ai: carry)
        if lvl >= 4:
            patch(
                S, "halo",
                type("H", (), {
                    "exchange_fields": staticmethod(
                        lambda E, B, geom, ax, ai: (
                            jnp.pad(E, ((HALO, HALO), (0, 0))),
                            jnp.pad(B, ((HALO, HALO), (0, 0))),
                        )
                    ),
                    "fold_currents": staticmethod(
                        lambda J, rho, geom, ax, ai: (
                            J[HALO:-HALO], rho[HALO:-HALO]
                        )
                    ),
                    "psum": staticmethod(halo.psum),
                })(),
            )
            patch(S, "apply_boundaries",
                  lambda E, B, geom, ai, t, dt, ly, lz: (E, B))
            patch(
                S, "maxwell",
                type("M", (), {
                    "advance": staticmethod(
                        lambda E, B, J, dt, dx, mask: (E, B)
                    ),
                })(),
            )
        try:
            sim, stuff = build(args, **overrides)
            compile_s, ms = timeit(sim, stuff, args.steps)
            results[rung] = ms
            print(f"{rung:8s} compile={compile_s:6.1f}s  ms/step={ms:7.3f}",
                  file=sys.stderr, flush=True)
        finally:
            for (mod, name), val in saved.items():
                setattr(mod, name, val)

    pairs = [
        ("misfit fallback", "full", "nomisfit"),
        ("migration phase", "nomisfit", "nomig"),
        ("sort phase", "nomig", "nosort"),
        ("field pipeline", "nosort", "nofield"),
    ]
    for label, a, b in pairs:
        if a in results and b in results:
            print(f"{label}: {results[a] - results[b]:.3f} ms/step",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
