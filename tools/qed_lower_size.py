"""Local (chipless) probe of the QED bench program's lowered size.

Builds the same Simulation + run program as ``bench.py --qed
--particles N --steps-per-program S`` and lowers it to StableHLO on the
CPU backend with Pallas kernels in interpret mode, printing trace+lower
wall time, module text size, and top op counts.  The Mosaic kernel body
differs under interpret mode, but the QED machinery (sampler,
interaction walk, compaction, migration) lowers identically — so
comparing these numbers across commits attributes remote-compile
blowups to the JAX-level program, without needing libtpu or the chip.

Usage: python tools/qed_lower_size.py [--particles 2097152] [--spp 25]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=int, default=2097152)
    p.add_argument("--spp", type=int, default=25)
    p.add_argument("--no-deposition", action="store_true")
    p.add_argument("--no-absorption", action="store_true")
    p.add_argument("--chi", type=float, default=0.02)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from opal_tpu import constants as const
    from opal_tpu.grid import GridGeometry
    from opal_tpu.sim import SimOptions, Simulation
    from opal_tpu.species import SpeciesSpec, initialize_device

    n = int(args.particles)
    nx = max(1024, n // 128)
    npc = max(1, n // nx)
    dx = 500.0
    dt = 0.95 * dx / const.SPEED_OF_LIGHT
    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=1)
    cap = -(-int(n * 1.25) // 2048) * 2048
    block, resort, mig_every = 2048, 64, 3
    opts = SimOptions(
        dt=dt, current_deposition=not args.no_deposition,
        photon_emission=True,
        photon_absorption=not args.no_absorption,
        migration_capacity=-(-int(npc * mig_every * 1.5 + 128) // 8) * 8,
        absorption_candidates=64,
        absorption_active_capacity=max(4096, cap // 4),
        emission_active_capacity=max(4096, cap // 8),
        fused_window=-(-(block // max(1, npc) + 16) // 8) * 8,
        fused_block=block,
        fused_resort_every=resort,
        migration_every=mig_every,
        migration_window=max(
            4096, -(-int(npc * (0.95 * resort + 3)) // 8) * 8
        ),
    )
    espec = SpeciesSpec.electron()
    specs = {"electron": espec, "photon": SpeciesSpec.photon()}
    sim = Simulation(geom, opts, specs, dtype=jnp.float32)
    sim._interpret = True

    state = initialize_device(
        espec, geom, sim.mesh, npc,
        density=lambda x: jnp.full_like(jnp.asarray(x), 20.0),
        ux=lambda x, u, nr: -1000.0 * (1.0 + 0.01 * nr),
        uy=lambda x, u, nr: jnp.zeros_like(x),
        uz=lambda x, u, nr: jnp.zeros_like(x),
        dt=dt, capacity_per_device=cap, seed=0, dtype=jnp.float32,
    )
    zero_fn = lambda x, u, nr: jnp.zeros_like(jnp.asarray(x))
    species = {
        "electron": state,
        "photon": initialize_device(
            SpeciesSpec.photon(), geom, sim.mesh, 0,
            density=lambda x: jnp.zeros_like(jnp.asarray(x)),
            ux=zero_fn, uy=zero_fn, uz=zero_fn,
            dt=dt, capacity_per_device=cap, seed=1, dtype=jnp.float32,
        ),
    }
    E, B, J, rho = sim.init_fields()
    b0 = args.chi * const.CRITICAL_FIELD / (1000.0 * const.SPEED_OF_LIGHT)
    B = jax.device_put(jnp.zeros_like(B).at[:, 2].set(b0), B.sharding)
    counters = sim.zero_counters()
    key = jax.random.key(0)

    def stepfn(E, B, J, rho, species, t0, key, counters):
        return sim.run(E, B, J, rho, species, t0, key, counters, args.spp)

    t0 = time.monotonic()
    lowered = jax.jit(stepfn).trace(
        E, B, J, rho, species, 0.0, key, counters
    ).lower()
    trace_s = time.monotonic() - t0
    txt = lowered.as_text()
    ops = re.findall(r"= \"?([\w.]+)\"?\(", txt)
    from collections import Counter

    top = Counter(ops).most_common(12)
    print(f"trace+lower {trace_s:.1f}s, module {len(txt) / 1e6:.2f} MB, "
          f"{len(ops)} ops")
    for name, cnt in top:
        print(f"  {cnt:7d}  {name}")


if __name__ == "__main__":
    main()
