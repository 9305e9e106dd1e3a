"""Deferred migration (r4): for slow-drift decks the exchange cadence
is bounded by the 2-cell deposit/gather reach (ceil(drift * M) <= 2),
not by a step count — particles roam into the halo between exchanges
and the existing halo machinery (field exchange + current fold)
handles their gathers and deposits exactly.

The test runs the same two-stream deck with the exchange every 3 steps
(round-3 behavior) and deferred to the sort cadence, and requires the
fields to match: the physics is identical because an out-of-slab
particle's halo-row deposit folds onto the neighbour exactly where the
wrapped particle would have deposited.
"""

import math

import jax
import numpy as np
import pytest

from opal_tpu import constants as const
from opal_tpu.grid import GridGeometry
from opal_tpu.sim import SimOptions, Simulation, counter_total
from opal_tpu.species import SpeciesSpec, initialize

C = const.SPEED_OF_LIGHT


@pytest.mark.parametrize("ndev", [1, 8])
def test_deferred_exchange_matches_m3(ndev):
    import jax.numpy as jnp

    nx, npc = 256, 25
    dx = 1.0e-6
    dt = 0.95 * dx / C
    ne = 1.26e22
    u0 = 0.02  # drift ~0.02c -> 0.019 cells/step; 64 steps -> 1.2 cells

    def build(migrate_every, resort):
        opts = SimOptions(
            dt=dt, current_deposition=True, migration_capacity=4096,
            fused_pusher=True, fused_block=128, fused_window=16,
            fused_resort_every=resort, migration_every=migrate_every,
            max_drift_cells_per_step=0.02,
            migration_window=512,
        )
        espec = SpeciesSpec.electron()
        sim = Simulation(geom, opts, {"electron": espec},
                         dtype=jnp.float32)
        state = initialize(
            espec, geom, npc,
            density=lambda x: np.full_like(x, ne),
            ux=lambda x, u, n: u0 * (1.0 + 0.001 * n)
            * (2.0 * np.floor(u - 0.5) + 1.0),
            uy=lambda x, u, n: np.zeros_like(x),
            uz=lambda x, u, n: np.zeros_like(x),
            dt=dt, capacity_per_device=2 * nx * npc // ndev, seed=3,
            dtype=np.float32,
        )
        return sim, {"electron": sim.shard_particles(state)}

    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=ndev)

    results = {}
    for label, (m, r) in {
        "m3": (3, 64), "deferred": (64, 64),
    }.items():
        sim, species = build(m, r)
        # the deferred cadence must actually be adopted by the schedule
        M_eff, _ = sim._cadences(species)
        assert M_eff == m
        E, B, J, rho = sim.init_fields()
        counters = sim.zero_counters()
        out = sim.run(
            E, B, J, rho, species, 0.0, jax.random.key(0), counters, 128
        )
        E, B = out[0], out[1]
        counters = out[6]
        assert counter_total(counters["electron"]) == 0, label
        results[label] = (np.asarray(E, np.float64),
                          np.asarray(B, np.float64))

    E3, B3 = results["m3"]
    Ed, Bd = results["deferred"]
    # identical physics; summation-order differences only
    scale = np.abs(E3).max()
    np.testing.assert_allclose(Ed, E3, atol=2e-5 * scale, rtol=2e-4)
    assert np.isfinite(Ed).all() and scale > 0
