"""Fused-kernel equivalence with current_deposition off.

``colliding_beams.yaml`` turns deposition off (beam-in-vacuum physics),
and the fused kernel serves it with the deposit section skipped
(``FusedSpec.dep_skip``) instead of falling back to the unfused ops.
These tests pin that path: in a static uniform B field (deposition
off, J identically zero, so the Yee advance preserves the field) the
fused/packed pipelines must gyrate the particles exactly like the
unfused ops, and nothing may deposit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.physics

from opal_tpu import constants as const
from opal_tpu.grid import GridGeometry
from opal_tpu.sim import SimOptions, Simulation, counter_total
from opal_tpu.species import SpeciesSpec, initialize

C = const.SPEED_OF_LIGHT


def _run(fused, packed, ndev=2, nsteps=60):
    dx = 1.0e-6
    dt = 0.95 * dx / C
    nx, npc = 32 * ndev, 64
    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=ndev)
    opts = SimOptions(
        dt=dt, current_deposition=False, migration_capacity=512,
        fused_pusher=fused, packed_fused=packed, fused_block=256,
        fused_window=32, fused_misfit_capacity=512, fused_resort_every=3,
    )
    spec = SpeciesSpec.electron()
    sim = Simulation(geom, opts, {"electron": spec}, dtype=jnp.float32)
    state = initialize(
        spec, geom, npc,
        density=lambda x: np.full_like(x, 1.0e6),
        ux=lambda x, u, n: np.full_like(x, 2.0) * np.sign(u - 0.5),
        uy=lambda x, u, n: 0.1 * n,
        uz=lambda x, u, n: np.zeros_like(x),
        dt=dt, capacity_per_device=2 * nx * npc // ndev, seed=7,
        dtype=np.float32,
    )
    state = sim.shard_particles(state)
    E, B, J, rho = sim.init_fields()
    # uniform B_z: curl-free, so the field advance preserves it and the
    # particles gyrate — the staggered gather and u update are exercised
    b0 = 2.0 * const.ELECTRON_MASS / (const.ELEMENTARY_CHARGE * 50 * dt)
    B = B.at[:, 2].set(b0)
    n0 = int(jnp.sum(state.alive))
    E, B, J, rho, species, t, counters = sim.run(
        E, B, J, rho, {"electron": state}, 0.0, jax.random.key(0),
        sim.zero_counters(), nsteps,
    )
    st = species["electron"]
    assert int(jnp.sum(st.alive)) == n0
    assert counter_total(counters["electron"]) == 0
    # nothing deposits with current_deposition off
    assert float(jnp.max(jnp.abs(J))) == 0.0
    assert float(jnp.max(jnp.abs(rho))) == 0.0
    w = np.asarray(jnp.where(st.alive, st.weight, 0.0))
    mom = lambda a: float(np.sum(w * np.asarray(a)))
    return {
        "ke": float(sim.total_kinetic_energy("electron", st)),
        "sux": mom(st.ux), "suy": mom(st.uy),
        "sx": mom(st.x + st.cell.astype(st.x.dtype)),
    }


@pytest.mark.parametrize("packed", [False, True])
def test_fused_dep_off_matches_unfused(packed):
    ref = _run(fused=False, packed=False)
    got = _run(fused=True, packed=packed)
    assert got["ke"] == pytest.approx(ref["ke"], rel=1e-5)
    scale = max(abs(ref["sux"]), abs(ref["suy"]), 1e-30)
    assert got["sux"] == pytest.approx(ref["sux"], abs=2e-4 * scale)
    assert got["suy"] == pytest.approx(ref["suy"], abs=2e-4 * scale)
    assert got["sx"] == pytest.approx(ref["sx"], rel=1e-5)
