"""Lazy photon chi with the absorption pass off.

When ``photon_absorption`` is off, photon chi has no physics consumer
during stepping (it only feeds the absorption/stimulated-emission
cross sections, reference ``photon.rs:320-341``) and is an
instantaneous function of the local fields (``photon.rs:165-176``).
The step therefore skips the full-capacity photon field gather, and
``Simulation.refresh_photon_chi`` recomputes chi on demand at
output/checkpoint time.  These tests pin both halves: the step leaves
chi untouched, and the refresh reproduces the direct formula through
the halo-exchanged slab gather."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.unit

from opal_tpu import constants as const
from opal_tpu.grid import GridGeometry
from opal_tpu.ops.pusher import photon_chi
from opal_tpu.fields import make_mesh
from opal_tpu.sim import SimOptions, Simulation
from opal_tpu.species import SpeciesSpec, initialize, shard_even

C = const.SPEED_OF_LIGHT


def _setup(ndev=2, replicate=False):
    dx = 1.0e-6
    dt = 0.95 * dx / C
    nx = 32 * ndev
    geom = GridGeometry(
        nx=nx, dx=dx, xmin=0.0, n_devices=1 if replicate else ndev
    )
    opts = SimOptions(
        dt=dt, current_deposition=False, migration_capacity=256,
        fused_pusher=False, replicate_fields=replicate,
    )
    spec = SpeciesSpec.photon()
    sim = Simulation(
        geom, opts, {"photon": spec},
        mesh=make_mesh(ndev) if replicate else None,
        dtype=jnp.float32,
    )
    # photons moving mostly in y (v_x small): k = (1, 400, 0) m_e c
    state = initialize(
        spec, geom, 8,
        density=lambda x: np.full_like(x, 1.0e3),
        ux=lambda x, u, n: np.full_like(x, 1.0),
        uy=lambda x, u, n: np.full_like(x, 400.0),
        uz=lambda x, u, n: np.zeros_like(x),
        dt=dt, capacity_per_device=2 * nx * 8 // (1 if replicate else ndev),
        seed=3, dtype=np.float32,
    )
    if replicate:
        n_alive = int(np.asarray(state.alive).sum())
        cap = -(-n_alive // (ndev * 8)) * 8
        state = shard_even(state, ndev, cap)
    state = sim.shard_particles(state)
    E, B, J, rho = sim.init_fields()
    b0 = 1.0e7  # uniform B_z: static under the Yee advance (curl-free)
    B = B.at[:, 2].set(b0)
    return sim, geom, opts, state, E, B, J, rho, b0


def test_step_skips_chi_and_refresh_matches_formula():
    sim, geom, opts, state, E, B, J, rho, b0 = _setup()
    seeded = np.asarray(state.chi)
    assert float(np.max(np.abs(seeded))) == 0.0  # chi starts zeroed
    n0 = int(jnp.sum(state.alive))
    E, B, J, rho, species, t, _ = sim.run(
        E, B, J, rho, {"photon": state}, 0.0, jax.random.key(0),
        sim.zero_counters(), 40,
    )
    st = species["photon"]
    assert int(jnp.sum(st.alive)) == n0
    # the step must NOT have touched chi (no absorption consumer)
    np.testing.assert_array_equal(np.asarray(st.chi), seeded)

    st2 = sim.refresh_photon_chi(E, B, st)
    alive = np.asarray(st.alive)
    k = np.stack(
        [np.asarray(st.ux), np.asarray(st.uy), np.asarray(st.uz)], axis=-1
    )
    Bvec = jnp.zeros((k.shape[0], 3), jnp.float32).at[:, 2].set(b0)
    expect = np.asarray(
        photon_chi(jnp.asarray(k, jnp.float32), jnp.zeros_like(Bvec), Bvec)
    )
    got = np.asarray(st2.chi)
    np.testing.assert_allclose(got[alive], expect[alive], rtol=2e-5)
    # everything else is untouched by the refresh
    np.testing.assert_array_equal(np.asarray(st2.x), np.asarray(st.x))
    np.testing.assert_array_equal(np.asarray(st2.alive), np.asarray(st.alive))


def test_refresh_replicated_mode():
    sim, geom, opts, state, E, B, J, rho, b0 = _setup(replicate=True)
    st2 = sim.refresh_photon_chi(E, B, state)
    alive = np.asarray(state.alive)
    k = np.stack(
        [np.asarray(state.ux), np.asarray(state.uy), np.asarray(state.uz)],
        axis=-1,
    )
    Bvec = jnp.zeros((k.shape[0], 3), jnp.float32).at[:, 2].set(b0)
    expect = np.asarray(
        photon_chi(jnp.asarray(k, jnp.float32), jnp.zeros_like(Bvec), Bvec)
    )
    np.testing.assert_allclose(
        np.asarray(st2.chi)[alive], expect[alive], rtol=2e-5
    )


@pytest.mark.physics
def test_absorption_on_still_updates_chi_per_step():
    # with the absorption pass ON the step keeps the per-step update
    # (the cross sections consume chi every step)
    dx = 1.0e-6
    dt = 0.95 * dx / C
    nx = 64
    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=2)
    opts = SimOptions(
        dt=dt, current_deposition=False, migration_capacity=256,
        fused_pusher=False, photon_absorption=True,
        absorption_candidates=4, absorption_active_capacity=0,
    )
    especs = {"electron": SpeciesSpec.electron(), "photon": SpeciesSpec.photon()}
    sim = Simulation(geom, opts, especs, dtype=jnp.float32)
    el = initialize(
        especs["electron"], geom, 2,
        density=lambda x: np.full_like(x, 1.0),  # negligible partners
        ux=lambda x, u, n: np.zeros_like(x),
        uy=lambda x, u, n: np.zeros_like(x),
        uz=lambda x, u, n: np.zeros_like(x),
        dt=dt, capacity_per_device=256, seed=1, dtype=np.float32,
    )
    ph = initialize(
        especs["photon"], geom, 4,
        density=lambda x: np.full_like(x, 1.0e3),
        ux=lambda x, u, n: np.full_like(x, 1.0),
        uy=lambda x, u, n: np.full_like(x, 400.0),
        uz=lambda x, u, n: np.zeros_like(x),
        dt=dt, capacity_per_device=1024, seed=2, dtype=np.float32,
    )
    species = {
        "electron": sim.shard_particles(el),
        "photon": sim.shard_particles(ph),
    }
    E, B, J, rho = sim.init_fields()
    b0 = 1.0e7
    B = B.at[:, 2].set(b0)
    E, B, J, rho, out, t, _ = sim.run(
        E, B, J, rho, species, 0.0, jax.random.key(0),
        sim.zero_counters(), 10,
    )
    st = out["photon"]
    alive = np.asarray(st.alive)
    assert alive.any()
    assert float(np.min(np.asarray(st.chi)[alive])) > 0.0
