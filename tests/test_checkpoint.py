"""Checkpoint/resume: a resumed run must continue bit-identically
(an opal_tpu extension; the reference always restarts at t = start,
``main.rs:185``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opal_tpu import checkpoint, constants as const
from opal_tpu.grid import GridGeometry
from opal_tpu.sim import SimOptions, Simulation
from opal_tpu.species import SpeciesSpec, initialize


def _build(nx=32, n_devices=4):
    geom = GridGeometry(nx=nx, dx=500.0, xmin=0.0, n_devices=n_devices)
    dt = 0.95 * geom.dx / const.SPEED_OF_LIGHT
    opts = SimOptions(dt=dt, photon_emission=True, photon_absorption=False,
                      migration_capacity=256)
    espec = SpeciesSpec.electron()
    pspec = SpeciesSpec.photon()
    sim = Simulation(geom, opts, {"electron": espec, "photon": pspec})

    drift = 2.5e-24 / (const.ELECTRON_MASS * const.SPEED_OF_LIGHT)
    e = initialize(
        espec, geom, 4,
        density=lambda x: np.full_like(x, 20.0),
        ux=lambda x, u, n: drift * np.sign(u - 0.5),
        uy=lambda x, u, n: np.zeros_like(x),
        uz=lambda x, u, n: np.zeros_like(x),
        dt=dt, capacity_per_device=64, seed=0,
    )
    p = initialize(
        pspec, geom, 0, lambda x: x * 0, None, None, None, dt, 64, seed=1
    )
    species = {
        "electron": sim.shard_particles(e),
        "photon": sim.shard_particles(p),
    }
    return sim, species


def _tree_equal(a, b):
    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.physics
def test_checkpoint_roundtrip_continues_identically(tmp_path):
    sim, species = _build()
    E, B, J, rho = sim.init_fields()
    counters = sim.zero_counters()
    key = jax.random.key(7)

    # run 3 steps, snapshot, run 3 more
    out = sim.run(E, B, J, rho, species, 0.0, key, counters, 3)
    E1, B1, J1, rho1, sp1, t1, c1 = out
    checkpoint.save(tmp_path, 1, float(t1), E1, B1, J1, rho1, sp1, key, c1)
    ref = sim.run(E1, B1, J1, rho1, sp1, float(t1), key, c1, 3)

    # load and continue: must match exactly
    step, t, E2, B2, J2, rho2, sp2, key2, c2 = checkpoint.load(tmp_path, sim)
    assert step == 1
    np.testing.assert_allclose(t, float(t1))
    _tree_equal((E1, B1, J1, rho1), (E2, B2, J2, rho2))
    _tree_equal(sp1, sp2)
    got = sim.run(E2, B2, J2, rho2, sp2, t, key2, c2, 3)
    _tree_equal(ref, got)


def test_checkpoint_rejects_different_device_count(tmp_path):
    """Particle block layout is mesh-relative: resuming a 4-device
    snapshot on 8 devices must be refused."""
    sim4, species = _build(nx=64, n_devices=4)
    E, B, J, rho = sim4.init_fields()
    counters = sim4.zero_counters()
    key = jax.random.key(3)
    checkpoint.save(
        tmp_path, 1, 0.0, E, B, J, rho, species, key, counters, n_devices=4
    )

    geom8 = GridGeometry(nx=64, dx=500.0, xmin=0.0, n_devices=8)
    sim8 = Simulation(
        geom8, sim4.options,
        {"electron": SpeciesSpec.electron(), "photon": SpeciesSpec.photon()},
    )
    import pytest

    with pytest.raises(ValueError):
        checkpoint.load(tmp_path, sim8)


def test_checkpoint_rejects_mismatched_grid(tmp_path):
    sim, species = _build()
    E, B, J, rho = sim.init_fields()
    checkpoint.save(
        tmp_path, 0, 0.0, E, B, J, rho, species, jax.random.key(0),
        sim.zero_counters(),
    )
    geom2 = GridGeometry(nx=64, dx=500.0, xmin=0.0, n_devices=4)
    sim2 = Simulation(
        geom2, sim.options,
        {"electron": SpeciesSpec.electron(), "photon": SpeciesSpec.photon()},
    )
    import pytest

    with pytest.raises(ValueError):
        checkpoint.load(tmp_path, sim2)
