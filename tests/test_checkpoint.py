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


def _global_cells(sim, st, replicated=False):
    """Map weight-tag -> global extended cell for alive rows."""
    alive = np.asarray(st.alive)
    cell = np.asarray(st.cell)
    w = np.asarray(st.weight)
    n = alive.shape[0]
    ndev = sim.mesh.shape["x"]
    cap = n // ndev
    dev = np.arange(n) // cap
    g = cell if replicated else dev * sim.geom.n_loc + cell
    return {int(w[i]): int(g[i]) for i in np.flatnonzero(alive)}


def _tagged(sim, species):
    """Give every alive electron a unique integer weight tag."""
    st = species["electron"]
    n = st.alive.shape[0]
    tags = jnp.arange(1, n + 1, dtype=st.weight.dtype)
    return {
        **species,
        "electron": dataclasses.replace(
            st, weight=jnp.where(st.alive, tags, 0.0)
        ),
    }


def _build_replicated(nx=32, n_devices=4):
    from opal_tpu.fields import make_mesh
    from opal_tpu.species import shard_even

    geom = GridGeometry(nx=nx, dx=500.0, xmin=0.0, n_devices=1)
    dt = 0.95 * geom.dx / const.SPEED_OF_LIGHT
    opts = SimOptions(dt=dt, photon_emission=True, photon_absorption=False,
                      migration_capacity=256, replicate_fields=True)
    espec = SpeciesSpec.electron()
    pspec = SpeciesSpec.photon()
    sim = Simulation(geom, opts, {"electron": espec, "photon": pspec},
                     mesh=make_mesh(n_devices))
    drift = 2.5e-24 / (const.ELECTRON_MASS * const.SPEED_OF_LIGHT)
    e = initialize(
        espec, geom, 4,
        density=lambda x: np.full_like(x, 20.0),
        ux=lambda x, u, n: drift * np.sign(u - 0.5),
        uy=lambda x, u, n: np.zeros_like(x),
        uz=lambda x, u, n: np.zeros_like(x),
        dt=dt, capacity_per_device=nx * 4, seed=0,
    )
    n_alive = int(np.asarray(e.alive).sum())
    cap = max(128, -(-max(1, n_alive) // n_devices // 128) * 128)
    e = shard_even(e, n_devices, cap)
    p = initialize(
        pspec, geom, 0, lambda x: x * 0, None, None, None, dt, 8, seed=1
    )
    p = shard_even(p, n_devices, 128)
    species = {
        "electron": sim.shard_particles(e),
        "photon": sim.shard_particles(p),
    }
    return sim, species


def test_checkpoint_reshard_device_count(tmp_path):
    """4-device domain snapshot resumed on 8 devices: every alive
    particle keeps its global cell."""
    sim4, species = _build(nx=64, n_devices=4)
    species = _tagged(sim4, species)
    E, B, J, rho = sim4.init_fields()
    checkpoint.save(
        tmp_path, 1, 0.0, E, B, J, rho, species, jax.random.key(3),
        sim4.zero_counters(), n_devices=4, n_loc=sim4.geom.n_loc,
    )
    before = _global_cells(sim4, species["electron"])

    geom8 = GridGeometry(nx=64, dx=500.0, xmin=0.0, n_devices=8)
    sim8 = Simulation(
        geom8, sim4.options,
        {"electron": SpeciesSpec.electron(), "photon": SpeciesSpec.photon()},
    )
    _, _, _, _, _, _, sp2, _, _ = checkpoint.load(tmp_path, sim8)
    after = _global_cells(sim8, sp2["electron"])
    assert before == after


def test_checkpoint_mode_flip_domain_to_replicated(tmp_path):
    """Domain snapshot resumed in replicated mode (and back): global
    cells must be preserved — the cell column switches meaning."""
    simd, species = _build(nx=32, n_devices=4)
    species = _tagged(simd, species)
    E, B, J, rho = simd.init_fields()
    checkpoint.save(
        tmp_path, 1, 0.0, E, B, J, rho, species, jax.random.key(3),
        simd.zero_counters(), n_devices=4, n_loc=simd.geom.n_loc,
        replicated=False,
    )
    before = _global_cells(simd, species["electron"])

    simr, _ = _build_replicated(nx=32, n_devices=4)
    _, _, _, _, _, _, spr, _, _ = checkpoint.load(tmp_path, simr)
    after = _global_cells(simr, spr["electron"], replicated=True)
    assert before == after

    # and back: replicated snapshot -> domain resume
    Er, Br, Jr, rhor = simr.init_fields()
    checkpoint.save(
        tmp_path, 2, 0.0, Er, Br, Jr, rhor, spr, jax.random.key(4),
        simr.zero_counters(), n_devices=4, n_loc=simr.geom.n_loc,
        replicated=True,
    )
    _, _, _, _, _, _, spd, _, _ = checkpoint.load(tmp_path, simd)
    back = _global_cells(simd, spd["electron"])
    assert back == before
