"""Replicated-field absorption (r4, VERDICT r3 weak #5): pairing over
an all-gathered per-cell candidate table with owner-routed kicks, so
nonuniform absorption decks get the balanced equal-count sharding too
(the reference's balanced split has no absorption carve-out,
grid/mod.rs:157-206).

The forced-event test places the photon and its ONLY same-cell
electron on DIFFERENT devices: the event must fire (global pairing)
and the kick must land on the remote electron (record routing)."""

import dataclasses

import jax
import numpy as np
import pytest

from opal_tpu import constants as const
from opal_tpu.grid import GridGeometry
from opal_tpu.sim import SimOptions, Simulation, counter_total
from opal_tpu.species import ParticleState, SpeciesSpec, _empty_fields

C = const.SPEED_OF_LIGHT


def _state(spec, n, dtype=np.float64, **overrides):
    import jax.numpy as jnp

    f = _empty_fields(spec, n, dtype)
    u = overrides.pop("u", None)
    if u is not None:
        u = np.asarray(u, dtype)
        f["ux"], f["uy"], f["uz"] = u[:, 0], u[:, 1], u[:, 2]
    for k, v in overrides.items():
        f[k] = v
    return ParticleState(**{
        k: (None if v is None else jnp.asarray(v)) for k, v in f.items()
    })


def _sim(nx=32, ndev=8, **opts):
    import jax.numpy as jnp

    dx = 1.0e-6
    dt = 0.95 * dx / C
    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=1)
    options = SimOptions(
        dt=dt, current_deposition=False, photon_emission=False,
        photon_absorption=True, replicate_fields=True,
        migration_capacity=256, **opts,
    )
    from opal_tpu.fields import make_mesh

    sim = Simulation(
        geom, options,
        {"electron": SpeciesSpec.electron(), "photon": SpeciesSpec.photon()},
        dtype=jnp.float64, mesh=make_mesh(ndev),
    )
    return sim, geom, dt


@pytest.mark.parametrize("stim", [False, True])
def test_cross_device_pairing_and_kick(stim):
    """Photon on device 0, its only cell-mate electron on device 7."""
    sim, geom, dt = _sim(stimulated_emission=stim)
    n = 64  # 8 rows per device
    # electron at row 60 (device 7), cell 5; photon at row 1 (device 0)
    cells_e = np.zeros(n, np.int32)
    alive_e = np.zeros(n, bool)
    w_e = np.zeros(n)
    cells_e[60] = 5
    alive_e[60] = True
    w_e[60] = 2.0e10
    e = _state(
        SpeciesSpec.electron(), n, cell=cells_e, weight=w_e,
        gamma=np.ones(n), chi=np.full(n, 1.0), alive=alive_e,
    )
    cells_p = np.zeros(n, np.int32)
    alive_p = np.zeros(n, bool)
    w_p = np.zeros(n)
    cells_p[1] = 5
    alive_p[1] = True
    w_p[1] = 1.0e10
    u_p = np.zeros((n, 3)); u_p[1] = [0.1, 0.0, 0.0]
    x_p = np.zeros(n); x_p[1] = 0.02
    ph = _state(
        SpeciesSpec.photon(), n, cell=cells_p, x=x_p, weight=w_p,
        u=u_p, gamma=np.full(n, 0.1), chi=np.full(n, 2.0),
        # forced first-candidate event of the chosen kind
        tau_abs=np.full(n, 1e30 if stim else -0.5),
        tau_st=np.full(n, -0.5 if stim else 1e30),
        alive=alive_p,
    )
    species = {
        "electron": sim.shard_particles(e),
        "photon": sim.shard_particles(ph),
    }
    E, B, J, rho = sim.init_fields()
    # a uniform B_z keeps the recomputed photon chi above the
    # chi*m/E >= 1e-8 activity cutoff (zero fields would zero chi and
    # skip every photon); electrons at u=0 feel no force from it
    B = B.at[:, 2].set(1.0e5)
    counters = sim.zero_counters()
    out = sim.run(
        E, B, J, rho, species, 0.0, jax.random.key(0), counters, 1
    )
    sp, counters = out[4], out[6]
    e2 = sp["electron"]
    ph2 = sp["photon"]
    alive_ph = np.asarray(ph2.alive)
    du = np.stack(
        [np.asarray(e2.ux), np.asarray(e2.uy), np.asarray(e2.uz)], axis=1
    )
    assert counter_total(counters["photon"]) == 0
    if stim:
        # stimulated: seed photon survives + a copy with the electron's
        # weight appears; electron recoils by -k
        assert alive_ph.sum() == 2
        ws = np.sort(np.asarray(ph2.weight)[alive_ph])
        np.testing.assert_allclose(ws, [1.0e10, 2.0e10])
        np.testing.assert_allclose(du[60], [-0.1, 0, 0], rtol=1e-12)
    else:
        # absorbed: photon dies, remote electron kicked by (w_ph/w_e) k
        assert alive_ph.sum() == 0
        np.testing.assert_allclose(
            du[60], [0.5 * 0.1, 0, 0], rtol=1e-12
        )
    # no other electron moved
    others = np.delete(np.abs(du).sum(axis=1), 60)
    assert np.all(others == 0)


def test_replicated_momentum_conservation():
    """Random cross-device pairs: total momentum is conserved
    (sum w_e du_e == sum w_ph k over absorbed photons)."""
    sim, geom, dt = _sim(stimulated_emission=False)
    rng = np.random.default_rng(12)
    n = 256
    cells_e = rng.integers(0, 32, n).astype(np.int32)
    e = _state(
        SpeciesSpec.electron(), n, cell=cells_e,
        weight=np.full(n, 2.0e10), gamma=np.ones(n),
        chi=np.full(n, 1.0), alive=np.ones(n, bool),
    )
    cells_p = rng.integers(0, 32, n).astype(np.int32)
    k = np.zeros((n, 3)); k[:, 0] = 0.05
    ph = _state(
        SpeciesSpec.photon(), n, cell=cells_p, weight=np.full(n, 1.0e10),
        u=k, gamma=np.full(n, 0.05), chi=np.full(n, 2.0),
        tau_abs=np.where(rng.random(n) < 0.5, -0.5, 1e30),
        tau_st=np.full(n, 1e30),
        alive=np.ones(n, bool),
    )
    species = {
        "electron": sim.shard_particles(e),
        "photon": sim.shard_particles(ph),
    }
    E, B, J, rho = sim.init_fields()
    B = B.at[:, 2].set(1.0e5)  # see above: photon chi activity cutoff
    out = sim.run(
        E, B, J, rho, species, 0.0, jax.random.key(1),
        sim.zero_counters(), 1,
    )
    sp = out[4]
    e2, ph2 = sp["electron"], sp["photon"]
    absorbed = np.asarray(ph.alive) & ~np.asarray(ph2.alive)
    assert absorbed.sum() > 10  # forced events with cell-mates fired
    # photons without same-cell electrons must not die
    has_mate = np.isin(cells_p, cells_e)
    assert not np.any(absorbed & ~has_mate)
    dp_e = 2.0e10 * (
        np.stack([np.asarray(e2.ux), np.asarray(e2.uy),
                  np.asarray(e2.uz)], 1)
        - np.stack([np.asarray(e.ux), np.asarray(e.uy),
                    np.asarray(e.uz)], 1)
    ).sum(axis=0)
    dp_ph = 1.0e10 * k[absorbed].sum(axis=0)
    np.testing.assert_allclose(dp_e, dp_ph, rtol=1e-9)
