"""End-to-end PIC step tests: streaming, migration, and energy
book-keeping, across device counts."""

import dataclasses
import math

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


def _drifting_setup(ndev, nx=64, npc=4, ux=2.0, deposition=False, **kw):
    dx = 1.0e-6
    dt = 0.95 * dx / C
    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=ndev)
    opts = SimOptions(
        dt=dt, current_deposition=deposition, migration_capacity=512, **kw
    )
    spec = SpeciesSpec.electron()
    sim = Simulation(geom, opts, {"electron": spec})
    state = initialize(
        spec, geom, npc,
        density=lambda x: np.full_like(x, 1.0e6),
        ux=lambda x, u, n: np.full_like(x, ux),
        uy=lambda x, u, n: np.zeros_like(x),
        uz=lambda x, u, n: np.zeros_like(x),
        dt=dt, capacity_per_device=max(256, 2 * nx * npc // ndev), seed=7,
    )
    return sim, geom, opts, sim.shard_particles(state)


@pytest.mark.parametrize("sorted_pipeline", [False, True])
@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_streaming_conserves_particles_and_energy(ndev, sorted_pipeline):
    """Force-free drift in a periodic box: particle count and kinetic
    energy are exactly conserved while particles migrate across every
    device boundary — with either migration pipeline (classic or
    cell-sorted)."""
    sim, geom, opts, state = _drifting_setup(
        ndev, sorted_pipeline=sorted_pipeline
    )
    E, B, J, rho = sim.init_fields()
    counters = sim.zero_counters()
    key = jax.random.key(0)

    n0 = int(jnp.sum(state.alive))
    ke0 = sim.total_kinetic_energy("electron", state)
    assert n0 == geom.nx * 4

    nsteps = 200  # drift speed ~0.85 c -> crosses several subdomains
    E, B, J, rho, species, t, counters = sim.run(
        E, B, J, rho, {"electron": state}, 0.0, key, counters, nsteps
    )
    st = species["electron"]
    assert int(jnp.sum(st.alive)) == n0
    assert counter_total(counters["electron"]) == 0
    ke1 = sim.total_kinetic_energy("electron", st)
    assert ke1 == pytest.approx(ke0, rel=1e-12)
    # all particles still inside the local domain
    cells = np.asarray(st.cell)[np.asarray(st.alive)]
    assert cells.min() >= 0 and cells.max() < geom.n_loc


@pytest.mark.parametrize("ndev", [1, 4])
def test_pipelines_equivalent_with_deposition(ndev):
    """Classic and cell-sorted pipelines run the same physics: with
    deposition on (self-consistent fields, presorted deposition path),
    fields and per-species energies agree to float-reassociation
    level after many steps and migrations."""
    results = {}
    for sp in (False, True):
        sim, geom, opts, state = _drifting_setup(
            ndev, deposition=True, sorted_pipeline=sp
        )
        E, B, J, rho = sim.init_fields()
        counters = sim.zero_counters()
        key = jax.random.key(0)
        E, B, J, rho, species, t, counters = sim.run(
            E, B, J, rho, {"electron": state}, 0.0, key, counters, 120
        )
        st = species["electron"]
        assert counter_total(counters["electron"]) == 0
        results[sp] = (
            np.asarray(E), np.asarray(B), np.asarray(J), np.asarray(rho),
            float(sim.total_kinetic_energy("electron", st)),
            int(jnp.sum(st.alive)),
        )
    a, b = results[False], results[True]
    assert a[5] == b[5]  # particle count
    for x, y in zip(a[:4], b[:4]):
        np.testing.assert_allclose(x, y, rtol=1e-9, atol=1e-30)
    assert a[4] == pytest.approx(b[4], rel=1e-9)


@pytest.mark.parametrize("ndev", [1, 4])
def test_migration_cadence_equivalent(ndev):
    """Delaying the migration exchange (particles roam <= 2 cells into
    the 4-cell halo; ghost fields/currents stay valid every step) must
    not change the physics: M=3 matches M=1 to f64 reassociation level
    and conserves particles exactly."""
    results = {}
    for m in (1, 3):
        sim, geom, opts, state = _drifting_setup(
            ndev, deposition=True, migration_every=m
        )
        E, B, J, rho = sim.init_fields()
        counters = sim.zero_counters()
        key = jax.random.key(0)
        n0 = int(jnp.sum(state.alive))
        E, B, J, rho, species, t, counters = sim.run(
            E, B, J, rho, {"electron": state}, 0.0, key, counters, 91
        )
        st = species["electron"]
        assert int(jnp.sum(st.alive)) == n0
        assert counter_total(counters["electron"]) == 0
        results[m] = (
            np.asarray(E), np.asarray(B), np.asarray(J),
            float(sim.total_kinetic_energy("electron", st)),
        )
    for x, y in zip(results[1][:3], results[3][:3]):
        np.testing.assert_allclose(y, x, rtol=1e-9, atol=1e-30)
    assert results[3][3] == pytest.approx(results[1][3], rel=1e-12)


@pytest.mark.parametrize("ndev,resort", [(1, 1), (2, 1), (2, 3)])
def test_fused_pusher_equivalent(ndev, resort):
    """The fused Pallas gather+push+deposit kernel (interpret mode on
    CPU) runs the same physics as the unfused sorted pipeline in f32:
    fields and energies agree to f32 reassociation level, and no
    particles are lost.  Covered at per-step resort cadence and at
    R=3 (carried anchors + misfit fallback for arrivals)."""
    dx = 1.0e-6
    dt = 0.95 * dx / C
    nx, npc = 32 * ndev, 64
    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=ndev)
    results = {}
    for fp in (False, True):
        opts = SimOptions(
            dt=dt, current_deposition=True, migration_capacity=512,
            sorted_pipeline=True, fused_pusher=fp, fused_block=256,
            fused_window=32, fused_misfit_capacity=512,
            fused_resort_every=resort,
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
        counters = sim.zero_counters()
        key = jax.random.key(0)
        n0 = int(jnp.sum(state.alive))
        E, B, J, rho, species, t, counters = sim.run(
            E, B, J, rho, {"electron": state}, 0.0, key, counters, 60
        )
        st = species["electron"]
        assert int(jnp.sum(st.alive)) == n0
        assert counter_total(counters["electron"]) == 0
        results[fp] = (
            np.asarray(E), np.asarray(B), np.asarray(J),
            float(sim.total_kinetic_energy("electron", st)),
        )
    a, b = results[False], results[True]
    for x, y in zip(a[:3], b[:3]):
        scale = max(np.max(np.abs(x)), 1e-30)
        np.testing.assert_allclose(y, x, atol=5e-4 * scale, rtol=0)
    assert b[3] == pytest.approx(a[3], rel=1e-5)


def test_fused_tau_chi_parity_with_emission():
    """With photon emission on, the fused path's out-of-kernel optical
    depth update (rate(chi, gamma_half) from the kernel outputs) must
    match the unfused vay_push decrement.  tau starts high so no
    stochastic emission fires — the decrement itself is deterministic."""
    ndev = 2
    dx = 1.0e-7
    dt = 0.95 * dx / C
    nx, npc = 32 * ndev, 32
    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=ndev)
    # field strength giving chi ~ 0.05 at gamma=1000
    b0 = 0.05 * const.CRITICAL_FIELD / (C * 1000.0)
    results = {}
    for fp in (False, True):
        opts = SimOptions(
            dt=dt, current_deposition=True, photon_emission=True,
            migration_capacity=512, fused_pusher=fp, fused_block=256,
            fused_window=32, fused_misfit_capacity=512,
        )
        especs = SpeciesSpec.electron()
        sim = Simulation(
            geom, opts, {"electron": especs, "photon": SpeciesSpec.photon()},
            dtype=jnp.float32,
        )
        state = sim.shard_particles(initialize(
            especs, geom, npc,
            density=lambda x: np.full_like(x, 1.0e6),
            ux=lambda x, u, n: np.full_like(x, -1000.0),
            uy=lambda x, u, n: np.zeros_like(x),
            uz=lambda x, u, n: np.zeros_like(x),
            dt=dt, capacity_per_device=2 * nx * npc // ndev, seed=7,
            dtype=np.float32,
        ))
        state = dataclasses.replace(state, tau=state.tau + 50.0)
        phot = sim.shard_particles(initialize(
            SpeciesSpec.photon(), geom, 0, lambda x: x * 0,
            None, None, None, dt, 256, seed=8, dtype=np.float32,
        ))
        E, B, J, rho = sim.init_fields()
        B = jax.device_put(
            jnp.zeros_like(B).at[:, 2].set(b0), B.sharding
        )
        counters = sim.zero_counters()
        E, B, J, rho, species, t, counters = sim.run(
            E, B, J, rho, {"electron": state, "photon": phot}, 0.0,
            jax.random.key(0), counters, 5
        )
        st = species["electron"]
        al = np.asarray(st.alive)
        assert int(np.asarray(species["photon"].alive).sum()) == 0
        results[fp] = (
            np.sort(np.asarray(st.tau)[al]),
            np.sort(np.asarray(st.chi)[al]),
        )
    # tau decrements and chi agree at f32 level
    np.testing.assert_allclose(
        results[True][0], results[False][0], rtol=2e-5
    )
    np.testing.assert_allclose(
        results[True][1], results[False][1], rtol=0, atol=3e-4 * 0.05
    )
    assert results[False][1].max() > 0.01  # chi actually nonzero


def test_fused_ion_pusher_equivalent():
    """The Boris variant of the fused kernel (ions) matches the unfused
    two-species run: fields and both species' energies agree at f32
    reassociation level."""
    ndev = 2
    dx = 1.0e-6
    dt = 0.95 * dx / C
    nx, npc = 32 * ndev, 32
    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=ndev)
    especs = SpeciesSpec.electron()
    ispecs = SpeciesSpec.ion("proton", 1.0, 1.0)
    results = {}
    for fp in (False, True):
        opts = SimOptions(
            dt=dt, current_deposition=True, migration_capacity=512,
            fused_pusher=fp, fused_block=256, fused_window=32,
            fused_misfit_capacity=512, fused_resort_every=2,
        )
        sim = Simulation(
            geom, opts, {"electron": especs, "ion": ispecs},
            dtype=jnp.float32,
        )
        states = {}
        for nm, spec, seed in (("electron", especs, 7), ("ion", ispecs, 9)):
            states[nm] = sim.shard_particles(initialize(
                spec, geom, npc,
                density=lambda x: np.full_like(x, 1.0e6),
                ux=lambda x, u, n: np.full_like(x, 0.5) * np.sign(u - 0.5),
                uy=lambda x, u, n: 0.05 * n,
                uz=lambda x, u, n: np.zeros_like(x),
                dt=dt, capacity_per_device=2 * nx * npc // ndev, seed=seed,
                dtype=np.float32,
            ))
        E, B, J, rho = sim.init_fields()
        counters = sim.zero_counters()
        n0 = {nm: int(jnp.sum(states[nm].alive)) for nm in states}
        E, B, J, rho, species, t, counters = sim.run(
            E, B, J, rho, states, 0.0, jax.random.key(0), counters, 60
        )
        for nm in species:
            assert int(jnp.sum(species[nm].alive)) == n0[nm], nm
            assert counter_total(counters[nm]) == 0, nm
        results[fp] = (
            np.asarray(E), np.asarray(J),
            float(sim.total_kinetic_energy("electron", species["electron"])),
            float(sim.total_kinetic_energy("ion", species["ion"])),
        )
    a, b = results[False], results[True]
    for x, y in zip(a[:2], b[:2]):
        scale = max(np.max(np.abs(x)), 1e-30)
        np.testing.assert_allclose(y, x, atol=5e-4 * scale, rtol=0)
    assert b[2] == pytest.approx(a[2], rel=1e-5)
    assert b[3] == pytest.approx(a[3], rel=1e-5)


@pytest.mark.parametrize("ndev", [1, 4])
def test_single_particle_trajectory_across_devices(ndev):
    """A single particle's global position must follow x(t) = x0 + v t
    exactly through halo crossings and periodic wrap."""
    dx = 1.0e-6
    dt = 0.95 * dx / C
    nx = 32
    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=ndev)
    opts = SimOptions(dt=dt, current_deposition=False, migration_capacity=16)
    spec = SpeciesSpec.electron()
    sim = Simulation(geom, opts, {"electron": spec})

    from opal_tpu.species import _empty_fields, ParticleState

    cap = 8
    f = _empty_fields(spec, ndev * cap, np.float64)
    u0 = 3.0
    gamma0 = math.sqrt(1.0 + u0 * u0)
    f["cell"][0] = 5
    f["x"][0] = 0.25
    f["weight"][0] = 1.0
    f["ux"][0] = u0
    f["gamma"][0] = gamma0
    f["alive"][0] = True
    state = sim.shard_particles(ParticleState(**f))

    E, B, J, rho = sim.init_fields()
    nsteps = 100
    E, B, J, rho, species, t, counters = sim.run(
        E, B, J, rho, {"electron": state}, 0.0, jax.random.key(0),
        sim.zero_counters(), nsteps,
    )
    st = species["electron"]
    alive = np.asarray(st.alive)
    assert alive.sum() == 1
    i = int(np.argmax(alive))
    dev = i // cap
    x_global = (dev * geom.n_loc + int(st.cell[i]) + float(st.x[i])) * dx
    v = C * u0 / gamma0
    expected = (5 + 0.25) * dx + v * nsteps * dt
    expected = expected % (nx * dx)  # periodic wrap
    assert x_global == pytest.approx(expected, abs=1e-9 * dx)


@pytest.mark.parametrize("ndev,fused", [(1, False), (8, False), (8, True)])
def test_plasma_oscillation_total_energy(ndev, fused):
    """With deposition on, a uniform drifting electron slab against a
    neutralizing background starts plasma oscillations; total (field +
    kinetic) energy must be conserved to high accuracy.  The
    ``fused=True`` case runs the f32 fused pipeline at the CLI's own
    auto window/cadence (``cli.fused_auto_sizing``) for BOTH species —
    the shipped-default energy-conservation oracle (VERDICT r2 #5)."""
    nx, npc = 64, 16
    dx = 5.0e-7
    dt = 0.95 * dx / C
    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=ndev)
    cap = max(1024, 2 * nx * npc // ndev)
    if fused:
        from opal_tpu.cli import fused_auto_sizing
        from opal_tpu.grid import HALO
        from opal_tpu.ops.fused import PAD

        block = 128
        cap = -(-cap // block) * block
        w_max = (geom.n_loc + 2 * HALO + 2 * PAD - 8) // 8 * 8
        window, resort = fused_auto_sizing(
            -(-block // npc), w_max, 64, 2.0 * 0.05
        )
        opts = SimOptions(
            dt=dt, current_deposition=True, migration_capacity=2048,
            fused_pusher=True, fused_block=block, fused_window=window,
            fused_resort_every=resort,
        )
        dtype, np_dtype = jnp.float32, np.float32
    else:
        opts = SimOptions(
            dt=dt, current_deposition=True, migration_capacity=2048
        )
        dtype, np_dtype = jnp.float64, np.float64
    espec = SpeciesSpec.electron()
    ispec = SpeciesSpec.ion("proton", 1.0, 1.0)
    sim = Simulation(
        geom, opts, {"electron": espec, "proton": ispec}, dtype=dtype
    )

    ne = 1.0e24
    estate = initialize(
        espec, geom, npc,
        density=lambda x: np.full_like(x, ne),
        ux=lambda x, u, n: np.full_like(x, 0.05),
        uy=lambda x, u, n: np.zeros_like(x),
        uz=lambda x, u, n: np.zeros_like(x),
        dt=dt, capacity_per_device=cap, seed=3, dtype=np_dtype,
    )
    istate = initialize(
        ispec, geom, npc,
        density=lambda x: np.full_like(x, ne),
        ux=lambda x, u, n: np.zeros_like(x),
        uy=lambda x, u, n: np.zeros_like(x),
        uz=lambda x, u, n: np.zeros_like(x),
        dt=dt, capacity_per_device=cap, seed=4, dtype=np_dtype,
    )
    species = {
        "electron": sim.shard_particles(estate),
        "proton": sim.shard_particles(istate),
    }
    if fused:
        for nm in species:
            assert sim._fused_applicable(nm, species[nm]), nm
    E, B, J, rho = sim.init_fields()

    ke0 = sum(sim.total_kinetic_energy(n, species[n]) for n in species)
    E, B, J, rho, species, t, counters = sim.run(
        E, B, J, rho, species, 0.0, jax.random.key(1), sim.zero_counters(), 400
    )
    ke1 = sum(sim.total_kinetic_energy(n, species[n]) for n in species)
    fe1 = sim.em_field_energy(E, B)
    if fused:
        for nm in species:
            assert counter_total(counters[nm]) == 0, nm
    # field energy must have appeared (oscillation); the naive KE+field
    # total mixes half-step (KE) and full-step (field) quantities, so it
    # ripples at ~omega_p * dt — a few percent here, not a drift
    assert fe1 > 0.01 * ke0
    assert (ke1 + fe1) == pytest.approx(ke0, rel=0.05)


def test_fused_long_run_invariants():
    """200 steps across many sort periods (R=16), skipped-exchange
    cadence M=3, edge migration, misfit fallback: no particle is ever
    lost or double-counted (counters stay zero), every alive particle
    stays in-domain, and total energy is conserved at f32 level in a
    field-free drift."""
    ndev = 2
    dx = 1.0e-6
    dt = 0.95 * dx / C
    nx, npc = 32 * ndev, 64
    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=ndev)
    opts = SimOptions(
        dt=dt, current_deposition=True, migration_capacity=1024,
        sorted_pipeline=True, fused_pusher=True, fused_block=256,
        fused_window=24, fused_misfit_capacity=1024,
        fused_resort_every=16, migration_every=3, migration_window=2048,
    )
    spec = SpeciesSpec.electron()
    sim = Simulation(geom, opts, {"electron": spec}, dtype=jnp.float32)
    state = sim.shard_particles(initialize(
        spec, geom, npc,
        # low density so self-fields stay negligible: a near-pure drift
        density=lambda x: np.full_like(x, 1.0),
        ux=lambda x, u, n: np.full_like(x, 1.5) * np.sign(u - 0.5),
        uy=lambda x, u, n: 0.2 * n,
        uz=lambda x, u, n: np.zeros_like(x),
        dt=dt, capacity_per_device=2 * nx * npc // ndev, seed=13,
        dtype=np.float32,
    ))
    E, B, J, rho = sim.init_fields()
    counters = sim.zero_counters()
    n0 = int(jnp.sum(state.alive))
    ke0 = sim.total_kinetic_energy("electron", state)

    species = {"electron": state}
    t = 0.0
    key = jax.random.key(5)
    for block in range(4):  # 4 output blocks of 50 steps
        E, B, J, rho, species, t, counters = sim.run(
            E, B, J, rho, species, float(t), jax.random.fold_in(key, block),
            counters, 50,
        )
    st = species["electron"]
    assert counter_total(counters["electron"]) == 0
    assert int(jnp.sum(st.alive)) == n0
    cells = np.asarray(st.cell)
    alive = np.asarray(st.alive)
    assert cells[alive].min() >= 0 and cells[alive].max() < geom.n_loc
    ke = sim.total_kinetic_energy("electron", st)
    assert ke == pytest.approx(ke0, rel=2e-4)


@pytest.mark.parametrize("mig_every", [1, 3])
def test_fused_presorted_absorption_invariants(mig_every):
    """The fused QED path re-sorts electrons after migration and
    absorb() consumes the sorted state directly (presorted=True).  The
    candidate-walk order differs from the unfused path (both are valid
    reference orderings), so the check is physical: emission fires,
    nothing overflows, every surviving particle is in-domain, and
    total energy (electron KE + photon energy) is conserved — the
    static B field does no work, and emission/absorption only move
    energy between the species.

    mig_every=3 exercises the halo-extended absorption pairing
    (interactions.absorb buckets over [-HALO, n_loc + HALO) so QED no
    longer forces the per-step exchange)."""
    ndev = 2
    dx = 1.0e-8
    dt = 0.95 * dx / C
    nx, npc = 32 * ndev, 32
    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=ndev)
    opts = SimOptions(
        dt=dt, current_deposition=True, photon_emission=True,
        photon_absorption=True, migration_capacity=512,
        fused_pusher=True, fused_block=256, fused_window=32,
        fused_misfit_capacity=512, absorption_candidates=64,
        migration_window=1024, migration_every=mig_every,
    )
    especs = SpeciesSpec.electron()
    sim = Simulation(
        geom, opts, {"electron": especs, "photon": SpeciesSpec.photon()},
        dtype=jnp.float32,
    )
    state = sim.shard_particles(initialize(
        especs, geom, npc,
        density=lambda x: np.full_like(x, 1.0e3),
        ux=lambda x, u, n: np.full_like(x, -1000.0),
        uy=lambda x, u, n: np.zeros_like(x),
        uz=lambda x, u, n: np.zeros_like(x),
        dt=dt, capacity_per_device=2 * nx * npc // ndev, seed=7,
        dtype=np.float32,
    ))
    phot = sim.shard_particles(initialize(
        SpeciesSpec.photon(), geom, 0, lambda x: x * 0,
        None, None, None, dt, 4096, seed=8, dtype=np.float32,
    ))
    E, B, J, rho = sim.init_fields()
    # strong field: chi ~ 0.5 at gamma 1000 -> plenty of emission, and
    # the emitted photons then absorb/stimulate against the population
    b0 = 0.5 * const.CRITICAL_FIELD / (C * 1000.0)
    B = jax.device_put(jnp.zeros_like(B).at[:, 2].set(b0), B.sharding)
    counters = sim.zero_counters()
    ke0 = sim.total_kinetic_energy("electron", state)
    E, B, J, rho, species, t, counters = sim.run(
        E, B, J, rho, {"electron": state, "photon": phot}, 0.0,
        jax.random.key(3), counters, 12
    )
    e2, p2 = species["electron"], species["photon"]
    assert counter_total(counters["photon"]) == 0
    assert counter_total(counters["electron"]) == 0
    al_p = np.asarray(p2.alive)
    assert al_p.sum() > 0  # emission fired
    cells = np.asarray(e2.cell)[np.asarray(e2.alive)]
    assert cells.min() >= 0 and cells.max() < geom.n_loc
    ke = sim.total_kinetic_energy("electron", e2)
    eph = sim.total_kinetic_energy("photon", p2)
    # self-consistent current deposition perturbs the (initially zero)
    # E field a little; tolerate f32-level exchange with the fields
    assert ke + eph == pytest.approx(ke0, rel=1e-3)
