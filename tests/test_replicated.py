"""Replicated-field mode: the TPU-native load-balancing answer to the
reference's density-balanced decomposition (``grid/mod.rs:157-206``).
Every device holds the whole (tiny) grid; the particle population is
split into equal-count contiguous chunks; deposits are psum'd.  For a
hole_boring-like deck (plasma in a fraction of the box) the domain
decomposition idles most devices — this mode balances them exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.physics

from opal_tpu import constants as const
from opal_tpu.fields import make_mesh
from opal_tpu.grid import GridGeometry
from opal_tpu.sim import SimOptions, Simulation, counter_total
from opal_tpu.species import SpeciesSpec, initialize, shard_even

NDEV = 8


def _slab_density(frac=0.25, n0=40.0):
    """Plasma slab covering ``frac`` of the box from the left edge of
    the second quarter (hole_boring-like nonuniformity)."""
    def ne(x):
        x = np.asarray(x, float)
        lo, hi = 0.25, 0.25 + frac
        span = x.max() - x.min() if x.size else 1.0
        s = (x - x.min()) / max(span, 1e-300)
        return np.where((s >= lo) & (s < hi), n0, 0.0)
    return ne


def _build(replicated: bool, nx=256, npc=16, nsteps=12, boundaries=None):
    dx = 500.0
    dt = 0.95 * dx / const.SPEED_OF_LIGHT
    kw = {} if boundaries is None else boundaries
    geom = GridGeometry(
        nx=nx, dx=dx, xmin=0.0,
        n_devices=1 if replicated else NDEV, **kw,
    )
    opts = SimOptions(
        dt=dt, current_deposition=True, migration=True,
        fused_pusher=True, fused_block=128, fused_window=48,
        fused_resort_every=4, fused_misfit_capacity=128,
        migration_window=512, migration_capacity=128,
        replicate_fields=replicated,
    )
    espec = SpeciesSpec.electron()
    mesh = make_mesh(NDEV)
    sim = Simulation(geom, opts, {"electron": espec}, mesh=mesh,
                     dtype=jnp.float32, field_dtype=jnp.float64)
    drift = 0.1
    host = initialize(
        espec, geom, npc,
        density=_slab_density(),
        ux=lambda x, u, nr: drift * np.sign(u - 0.5),
        uy=lambda x, u, nr: np.zeros_like(x),
        uz=lambda x, u, nr: np.zeros_like(x),
        dt=dt,
        capacity_per_device=(nx * npc if replicated else nx * npc),
        seed=0, dtype=np.float32,
    )
    if replicated:
        n_alive = int(np.asarray(host.alive).sum())
        cap = -(-(-(-n_alive // NDEV)) // 128) * 128
        host = shard_even(host, NDEV, cap)
    species = {"electron": sim.shard_particles(host)}
    E, B, J, rho = sim.init_fields()
    res = sim.run(
        E, B, J, rho, species, 0.0, jax.random.key(0),
        sim.zero_counters(), nsteps,
    )
    return sim, res


def test_replicated_balances_nonuniform_deck():
    """Per-device alive counts must be equal to within one chunk (the
    VERDICT criterion is < 2x; equal-count chunking gives ~1.0x)."""
    sim, res = _build(True)
    st = res[4]["electron"]
    alive = np.asarray(st.alive)
    cap = alive.shape[0] // NDEV
    per_dev = alive.reshape(NDEV, cap).sum(axis=1)
    assert per_dev.min() > 0
    assert per_dev.max() <= per_dev.min() + 1
    assert counter_total(res[6]["electron"]) == 0


def test_replicated_matches_domain_mode():
    """Same physics from both decompositions: identical total alive
    count and field energies within the f32 deposition-order budget."""
    sim_r, res_r = _build(True)
    sim_d, res_d = _build(False)
    alive_r = int(np.asarray(res_r[4]["electron"].alive).sum())
    alive_d = int(np.asarray(res_d[4]["electron"].alive).sum())
    assert alive_r == alive_d
    fe_r = sim_r.em_field_energy(res_r[0], res_r[1])
    fe_d = sim_d.em_field_energy(res_d[0], res_d[1])
    assert fe_d > 0
    np.testing.assert_allclose(fe_r, fe_d, rtol=1e-4)
    ke_r = sim_r.total_kinetic_energy("electron", res_r[4]["electron"])
    ke_d = sim_d.total_kinetic_energy("electron", res_d[4]["electron"])
    np.testing.assert_allclose(ke_r, ke_d, rtol=1e-5)
    # replicated-mode fields are identical on every device replica
    E_r = np.asarray(res_r[0])
    E_d = np.asarray(res_d[0])
    np.testing.assert_allclose(E_r, E_d, rtol=1e-4, atol=1e-30)


def test_replicated_kills_at_global_edges():
    """Non-periodic edges delete leavers in place (the reference drops
    leavers with no neighbour, mod.rs:309-329)."""
    sim, res = _build(
        True, nsteps=64,
        boundaries=dict(left_boundary="laser", right_boundary="absorbing"),
    )
    st = res[4]["electron"]
    alive = np.asarray(st.alive)
    cell = np.asarray(st.cell)
    geom = sim.geom
    assert (cell[alive] >= geom.interior_start).all()
    assert (cell[alive] < geom.interior_end).all()


def test_replicated_initialize_fields_matches_domain_mode():
    """The Gauss/Ampère setup must give the same initial fields from
    both decompositions.  Regression: the replicated branch fed its
    already-psum'd global J/rho into electrostatic_init's own psum,
    scaling the sheet-field boundary terms by the mesh size."""
    def init_fields(replicated):
        dx = 500.0
        dt = 0.95 * dx / const.SPEED_OF_LIGHT
        geom = GridGeometry(
            nx=256, dx=dx, xmin=0.0, n_devices=1 if replicated else NDEV,
            left_boundary="laser", right_boundary="absorbing",
        )
        opts = SimOptions(
            dt=dt, current_deposition=True, migration=True,
            replicate_fields=replicated,
        )
        espec = SpeciesSpec.electron()
        mesh = make_mesh(NDEV)
        sim = Simulation(geom, opts, {"electron": espec}, mesh=mesh,
                         dtype=jnp.float64, field_dtype=jnp.float64)
        host = initialize(
            espec, geom, 8,
            density=_slab_density(),
            ux=lambda x, u, nr: 0.05 * np.sign(u - 0.5),
            uy=lambda x, u, nr: np.full_like(x, 0.01),
            uz=lambda x, u, nr: np.full_like(x, -0.02),
            dt=dt, capacity_per_device=256 * 8, seed=0, dtype=np.float64,
        )
        if replicated:
            n_alive = int(np.asarray(host.alive).sum())
            cap = -(-(-(-n_alive // NDEV)) // 128) * 128
            host = shard_even(host, NDEV, cap)
        species = {"electron": sim.shard_particles(host)}
        E, B, J, rho = sim.init_fields()
        E, B, J, rho = sim.initialize_fields(E, B, J, rho, species)
        s, e = geom.interior_start, geom.interior_end
        return (
            np.asarray(E)[s:e], np.asarray(B)[s:e], np.asarray(rho)[s:e]
        )

    # the extended-grid padding differs between the decompositions
    # (n_loc rounding), so compare the 256 interior cells
    E_r, B_r, rho_r = init_fields(True)
    E_d, B_d, rho_d = init_fields(False)
    np.testing.assert_allclose(rho_r, rho_d, rtol=1e-12, atol=1e-30)
    assert np.abs(E_d[:, 0]).max() > 0
    np.testing.assert_allclose(E_r, E_d, rtol=1e-12, atol=1e-25)
    np.testing.assert_allclose(B_r, B_d, rtol=1e-12, atol=1e-25)


def test_replicated_particle_x_is_global():
    """Replicated-mode cells are global: particle_quantity('x') must
    not add a per-device offset (it did — every shard d > 0 reported
    positions shifted by d * nx * dx, corrupting spatial histograms)."""
    from opal_tpu.diagnostics.output import particle_quantity

    sim, res = _build(replicated=True, nx=128, npc=8, nsteps=2)
    st = res[4]["electron"]
    geom = sim.geom
    cap = st.alive.shape[0] // NDEV
    x = particle_quantity(
        "x", SpeciesSpec.electron(), st, geom, cap, replicated=True
    )
    lo = geom.xmin
    hi = geom.xmin + geom.n_ext * geom.dx
    assert x.size == int(np.asarray(st.alive).sum())
    assert np.all((x >= lo) & (x < hi)), (x.min(), x.max(), lo, hi)
