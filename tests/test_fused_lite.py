"""Lite fused kernel (FusedSpec.lite): the non-QED fast path skips
the chi/gamma-half/prev_x outputs and their compute.  Trajectories
(cell/x/u/gamma) must match the full kernel bitwise; work matches to
float rounding (the work chain re-associates by ~1 ULP once chi's
shared subexpressions disappear); chi is refreshed lazily at output
(Simulation.refresh_electron_chi)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opal_tpu import constants as const
from opal_tpu.fields import GridGeometry
from opal_tpu.sim import Simulation, SimOptions
from opal_tpu.species import SpeciesSpec, initialize

pytestmark = pytest.mark.unit


def _mini(fused_lite, nsteps=12, deposition=True, bfield=1e-5):
    ndev, nx, npc = 4, 128, 4
    geom = GridGeometry(nx=nx, dx=500.0, xmin=0.0, n_devices=ndev)
    dt = 0.95 * 500.0 / const.SPEED_OF_LIGHT
    opts = SimOptions(
        dt=dt, current_deposition=deposition, migration=True,
        fused_pusher=True, fused_block=128, fused_window=40,
        fused_resort_every=4, fused_misfit_capacity=128,
        migration_every=3, migration_window=256, migration_capacity=64,
        fused_lite=fused_lite,
    )
    espec = SpeciesSpec.electron()
    sim = Simulation(geom, opts, {"electron": espec}, dtype=jnp.float32)
    state = initialize(
        espec, geom, npc,
        density=lambda x: np.full_like(np.asarray(x, float), 20.0),
        ux=lambda x, u, nr: 0.2 * np.sign(u - 0.5),
        uy=lambda x, u, nr: 0.05 * nr,
        uz=lambda x, u, nr: np.zeros_like(x),
        dt=dt, capacity_per_device=128, seed=0, dtype=np.float32,
    )
    species = {"electron": sim.shard_particles(state)}
    E, B, J, rho = sim.init_fields()
    B = B.at[:, 2].set(bfield)  # gyration so chi/work are nonzero
    res = sim.run(
        E, B, J, rho, species, 0.0, jax.random.key(0),
        sim.zero_counters(), nsteps,
    )
    return sim, res


def test_lite_matches_full_trajectories():
    sim_l, r_l = _mini(-1)
    sim_f, r_f = _mini(0)
    sp_l, sp_f = r_l[4]["electron"], r_f[4]["electron"]
    for name in ("cell", "x", "ux", "uy", "uz", "gamma", "weight",
                 "alive"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sp_l, name)),
            np.asarray(getattr(sp_f, name)), err_msg=name,
        )
    w_l, w_f = np.asarray(sp_l.work), np.asarray(sp_f.work)
    # the work integral cancels toward zero on gyration orbits — scale
    # the tolerance by the column magnitude, not per element
    np.testing.assert_allclose(
        w_l, w_f, rtol=1e-5, atol=1e-5 * np.abs(w_f).max(),
        err_msg="work",
    )
    for i, name in [(0, "E"), (1, "B"), (2, "J"), (3, "rho")]:
        np.testing.assert_array_equal(
            np.asarray(r_l[i]), np.asarray(r_f[i]), err_msg=name
        )


def test_lazy_chi_refresh_matches_full_kernel():
    # deposition off -> the uniform B field stays static, so the
    # kernel's half-step invariant and the full-step refresh see the
    # same fields (with deposition on, shot-noise E fields evolve
    # between the two evaluation points).  B must be small enough that
    # the per-step rotation angle theta = qB dt/(2 gamma m) << 1: the
    # Vay half-step is an Euler step u + alpha v x B whose |u_perp|
    # inflates by sqrt(1 + theta^2), so the stored half-step chi only
    # agrees with the full-step refresh to O(theta^2)
    sim_l, r_l = _mini(-1, deposition=False, bfield=1e-8)
    sim_f, r_f = _mini(0, deposition=False, bfield=1e-8)
    assert sim_l.electron_chi_is_lazy and not sim_f.electron_chi_is_lazy
    E, B = r_l[0], r_l[1]
    st = sim_l.refresh_electron_chi(E, B, r_l[4]["electron"])
    chi_ref = np.asarray(r_f[4]["electron"].chi)
    chi = np.asarray(st.chi)
    alive = np.asarray(st.alive)
    # full kernel stores the half-step invariant; the refresh evaluates
    # it at the full step -> equal to O(dt), and exactly equal in a
    # static B field (chi depends only on |u_perp| B here)
    np.testing.assert_allclose(
        chi[alive], chi_ref[alive], rtol=5e-3, err_msg="chi"
    )
    assert (chi[alive] > 0).all()


def test_lite_auto_selection_wiring():
    """QED decks must keep the FULL kernel for electrons (chi/gh feed
    the optical-depth update) while ions stay lite; fused_lite=0 turns
    lite off everywhere."""
    geom = GridGeometry(nx=128, dx=500.0, xmin=0.0, n_devices=4)
    dt = 0.95 * 500.0 / const.SPEED_OF_LIGHT

    def mk(**kw):
        opts = SimOptions(dt=dt, fused_pusher=True, fused_block=128,
                          fused_window=40, **kw)
        specs = {"electron": SpeciesSpec.electron(),
                 "ion": SpeciesSpec.ion("proton", 1.0, 1.0)}
        return Simulation(geom, opts, specs, dtype=jnp.float32)

    sim = mk()  # non-QED
    assert sim._fused_spec("electron").lite
    assert sim._fused_spec("electron").work_out
    assert sim._fused_spec("ion").lite
    assert not sim._fused_spec("ion").work_out

    sim = mk(photon_emission=True)
    assert not sim._fused_spec("electron").lite
    assert sim._fused_spec("ion").lite

    sim = mk(fused_lite=0)
    assert not sim._fused_spec("electron").lite
    assert not sim._fused_spec("ion").lite
    assert not sim._fused_spec("ion").work_out
