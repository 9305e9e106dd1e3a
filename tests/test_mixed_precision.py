"""Mixed precision (SURVEY §7 item 7): f32 particles on the fused
Pallas path + f64 field integration / energy sums.  This is the CLI
default — it must conserve energy like f64 while keeping the fast
particle pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opal_tpu import constants as const
from opal_tpu.grid import GridGeometry
from opal_tpu.sim import SimOptions, Simulation, counter_total
from opal_tpu.species import SpeciesSpec, initialize


def _run(dtype, field_dtype, nsteps, qed=False):
    ndev = 4
    nx = 128
    npc = 8
    geom = GridGeometry(nx=nx, dx=500.0, xmin=0.0, n_devices=ndev)
    dt = 0.95 * 500.0 / const.SPEED_OF_LIGHT
    opts = SimOptions(
        dt=dt, current_deposition=True, migration=True,
        photon_emission=qed, photon_absorption=qed,
        fused_pusher=True, fused_block=256, fused_window=40,
        fused_resort_every=8, fused_misfit_capacity=128,
        migration_every=1, migration_window=512, migration_capacity=128,
        absorption_candidates=8,
    )
    espec = SpeciesSpec.electron()
    specs = {"electron": espec}
    if qed:
        specs["photon"] = SpeciesSpec.photon()
    sim = Simulation(geom, opts, specs, dtype=dtype, field_dtype=field_dtype)
    np_dtype = np.float64 if dtype == jnp.float64 else np.float32
    drift = 2.5e-24 / (const.ELECTRON_MASS * const.SPEED_OF_LIGHT)
    state = initialize(
        espec, geom, npc,
        density=lambda x: np.full_like(np.asarray(x, float), 20.0),
        ux=lambda x, u, nr: (1000.0 if qed else drift)
        * (1.0 + 0.001 * nr) * np.sign(u - 0.5),
        uy=lambda x, u, nr: np.zeros_like(x),
        uz=lambda x, u, nr: np.zeros_like(x),
        dt=dt, capacity_per_device=512, seed=0, dtype=np_dtype,
    )
    species = {"electron": sim.shard_particles(state)}
    if qed:
        zero = lambda x, u, nr: np.zeros_like(x)
        species["photon"] = sim.shard_particles(initialize(
            SpeciesSpec.photon(), geom, 0,
            density=lambda x: np.zeros_like(np.asarray(x, float)),
            ux=zero, uy=zero, uz=zero,
            dt=dt, capacity_per_device=512, seed=1, dtype=np_dtype,
        ))
    E, B, J, rho = sim.init_fields()
    assert E.dtype == field_dtype
    res = sim.run(
        E, B, J, rho, species, 0.0, jax.random.key(0),
        sim.zero_counters(), nsteps,
    )
    etot = sim.em_field_energy(res[0], res[1])
    for name in specs:
        etot += sim.total_kinetic_energy(name, res[4][name])
    return res, float(etot)


@pytest.mark.physics
def test_mixed_energy_conservation():
    """The mixed run's total-energy drift over 400 steps must be within
    the f32 budget (<= 1e-5 relative) and its state must track the
    all-f64 run."""
    _, e0_mixed = _run(jnp.float32, jnp.float64, 1)
    res_m, e_mixed = _run(jnp.float32, jnp.float64, 400)
    drift = abs(e_mixed - e0_mixed) / e0_mixed
    assert drift < 1.0e-5, f"mixed-precision energy drift {drift:.2e}"
    # particle dtype stays f32, fields stay f64 through the run
    assert res_m[0].dtype == jnp.float64
    assert res_m[4]["electron"].x.dtype == jnp.float32
    assert counter_total(res_m[6]["electron"]) == 0


@pytest.mark.physics
def test_mixed_qed_step_runs():
    """QED passes (emission + absorption) execute in mixed precision:
    f64 field slabs feed f32 particle kernels without dtype drift."""
    res, etot = _run(jnp.float32, jnp.float64, 4, qed=True)
    assert np.isfinite(etot)
    assert res[4]["photon"].x.dtype == jnp.float32
    assert res[0].dtype == jnp.float64
