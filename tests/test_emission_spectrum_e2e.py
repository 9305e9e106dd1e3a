"""END-TO-END photon emission spectrum oracle (VERDICT r3 weak #4).

``test_qed_spectrum.py`` pins the bare samplers against the
Nikishov-Ritus integrals; this test pins the WHOLE stepping pipeline —
field gather, push, in-step chi, optical-depth decrement, renewal
draws, ``emit_radiation``, photon-buffer insert — by running a real
``Simulation`` in a uniform magnetic field and comparing the binned
energy spectrum of the photon *population* against the same scipy
oracles at a stated tolerance.

Setup: a periodic box with a static uniform B_z and monoenergetic
electrons (u = u_x), no deposition (J = 0 keeps the fields exactly
static), so every emission samples at the SAME (chi, gamma):

* classical branch (the reference's ``no_radiation_reaction`` feature,
  ``electron.rs:214``): no recoil, chi is exactly invariant under
  gyration, every photon is i.i.d. from the classical synchrotron
  spectrum — the empirical CDF must sit on the oracle to ~1.5%.
* quantum branch (recoil on): the expected emission count per electron
  is kept at ~0.12 so ~94% of photons are first emissions; the CDF
  match tolerance is widened to 3% for the recoil-softened remainder.
"""

import math

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.physics

from opal_tpu import constants as const
from opal_tpu.grid import GridGeometry
from opal_tpu.qed import emission
from opal_tpu.sim import SimOptions, Simulation, counter_total
from opal_tpu.species import SpeciesSpec, initialize

from tests.test_qed_spectrum import _classical_cdf, _quantum_cdf

C = const.SPEED_OF_LIGHT
QUANTILES = np.linspace(0.05, 0.95, 19)


def _run_uniform_field(chi, gamma, radiation_reaction, target_emissions):
    """Run the real pipeline in a uniform B_z; return (photon energies
    omega/mc^2 as np array, electron gamma, counters, sim)."""
    import jax.numpy as jnp

    nx, npc = 512, 128
    dx = 1.0e-8
    dt = 0.95 * dx / C
    ux = -math.sqrt(gamma * gamma - 1.0)
    # chi = c |u x B| / (E_S): u = (ux, 0, 0), B = (0, 0, Bz)
    Bz = chi * const.CRITICAL_FIELD / (C * abs(ux))

    rate_fn = emission.rate if radiation_reaction else emission.classical_rate
    p1 = float(rate_fn(jnp.asarray(chi), jnp.asarray(gamma))) * dt
    n_steps = max(2, int(round(target_emissions / p1)))

    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=1)
    n_e = nx * npc
    cap_ph = -(-int(n_e * target_emissions * 4 + 65536) // 1024) * 1024
    opts = SimOptions(
        dt=dt, current_deposition=False, photon_emission=True,
        radiation_reaction=radiation_reaction,
        migration_capacity=8192,
    )
    especs = {"electron": SpeciesSpec.electron(),
              "photon": SpeciesSpec.photon()}
    sim = Simulation(geom, opts, especs, dtype=jnp.float64)

    e_state = initialize(
        especs["electron"], geom, npc,
        density=lambda x: np.full_like(x, 1.0e18),
        ux=lambda x, u, n: np.full_like(x, ux),
        uy=lambda x, u, n: np.zeros_like(x),
        uz=lambda x, u, n: np.zeros_like(x),
        dt=dt, capacity_per_device=n_e, seed=7, dtype=np.float64,
    )
    ph_state = initialize(
        especs["photon"], geom, 0, lambda x: x * 0.0, None, None, None,
        dt, cap_ph, dtype=np.float64,
    )
    species = {
        "electron": sim.shard_particles(e_state),
        "photon": sim.shard_particles(ph_state),
    }
    E, B, J, rho = sim.init_fields()
    B = B.at[:, 2].set(Bz)
    counters = sim.zero_counters()

    out = sim.run(
        E, B, J, rho, species, 0.0, jax.random.key(3), counters, n_steps
    )
    species, counters = out[4], out[6]
    ph = species["photon"]
    alive = np.asarray(ph.alive)
    k0 = np.asarray(ph.gamma)[alive]  # photon energy omega/(m c^2)
    return k0, counters


def _assert_cdf_match(values, grid, cdf, atol):
    q_emp = np.quantile(values, QUANTILES)
    cdf_at_q = np.interp(q_emp, grid, cdf)
    np.testing.assert_allclose(cdf_at_q, QUANTILES, atol=atol)


def test_e2e_classical_spectrum():
    chi, gamma = 0.05, 4000.0
    k0, counters = _run_uniform_field(
        chi, gamma, radiation_reaction=False, target_emissions=1.5
    )
    # no buffer losses; healthy statistics
    for name in ("electron", "photon"):
        assert counter_total(counters[name]) == 0
    assert k0.size > 50_000

    v = k0 / (1.5 * chi * gamma)
    grid = np.geomspace(1e-10, 40.0, 4000)
    _assert_cdf_match(v, grid, _classical_cdf(grid), atol=0.015)


def test_e2e_quantum_spectrum():
    chi, gamma = 0.2, 4000.0
    k0, counters = _run_uniform_field(
        chi, gamma, radiation_reaction=True, target_emissions=0.12
    )
    for name in ("electron", "photon"):
        assert counter_total(counters[name]) == 0
    assert k0.size > 5_000

    f = k0 / gamma
    assert (f > 0).all() and (f < 1).all()
    lo = max(f.min() * 0.5, 1e-12)
    grid = np.geomspace(lo, 1.0 - 1e-9, 4000)
    _assert_cdf_match(f, grid, _quantum_cdf(chi, grid), atol=0.03)
