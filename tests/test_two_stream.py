"""Two-stream instability: the primary end-to-end physics oracle
(SURVEY §4).  For two symmetric cold beams (+-v0, each with beam
plasma frequency omega_b), the fastest-growing mode of

    1 = omega_b^2/(omega - k v0)^2 + omega_b^2/(omega + k v0)^2

has growth rate gamma_max = omega_b / 2 at k v0 = (sqrt(3)/2) omega_b.
Field energy therefore grows as exp(2 gamma_max t) in the linear
phase; the measured slope must match to ~25% (finite npc noise,
discrete k spectrum)."""

import math

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.physics

from opal_tpu import constants as const
from opal_tpu.grid import GridGeometry
from opal_tpu.sim import SimOptions, Simulation
from opal_tpu.species import SpeciesSpec, initialize

C = const.SPEED_OF_LIGHT


@pytest.mark.parametrize("ndev", [1, 8])
def test_two_stream_growth_rate(ndev):
    nx, npc = 256, 25
    dx = 1.0e-6
    dt = 0.95 * dx / C
    ne = 1.26e22  # per m^3 -> omega_p dt ~ 0.02
    u0 = 0.1005  # drift u: v0 ~ 0.1 c

    omega_p = math.sqrt(
        ne * const.ELEMENTARY_CHARGE**2
        / (const.VACUUM_PERMITTIVITY * const.ELECTRON_MASS)
    )
    omega_b = omega_p / math.sqrt(2.0)
    gamma_max = omega_b / 2.0

    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=ndev)
    opts = SimOptions(dt=dt, current_deposition=True, migration_capacity=4096)
    espec = SpeciesSpec.electron()
    sim = Simulation(geom, opts, {"electron": espec})

    # counter-streaming beams, as in examples/two_stream.yaml:
    # sign from urand, 0.1% momentum noise from nrand to seed the mode
    state = initialize(
        espec, geom, npc,
        density=lambda x: np.full_like(x, ne),
        ux=lambda x, u, n: u0 * (1.0 + 0.001 * n) * (2.0 * np.floor(u - 0.5) + 1.0),
        uy=lambda x, u, n: np.zeros_like(x),
        uz=lambda x, u, n: np.zeros_like(x),
        dt=dt, capacity_per_device=2 * nx * npc // ndev, seed=11,
    )
    species = {"electron": sim.shard_particles(state)}
    E, B, J, rho = sim.init_fields()
    counters = sim.zero_counters()
    key = jax.random.key(0)

    sample_every = 25
    energies = []
    t = 0.0
    for _ in range(64):
        E, B, J, rho, species, t, counters = sim.run(
            E, B, J, rho, species, float(t), key, counters, sample_every
        )
        energies.append(sim.em_field_energy(E, B))
    energies = np.asarray(energies)
    assert np.all(np.isfinite(energies))

    # expected log-energy slope per sample in the linear phase
    expected = 2.0 * gamma_max * dt * sample_every
    log_e = np.log(energies)
    # strongest sustained growth over 8-sample windows
    w = 8
    slopes = [
        np.polyfit(np.arange(w), log_e[i : i + w], 1)[0]
        for i in range(len(log_e) - w)
    ]
    measured = max(slopes)
    assert measured == pytest.approx(expected, rel=0.25), (
        measured, expected,
    )
    # instability must grow well above the shot-noise floor
    assert energies.max() > 50.0 * energies.min()
