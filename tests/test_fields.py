"""Field-solver integration tests with analytic oracles, ported from
the reference suite (``src/grid/yee.rs:891-1080``), parameterized over
device counts so the ppermute halo-exchange path is exercised on a
multi-device mesh (virtual CPU devices)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from opal_tpu import constants as const
from opal_tpu.fields import FieldSolver, make_mesh, zero_fields
from opal_tpu.grid import GridGeometry

C = const.SPEED_OF_LIGHT
EPS0 = const.VACUUM_PERMITTIVITY


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_laser_injection_energy(ndev):
    """Inject a finite laser pulse; on-grid energy must match the
    analytic integral to 1e-3 (``yee.rs:902-953``)."""
    xmin = -10.0e-6
    dx = 1.0e-6 / 100.0
    dt = 0.95 * dx / C
    t0 = -15.0e-6 / C
    nsteps = int(abs(t0) / dt) + 1  # 0..=nsteps inclusive

    omega = 2.0 * math.pi * C / 1.0e-6
    emax = 1.0e10

    def laser_y(t, x):
        phi = omega * (t - x / C)
        return jnp.where(
            jnp.abs(phi) < 8.0 * math.pi,
            emax * jnp.sin(phi) * jnp.cos(phi / 16.0) ** 2,
            0.0,
        )

    def laser_z(t, x):
        return jnp.zeros_like(jnp.asarray(t))

    geom = GridGeometry(
        nx=2000, dx=dx, xmin=xmin, n_devices=ndev,
        left_boundary="laser", right_boundary="absorbing",
    )
    mesh = make_mesh(ndev)
    solver = FieldSolver(geom, mesh, dt, laser_y, laser_z)
    E, B, _, _ = zero_fields(geom, mesh)
    E, B, t = solver.run(E, B, t0, nsteps)

    # spot-check the field profile at x = lambda/4 (loose)
    e_pt, _ = solver.fields_at_interior(E, B, 1000 + 25, 0.0)
    expected_ey = -emax * math.cos(math.pi / 32.0) ** 2
    assert abs(e_pt[1] - expected_ey) / abs(expected_ey) < 0.02

    em_energy = solver.em_field_energy(E, B)
    target = EPS0 * emax**2 * (3.0 * math.pi * C / omega)
    assert abs(em_energy - target) / target < 1.0e-3


@pytest.mark.parametrize("ndev", [1, 8])
def test_conducting_mirror_energy(ndev):
    """Bounce a circularly polarized pulse off a conducting mirror;
    the reflected energy matches the analytic value to 1e-3
    (``yee.rs:955-1011``)."""
    xmin = -10.0e-6
    dx = 1.0e-6 / 100.0
    dt = 0.95 * dx / C
    t0 = -15.0e-6 / C
    nsteps = int(35.0e-6 / (C * dt)) + 1

    omega = 2.0 * math.pi * C / 1.0e-6
    emax = 1.0e10

    def laser_y(t, x):
        phi = omega * (t - x / C)
        return jnp.where(
            jnp.abs(phi) < 8.0 * math.pi,
            -emax
            * (jnp.sin(phi) + (2.0 / 16.0) * jnp.cos(phi) * jnp.tan(phi / 16.0))
            * jnp.cos(phi / 16.0) ** 2,
            0.0,
        )

    def laser_z(t, x):
        phi = omega * (t - x / C)
        return jnp.where(
            jnp.abs(phi) < 8.0 * math.pi,
            emax
            * (jnp.cos(phi) + (2.0 / 16.0) * jnp.sin(phi) * jnp.tan(phi / 16.0))
            * jnp.cos(phi / 16.0) ** 2,
            0.0,
        )

    geom = GridGeometry(
        nx=2000, dx=dx, xmin=xmin, n_devices=ndev,
        left_boundary="laser", right_boundary="conducting",
    )
    mesh = make_mesh(ndev)
    solver = FieldSolver(geom, mesh, dt, laser_y, laser_z)
    E, B, _, _ = zero_fields(geom, mesh)
    E, B, t = solver.run(E, B, t0, nsteps)

    em_energy = solver.em_field_energy(E, B)
    target = EPS0 * emax**2 * (193.0 / 32.0) * (math.pi * C / omega)
    assert abs(em_energy - target) / target < 1.0e-3


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_periodic_energy_conservation(ndev):
    """Drive a current antenna, then check the wrapped-around pulse
    conserves energy to 1e-6 after another full transit
    (``yee.rs:1013-1079``)."""
    dx = 1.0e-6 / 100.0
    dt = 0.95 * dx / C
    t0 = -5.0e-6 / C
    nsteps = int(10.0e-6 / (C * dt))

    omega = 2.0 * math.pi * C / 1.0e-6
    jmax = omega * EPS0 * 1.0e5

    antenna_cell = 1000

    def antenna(J, t, gcells):
        phi = omega * t
        val = jnp.where(
            jnp.abs(phi) < 4.0 * math.pi,
            jmax
            * (jnp.sin(phi) + (2.0 / 8.0) * jnp.cos(phi) * jnp.tan(phi / 8.0))
            * jnp.cos(phi / 8.0) ** 2,
            0.0,
        )
        mask = (gcells == antenna_cell).astype(J.dtype)
        return J.at[:, 2].add(mask * val)

    geom = GridGeometry(nx=2000, dx=dx, xmin=-10.0e-6, n_devices=ndev)
    mesh = make_mesh(ndev)
    solver = FieldSolver(geom, mesh, dt, antenna=antenna)
    E, B, _, _ = zero_fields(geom, mesh)

    E, B, t = solver.run(E, B, t0, nsteps)
    initial = solver.em_field_energy(E, B)
    assert initial > 0.0

    E, B, t = solver.run(E, B, float(t), nsteps)
    final = solver.em_field_energy(E, B)
    assert abs(initial - final) / initial < 1.0e-6
