"""Particle-pusher physics tests (reference: ``electron.rs:400-437``)."""

import math

import jax.numpy as jnp
import numpy as np

from opal_tpu import constants as const
from opal_tpu.ops import pusher


def _single(u0):
    cell = jnp.zeros(1, dtype=jnp.int32)
    x = jnp.zeros(1)
    y = jnp.zeros(1)
    z = jnp.zeros(1)
    u = jnp.asarray([u0])
    gamma = jnp.sqrt(1.0 + jnp.sum(u * u, axis=-1))
    tau = jnp.full(1, jnp.inf)
    work = jnp.zeros(1)
    return cell, x, y, z, u, gamma, tau, work


def test_vay_static_magnetic_field_conserves_gamma():
    b0, u0 = 1.0, 1.0
    r_c = const.ELECTRON_MASS * const.SPEED_OF_LIGHT * u0 / (
        abs(const.ELECTRON_CHARGE) * b0
    )
    omega_c = const.SPEED_OF_LIGHT * u0 / (math.sqrt(1.0 + u0 * u0) * r_c)
    dt = 0.01 * 2.0 * math.pi / omega_c
    cell, x, y, z, u, gamma, tau, work = _single([u0, 0.0, 0.0])
    E = jnp.zeros((1, 3))
    B = jnp.asarray([[0.0, 0.0, b0]])
    for _ in range(100):
        cell, x, _, y, z, u, gamma, chi, tau, work = pusher.vay_push(
            cell, x, y, z, u, gamma, tau, work, E, B, 1.0, dt
        )
    target = math.sqrt(1.0 + u0 * u0)
    assert abs(float(gamma[0]) - target) / target < 1.0e-6
    # B does no work
    assert abs(float(work[0])) < 1e-30 * const.ELECTRON_MASS * const.SPEED_OF_LIGHT_SQD


def test_vay_static_electric_field_matches_analytic():
    """gamma(t) = sqrt(1 + (e E t / m c)^2) for a charge from rest."""
    e0 = 1.0e3
    dt = 1.0e-9
    cell, x, y, z, u, gamma, tau, work = _single([0.0, 0.0, 0.0])
    E = jnp.asarray([[e0, 0.0, 0.0]])
    B = jnp.zeros((1, 3))
    for _ in range(100):
        cell, x, _, y, z, u, gamma, chi, tau, work = pusher.vay_push(
            cell, x, y, z, u, gamma, tau, work, E, B, 1.0, dt
        )
    target = math.sqrt(
        1.0
        + (
            const.ELECTRON_CHARGE
            * e0
            * 1.0e-7
            / (const.ELECTRON_MASS * const.SPEED_OF_LIGHT)
        )
        ** 2
    )
    assert abs(float(gamma[0]) - target) / target < 1.0e-6


def test_boris_static_magnetic_field_conserves_energy():
    b0, u0 = 1.0, 1.0
    r_c = const.ELECTRON_MASS * const.SPEED_OF_LIGHT * u0 / (
        abs(const.ELECTRON_CHARGE) * b0
    )
    omega_c = const.SPEED_OF_LIGHT * u0 / (math.sqrt(1.0 + u0 * u0) * r_c)
    dt = 0.01 * 2.0 * math.pi / omega_c
    cell = jnp.zeros(1, dtype=jnp.int32)
    x = y = z = jnp.zeros(1)
    u = jnp.asarray([[u0, 0.0, 0.0]])
    E = jnp.zeros((1, 3))
    B = jnp.asarray([[0.0, 0.0, b0]])
    q = jnp.full(1, const.ELECTRON_CHARGE)
    m = jnp.full(1, const.ELECTRON_MASS)
    for _ in range(100):
        cell, x, _, y, z, u, gamma_m1, chi = pusher.boris_push(
            cell, x, y, z, u, q, m, E, B, 1.0, dt
        )
    target = math.sqrt(1.0 + u0 * u0) - 1.0
    assert abs(float(gamma_m1[0]) - target) / target < 1.0e-6


def test_boris_ion_gamma_m1_precision():
    """Non-relativistic ions: gamma - 1 must not suffer cancellation."""
    u0 = 1.0e-8
    cell = jnp.zeros(1, dtype=jnp.int32)
    x = y = z = jnp.zeros(1)
    u = jnp.asarray([[u0, 0.0, 0.0]])
    E = jnp.zeros((1, 3))
    B = jnp.zeros((1, 3))
    q = jnp.full(1, const.ELEMENTARY_CHARGE)
    m = jnp.full(1, const.PROTON_MASS)
    cell, x, _, y, z, u, gamma_m1, chi = pusher.boris_push(
        cell, x, y, z, u, q, m, E, B, 1.0, 1e-12
    )
    expected = u0**2 / 2.0  # leading order
    assert abs(float(gamma_m1[0]) - expected) / expected < 1.0e-8


def test_photon_push_ballistic():
    cell = jnp.zeros(1, dtype=jnp.int32)
    x = jnp.full(1, 0.5)
    y = z = jnp.zeros(1)
    k = jnp.asarray([[2.0, 1.0, 0.0]])
    E = jnp.zeros((1, 3))
    B = jnp.zeros((1, 3))
    dx, dt = 1.0, 1.0e-9
    cell, x_new, prev_x, y, z, chi = pusher.photon_push(
        cell, x, y, z, k, E, B, dx, dt
    )
    k0 = math.sqrt(5.0)
    expect_dx = const.SPEED_OF_LIGHT * (2.0 / k0) * dt / dx
    assert float(x_new[0] + cell[0]) == np.float64(0.5 + expect_dx)
    assert float(y[0]) == np.float64(const.SPEED_OF_LIGHT * (1.0 / k0) * dt)
    assert float(chi[0]) == 0.0


def test_cell_crossing_fixup():
    cell = jnp.asarray([5, 5], dtype=jnp.int32)
    x = jnp.asarray([1.2, -0.3])
    prev_x = jnp.asarray([0.9, 0.2])
    cell2, x2, prev2 = pusher._cell_fixup(cell, x, prev_x)
    np.testing.assert_array_equal(np.asarray(cell2), [6, 4])
    np.testing.assert_allclose(np.asarray(x2), [0.2, 0.7], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(prev2), [-0.1, 1.2], rtol=1e-12)


def test_vay_chi_crossed_fields():
    """chi for an electron counter-propagating a plane wave:
    chi = 2 gamma E / E_crit for E perp B = E/c."""
    gamma0 = 1000.0
    ux = -math.sqrt(gamma0**2 - 1.0)
    e0 = 1.0e14
    cell, x, y, z, u, gamma, tau, work = _single([ux, 0.0, 0.0])
    E = jnp.asarray([[0.0, e0, 0.0]])
    B = jnp.asarray([[0.0, 0.0, e0 / const.SPEED_OF_LIGHT]])
    dt = 1.0e-18
    cell, x, _, y, z, u, gamma, chi, tau, work = pusher.vay_push(
        cell, x, y, z, u, gamma, tau, work, E, B, 1.0, dt
    )
    expected = 2.0 * gamma0 * e0 / const.CRITICAL_FIELD
    assert abs(float(chi[0]) - expected) / expected < 1.0e-2
