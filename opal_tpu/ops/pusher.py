"""Relativistic particle pushers, vectorized over SoA particle arrays.

Implements the reference's three pushes as pure array functions fused
under jit:

* Vay leapfrog push for electrons, including the quantum-parameter
  update, optical-depth decrement against the emission rate, and the
  work integral (``src/particle/electron.rs:268-330``).
* Boris push, used for ions and available for electrons
  (``src/particle/ion.rs:168-214``, ``electron.rs:335-392``).
* Ballistic photon push with quantum-parameter update
  (``src/particle/photon.rs:150-183``).

Each returns the updated arrays; the caller owns state assembly.  The
cell-crossing fixup mirrors the reference exactly: positions stay in
[0, 1) as fractional cell offsets and the integer cell index moves by
at most one cell per step (CFL guarantees |dx_i| < 1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as const
from ..qed import emission


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _cross(a, b):
    return jnp.cross(a, b)


def _cell_fixup(cell, x, prev_x):
    """Shift the cell index when the fractional offset leaves [0, 1)
    (``electron.rs:319-329``)."""
    fl = jnp.floor(x)
    shift = jnp.where(fl < 0.0, -1, jnp.where(fl > 0.0, 1, 0)).astype(cell.dtype)
    return cell + shift, x - fl, prev_x - fl


class PushResult(NamedTuple):
    cell: jnp.ndarray
    x: jnp.ndarray
    prev_x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    u: jnp.ndarray
    gamma: jnp.ndarray
    chi: jnp.ndarray
    tau: jnp.ndarray
    work: jnp.ndarray


def vay_push(
    cell, x, y, z, u, gamma, tau, work, E, B, dx, dt, *,
    classical_rates=False, compute_dtype=None
):
    """Vay et al. leapfrog push for electrons (electron.rs:268-330).

    ``u`` is p/(mc) with shape (N, 3); ``E``, ``B`` the fields at the
    particle, (N, 3).  Updates momentum, gamma, chi, the work integral,
    and the optical depth against photon emission.

    ``compute_dtype``: run the push ARITHMETIC in this dtype while
    keeping the stored state in its own (round outputs back).  The
    f32 arithmetic chain carries a field-phase-correlated rounding
    bias of ~+1.6e-6 of the electron energy over a colliding_beams
    crossing (measured: +22.6 J with emission off, laser work ~0 —
    tools/ledger_closure.py --no-emission, r5); computing in f64 and
    rounding only the STORED state removes the bias (storage rounding
    is phase-uncorrelated), closing the mixed-precision ledger below
    1e-5.
    """
    out_dtype = x.dtype
    if compute_dtype is not None and compute_dtype != out_dtype:
        x = x.astype(compute_dtype)
        y = y.astype(compute_dtype)
        z = z.astype(compute_dtype)
        u = u.astype(compute_dtype)
        gamma = gamma.astype(compute_dtype)
        E = E.astype(compute_dtype)
        B = B.astype(compute_dtype)
    c = const.SPEED_OF_LIGHT
    v = c * u / gamma[:, None]

    # u_i = u_{i-1/2} + (q dt / 2 m c) (E + v x B)
    alpha = const.ELECTRON_CHARGE * dt / (2.0 * const.ELECTRON_MASS * c)
    u_half = u + alpha * (E + _cross(v, B))
    gamma_half = jnp.sqrt(1.0 + _dot(u_half, u_half))
    work = work + const.ELECTRON_CHARGE * c * _dot(u_half, E) * dt / gamma_half

    # quantum parameter from F.u at the half step
    chi = (
        jnp.sqrt(
            jnp.maximum(
                _dot(
                    gamma_half[:, None] * E + c * _cross(u_half, B),
                    gamma_half[:, None] * E + c * _cross(u_half, B),
                )
                - _dot(E, u_half) ** 2,
                0.0,
            )
        )
        / const.CRITICAL_FIELD
    )

    # cast: the rate's f64 lookup tables must not promote f32 state
    # (breaks the scan carry dtype when x64 is enabled)
    if classical_rates:
        tau = (tau - emission.classical_rate(chi, gamma_half) * dt).astype(
            tau.dtype
        )
    else:
        tau = (tau - emission.rate(chi, gamma_half) * dt).astype(tau.dtype)

    # u' = u_i + (q dt / 2 m c) E
    u_prime = u_half + alpha * E
    gamma_prime_sqd = 1.0 + _dot(u_prime, u_prime)

    tau_v = alpha * c * B  # the Vay paper's tau vector
    u_star = _dot(u_prime, tau_v)
    sigma = gamma_prime_sqd - _dot(tau_v, tau_v)
    gamma_new = jnp.sqrt(
        0.5 * sigma + jnp.sqrt(0.25 * sigma**2 + _dot(tau_v, tau_v) + u_star**2)
    )

    t_v = tau_v / gamma_new[:, None]
    s = 1.0 / (1.0 + _dot(t_v, t_v))
    u_new = s[:, None] * (
        u_prime + _dot(u_prime, t_v)[:, None] * t_v + _cross(u_prime, t_v)
    )

    prev_x = x
    dxi = c * u_new[:, 0] * dt / (dx * gamma_new)
    x_new = x + dxi
    # transverse positions advance with the *old* velocity, as in the
    # reference (electron.rs:315-316)
    y_new = y + v[:, 1] * dt
    z_new = z + v[:, 2] * dt

    cell, x_new, prev_x = _cell_fixup(cell, x_new, prev_x)
    if compute_dtype is not None and compute_dtype != out_dtype:
        # round only the STORED state; tau/work keep their own dtypes
        # (work is field-dtype under mixed precision)
        x_new = x_new.astype(out_dtype)
        prev_x = prev_x.astype(out_dtype)
        y_new = y_new.astype(out_dtype)
        z_new = z_new.astype(out_dtype)
        u_new = u_new.astype(out_dtype)
        gamma_new = gamma_new.astype(out_dtype)
        chi = chi.astype(out_dtype)
    return PushResult(cell, x_new, prev_x, y_new, z_new, u_new, gamma_new, chi, tau, work)


def boris_push(cell, x, y, z, u, charge, mass, E, B, dx, dt):
    """Boris push for an arbitrary charge/mass species
    (``ion.rs:168-214``; ``electron.rs:335-392``).

    Returns updated (cell, x, prev_x, y, z, u, gamma_m1, chi).  The
    Lorentz factor is handled as gamma - 1 computed cancellation-free
    (``ion.rs:85``), important for non-relativistic ions.  ``chi`` is
    evaluated at the rotation gamma, as the electron Boris push does;
    ion callers may discard it.
    """
    c = const.SPEED_OF_LIGHT
    cB = c * B
    alpha = charge * dt / (2.0 * mass * c)  # (N,)

    u_minus = u + alpha[:, None] * E
    um2 = _dot(u_minus, u_minus)
    gamma = 1.0 + um2 / (1.0 + jnp.sqrt(1.0 + um2))
    t = alpha / gamma
    u_prime = u_minus + t[:, None] * _cross(u_minus, cB)
    t_prime = 2.0 * t / (1.0 + t**2 * _dot(cB, cB))
    u_plus = u_minus + t_prime[:, None] * _cross(u_prime, cB)

    chi = (
        jnp.sqrt(
            jnp.maximum(
                _dot(
                    gamma[:, None] * E + _cross(u_plus, cB),
                    gamma[:, None] * E + _cross(u_plus, cB),
                )
                - _dot(E, u_plus) ** 2,
                0.0,
            )
        )
        / const.CRITICAL_FIELD
    )

    u_new = u_plus + alpha[:, None] * E
    un2 = _dot(u_new, u_new)
    gamma_m1 = un2 / (1.0 + jnp.sqrt(1.0 + un2))

    prev_x = x
    v = c * u_new / (1.0 + gamma_m1[:, None])
    x_new = x + v[:, 0] * dt / dx
    y_new = y + v[:, 1] * dt
    z_new = z + v[:, 2] * dt

    cell, x_new, prev_x = _cell_fixup(cell, x_new, prev_x)
    return cell, x_new, prev_x, y_new, z_new, u_new, gamma_m1, chi


def electron_chi(ux, uy, uz, gamma, E, B):
    """Instantaneous electron quantum parameter from the local fields:
    chi = |F.u| / (m c E_crit) with F the EM field tensor — the same
    invariant the Vay push evaluates at the half step
    (``electron.rs:283-285``), here from the full-step momentum.  Used
    to refresh the (stale) chi diagnostic of lite fused runs at output
    time; agrees with the per-step value to O(dt)."""
    c = const.SPEED_OF_LIGHT
    fx = gamma * E[:, 0] + c * (uy * B[:, 2] - uz * B[:, 1])
    fy = gamma * E[:, 1] + c * (uz * B[:, 0] - ux * B[:, 2])
    fz = gamma * E[:, 2] + c * (ux * B[:, 1] - uy * B[:, 0])
    eu = E[:, 0] * ux + E[:, 1] * uy + E[:, 2] * uz
    return (
        jnp.sqrt(jnp.maximum(fx * fx + fy * fy + fz * fz - eu * eu, 0.0))
        / const.CRITICAL_FIELD
    )


def photon_chi(k, E, B):
    """Instantaneous photon quantum parameter from the local fields
    (``photon.rs:165-176``).  ``k`` in units of m_e c."""
    c = const.SPEED_OF_LIGHT
    k0 = jnp.sqrt(jnp.maximum(_dot(k, k), 1.0e-300))
    return (
        jnp.sqrt(
            jnp.maximum(
                _dot(
                    k0[:, None] * E + c * _cross(k, B),
                    k0[:, None] * E + c * _cross(k, B),
                )
                - _dot(E, k) ** 2,
                0.0,
            )
        )
        / const.CRITICAL_FIELD
    )


def photon_push(cell, x, y, z, k, E, B, dx, dt):
    """Ballistic photon push with chi update (``photon.rs:150-183``).

    ``k`` is the photon momentum in units of m_e c.  Returns updated
    (cell, x, prev_x, y, z, chi).  Pass ``E = B = None`` to skip the
    chi update (chi is returned as None): with the absorption pass off
    chi has no physics consumer during stepping and is refreshed
    lazily at output time (``Simulation.refresh_photon_chi``).
    """
    c = const.SPEED_OF_LIGHT
    k0 = jnp.sqrt(jnp.maximum(_dot(k, k), 1.0e-300))
    v = c * k / k0[:, None]

    chi = None if E is None else photon_chi(k, E, B)

    prev_x = x
    x_new = x + v[:, 0] * dt / dx
    y_new = y + v[:, 1] * dt
    z_new = z + v[:, 2] * dt

    cell, x_new, prev_x = _cell_fixup(cell, x_new, prev_x)
    return cell, x_new, prev_x, y_new, z_new, chi
