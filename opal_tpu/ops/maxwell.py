"""1D Yee/FDTD field advance on a device-local slab.

Explicit second-order finite-difference time-domain update of
Maxwell's equations (reference: ``src/grid/yee.rs:839-867``), written
as vectorized slab operations under jit.  A slab is the device's owned
cells bracketed by halo cells; the timestep sequence is
B(dt/2), E(dt), B(dt/2) (``yee.rs:345-349``).

The Silver-Müller absorber is applied at slab index 0 unconditionally —
exactly as the reference applies it to every rank's local cell 0
(``yee.rs:853-858``): on internal devices that cell is a halo cell
whose value is overwritten at the next exchange, so the absorber only
"sticks" where cell 0 is a genuine laser boundary.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as const


def advance_b(E, B, dt, dx):
    """Half/full B advance: B_y += dt d_x E_z, B_z -= dt d_x E_y over
    cells [0, n-1); the last cell is left untouched (``yee.rs:839-848``).
    """
    dEy = E[1:, 1] - E[:-1, 1]
    dEz = E[1:, 2] - E[:-1, 2]
    By = B[:-1, 1] + dt * dEz / dx
    Bz = B[:-1, 2] - dt * dEy / dx
    B = B.at[:-1, 1].set(By)
    B = B.at[:-1, 2].set(Bz)
    return B


def advance_e(E, B, J, dt, dx, sm_mask):
    """Full E advance (``yee.rs:852-866``).

    ``sm_mask`` is a per-slab-cell boolean selecting where the
    Silver-Müller outgoing-wave update replaces the regular stencil.
    The caller sets it True at the global extended cell 0 when the left
    boundary is a laser injector, and always at slab index 0 (a halo
    cell whose value is overwritten at the next exchange — the same
    role the reference's ghost cell 0 plays on every rank).
    """
    c = const.SPEED_OF_LIGHT
    c2 = const.SPEED_OF_LIGHT_SQD
    eps0 = const.VACUUM_PERMITTIVITY

    kappa = 2.0 * c * dt / (c * dt + dx)
    sigma = 1.0 - kappa
    sm = jnp.stack(
        [
            jnp.zeros_like(E[:, 0]),
            sigma * E[:, 1] - c * kappa * B[:, 2],
            sigma * E[:, 2] + c * kappa * B[:, 1],
        ],
        axis=-1,
    )

    B_left = jnp.roll(B, 1, axis=0)  # index 0 wraps; masked by sm below
    Ex = E[:, 0] - dt * J[:, 0] / eps0
    Ey = E[:, 1] + dt * c2 * (B_left[:, 2] - B[:, 2]) / dx - dt * J[:, 1] / eps0
    Ez = E[:, 2] + dt * c2 * (B[:, 1] - B_left[:, 1]) / dx - dt * J[:, 2] / eps0
    regular = jnp.stack([Ex, Ey, Ez], axis=-1)

    return jnp.where(sm_mask[:, None], sm, regular)


def advance(E, B, J, dt, dx, sm_mask):
    """One full field step: B(dt/2), E(dt), B(dt/2)."""
    B = advance_b(E, B, 0.5 * dt, dx)
    E = advance_e(E, B, J, dt, dx, sm_mask)
    B = advance_b(E, B, 0.5 * dt, dx)
    return E, B


def smooth_currents(J_slab, rho_slab, alpha):
    """Bilinear (three-point) filter of charge and current density,
    suppressing the Nyquist-frequency signal (``yee.rs:871-888``):

        j_i <- alpha j_i + (1 - alpha) (j_{i-1} + j_{i+1}) / 2

    Operates on halo-extended slabs so every owned cell sees true
    neighbours; the outermost slab cells keep their value (as the
    reference leaves its array ends untouched).  The reference filters
    j only; rho is passed through for a matching interface.
    """
    blend = lambda a: alpha * a[1:-1] + 0.5 * (1.0 - alpha) * (a[:-2] + a[2:])
    J = J_slab.at[1:-1].set(blend(J_slab))
    return J, rho_slab
