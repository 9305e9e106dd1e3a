"""Charge-conserving current deposition.

Maps macroparticle motion onto grid currents: the longitudinal current
``jx`` via the flux (Esirkepov-style) form that exactly satisfies the
discrete continuity equation, and the transverse currents / charge
density via b-spline weighting (reference: ``src/grid/yee.rs:551-641``).

TPU mapping: the reference's per-thread private arrays with a serial
reduction become a single batched scatter-add per component — XLA
lowers this to a deterministic sorted scatter.  A faster Pallas
replicated-bin kernel can be swapped in behind the same interface.

Parity notes (deliberate bug-for-bug reproduction of the reference):

* ``yee.rs:597/602`` adds a ``weight(2 + x)`` contribution of j_perp at
  ``index+2``; for x in [0, 1) that weight is identically zero, so the
  term is simply omitted here.  (The physically complete stencil would
  use ``weight(2 - x)`` — the reference under-deposits j_perp for
  x > 1/2, and we reproduce that.)
* ``yee.rs:609`` deposits the charge-density weight ``weight(2 - x)``
  at ``index-2`` (rather than ``index+2``); reproduced as-is.
"""

from __future__ import annotations

import jax.numpy as jnp

from .interp import flux, weight


def deposit(J, rho, idx, x, prev_x, macrocharge, velocity, dx, dt):
    """Accumulate one species' contribution into slab arrays.

    Parameters
    ----------
    J : (n, 3) current density slab (modified copy returned)
    rho : (n,) charge density slab
    idx : (N,) per-particle slab array index of its cell
    x, prev_x : (N,) fractional offsets in the cell at t and t - dt
    macrocharge : (N,) weight * charge; 0 for dead particles
    velocity : (N, 3) particle velocity (SI)
    """
    # --- jx: flux through the five cell-centre boundaries ---------------
    jx_idx = []
    jx_val = []
    for off in (-2, -1, 0, 1, 2):
        b = off + 0.5
        jx_idx.append(idx + off)
        jx_val.append(macrocharge * flux(b - prev_x, b - x) / dt)

    # --- j_perp and rho: b-spline weights -------------------------------
    w_m1 = weight(1.0 + x)
    w_0 = weight(x)
    w_p1 = weight(1.0 - x)
    w_m2q = weight(2.0 - x)  # the reference's index-2 rho quirk

    jy_idx = [idx - 1, idx, idx + 1]
    jperp_w = [w_m1, w_0, w_p1]

    vy = velocity[:, 1]
    vz = velocity[:, 2]

    J = J.at[jnp.concatenate(jx_idx), 0].add(jnp.concatenate(jx_val))
    J = J.at[jnp.concatenate(jy_idx), 1].add(
        jnp.concatenate([macrocharge * vy * w / dx for w in jperp_w])
    )
    J = J.at[jnp.concatenate(jy_idx), 2].add(
        jnp.concatenate([macrocharge * vz * w / dx for w in jperp_w])
    )
    rho = rho.at[jnp.concatenate(jy_idx + [idx - 2])].add(
        jnp.concatenate([macrocharge * w / dx for w in jperp_w + [w_m2q]])
    )
    return J, rho
