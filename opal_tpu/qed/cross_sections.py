"""Binary-interaction cross sections: one-photon absorption
(``gamma + e -> e``) and stimulated emission
(``gamma + e -> e + 2 gamma``) in a background field.

Vectorized forms of the reference's scaled cross sections
(``src/qed/photon_absorption.rs:17-35``,
``src/qed/stimulated_emission.rs:18-38``).  Each returns
``(sigma, valid)`` where ``valid`` replaces the reference's
``Option``: invalid pairs (non-positive chi, kinematically forbidden
stimulated emission, Airy out of range) yield sigma = 0.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .. import constants as const
from .airy import airy_ai

_TINY = 1.0e-300
#: 1e-300 underflows to 0.0 in f32 (the mixed-precision state dtype and
#: the Pallas in-kernel dtype), defeating the divide guards


def _tiny(dtype):
    return 1.0e-37 if dtype == jnp.float32 else _TINY


_PREF = (2.0 * math.pi * const.CLASSICAL_ELECTRON_RADIUS) ** 2 / const.ALPHA_FINE


def _scaled_cross_section(k, p, chi_gamma, chi_e, sign):
    """Common kernel; ``sign`` is +1 for absorption, -1 for stimulated
    emission (which replaces chi_e + chi_gamma by chi_e - chi_gamma)."""
    k0, kx, ky, kz = k[..., 0], k[..., 1], k[..., 2], k[..., 3]
    p0, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    tiny = _tiny(jnp.asarray(k0).dtype)

    chi_sum = chi_e + sign * chi_gamma
    denom = jnp.maximum(chi_e * chi_sum, tiny)
    g = 0.5 + 0.25 * chi_gamma**2 / denom
    z = (jnp.maximum(chi_gamma, tiny) / denom) ** (2.0 / 3.0)
    k_p = k0 * p0 - kx * px - ky * py - kz * pz
    zbar = 2.0 * z * chi_e * k_p / jnp.maximum(chi_gamma, tiny)
    # k0 p0 form guarantees positivity (photon_absorption.rs:26)
    zbar_z = 2.0 * p0 * k_p / jnp.maximum(k0, tiny)

    ai, ai_valid = airy_ai(zbar)
    sigma = (
        _PREF
        * chi_e
        * z
        * (4.0 * g * zbar_z - 1.0)
        * ai
        / jnp.maximum(chi_gamma * k0 * p0, tiny)
    )
    base_valid = (chi_e > 0.0) & (chi_gamma > 0.0) & ai_valid
    if sign < 0:
        # Electron cannot emit a photon with more energy than itself
        # (stimulated_emission.rs:20).
        base_valid = base_valid & (chi_gamma < chi_e) & (k0 < p0)
    return jnp.where(base_valid, sigma, 0.0), base_valid


def photon_absorption(k, p, chi_gamma, chi_e):
    """Scaled absorption cross section: sigma * k.p / (k0 p0).

    ``k``/``p`` are normalized four-momenta with shape (..., 4).  The
    absorption probability is ``P = w_e (c dt / dx) * sigma``.
    """
    return _scaled_cross_section(k, p, chi_gamma, chi_e, +1)


def stimulated_emission(k, p, chi_gamma, chi_e):
    """Scaled stimulated-emission cross section, same convention."""
    return _scaled_cross_section(k, p, chi_gamma, chi_e, -1)


def pair_cross_sections(k, p, chi_gamma, chi_e):
    """Both scaled cross sections for one pair, sharing the
    kinematic invariants (k.p, the k0 p0 positivity form and the
    common denominator guards) between them — the absorption walk
    evaluates both on every (photon, candidate) pair per step, and
    only the chi_e +- chi_gamma dependent factors (incl. the Airy
    argument) differ.  Returns ``(sigma_abs, sigma_st)``; each is 0
    where its branch is invalid (same semantics as the separate
    functions up to float reassociation)."""
    k0, kx, ky, kz = k[..., 0], k[..., 1], k[..., 2], k[..., 3]
    p0, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    tiny = _tiny(jnp.asarray(k0).dtype)
    k_p = k0 * p0 - kx * px - ky * py - kz * pz
    zbar_z = 2.0 * p0 * k_p / jnp.maximum(k0, tiny)
    chig_safe = jnp.maximum(chi_gamma, tiny)
    twoz_chi = 2.0 * chi_e * k_p / chig_safe  # zbar = z * this
    inv_k0p0 = _PREF * chi_e / jnp.maximum(chi_gamma * k0 * p0, tiny)

    out = []
    for sign in (1.0, -1.0):
        chi_sum = chi_e + sign * chi_gamma
        denom = jnp.maximum(chi_e * chi_sum, tiny)
        g = 0.5 + 0.25 * chi_gamma**2 / denom
        z = (chig_safe / denom) ** (2.0 / 3.0)
        ai, ai_valid = airy_ai(z * twoz_chi)
        sigma = z * (4.0 * g * zbar_z - 1.0) * ai * inv_k0p0
        valid = (chi_e > 0.0) & (chi_gamma > 0.0) & ai_valid
        if sign < 0:
            valid = valid & (chi_gamma < chi_e) & (k0 < p0)
        out.append(jnp.where(valid, sigma, 0.0))
    return out[0], out[1]
