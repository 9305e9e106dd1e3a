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
_PREF = (2.0 * math.pi * const.CLASSICAL_ELECTRON_RADIUS) ** 2 / const.ALPHA_FINE


def _scaled_cross_section(k, p, chi_gamma, chi_e, sign):
    """Common kernel; ``sign`` is +1 for absorption, -1 for stimulated
    emission (which replaces chi_e + chi_gamma by chi_e - chi_gamma)."""
    k0, kx, ky, kz = k[..., 0], k[..., 1], k[..., 2], k[..., 3]
    p0, px, py, pz = p[..., 0], p[..., 1], p[..., 2], p[..., 3]

    chi_sum = chi_e + sign * chi_gamma
    denom = jnp.maximum(chi_e * chi_sum, _TINY)
    g = 0.5 + 0.25 * chi_gamma**2 / denom
    z = (jnp.maximum(chi_gamma, _TINY) / denom) ** (2.0 / 3.0)
    k_p = k0 * p0 - kx * px - ky * py - kz * pz
    zbar = 2.0 * z * chi_e * k_p / jnp.maximum(chi_gamma, _TINY)
    # k0 p0 form guarantees positivity (photon_absorption.rs:26)
    zbar_z = 2.0 * p0 * k_p / jnp.maximum(k0, _TINY)

    ai, ai_valid = airy_ai(zbar)
    sigma = (
        _PREF
        * chi_e
        * z
        * (4.0 * g * zbar_z - 1.0)
        * ai
        / jnp.maximum(chi_gamma * k0 * p0, _TINY)
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
