"""Airy function Ai(x) for real non-negative argument, vectorized.

Same piecewise scheme as the reference (``src/qed/special_functions/
airy.rs:19-69``): Taylor series for x < 1, then generalized
Gauss-Laguerre quadrature of the integral representation with 40/16/4
nodes for x < 2 / 10 / 50.  Beyond 50 (Ai < 4.5e-104) or below 0 the
result is flagged invalid and returned as 0.0.

Unlike the reference, nothing here is hand-tabulated: the Taylor
coefficients come from the standard Maclaurin series of Ai and the
quadrature rules from ``scipy.special.roots_genlaguerre`` (weight
``t**(-1/6) * exp(-t)``), both computed once at import.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from scipy.special import roots_genlaguerre


def _taylor_coefficients(terms: int = 14) -> tuple[np.ndarray, np.ndarray]:
    """Maclaurin series of Ai: alpha * f(x) + beta * g(x) with
    f = sum 3^k (1/3)_k x^(3k) / (3k)!,  g = sum 3^k (2/3)_k x^(3k+1) / (3k+1)!.
    """
    alpha = 3.0 ** (-2.0 / 3.0) / math.gamma(2.0 / 3.0)  # Ai(0)
    beta = -(3.0 ** (-1.0 / 3.0)) / math.gamma(1.0 / 3.0)  # Ai'(0)
    coeffs, powers = [], []
    af, ag = alpha, beta
    for k in range(terms):
        coeffs.append(af)
        powers.append(3 * k)
        coeffs.append(ag)
        powers.append(3 * k + 1)
        # recurrences: term_{k+1}/term_k = x^3 / ((3k+2)(3k+3)) for f,
        # x^3 / ((3k+3)(3k+4)) for g
        af = af / ((3 * k + 2) * (3 * k + 3))
        ag = ag / ((3 * k + 3) * (3 * k + 4))
    return np.asarray(coeffs), np.asarray(powers, dtype=np.int32)


_TAYLOR_A, _TAYLOR_N = _taylor_coefficients()

# Quadrature scale factor a(x) = s^(-1/6) e^(-s) / (sqrt(pi) 48^(1/6) Gamma(5/6))
_SCALE = 1.0 / (math.sqrt(math.pi) * 48.0 ** (1.0 / 6.0) * math.gamma(5.0 / 6.0))

_GL_NODES = {}
_GL_WEIGHTS = {}
for _n in (40, 16, 4):
    _x, _w = roots_genlaguerre(_n, -1.0 / 6.0)
    _GL_NODES[_n] = np.asarray(_x)
    _GL_WEIGHTS[_n] = np.asarray(_w)


def _quadrature(x, n: int):
    """Ai(x) = a(x) * sum_i w_i (2 + t_i/s)^(-1/6), s = 2 x^1.5 / 3."""
    s = 2.0 * x**1.5 / 3.0
    a = _SCALE * s ** (-1.0 / 6.0) * jnp.exp(-s)
    nodes = jnp.asarray(_GL_NODES[n])
    weights = jnp.asarray(_GL_WEIGHTS[n])
    integrand = (2.0 + nodes / s[..., None]) ** (-1.0 / 6.0)
    return a * jnp.sum(weights * integrand, axis=-1)


def airy_ai(x):
    """Ai(x) for x >= 0; returns ``(value, valid)``.

    ``valid`` is False outside [0, 50); the value there is 0.0 (which is
    also the physically correct limit for the absorption cross section,
    where Ai underflow means "no interaction").
    """
    x = jnp.asarray(x)
    # Clamp per-branch inputs so unselected branches stay finite.
    x_t = jnp.clip(x, 0.0, 1.0)
    taylor = jnp.sum(
        jnp.asarray(_TAYLOR_A) * x_t[..., None] ** jnp.asarray(_TAYLOR_N), axis=-1
    )
    q40 = _quadrature(jnp.clip(x, 1.0, 2.0), 40)
    q16 = _quadrature(jnp.clip(x, 2.0, 10.0), 16)
    q4 = _quadrature(jnp.clip(x, 10.0, 50.0), 4)

    value = jnp.where(
        x < 1.0, taylor, jnp.where(x < 2.0, q40, jnp.where(x < 10.0, q16, q4))
    )
    valid = (x >= 0.0) & (x < 50.0)
    return jnp.where(valid, value, 0.0), valid
