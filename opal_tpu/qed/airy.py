"""Airy function Ai(x) for real non-negative argument, vectorized.

Same piecewise intervals as the reference (``src/qed/special_functions/
airy.rs:19-69``): Taylor series for x < 1, then the generalized
Gauss-Laguerre quadrature of the integral representation with 40/16/4
nodes for x < 2 / 10 / 50.  Beyond 50 (Ai < 4.5e-104) or below 0 the
result is flagged invalid and returned as 0.0.

Unlike the reference, nothing here is hand-tabulated: the Taylor
coefficients come from the standard Maclaurin series of Ai and the
quadrature rules from ``scipy.special.roots_genlaguerre``, both
computed once at import.

Evaluation strategy (matters at scale): the absorption pass calls this
on (n_photons, candidates)-shaped tensors every step.  Broadcasting
``x[..., None] ** powers`` against the node/term axis materializes
(n, B, 40)-shaped intermediates full of transcendental ``pow`` ops —
13 GB per op at bench scale (measured via tools/hlo_stats.py --qed).
Instead:

* the Taylor branch runs two Horner chains in y = x^3 (exact
  restructuring of the series, whose terms only occupy powers 3k and
  3k+1);
* each quadrature branch's node sum I(s) = sum_i w_i (2 + t_i/s)^(-1/6)
  is replaced by a Chebyshev fit in log(s), computed at import from
  the quadrature rule itself and evaluated by the Clenshaw recurrence.
  Fit residuals are ~3e-15 relative (degree 12/16/16), far inside the
  1e-12 agreement the tests require, and the evaluation carries only
  (n, B)-shaped values.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from scipy.special import roots_genlaguerre


def _taylor_coefficients(terms: int = 14) -> tuple[np.ndarray, np.ndarray]:
    """Maclaurin series of Ai split into the y = x^3 Horner chains:
    Ai(x) = f(y) + x g(y),  f = sum fk y^k,  g = sum gk y^k."""
    alpha = 3.0 ** (-2.0 / 3.0) / math.gamma(2.0 / 3.0)  # Ai(0)
    beta = -(3.0 ** (-1.0 / 3.0)) / math.gamma(1.0 / 3.0)  # Ai'(0)
    fk, gk = [], []
    af, ag = alpha, beta
    for k in range(terms):
        fk.append(af)
        gk.append(ag)
        # recurrences: term_{k+1}/term_k = x^3 / ((3k+2)(3k+3)) for f,
        # x^3 / ((3k+3)(3k+4)) for g
        af = af / ((3 * k + 2) * (3 * k + 3))
        ag = ag / ((3 * k + 3) * (3 * k + 4))
    return np.asarray(fk), np.asarray(gk)


_TAYLOR_F, _TAYLOR_G = (
    tuple(float(c) for c in a) for a in _taylor_coefficients()
)

# Quadrature scale factor a(x) = s^(-1/6) e^(-s) / (sqrt(pi) 48^(1/6) Gamma(5/6))
_SCALE = 1.0 / (math.sqrt(math.pi) * 48.0 ** (1.0 / 6.0) * math.gamma(5.0 / 6.0))


def _fit_branch(x_lo: float, x_hi: float, n: int, deg: int):
    """Chebyshev coefficients (in u = affine(log s)) of the n-node
    generalized Gauss-Laguerre sum I(s), plus the u-map (a, b)."""
    t, w = roots_genlaguerre(n, -1.0 / 6.0)
    xs = np.linspace(x_lo, x_hi, 16 * (deg + 1))
    s = 2.0 * xs**1.5 / 3.0
    target = (w * (2.0 + t / s[:, None]) ** (-1.0 / 6.0)).sum(-1)
    ls = np.log(s)
    a, b = ls.min(), ls.max()
    u = 2.0 * (ls - a) / (b - a) - 1.0
    coef = np.polynomial.chebyshev.chebfit(u, target, deg)
    # plain-float coefficients: Python floats are weak-typed in JAX, so
    # the evaluation below inherits the INPUT's dtype (f32 stays f32 —
    # numpy f64 scalars would promote the whole chain to f64, which on
    # TPU means emulated arithmetic and a Mosaic lowering failure when
    # called inside a Pallas kernel)
    return tuple(float(c) for c in coef), float(a), float(b)


_BRANCHES = (
    (1.0, 2.0) + _fit_branch(1.0, 2.0, 40, 12),
    (2.0, 10.0) + _fit_branch(2.0, 10.0, 16, 16),
    (10.0, 50.0) + _fit_branch(10.0, 50.0, 4, 16),
)


def _clenshaw(u, coef):
    """Chebyshev series at u via the Clenshaw recurrence; u is any
    array, coef a host-side tuple of plain floats (weak-typed)."""
    b1 = jnp.zeros_like(u)
    b2 = jnp.zeros_like(u)
    for c in coef[:0:-1]:
        b1, b2 = 2.0 * u * b1 - b2 + c, b1
    return u * b1 - b2 + coef[0]


def airy_ai(x):
    """Ai(x) for x >= 0; returns ``(value, valid)``.

    ``valid`` is False outside [0, 50); the value there is 0.0 (which is
    also the physically correct limit for the absorption cross section,
    where Ai underflow means "no interaction").
    """
    x = jnp.asarray(x)

    # Taylor branch: two Horner chains in y = x^3.
    x_t = jnp.clip(x, 0.0, 1.0)
    y = x_t * x_t * x_t
    f = jnp.zeros_like(x_t)
    g = jnp.zeros_like(x_t)
    for fk, gk in zip(_TAYLOR_F[::-1], _TAYLOR_G[::-1]):  # weak floats
        f = f * y + fk
        g = g * y + gk
    taylor = f + x_t * g

    # Quadrature branches: a(x) * I(s) with I via Clenshaw in log s.
    # s, log s and the prefactor are branch-independent for any x
    # inside a branch's range, so the sqrt/log/exp transcendentals run
    # ONCE over the clipped quadrature domain instead of once per
    # branch (the absorption walk evaluates this on (photons, B)
    # tensors twice per pair every step; 9 transcendentals -> 3).
    x_q = jnp.clip(x, 1.0, 50.0)
    s_q = 2.0 * x_q * jnp.sqrt(x_q) / 3.0
    ls_q = jnp.log(s_q)
    pref_q = _SCALE * jnp.exp(-s_q - ls_q / 6.0)
    value = taylor
    for x_lo, x_hi, coef, a, b in _BRANCHES:
        u = 2.0 * (ls_q - a) / (b - a) - 1.0
        value = jnp.where(x < x_lo, value, pref_q * _clenshaw(u, coef))

    valid = (x >= 0.0) & (x < 50.0)
    return jnp.where(valid, value, 0.0), valid
