"""Quantum synchrotron emission (nonlinear Compton scattering).

Vectorized rates and inverse-CDF spectrum sampling for
``e -> e + gamma`` in a strong background field, following the
reference's algorithm (``src/qed/photon_emission.rs``) with every
data-dependent branch rewritten as masked selects so the whole sampler
runs inside ``jit`` over a particle batch.

Differences from the reference, by design:

* CDF inversion is fixed-count bisection (see :mod:`.pwmci`), not
  Brent iteration — identical results to well below table accuracy.
* For chi > 100 the reference aborts (``photon_emission.rs:144``);
  here chi is clamped to the last tabulated value, keeping the step
  total and shape-stable.  Rates above chi = 100 still use the
  asymptotic fit.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import constants as const
from . import pwmci
from . import tables_data as T

_SQRT3 = math.sqrt(3.0)
_TINY = 1.0e-300
#: guard epsilon by dtype: the f64 literal underflows to 0.0 when cast
#: to f32, defeating the log(0)/divide-by-zero guards
_TINY32 = 1.0e-37


def _tiny(dtype) -> float:
    return _TINY32 if dtype == jnp.float32 else _TINY


def _pick(vec, tidx, dtype):
    """Per-query fetch from a tiny (T,) vector.

    f32 queries are gather-free (random gathers are latency-bound on
    TPU even from small tables — the XLA lowering does not exploit
    table size): a piecewise-constant step expansion
    v[t] = v[0] + sum_k (v[k] - v[k-1]) * (t >= k) fuses into ONE
    elementwise kernel over the query shape, with no (n, T)
    intermediate (the earlier one-hot mul-sum materialized one).
    f64 queries keep exact advanced indexing.
    """
    if dtype == jnp.float32:
        v = np.asarray(vec, np.float32)
        out = jnp.full(tidx.shape, v[0], jnp.float32)
        for k in range(1, v.shape[0]):
            # exactly one term fires per query: bitwise-exact fetch
            out = jnp.where(tidx == k, v[k], out)
        return out
    return jnp.asarray(np.asarray(vec))[tidx]

# NOTE: all module-level tables stay host-side numpy: inside jit they
# become HLO constants at trace time.  Eager jnp arrays here would be
# closure-captured device buffers, which permanently degrade dispatch
# on remote-attached TPUs (see pwmci.prepare).
_H_LN_CHI = np.ascontiguousarray(T.LN_H_CHI_TABLE[:, 0])
_H_LN_H = np.ascontiguousarray(T.LN_H_CHI_TABLE[:, 1])

_QUANTUM_PREP = pwmci.prepare(T.QUANTUM_CDF_TABLE)
_Q_COEFF = np.ascontiguousarray(T.QUANTUM_CDF_COEFF)
_Q_POWER = np.ascontiguousarray(T.QUANTUM_CDF_POWER)

_Y_PREP = pwmci.prepare(T.Y_CDF_TABLE)
_Y_COEFF = np.ascontiguousarray(T.Y_CDF_COEFF)
_Y_POWER = np.ascontiguousarray(T.Y_CDF_POWER)

_Y_INF_PREP = pwmci.prepare(T.Y_INF_TABLE[None])
_Y_INF_COEFF = T.Y_INF_COEFF
_Y_INF_POWER = T.Y_INF_POWER

_CLASSICAL_PREP = pwmci.prepare(T.CLASSICAL_SPECTRUM_TABLE[None])


def rate(chi, gamma):
    """Quantum synchrotron emission rate per unit (lab) time, 1/s.

    Piecewise h(chi): analytic for chi < 0.01, log-log table
    interpolation for 0.01 <= chi < 100, rational fit beyond
    (reference: ``photon_emission.rs:59-79``).
    """
    chi = jnp.asarray(chi)
    chi_safe = jnp.maximum(chi, _tiny(chi.dtype))

    h_small = (5.0 * math.pi / 3.0) * (1.0 - 8.0 * chi / (5.0 * _SQRT3))

    cbrt2 = jnp.cbrt(jnp.maximum(chi, 100.0)) ** 2
    h_large = -1019.4661473121777 + 1786.716527650374 * cbrt2
    h_large = 1750.6263395722715 + cbrt2 * h_large
    h_large = -2260.1819695887225 + jnp.cbrt(jnp.maximum(chi, 100.0)) * h_large
    h_large = 0.00296527643253334 * h_large / jnp.maximum(chi, 100.0) ** 2

    # float() keeps the anchor weak-typed: a numpy f64 scalar would
    # promote f32 chi (the mixed-precision state dtype) to f64 — on
    # TPU that silently runs the whole chain in emulated f64
    index = (jnp.log(chi_safe) - float(_H_LN_CHI[0])) / T.DELTA_LN_CHI
    index = jnp.clip(index, 0.0, _H_LN_CHI.shape[0] - 1.0 - 1e-12)
    if chi.dtype == jnp.float32:
        # gather-free EXACT linear interpolation as a relu-kink
        # expansion: a piecewise-linear table over uniform knots is
        # f(x) = H0 + s0 x + sum_k (s_k - s_{k-1}) relu(x - k).  The
        # 40 terms fuse into ONE elementwise kernel over (n,) — the
        # earlier hat-weight formulation materialized (n, 41) tensors
        # (~430 MB/step at 2.6M electrons in the compiled QED step,
        # since the tau decrement evaluates this for every electron
        # every step); a random gather is latency-bound on TPU.
        ln_h = np.float32(_H_LN_H[0]) + np.float32(
            _H_LN_H[1] - _H_LN_H[0]
        ) * index
        slopes = np.diff(_H_LN_H)
        for k, dk in enumerate(np.diff(slopes), start=1):
            ln_h = ln_h + np.float32(dk) * jnp.maximum(
                index - np.float32(k), 0.0
            )
    else:
        lo = jnp.clip(
            jnp.floor(index).astype(jnp.int32), 0, _H_LN_CHI.shape[0] - 2
        )
        w = index - lo
        h_ln_h = jnp.asarray(_H_LN_H)  # trace-time constant
        ln_h = (1.0 - w) * h_ln_h[lo] + w * h_ln_h[lo + 1]
    h_mid = jnp.exp(ln_h)

    h = jnp.where(chi < 0.01, h_small, jnp.where(chi >= 100.0, h_large, h_mid))
    return (
        _SQRT3
        * const.ALPHA_FINE
        * chi
        * h
        / (2.0 * math.pi * gamma * const.COMPTON_TIME)
    )


def classical_rate(chi, gamma):
    """Classical synchrotron rate, 1/s (``photon_emission.rs:82-85``)."""
    h = 5.0 * math.pi / 3.0
    return (
        _SQRT3
        * const.ALPHA_FINE
        * jnp.asarray(chi)
        * h
        / (2.0 * math.pi * gamma * const.COMPTON_TIME)
    )


def _invert_quantum_cdf(tidx, ln_r):
    """ln(u) such that cdf(ln u; chi_tidx) = ln_r, with the power-law
    continuation below the table and clipping above
    (``photon_emission.rs:149-164``)."""
    dt_ = jnp.asarray(ln_r).dtype
    coeff = _pick(_Q_COEFF, tidx, dt_)
    power = _pick(_Q_POWER, tidx, dt_)
    first_f = _pick(_QUANTUM_PREP.f[:, 0], tidx, dt_)
    last_x = _pick(_QUANTUM_PREP.x[:, -1], tidx, dt_)
    powerlaw = (ln_r - jnp.log(coeff)) / power
    inv, ok = pwmci.invert(_QUANTUM_PREP, tidx, ln_r)
    return jnp.where(ln_r <= first_f, powerlaw, jnp.where(ok, inv, last_x))


def _from_linear_cdf_table(global_zero, local_zero, rand, prep, tidx, coeff, power):
    """Sample y > local_zero from a CDF tabulated on global_zero < y < inf
    (``photon_emission.rs:87-121``), vectorized with masked branches."""
    dt_ = jnp.asarray(local_zero).dtype
    first_x = _pick(prep.x[:, 0], tidx, dt_)
    first_f = _pick(prep.f[:, 0], tidx, dt_)

    # r_zero = cdf(local_zero)
    diff = jnp.maximum(local_zero - global_zero, 0.0)
    r_zero_pl = coeff * diff**power
    ev, ev_ok = pwmci.evaluate(prep, tidx, local_zero)
    below = local_zero < first_x
    r_zero = jnp.where(below, r_zero_pl, ev)
    # local_zero beyond the table end: return local_zero unchanged
    early_out = jnp.logical_and(~below, ~ev_ok)

    r = r_zero + (1.0 - r_zero) * rand
    y_pl = jnp.exp(
        (jnp.log(jnp.maximum(r, _tiny(dt_))) - jnp.log(coeff)) / power
    ) + global_zero
    inv, inv_ok = pwmci.invert(prep, tidx, r)
    y = jnp.where(r <= first_f, y_pl, jnp.where(inv_ok, inv, local_zero))
    return jnp.where(early_out, local_zero, y)


def _angle_from_z(z, gamma):
    """Polar emission angle from the scaled variable z
    (``photon_emission.rs:198-199``), with the reference's NaN -> 1
    handling of cos(theta)."""
    denom = jnp.sqrt(jnp.maximum(gamma**2 - 1.0, _tiny(jnp.asarray(gamma).dtype)))
    cos_theta = (gamma - z ** (2.0 / 3.0) / (2.0 * gamma)) / denom
    cos_theta = jnp.where(jnp.isnan(cos_theta), 1.0, cos_theta)
    return jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0))


def classical_sample(chi, gamma, rand1, rand2, rand3):
    """Sample the classical synchrotron spectrum
    (``photon_emission.rs:264-292``).

    Returns ``(omega_mc2, theta, cphi)``.  Note the classical photon
    energy is *not* bounded by the electron energy.
    """
    chi = jnp.asarray(chi)
    rand2 = jnp.asarray(rand2)
    tiny = _tiny(chi.dtype)
    arg = (-9.0 + 50.0 * rand2 - 25.0 * rand2**2) / 16.0
    delta = jnp.arccos(jnp.clip(arg, -1.0, 1.0))
    denom = jnp.maximum(5.0 * (1.0 - rand2), tiny)
    z = ((2.0 + 4.0 * jnp.cos(delta / 3.0)) / denom) ** 3

    ln_rand = jnp.log(jnp.maximum(rand1, tiny))
    x_small = 1.020377255 * jnp.asarray(rand1) ** 0.6
    inv, ok = pwmci.invert(_CLASSICAL_PREP, jnp.zeros_like(ln_rand, dtype=jnp.int32), ln_rand)
    # float(): numpy f64 scalars are strong-typed and would promote the
    # f32 (mixed-precision) sampling chain to emulated f64 on TPU
    last_ln_x = float(_CLASSICAL_PREP.x[0, -1])
    x = jnp.where(
        ln_rand < float(_CLASSICAL_PREP.f[0, 0]),
        x_small,
        jnp.exp(jnp.where(ok, inv, last_ln_x)),
    )

    u = 3.0 * chi * x / (2.0 * jnp.maximum(z, tiny))
    omega_mc2 = u * gamma
    theta = _angle_from_z(z, gamma)
    return omega_mc2, theta, 2.0 * math.pi * jnp.asarray(rand3)


def sample(chi, gamma, rand1, rand2, rand3):
    """Sample the angularly resolved quantum synchrotron spectrum
    (``photon_emission.rs:129-203``).

    Returns ``(omega_mc2, theta, cphi)`` — photon energy in units of
    m_e c^2, polar angle w.r.t. the electron momentum in [0, pi], and
    azimuth in [0, 2 pi).  Fully vectorized; chi below the table uses
    the classical sampler with the QED energy correction.
    """
    chi = jnp.asarray(chi)
    gamma = jnp.asarray(gamma)
    tiny = _tiny(chi.dtype)
    chi_safe = jnp.maximum(chi, tiny)
    ln_chi = jnp.log(chi_safe)

    # ---- quantum branch: u from r1 = cdf(u; chi) ----------------------
    index = (ln_chi - T.LN_CHI_MIN) / T.LN_CHI_STEP
    n_chi = _Q_COEFF.shape[0]
    idx = jnp.clip(jnp.floor(index).astype(jnp.int32), 0, n_chi - 2)
    w = jnp.clip(index - idx, 0.0, 1.0)

    ln_r1 = jnp.log(jnp.maximum(jnp.asarray(rand1), tiny))
    ln_u_lower = _invert_quantum_cdf(idx, ln_r1)
    ln_u_upper = _invert_quantum_cdf(idx + 1, ln_r1)
    u = jnp.exp((1.0 - w) * ln_u_lower + w * ln_u_upper)

    # ---- angle: y from r2 = cdf(z | u; chi) ---------------------------
    beta = 2.0 * u / (3.0 * chi_safe)
    delta = (1.0 + (1.0 + u) ** 2) * beta ** (-2.0 / 3.0) / (1.0 + u)

    didx_f = (jnp.log(delta) - T.LN_DELTA_MIN) / T.LN_DELTA_STEP
    n_delta = _Y_COEFF.shape[0]
    di = jnp.floor(didx_f).astype(jnp.int32)
    inf_mask = di >= n_delta - 1
    di_c = jnp.clip(di, 0, n_delta - 2)
    dw = jnp.clip(didx_f - di_c, 0.0, 1.0)

    gz = delta ** (-1.5)
    dt_ = chi.dtype
    y_lower = _from_linear_cdf_table(
        gz, beta, rand2, _Y_PREP, di_c,
        _pick(_Y_COEFF, di_c, dt_), _pick(_Y_POWER, di_c, dt_)
    )
    y_upper = _from_linear_cdf_table(
        gz, beta, rand2, _Y_PREP, di_c + 1,
        _pick(_Y_COEFF, di_c + 1, dt_), _pick(_Y_POWER, di_c + 1, dt_)
    )
    y_tab = (1.0 - dw) * y_lower + dw * y_upper
    y_inf = _from_linear_cdf_table(
        0.0,
        beta,
        rand2,
        _Y_INF_PREP,
        jnp.zeros_like(di_c),
        _Y_INF_COEFF,
        _Y_INF_POWER,
    )
    y = jnp.where(inf_mask, y_inf, y_tab)

    z = jnp.maximum(y / jnp.maximum(beta, tiny), 1.0)
    theta_q = _angle_from_z(z, gamma)
    omega_q = gamma * u / (1.0 + u)

    # ---- classical fallback for chi below the table -------------------
    omega_c, theta_c, _ = classical_sample(chi, gamma, rand1, rand2, rand3)
    omega_c = omega_c * gamma / (gamma + omega_c)  # QED energy correction

    classical = ln_chi <= T.LN_CHI_MIN
    omega = jnp.where(classical, omega_c, omega_q)
    theta = jnp.where(classical, theta_c, theta_q)
    return omega, theta, 2.0 * math.pi * jnp.asarray(rand3)
