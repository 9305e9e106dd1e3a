"""Photon energy-spectrum regression for the vectorized QED samplers.

The reference carries only file-dump spectrum tests (commented out,
``src/qed/photon_emission.rs:338-410``); here the sampled spectra are
asserted against an INDEPENDENT oracle — the Nikishov-Ritus quantum
synchrotron spectrum integrated with scipy:

    dN/df  ~  Int_y^inf K_{5/3}(t) dt  +  (f^2/(1-f)) K_{2/3}(y),
    y = 2 f / (3 chi (1 - f)),   f = omega / (gamma m c^2)

(the physics the reference's tables were built from), and the classical
angle-integrated synchrotron number spectrum

    dN/dv  ~  Int_v^inf K_{5/3}(t) dt,   v = omega / omega_c,
    omega_c = (3/2) chi gamma m c^2.

This validates the whole vectorized chain — table data, monotone-cubic
inversion, power-law continuations, delta-indexed angle tables — at the
distribution level (SURVEY §7: trajectory-level parity with the
reference's Xoshiro streams is out of scope by design).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.physics
from scipy import integrate, special

from opal_tpu.qed import emission

N_SAMPLES = 1 << 20
QUANTILES = np.linspace(0.05, 0.95, 19)


@functools.lru_cache(maxsize=None)
def _k53_tail(y: float) -> float:
    """Int_y^inf K_{5/3}(t) dt, integrated in log space: the integrand
    K(e^u) e^u is smooth down to tiny y (direct quad from y ~ 1e-10
    misestimates the t^(-5/3) endpoint and skews the whole CDF)."""
    val, _ = integrate.quad(
        lambda u: special.kv(5.0 / 3.0, math.exp(u)) * math.exp(u),
        math.log(y), 8.0, limit=400,
    )
    return val


def _quantum_cdf(chi: float, f_grid: np.ndarray) -> np.ndarray:
    """CDF of the photon energy fraction f on f_grid (quantum).

    The spectrum diverges as f^(-2/3) at f -> 0, so the grid must start
    at f_grid[0] > 0 and the head mass Int_0^f0 ~ 3 f0 S(f0) is added
    analytically (S ~ C f^(-2/3) there)."""
    y = 2.0 * f_grid / (3.0 * chi * (1.0 - f_grid))
    s = np.array([_k53_tail(v) for v in y])
    s = s + f_grid**2 / (1.0 - f_grid) * special.kv(2.0 / 3.0, y)
    head = 3.0 * f_grid[0] * s[0]
    cdf = head + integrate.cumulative_trapezoid(s, f_grid, initial=0.0)
    return cdf / cdf[-1]


def _classical_cdf(v_grid: np.ndarray) -> np.ndarray:
    """CDF of v = omega/omega_c for the classical spectrum (same
    v^(-2/3) head treatment as :func:`_quantum_cdf`)."""
    s = np.array([_k53_tail(v) for v in v_grid])
    head = 3.0 * v_grid[0] * s[0]
    cdf = head + integrate.cumulative_trapezoid(s, v_grid, initial=0.0)
    return cdf / cdf[-1]


def _draw(fn, chi, gamma, n=N_SAMPLES):
    key = jax.random.key(42)
    r1, r2, r3 = jax.random.uniform(key, (3, n), jnp.float64)
    omega, theta, _ = jax.jit(fn)(
        jnp.full((n,), chi), jnp.full((n,), gamma), r1, r2, r3
    )
    return np.asarray(omega), np.asarray(theta)


@pytest.mark.parametrize("chi", [0.1, 1.0, 10.0])
def test_quantum_energy_spectrum(chi):
    """Empirical quantiles of f = omega/gamma must sit on the
    Nikishov-Ritus CDF to ~1% (1e6 samples: statistical error ~5e-4,
    31-point table + monotone-cubic inversion a few 1e-3)."""
    gamma = 1000.0
    omega, _ = _draw(emission.sample, chi, gamma)
    f = omega / gamma
    assert (f > 0).all() and (f < 1).all()

    # oracle CDF on a grid covering the sampled support
    lo = max(f.min() * 0.5, 1e-12)
    grid = np.geomspace(lo, 1.0 - 1e-9, 4000)
    cdf = _quantum_cdf(chi, grid)

    q_emp = np.quantile(f, QUANTILES)
    cdf_at_q = np.interp(q_emp, grid, cdf)
    np.testing.assert_allclose(cdf_at_q, QUANTILES, atol=0.012)

    # mean energy fraction to 1% (integrates the whole spectrum shape)
    pdf_mean = np.trapezoid(grid * np.gradient(cdf, grid), grid)
    assert abs(f.mean() - pdf_mean) / pdf_mean < 0.01


def test_quantum_recoil_bound():
    """At chi = 10 hard photons dominate; energies must still respect
    omega < gamma (the u/(1+u) recoil bound, electron.rs:231-239)."""
    gamma = 500.0
    omega, _ = _draw(emission.sample, 10.0, gamma, n=1 << 18)
    assert omega.max() < gamma
    # a sizeable fraction of emissions above half the electron energy
    assert (omega > 0.25 * gamma).mean() > 0.05


def test_classical_energy_spectrum():
    """classical_sample's omega/omega_c marginal must match the
    angle-integrated classical synchrotron CDF."""
    chi, gamma = 0.01, 1000.0
    omega, _ = _draw(emission.classical_sample, chi, gamma)
    v = omega / (1.5 * chi * gamma)
    grid = np.geomspace(1e-10, 40.0, 4000)
    cdf = _classical_cdf(grid)
    q_emp = np.quantile(v, QUANTILES)
    cdf_at_q = np.interp(q_emp, grid, cdf)
    np.testing.assert_allclose(cdf_at_q, QUANTILES, atol=0.012)


def test_low_chi_sample_continuity():
    """sample() below the table (chi < 0.01) falls back to the
    QED-corrected classical sampler; the mean energy must be continuous
    across the table edge to a few %."""
    gamma = 1000.0
    lo, _ = _draw(emission.sample, 0.0099, gamma, n=1 << 18)
    hi, _ = _draw(emission.sample, 0.0101, gamma, n=1 << 18)
    assert abs(lo.mean() - hi.mean()) / hi.mean() < 0.05
