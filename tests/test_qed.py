"""QED numerics tests.

Rate regression targets come from the reference's own unit tests
(``src/qed/photon_emission.rs:298-336``); the Airy values from
``src/qed/special_functions/airy.rs:71-113``; pwmci inversion cases
from ``src/qed/pwmci.rs:230-282``.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special

from opal_tpu.qed import airy, cross_sections, emission, pwmci
from opal_tpu.qed import tables_data as T
from opal_tpu import constants as const


# ---------------------------------------------------------------------------
# Emission rate regression tests (targets from the reference test suite)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "chi,target",
    [
        (0.026, 2.07935e14),
        (3.5, 1.58485e16),
        (9.98, 3.45844e16),
        (12.4, 4.04647e16),
        (403.0, 4.46834e17),
    ],
)
def test_rate(chi, target):
    value = float(emission.rate(chi, 1000.0))
    assert abs(value - target) / target < 1.0e-3


def test_rate_vectorized_matches_scalar():
    chis = np.array([0.001, 0.026, 0.5, 3.5, 99.0, 150.0, 403.0])
    vec = np.asarray(emission.rate(chis, 1000.0))
    for c, v in zip(chis, vec):
        assert float(emission.rate(c, 1000.0)) == pytest.approx(v, rel=1e-12)


def test_rate_zero_chi():
    assert float(emission.rate(0.0, 1000.0)) == 0.0


def test_classical_rate():
    chi, gamma = 0.1, 500.0
    expected = (
        math.sqrt(3.0)
        * const.ALPHA_FINE
        * chi
        * (5.0 * math.pi / 3.0)
        / (2.0 * math.pi * gamma * const.COMPTON_TIME)
    )
    assert float(emission.classical_rate(chi, gamma)) == pytest.approx(
        expected, rel=1e-12
    )


# ---------------------------------------------------------------------------
# Airy function
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "x,target",
    [
        (0.0, 0.3550280538878172),
        (2.0, 0.03492413042327438),
        (17.0, 7.05019729838861e-22),
        (20.0, 1.69167286867e-27),
    ],
)
def test_airy_reference_points(x, target):
    val, valid = airy.airy_ai(x)
    assert bool(valid)
    assert abs(float(val) - target) / target < 1.0e-12


def test_airy_against_scipy():
    xs = np.concatenate(
        [np.linspace(0.0, 0.999, 40), np.linspace(1.0, 49.5, 60)]
    )
    vals, valid = airy.airy_ai(xs)
    ref = scipy.special.airy(xs)[0]
    assert np.all(np.asarray(valid))
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=1e-11)


def test_airy_out_of_range():
    val, valid = airy.airy_ai(200.0)
    assert not bool(valid) and float(val) == 0.0
    val, valid = airy.airy_ai(-1.0)
    assert not bool(valid) and float(val) == 0.0


# ---------------------------------------------------------------------------
# pwmci
# ---------------------------------------------------------------------------


def test_invert_x_sqd():
    table = np.array([[x, x**2] for x in np.arange(20) / 20.0])
    prep = pwmci.prepare(table)
    x, ok = pwmci.invert(prep, 0, 0.73)
    assert bool(ok)
    assert abs(float(x) - math.sqrt(0.73)) < 1.0e-4


def test_invert_tanh():
    table = np.array([[x, math.tanh(x)] for x in 5.0 * np.arange(40) / 40.0])
    prep = pwmci.prepare(table)
    x, ok = pwmci.invert(prep, 0, 0.22)
    assert bool(ok)
    assert abs(float(x) - math.atanh(0.22)) < 1.0e-4


def test_invert_shifted_tanh():
    table = np.array(
        [[x, 1.0 + math.tanh(x - 2.0)] for x in 5.0 * np.arange(20) / 20.0]
    )
    prep = pwmci.prepare(table)
    x, ok = pwmci.invert(prep, 0, 1.24)
    assert bool(ok)
    assert abs(float(x) - (2.0 - math.atanh(1.0 - 1.24))) < 1.0e-4


def test_evaluate_roundtrip():
    """invert and evaluate must be mutually consistent on a real table."""
    prep = pwmci.prepare(T.CLASSICAL_SPECTRUM_TABLE)
    fq = np.linspace(T.CLASSICAL_SPECTRUM_TABLE[0, 1] + 0.01, -0.01, 25)
    x, ok = pwmci.invert(prep, np.zeros(25, dtype=np.int32), fq)
    assert np.all(np.asarray(ok))
    f2, ok2 = pwmci.evaluate(prep, np.zeros(25, dtype=np.int32), np.asarray(x))
    assert np.all(np.asarray(ok2))
    np.testing.assert_allclose(np.asarray(f2), fq, rtol=0, atol=1e-9)


def test_out_of_range_flags():
    table = np.array([[x, x**2] for x in np.arange(20) / 20.0])
    prep = pwmci.prepare(table)
    _, ok = pwmci.invert(prep, 0, 2.0)
    assert not bool(ok)
    _, ok = pwmci.evaluate(prep, 0, 5.0)
    assert not bool(ok)


# ---------------------------------------------------------------------------
# Spectrum sampling
# ---------------------------------------------------------------------------


@pytest.mark.physics
def test_sample_quantum_energy_distribution():
    """Empirical CDF of sampled u must match the tabulated QUANTUM_CDF."""
    chi_idx = 20  # chi = 1.0 exactly on the table
    chi = math.exp(T.LN_CHI_MIN + chi_idx * T.LN_CHI_STEP)
    gamma = 1000.0
    n = 200_000
    rng = np.random.default_rng(1)
    r1, r2, r3 = rng.random(n), rng.random(n), rng.random(n)
    omega, theta, phi = emission.sample(
        jnp.full(n, chi), jnp.full(n, gamma), r1, r2, r3
    )
    omega = np.asarray(omega)
    u = omega / (gamma - omega)  # invert omega = gamma u / (1 + u)
    table = T.QUANTUM_CDF_TABLE[chi_idx]
    for ln_u, ln_cdf in table[5:28:4]:
        frac = np.mean(u <= math.exp(ln_u))
        expected = math.exp(ln_cdf)
        sigma = math.sqrt(max(expected * (1 - expected) / n, 1e-12))
        assert abs(frac - expected) < max(5 * sigma, 0.002), (
            ln_u,
            frac,
            expected,
        )


@pytest.mark.physics
def test_sample_bounds_and_finiteness():
    rng = np.random.default_rng(2)
    n = 10_000
    chi = 10.0 ** rng.uniform(-3, 2, n)
    gamma = 10.0 ** rng.uniform(0.5, 4, n)
    omega, theta, phi = emission.sample(
        chi, gamma, rng.random(n), rng.random(n), rng.random(n)
    )
    omega, theta, phi = map(np.asarray, (omega, theta, phi))
    assert np.all(np.isfinite(omega))
    assert np.all(omega >= 0)
    # quantum branch bounds photon energy below electron energy
    quantum = np.log(chi) > T.LN_CHI_MIN
    assert np.all(omega[quantum] <= gamma[quantum])
    assert np.all((theta >= 0) & (theta <= math.pi))
    assert np.all((phi >= 0) & (phi <= 2 * math.pi))


def test_classical_sample_spectrum_shape():
    """Classical spectrum: check empirical CDF of x = 2 u z / (3 chi)
    against the CLASSICAL_SPECTRUM_TABLE at a few interior points."""
    n = 200_000
    rng = np.random.default_rng(3)
    chi, gamma = 0.01, 1000.0
    r1 = rng.random(n)
    # fix r2 => fixed z, x depends only on r1
    r2 = np.full(n, 0.37)
    omega, _, _ = emission.classical_sample(
        jnp.full(n, chi), jnp.full(n, gamma), r1, r2, rng.random(n)
    )
    u = np.asarray(omega) / gamma
    arg = (-9.0 + 50.0 * 0.37 - 25.0 * 0.37**2) / 16.0
    delta = math.acos(arg)
    z = ((2.0 + 4.0 * math.cos(delta / 3.0)) / (5.0 * (1.0 - 0.37))) ** 3
    x = 2.0 * u * z / (3.0 * chi)
    for ln_x, ln_cdf in T.CLASSICAL_SPECTRUM_TABLE[10:35:6]:
        frac = np.mean(x <= math.exp(ln_x))
        expected = math.exp(ln_cdf)
        sigma = math.sqrt(max(expected * (1 - expected) / n, 1e-12))
        assert abs(frac - expected) < max(5 * sigma, 0.002)


# ---------------------------------------------------------------------------
# Cross sections
# ---------------------------------------------------------------------------


def _numpy_cross_section(k, p, chi_gamma, chi_e, stimulated):
    """Independent oracle: same formula, scipy Airy."""
    if chi_e <= 0 or chi_gamma <= 0:
        return None
    if stimulated and (chi_gamma >= chi_e or k[0] >= p[0]):
        return None
    s = -1.0 if stimulated else 1.0
    chi_sum = chi_e + s * chi_gamma
    g = 0.5 + 0.25 * chi_gamma**2 / (chi_e * chi_sum)
    z = (chi_gamma / (chi_e * chi_sum)) ** (2.0 / 3.0)
    k_p = k[0] * p[0] - k[1] * p[1] - k[2] * p[2] - k[3] * p[3]
    zbar = 2.0 * z * chi_e * k_p / chi_gamma
    zbar_z = 2.0 * p[0] * k_p / k[0]
    if zbar < 0 or zbar >= 50.0:
        return None
    ai = scipy.special.airy(zbar)[0]
    return (
        (2.0 * math.pi * const.CLASSICAL_ELECTRON_RADIUS) ** 2
        * chi_e
        * z
        * (4.0 * g * zbar_z - 1.0)
        * ai
        / (const.ALPHA_FINE * chi_gamma * k[0] * p[0])
    )


def test_absorption_cross_section_against_oracle():
    rng = np.random.default_rng(4)
    for _ in range(50):
        ux = rng.uniform(-50, 50)
        gamma = math.sqrt(1 + ux**2)
        p = np.array([gamma, ux, 0.0, 0.0])
        kmag = rng.uniform(0.01, 5.0)
        k = np.array([kmag, -kmag, 0.0, 0.0])
        chi_e = rng.uniform(0.001, 2.0)
        chi_g = rng.uniform(0.001, 2.0)
        expected = _numpy_cross_section(k, p, chi_g, chi_e, False)
        got, valid = cross_sections.photon_absorption(k, p, chi_g, chi_e)
        if expected is None:
            assert float(got) == 0.0
        else:
            assert bool(valid)
            assert float(got) == pytest.approx(expected, rel=1e-9)


def test_stimulated_emission_guards():
    p = np.array([100.0, 99.995, 0.0, 0.0])
    k = np.array([120.0, -120.0, 0.0, 0.0])
    # photon more energetic than electron: forbidden
    sigma, valid = cross_sections.stimulated_emission(k, p, 0.5, 1.0)
    assert not bool(valid) and float(sigma) == 0.0
    # chi_gamma >= chi_e: forbidden
    k = np.array([10.0, -10.0, 0.0, 0.0])
    sigma, valid = cross_sections.stimulated_emission(k, p, 1.5, 1.0)
    assert not bool(valid) and float(sigma) == 0.0


def test_stimulated_emission_against_oracle():
    rng = np.random.default_rng(5)
    hits = 0
    for _ in range(80):
        ux = rng.uniform(-50, -1)
        gamma = math.sqrt(1 + ux**2)
        p = np.array([gamma, ux, 0.0, 0.0])
        kmag = rng.uniform(0.01, gamma * 0.5)
        k = np.array([kmag, -kmag, 0.0, 0.0])
        chi_e = rng.uniform(0.01, 2.0)
        chi_g = rng.uniform(0.001, chi_e * 0.9)
        expected = _numpy_cross_section(k, p, chi_g, chi_e, True)
        got, valid = cross_sections.stimulated_emission(k, p, chi_g, chi_e)
        if expected is None:
            assert float(got) == 0.0
        else:
            hits += 1
            assert bool(valid)
            assert float(got) == pytest.approx(expected, rel=1e-9)
    assert hits > 5
