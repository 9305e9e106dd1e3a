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
@pytest.mark.parametrize("chi_idx", [0, 10, 20, 30])  # chi = 0.01..10
def test_sample_quantum_energy_distribution(chi_idx):
    """Empirical CDF of sampled u must match the tabulated QUANTUM_CDF.

    The tables themselves are the regression targets — the reference's
    spectrum tests (``photon_emission.rs:338-410``, commented out
    upstream) only dump data files, so per the build plan the targets
    are generated from the tabulated CDFs directly.  chi = 0.01 (node
    0) takes the quantum branch exactly as in the reference: the
    truncated ``LN_CHI_MIN`` constant makes ``ln(0.01) > LN_CHI_MIN``
    (``photon_emission.rs:139``) — but ``exp(LN_CHI_MIN)`` itself does
    NOT (its log round-trips to exactly ``LN_CHI_MIN``, which routes
    classical in both codes), so node 0 must use the literal 0.01.
    """
    chi = 0.01 if chi_idx == 0 else math.exp(
        T.LN_CHI_MIN + chi_idx * T.LN_CHI_STEP
    )
    gamma = 1000.0
    n = 1_000_000
    rng = np.random.default_rng(1)
    r1, r2, r3 = rng.random(n), rng.random(n), rng.random(n)
    omega, theta, phi = emission.sample(
        jnp.full(n, chi), jnp.full(n, gamma), r1, r2, r3
    )
    omega = np.asarray(omega)
    u = omega / (gamma - omega)  # invert omega = gamma u / (1 + u)
    table = T.QUANTUM_CDF_TABLE[chi_idx]
    for ln_u, ln_cdf in table[3:29:2]:
        frac = np.mean(u <= math.exp(ln_u))
        expected = math.exp(ln_cdf)
        sigma = math.sqrt(max(expected * (1 - expected) / n, 1e-12))
        assert abs(frac - expected) < max(5 * sigma, 0.001), (
            ln_u,
            frac,
            expected,
        )


def test_sample_chi_below_table_floor_is_classical():
    """At chi below the table floor ``sample`` must fall back to the
    classical sampler with the QED energy correction
    (``photon_emission.rs:139-143`` semantics).  Note chi = 0.01
    itself stays quantum (truncated LN_CHI_MIN), hence 0.009 here."""
    n = 10_000
    rng = np.random.default_rng(11)
    chi, gamma = 0.009, 1000.0
    r1, r2, r3 = rng.random(n), rng.random(n), rng.random(n)
    omega, theta, _ = emission.sample(
        jnp.full(n, chi), jnp.full(n, gamma), r1, r2, r3
    )
    omega_c, theta_c, _ = emission.classical_sample(
        jnp.full(n, chi), jnp.full(n, gamma), r1, r2, r3
    )
    omega_c = np.asarray(omega_c)
    expected = omega_c * gamma / (gamma + omega_c)
    np.testing.assert_allclose(np.asarray(omega), expected, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(theta), np.asarray(theta_c),
                               rtol=1e-12)


@pytest.mark.physics
@pytest.mark.parametrize("delta_idx", [15, 20, 25])
def test_sample_angular_distribution(delta_idx):
    """Empirical CDF of the angular variable y must match the tabulated
    Y_CDF row (targets generated from the tables; the reference's
    angular-spectrum test, ``photon_emission.rs:371-410``, only dumps
    data).

    Fixing r1 pins the photon energy u so that the angular parameter
    delta lands exactly on table node ``delta_idx``; the sampled polar
    angle is then mapped back to y = z * beta and binned against the
    (y, cdf) rows, conditioned on the sampling floor y > beta.
    """
    from scipy.optimize import brentq

    chi, gamma = 1.0, 1000.0
    chi_idx = 20  # chi = 1 exactly on the table -> single-table branch
    delta_t = math.exp(T.LN_DELTA_MIN + delta_idx * T.LN_DELTA_STEP)
    u_star = brentq(
        lambda u: (1.0 + (1.0 + u) ** 2)
        * (2.0 * u / (3.0 * chi)) ** (-2.0 / 3.0)
        / (1.0 + u)
        - delta_t,
        1e-6,
        3.0,
    )
    beta = 2.0 * u_star / (3.0 * chi)
    # r1 from the forward CDF (pwmci.evaluate is validated separately;
    # the sampler under test uses the fixed-iteration inversion)
    ev, ok = pwmci.evaluate(
        emission._QUANTUM_PREP, chi_idx, math.log(u_star)
    )
    assert bool(ok)
    r1 = math.exp(float(ev))

    n = 400_000
    rng = np.random.default_rng(delta_idx)
    omega, theta, _ = emission.sample(
        jnp.full(n, chi),
        jnp.full(n, gamma),
        jnp.full(n, r1),
        rng.random(n),
        rng.random(n),
    )
    # energy must be pinned to u_star by construction
    u_back = np.asarray(omega) / (gamma - np.asarray(omega))
    np.testing.assert_allclose(u_back, u_star, rtol=1e-8)
    # invert theta -> z -> y  (z = y / beta, _angle_from_z)
    theta = np.asarray(theta)
    z23 = 2.0 * gamma * (gamma - np.cos(theta) * math.sqrt(gamma**2 - 1.0))
    y = np.maximum(z23, 0.0) ** 1.5 * beta

    r_zero, ok0 = pwmci.evaluate(emission._Y_PREP, delta_idx, beta)
    r_zero = float(r_zero)
    assert bool(ok0)
    checked = 0
    for yk, fk in np.asarray(T.Y_CDF_TABLE[delta_idx]):
        if yk < beta * 1.1 or fk > 0.999:
            continue  # below the conditional floor / saturated tail
        frac = np.mean(y <= yk * (1.0 + 1e-9))
        expected = (fk - r_zero) / (1.0 - r_zero)
        sigma = math.sqrt(max(expected * (1 - expected) / n, 1e-12))
        assert abs(frac - expected) < max(5 * sigma, 0.002), (
            yk,
            frac,
            expected,
        )
        checked += 1
    assert checked >= 15


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


@pytest.mark.physics
def test_classical_sample_spectrum_shape():
    """Classical spectrum (the chi = 0.01 energy-spectrum target):
    check the empirical CDF of x = 2 u z / (3 chi) against the
    CLASSICAL_SPECTRUM_TABLE at interior points."""
    n = 1_000_000
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


# ---------------------------------------------------------------------------
# f32 fast path vs the f64 oracle path
# ---------------------------------------------------------------------------
#
# f32 queries take the gather-free one-hot table path (pwmci._rows_f32,
# emission._pick, the hat-weight rate interpolation) — the TPU-fast
# lowering.  These tests pin that path to the f64 advanced-indexing
# oracle: identical algorithm on f32-cast tables, so results agree to
# f32 roundoff except where a branch decision flips at a table/CDF
# boundary (allowed as a tiny outlier fraction).


def test_rate_f32_matches_f64():
    import jax

    chi = jnp.asarray(
        np.logspace(-4, 3, 4001) * (1.0 + 1e-7), jnp.float64
    )
    gamma = jnp.full_like(chi, 1000.0)
    r64 = np.asarray(emission.rate(chi, gamma))
    r32 = np.asarray(
        emission.rate(chi.astype(jnp.float32), gamma.astype(jnp.float32))
    )
    rel = np.abs(r32 - r64) / np.maximum(np.abs(r64), 1e-300)
    assert np.nanmax(rel) < 2e-5


def test_sample_f32_matches_f64():
    import jax

    key = jax.random.PRNGKey(7)
    n = 8192
    ks = jax.random.split(key, 4)
    ln_chi = jax.random.uniform(
        ks[0], (n,), jnp.float64, math.log(0.02), math.log(50.0)
    )
    chi = jnp.exp(ln_chi)
    gamma = jnp.full((n,), 1000.0, jnp.float64)
    r1 = jax.random.uniform(ks[1], (n,), jnp.float64, 1e-6, 1.0)
    r2 = jax.random.uniform(ks[2], (n,), jnp.float64, 1e-6, 1.0)
    r3 = jax.random.uniform(ks[3], (n,), jnp.float64)

    o64, t64, _ = emission.sample(chi, gamma, r1, r2, r3)
    o32, t32, _ = emission.sample(
        chi.astype(jnp.float32), gamma.astype(jnp.float32),
        r1.astype(jnp.float32), r2.astype(jnp.float32),
        r3.astype(jnp.float32),
    )
    o64, t64 = np.asarray(o64), np.asarray(t64)
    o32, t32 = np.asarray(o32), np.asarray(t32)
    rel_o = np.abs(o32 - o64) / np.maximum(np.abs(o64), 1e-30)
    # theta is absolute-bounded by pi; compare absolutely
    abs_t = np.abs(t32 - t64)
    # branch flips at CDF/table boundaries may displace a few samples
    assert np.mean(rel_o < 1e-3) > 0.995, np.sort(rel_o)[-40:]
    assert np.mean(abs_t < 1e-3) > 0.995, np.sort(abs_t)[-40:]
    # medians (distribution-level) must agree tightly
    assert abs(np.median(o32) - np.median(o64)) / np.median(o64) < 1e-4


def test_classical_sample_f32_matches_f64():
    import jax

    key = jax.random.PRNGKey(11)
    n = 8192
    ks = jax.random.split(key, 3)
    chi = jnp.full((n,), 0.004, jnp.float64)
    gamma = jnp.full((n,), 300.0, jnp.float64)
    r1 = jax.random.uniform(ks[0], (n,), jnp.float64, 1e-6, 1.0)
    r2 = jax.random.uniform(ks[1], (n,), jnp.float64, 1e-6, 1.0)
    r3 = jax.random.uniform(ks[2], (n,), jnp.float64)
    o64, t64, _ = emission.classical_sample(chi, gamma, r1, r2, r3)
    o32, t32, _ = emission.classical_sample(
        chi.astype(jnp.float32), gamma.astype(jnp.float32),
        r1.astype(jnp.float32), r2.astype(jnp.float32),
        r3.astype(jnp.float32),
    )
    rel_o = np.abs(np.asarray(o32) - np.asarray(o64)) / np.maximum(
        np.asarray(o64), 1e-30
    )
    assert np.mean(rel_o < 1e-3) > 0.995
