"""Sample-for-sample parity of the vectorized emission sampler against
a scalar transcription of the reference algorithm.

``emission.sample``/``classical_sample`` rewrite every data-dependent
branch of ``photon_emission.rs:87-205`` and ``:264-292`` as masked
selects so a particle batch samples inside one jit.  The physics tests
(test_qed_spectrum) check the *distributions*; this file checks the
*algorithm*: a straight-line scalar float64 transcription of the Rust
control flow (same tables, same pwmci core) must agree with the
vectorized version for every random tuple individually — catching
index-clamp, mask-precedence, interpolation-weight and
power-law-branch regressions that distribution tests can absorb."""

import math

import numpy as np
import pytest

# several thousand per-scalar pwmci dispatches: too slow for the unit
# tier's budget, so it rides the physics tier
pytestmark = pytest.mark.physics

from opal_tpu.qed import emission, pwmci
from opal_tpu.qed import tables_data as T


def _ev(prep, tidx, x):
    v, ok = pwmci.evaluate(prep, np.int32(tidx), np.float64(x))
    return float(v), bool(ok)


def _inv(prep, tidx, f):
    v, ok = pwmci.invert(prep, np.int32(tidx), np.float64(f))
    return float(v), bool(ok)


def _from_linear_cdf_table(global_zero, local_zero, rand, prep, tidx,
                           coeff, power):
    """Scalar ``from_linear_cdf_table`` (photon_emission.rs:87-121)."""
    if local_zero < float(prep.x[tidx, 0]):
        r_zero = coeff * (local_zero - global_zero) ** power
    else:
        r_zero, ok = _ev(prep, tidx, local_zero)
        if not ok:
            return local_zero
    r = r_zero + (1.0 - r_zero) * rand
    if r <= float(prep.f[tidx, 0]):
        return math.exp((math.log(r) - math.log(coeff)) / power) + global_zero
    y, ok = _inv(prep, tidx, r)
    return y if ok else local_zero


def _classical_sample(chi, gamma, r1, r2, r3):
    """Scalar ``classical_sample`` (photon_emission.rs:264-292)."""
    delta = math.acos((-9.0 + 50.0 * r2 - 25.0 * r2 * r2) / 16.0)
    z = ((2.0 + 4.0 * math.cos(delta / 3.0)) / (5.0 * (1.0 - r2))) ** 3
    ln_rand = math.log(r1)
    if ln_rand < float(emission._CLASSICAL_PREP.f[0, 0]):
        x = 1.020377255 * r1 ** 0.6
    else:
        ln_x, ok = _inv(emission._CLASSICAL_PREP, 0, ln_rand)
        if not ok:
            ln_x = float(emission._CLASSICAL_PREP.x[0, -1])
        x = math.exp(ln_x)
    u = 3.0 * chi * x / (2.0 * z)
    cos_theta = (gamma - z ** (2.0 / 3.0) / (2.0 * gamma)) / math.sqrt(
        gamma * gamma - 1.0
    )
    theta = math.acos(max(min(cos_theta, 1.0), -1.0))
    return u * gamma, theta, 2.0 * math.pi * r3


def _invert_quantum_cdf(tidx, ln_r):
    """One QUANTUM_CDF inversion (photon_emission.rs:149-164)."""
    coeff = float(emission._Q_COEFF[tidx])
    power = float(emission._Q_POWER[tidx])
    if ln_r <= float(emission._QUANTUM_PREP.f[tidx, 0]):
        return (ln_r - math.log(coeff)) / power
    ln_u, ok = _inv(emission._QUANTUM_PREP, tidx, ln_r)
    return ln_u if ok else float(emission._QUANTUM_PREP.x[tidx, -1])


def _sample(chi, gamma, r1, r2, r3):
    """Scalar ``sample`` (photon_emission.rs:129-203)."""
    if math.log(chi) <= T.LN_CHI_MIN:
        omega, theta, cphi = _classical_sample(chi, gamma, r1, r2, r3)
        return omega * gamma / (gamma + omega), theta, cphi

    index = (math.log(chi) - T.LN_CHI_MIN) / T.LN_CHI_STEP
    weight = index - math.floor(index)
    index = int(math.floor(index))

    ln_r1 = math.log(r1)
    ln_u_lower = _invert_quantum_cdf(index, ln_r1)
    ln_u_upper = _invert_quantum_cdf(index + 1, ln_r1)
    u = math.exp((1.0 - weight) * ln_u_lower + weight * ln_u_upper)

    beta = 2.0 * u / (3.0 * chi)
    delta = (1.0 + (1.0 + u) ** 2) * beta ** (-2.0 / 3.0) / (1.0 + u)

    didx = (math.log(delta) - T.LN_DELTA_MIN) / T.LN_DELTA_STEP
    dw = didx - math.floor(didx)
    didx = int(math.floor(didx))

    n_delta = emission._Y_COEFF.shape[0]
    if didx >= n_delta - 1:
        y = _from_linear_cdf_table(
            0.0, beta, r2, emission._Y_INF_PREP, 0,
            float(emission._Y_INF_COEFF), float(emission._Y_INF_POWER),
        )
    else:
        y_lo = _from_linear_cdf_table(
            delta ** -1.5, beta, r2, emission._Y_PREP, didx,
            float(emission._Y_COEFF[didx]), float(emission._Y_POWER[didx]),
        )
        y_hi = _from_linear_cdf_table(
            delta ** -1.5, beta, r2, emission._Y_PREP, didx + 1,
            float(emission._Y_COEFF[didx + 1]),
            float(emission._Y_POWER[didx + 1]),
        )
        y = (1.0 - dw) * y_lo + dw * y_hi

    z = max(y / beta, 1.0)
    cos_theta = (gamma - z ** (2.0 / 3.0) / (2.0 * gamma)) / math.sqrt(
        gamma * gamma - 1.0
    )
    theta = math.acos(max(min(cos_theta, 1.0), -1.0))
    return gamma * u / (1.0 + u), theta, 2.0 * math.pi * r3


def _tuples(n, chi_lo, chi_hi, seed):
    rng = np.random.default_rng(seed)
    chi = np.exp(rng.uniform(math.log(chi_lo), math.log(chi_hi), n))
    gamma = np.exp(rng.uniform(math.log(10.0), math.log(1.0e4), n))
    r1 = rng.uniform(1e-9, 1.0, n)
    r2 = rng.uniform(0.0, 1.0 - 1e-9, n)
    r3 = rng.uniform(0.0, 1.0, n)
    return chi, gamma, r1, r2, r3


@pytest.mark.parametrize(
    "chi_lo,chi_hi",
    [
        (0.012, 90.0),   # quantum table interior
        (0.001, 0.0099),  # below-table classical fallback
        (0.0099, 0.0121),  # straddling the table edge
    ],
)
def test_sample_matches_scalar_reference(chi_lo, chi_hi):
    n = 250
    chi, gamma, r1, r2, r3 = _tuples(n, chi_lo, chi_hi, seed=7)
    omega_v, theta_v, cphi_v = map(
        np.asarray, emission.sample(chi, gamma, r1, r2, r3)
    )
    for i in range(n):
        omega_s, theta_s, cphi_s = _sample(
            float(chi[i]), float(gamma[i]), float(r1[i]), float(r2[i]),
            float(r3[i]),
        )
        assert omega_v[i] == pytest.approx(omega_s, rel=1e-10, abs=1e-300), (
            i, chi[i], gamma[i], r1[i], r2[i])
        assert theta_v[i] == pytest.approx(theta_s, rel=1e-8, abs=1e-12), (
            i, chi[i], gamma[i], r1[i], r2[i])
        assert cphi_v[i] == pytest.approx(cphi_s, rel=1e-12)


def test_classical_sample_matches_scalar_reference():
    n = 250
    chi, gamma, r1, r2, r3 = _tuples(n, 1e-4, 1.0, seed=11)
    omega_v, theta_v, _ = map(
        np.asarray, emission.classical_sample(chi, gamma, r1, r2, r3)
    )
    for i in range(n):
        omega_s, theta_s, _ = _classical_sample(
            float(chi[i]), float(gamma[i]), float(r1[i]), float(r2[i]),
            float(r3[i]),
        )
        assert omega_v[i] == pytest.approx(omega_s, rel=1e-10), (
            i, chi[i], gamma[i], r1[i], r2[i])
        assert theta_v[i] == pytest.approx(theta_s, rel=1e-8, abs=1e-12)
