"""Interpolation-kernel identities (weight normalization, flux/weight
charge-conservation identity of ``yee.rs:179-183``)."""

import numpy as np

from opal_tpu.ops.interp import flux, weight


def test_weight_shape():
    assert float(weight(0.0)) == 0.75
    assert float(weight(0.5)) == 0.5
    assert float(weight(1.5)) == 0.0
    assert float(weight(-0.5)) == 0.5


def test_edge_weights_sum_to_one():
    x = np.linspace(0.0, 0.999, 101)
    total = np.asarray(weight(1.0 + x) + weight(x) + weight(1.0 - x) + weight(2.0 - x))
    np.testing.assert_allclose(total, 1.0, rtol=1e-14)


def test_centred_weights_sum_to_one():
    x = np.linspace(0.0, 0.999, 101)
    total = np.asarray(weight(0.5 + x) + weight(0.5 - x) + weight(1.5 - x))
    np.testing.assert_allclose(total, 1.0, rtol=1e-14)


def test_flux_conserves_weight():
    """delta W(x) = -flux(x - 1/2) + flux(x + 1/2) for any motion < dx."""
    rng = np.random.default_rng(0)
    for _ in range(200):
        x_i = rng.uniform(-2.0, 2.0)
        x_f = x_i + rng.uniform(-0.9, 0.9)
        dW = float(weight(x_f)) - float(weight(x_i))
        # grid point at 0, cell boundaries at +-1/2; flux args are
        # (boundary - particle) at t and t+dt; inflow left minus outflow right
        lhs = float(flux(-0.5 - x_i, -0.5 - x_f)) - float(flux(0.5 - x_i, 0.5 - x_f))
        assert abs(dW - lhs) < 1e-12, (x_i, x_f)


def test_flux_signs():
    # particle crossing left-to-right through boundary: positive flux
    assert float(flux(0.3, -0.3)) > 0.0
    # moving away without crossing, same sign: negative (reflux)
    assert float(flux(0.3, 0.6)) < 0.0
    # fully outside: zero
    assert float(flux(1.5, 1.8)) == 0.0


def test_flux_total_through_all_boundaries():
    """A particle moving by d deposits total jx * dt = q d (continuity)."""
    rng = np.random.default_rng(1)
    for _ in range(100):
        x0 = rng.uniform(0.0, 1.0)
        d = rng.uniform(-0.9, 0.9)
        x1 = x0 + d
        total = sum(
            float(flux((o + 0.5) - x0, (o + 0.5) - x1)) for o in range(-3, 4)
        )
        assert abs(total - d) < 1e-12
