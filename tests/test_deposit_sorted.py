"""Sorted segmented-sum deposition must match the scatter-add path to
floating-point reassociation (same physics, different summation
order)."""

import jax.numpy as jnp
import numpy as np

from opal_tpu.grid import HALO
from opal_tpu.ops.deposit import deposit, deposit_onehot, deposit_sorted


def _random_inputs(n, n_loc, seed):
    rng = np.random.default_rng(seed)
    n_slab = n_loc + 2 * HALO
    idx = rng.integers(0, n_loc, n).astype(np.int32) + HALO
    x = rng.random(n)
    prev_x = x - 0.9 * (rng.random(n) - 0.5)
    q = np.where(rng.random(n) < 0.1, 0.0, rng.standard_normal(n))
    vel = rng.standard_normal((n, 3)) * 1e7
    J = np.zeros((n_slab, 3))
    rho = np.zeros(n_slab)
    return (
        jnp.asarray(J), jnp.asarray(rho), jnp.asarray(idx), jnp.asarray(x),
        jnp.asarray(prev_x), jnp.asarray(q), jnp.asarray(vel),
    )


def test_sorted_matches_scatter():
    args = _random_inputs(20000, 64, 0)
    dx, dt = 500.0, 1e-12
    J1, r1 = deposit(*args, dx, dt)
    J2, r2 = deposit_sorted(*args, dx, dt)
    np.testing.assert_allclose(np.asarray(J2), np.asarray(J1),
                               rtol=1e-10, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1),
                               rtol=1e-10, atol=1e-12)


def test_onehot_matches_scatter():
    """The misfit fallback's one-hot MXU formulation must match the
    scatter path (same tap values; blocked vs index summation order),
    including in-domain rows near the slab edges."""
    args = _random_inputs(512, 64, 3)
    dx, dt = 500.0, 1e-12
    J1, r1 = deposit(*args, dx, dt)
    J2, r2 = deposit_onehot(*args, dx, dt)
    np.testing.assert_allclose(np.asarray(J2), np.asarray(J1),
                               rtol=1e-10, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1),
                               rtol=1e-10, atol=1e-12)


def test_onehot_out_of_slab_taps_drop():
    """Rows whose taps leave the slab lose exactly those taps (parity
    with deposit()'s drop guard), and far-out rows deposit nothing."""
    n_loc = 16
    n_slab = n_loc + 2 * HALO
    # idx 1: the -2 tap (row -1) must drop; idx n_slab-1: +1/+2 drop;
    # idx -7: fully out (one-hot misses), deposits nothing anywhere
    idx = jnp.asarray(np.array([1, n_slab - 1, -7], np.int32))
    x = jnp.asarray(np.array([0.3, 0.7, 0.5]))
    prev_x = jnp.asarray(np.array([0.4, 0.6, 0.4]))
    q = jnp.asarray(np.ones(3))
    vel = jnp.asarray(np.full((3, 3), 1e7))
    J0 = jnp.zeros((n_slab, 3))
    rho0 = jnp.zeros(n_slab)
    dx, dt = 500.0, 1e-12
    J1, r1 = deposit(J0, rho0, idx, x, prev_x, q, vel, dx, dt)
    J2, r2 = deposit_onehot(J0, rho0, idx, x, prev_x, q, vel, dx, dt)
    np.testing.assert_allclose(np.asarray(J2), np.asarray(J1),
                               rtol=1e-10, atol=1e-20)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1),
                               rtol=1e-10, atol=1e-20)


def test_slab_deposit_matches_scatter():
    """The misfit fallback's slab-accumulated deposit (one one-hot
    contraction into the kernel's (n_rows, 16) tap slab, folded by
    fold_out_slab) must match the scatter path for rows inside the
    deposit-reach bounds, and drop rows outside them entirely."""
    from opal_tpu.ops.fused import PAD, deposit_into_slab, fold_out_slab

    n_loc = 64
    n_slab = n_loc + 2 * HALO
    J0, rho0, idx, x, prev_x, q, vel = _random_inputs(512, n_loc, 7)
    dx, dt = 500.0, 1e-12
    J1, r1 = deposit(J0, rho0, idx, x, prev_x, q, vel, dx, dt)
    slab = jnp.zeros((n_slab + 2 * PAD, 16))
    slab = deposit_into_slab(slab, idx + PAD, x, prev_x, q, vel, dx, dt)
    J2, r2 = fold_out_slab(slab)
    np.testing.assert_allclose(np.asarray(J2), np.asarray(J1),
                               rtol=1e-10, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1),
                               rtol=1e-10, atol=1e-12)

    # out-of-reach rows (beyond [PAD+2, n_rows-PAD-3] in table space)
    # miss the one-hot and deposit NOTHING (they are counted as
    # deposit-reach losses by the caller)
    bad = jnp.asarray(np.array([1, n_slab + 2 * PAD - 2, -50], np.int32))
    slab_b = deposit_into_slab(
        jnp.zeros((n_slab + 2 * PAD, 16)), bad,
        jnp.asarray([0.3, 0.5, 0.7]), jnp.asarray([0.4, 0.4, 0.6]),
        jnp.asarray([1.0, 1.0, 1.0]), jnp.asarray(np.full((3, 3), 1e7)),
        dx, dt,
    )
    assert float(jnp.sum(jnp.abs(slab_b))) == 0.0


def test_sorted_empty_and_single_cell():
    # all particles in one cell; and all-dead (q = 0) input
    n_loc = 16
    n_slab = n_loc + 2 * HALO
    dx, dt = 1.0, 1.0
    idx = jnp.full(100, HALO + 7, jnp.int32)
    x = jnp.linspace(0.01, 0.99, 100)
    prev_x = x - 0.3
    q = jnp.ones(100)
    vel = jnp.ones((100, 3))
    J0 = jnp.zeros((n_slab, 3))
    r0 = jnp.zeros(n_slab)
    J1, r1 = deposit(J0, r0, idx, x, prev_x, q, vel, dx, dt)
    J2, r2 = deposit_sorted(J0, r0, idx, x, prev_x, q, vel, dx, dt)
    np.testing.assert_allclose(np.asarray(J2), np.asarray(J1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), rtol=1e-12)

    Jz, rz = deposit_sorted(J0, r0, idx, x, prev_x, q * 0.0, vel, dx, dt)
    np.testing.assert_array_equal(np.asarray(Jz), 0.0)
    np.testing.assert_array_equal(np.asarray(rz), 0.0)


def test_sorted_charge_conservation():
    """The flux form satisfies the discrete continuity equation:
    d rho/dt + div j = 0 summed over the slab (total charge change =
    boundary flux = 0 for interior particles)."""
    args = _random_inputs(5000, 64, 3)
    J, rho, idx, x, prev_x, q, vel = args
    dx, dt = 2.0, 0.5
    # prev and current deposit of rho must conserve total weight
    J2, r_now = deposit_sorted(J, rho, idx, x, prev_x, q, vel, dx, dt)
    total = float(jnp.sum(r_now) * dx)
    np.testing.assert_allclose(total, float(jnp.sum(q)), rtol=1e-10)


def test_out_of_domain_taps_drop_not_wrap():
    """A particle several cells out of domain (migration cadence M > 1
    leaves up to M cells of drift between exchanges) has stencil taps
    past the slab edge: they must be DROPPED, not wrapped onto the far
    end of the slab (numpy negative-index semantics corrupted the last
    rows), in both deposition paths."""
    n_loc = 16
    n_slab = n_loc + 2 * HALO
    # cell = -3 -> slab idx = 1; jx tap at idx-2 = -1, rho quirk tap too
    idx = jnp.asarray(np.array([1], np.int32))
    x = jnp.asarray([0.2])
    prev_x = jnp.asarray([1.1])  # crossed from the right: flux at -1.5 fires
    q = jnp.asarray([1.0])
    vel = jnp.asarray(np.array([[1e7, 1e7, 1e7]]))
    dx, dt = 500.0, 1e-12
    for fn in (deposit, deposit_sorted):
        J, rho = fn(
            jnp.zeros((n_slab, 3)), jnp.zeros(n_slab), idx, x, prev_x,
            q, vel, dx, dt,
        )
        J, rho = np.asarray(J), np.asarray(rho)
        # nothing may land on the far half of the slab
        assert np.all(J[n_slab // 2:] == 0.0), fn.__name__
        assert np.all(rho[n_slab // 2:] == 0.0), fn.__name__
        # the in-slab taps still deposit
        assert np.any(J[:4] != 0.0) and np.any(rho[:4] != 0.0), fn.__name__
