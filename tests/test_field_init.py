"""Electrostatic field initialization (``yee.rs:644-747``) and current
smoothing (``yee.rs:871-888``)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from opal_tpu import constants as const
from opal_tpu.fields import electrostatic_init, make_mesh, zero_fields
from opal_tpu.grid import GridGeometry
from opal_tpu.ops.maxwell import smooth_currents


def _run_init(geom, mesh, rho_np, J_np):
    E, B, J, rho = zero_fields(geom, mesh)
    J = jax.device_put(jnp.asarray(J_np), J.sharding)
    rho = jax.device_put(jnp.asarray(rho_np), rho.sharding)

    def device_fn(E, B, J, rho):
        ai = lax.axis_index("x")
        return electrostatic_init(E, B, J, rho, geom, "x", ai)

    E, B = jax.shard_map(
        device_fn, mesh=mesh, check_vma=False,
        in_specs=(P("x", None),) * 3 + (P("x"),),
        out_specs=(P("x", None), P("x", None)),
    )(E, B, J, rho)
    return np.asarray(E), np.asarray(B)


def test_gauss_law_prefix_sweep_multidevice():
    """dEx/dx = rho/eps0 with the infinite-sheet boundary value, and
    the device-parallel cumsum must match a serial sweep."""
    geom = GridGeometry(
        nx=64, dx=1.0e-6, xmin=0.0, n_devices=8,
        left_boundary="laser", right_boundary="absorbing",
    )
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    rho_np = rng.standard_normal(geom.n_ext) * 1e-6
    J_np = rng.standard_normal((geom.n_ext, 3)) * 1e2

    E, B = _run_init(geom, mesh, rho_np, J_np)

    s, e = geom.interior_start, geom.interior_end
    eps0, mu0, dx = (
        const.VACUUM_PERMITTIVITY, const.VACUUM_PERMEABILITY, geom.dx,
    )
    dom_Ex = -rho_np[s:e].sum() * dx / (2 * eps0)
    dom_By = -mu0 * J_np[s:e, 2].sum() * dx / 2
    dom_Bz = mu0 * J_np[s:e, 1].sum() * dx / 2

    # serial reference sweep over the extended grid
    Ex_ref = np.zeros(geom.n_ext)
    By_ref = np.zeros(geom.n_ext)
    Bz_ref = np.zeros(geom.n_ext)
    Ex_ref[: geom.left_pad] = dom_Ex
    By_ref[: geom.left_pad] = dom_By
    Bz_ref[: geom.left_pad] = dom_Bz
    for i in range(geom.left_pad, geom.n_ext):
        Ex_ref[i] = Ex_ref[i - 1] + dx * rho_np[i] / eps0
        By_ref[i] = By_ref[i - 1] + mu0 * dx * J_np[i, 2]
        Bz_ref[i] = Bz_ref[i - 1] - mu0 * dx * J_np[i, 1]

    np.testing.assert_allclose(E[:, 0], Ex_ref, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(B[:, 1], By_ref, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(B[:, 2], Bz_ref, rtol=1e-12, atol=1e-18)
    # Ey, Ez, Bx stay zero
    np.testing.assert_array_equal(E[:, 1:], 0.0)
    np.testing.assert_array_equal(B[:, 0], 0.0)


def test_uniform_neutral_plasma_gives_zero_interior_field():
    """Equal and opposite uniform charge -> rho = 0 -> E stays 0."""
    geom = GridGeometry(
        nx=32, dx=1.0e-6, xmin=0.0, n_devices=4,
        left_boundary="laser", right_boundary="absorbing",
    )
    mesh = make_mesh(4)
    rho_np = np.zeros(geom.n_ext)
    J_np = np.zeros((geom.n_ext, 3))
    E, B = _run_init(geom, mesh, rho_np, J_np)
    np.testing.assert_array_equal(E, 0.0)
    np.testing.assert_array_equal(B, 0.0)


def test_smooth_currents_bilinear():
    rng = np.random.default_rng(1)
    J = rng.standard_normal((32, 3))
    rho = rng.standard_normal(32)
    alpha = 0.5
    Js, rs = smooth_currents(jnp.asarray(J), jnp.asarray(rho), alpha)
    Js = np.asarray(Js)
    expect = alpha * J[1:-1] + 0.25 * (J[:-2] + J[2:])
    np.testing.assert_allclose(Js[1:-1], expect, rtol=1e-12)
    # edges and rho untouched
    np.testing.assert_array_equal(Js[0], J[0])
    np.testing.assert_array_equal(Js[-1], J[-1])
    np.testing.assert_array_equal(np.asarray(rs), rho)


def test_nyquist_mode_suppressed():
    """alpha = 1/2 bilinear filtering kills the (-1)^i Nyquist mode."""
    i = np.arange(64)
    J = np.stack([(-1.0) ** i, np.zeros(64), np.zeros(64)], axis=-1)
    Js, _ = smooth_currents(jnp.asarray(J), jnp.zeros(64), 0.5)
    np.testing.assert_allclose(np.asarray(Js)[1:-1], 0.0, atol=1e-15)
