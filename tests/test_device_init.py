"""Device-side initialization must match the host sampler's
distribution: identical weights/counts per cell, statistically matching
positions and momenta (the RNG streams differ by design)."""

import numpy as np
import jax.numpy as jnp

from opal_tpu import constants as const
from opal_tpu.fields import make_mesh
from opal_tpu.grid import GridGeometry
from opal_tpu.species import SpeciesSpec, initialize, initialize_device


def test_device_init_matches_host_totals():
    geom = GridGeometry(nx=64, dx=500.0, xmin=0.0, n_devices=8)
    mesh = make_mesh(8)
    spec = SpeciesSpec.electron()
    npc = 16
    dt = 0.95 * geom.dx / const.SPEED_OF_LIGHT
    density = lambda x: 20.0 * (1.0 + 0.5 * np.sin(2 * np.pi * x / (64 * 500.0)))
    drift = 3.0e-2
    ux = lambda x, u, n: drift * (1.0 + 0.001 * n) * jnp.sign(u - 0.5)
    uy = lambda x, u, n: jnp.zeros_like(x)
    uz = lambda x, u, n: jnp.zeros_like(x)

    cap = geom.n_loc * npc
    host = initialize(
        spec, geom, npc, density, ux, uy, uz, dt, cap, seed=0,
        dtype=np.float64,
    )
    dev = initialize_device(
        spec, geom, mesh, npc, density, ux, uy, uz, dt, cap, seed=0,
    )

    assert int(np.sum(dev.alive)) == int(np.sum(host.alive))
    np.testing.assert_allclose(
        float(jnp.sum(jnp.where(dev.alive, dev.weight, 0.0))),
        float(np.sum(np.where(host.alive, host.weight, 0.0))),
        rtol=1e-12,
    )
    # per-cell macro-counts agree exactly
    ha = np.asarray(host.alive)
    da = np.asarray(dev.alive)
    h_cells = np.asarray(host.cell)[ha]
    d_cells = np.asarray(dev.cell)[da]
    h_dev = np.flatnonzero(ha) // cap
    d_dev = np.flatnonzero(da) // cap
    h_global = h_dev * geom.n_loc + h_cells
    d_global = d_dev * geom.n_loc + d_cells
    np.testing.assert_array_equal(
        np.bincount(h_global, minlength=geom.n_ext),
        np.bincount(d_global, minlength=geom.n_ext),
    )
    # statistical position/momentum agreement
    assert abs(np.asarray(dev.x)[da].mean() - 0.5) < 0.02
    assert abs(np.abs(np.asarray(dev.u)[da, 0]).mean() - drift) < drift * 0.01
    # gamma consistent with u
    u = np.asarray(dev.u)[da]
    np.testing.assert_allclose(
        np.asarray(dev.gamma)[da], np.sqrt(1.0 + np.sum(u * u, -1)), rtol=1e-12
    )


def test_device_init_photon_fields():
    geom = GridGeometry(nx=64, dx=500.0, xmin=0.0, n_devices=8)
    mesh = make_mesh(8)
    spec = SpeciesSpec.photon()
    dt = 1.0e-6
    st = initialize_device(
        spec, geom, mesh, 4,
        density=lambda x: np.ones_like(x),
        ux=lambda x, u, n: jnp.ones_like(x),
        uy=lambda x, u, n: jnp.zeros_like(x),
        uz=lambda x, u, n: jnp.zeros_like(x),
        dt=dt, capacity_per_device=geom.n_loc * 4, seed=3,
    )
    a = np.asarray(st.alive)
    assert a.sum() == 64 * 4
    np.testing.assert_allclose(np.asarray(st.gamma)[a], 1.0)  # |k|
    assert (np.asarray(st.tau_abs)[a] > 0).all()
    assert (np.asarray(st.birth_time)[a] == 0).all()
