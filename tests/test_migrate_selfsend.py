"""Single-device self-send migration shortcut.

On one device the ring exchange is a send-to-self (reference
``mod.rs:311-315``); for species with no sorted-layout contract the
sim replaces the full sort/compact migration with an in-place periodic
wrap / global-edge kill (``Simulation._wrap_kill``).  These tests pin
the equivalence: the shortcut must reproduce what a send-to-self +
reinsert produces (the exchange semantics, computed in numpy) for both
boundary kinds, and the sim must actually select the shortcut.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opal_tpu import constants as const
from opal_tpu.grid import GridGeometry

from opal_tpu.sim import SimOptions, Simulation
from opal_tpu.species import SpeciesSpec, initialize

pytestmark = pytest.mark.unit


def _sim(periodic: bool):
    dx = 500.0
    dt = 0.95 * dx / const.SPEED_OF_LIGHT
    geom = GridGeometry(
        nx=64, dx=dx, xmin=0.0, n_devices=1,
        left_boundary="periodic" if periodic else "laser",
        right_boundary="periodic" if periodic else "absorbing",
    )
    opts = SimOptions(dt=dt, migration_capacity=64)
    specs = {"photon": SpeciesSpec.photon()}
    sim = Simulation(geom, opts, specs, dtype=jnp.float32)
    return sim, geom


def _state(sim, geom, seed=0):
    rng = np.random.default_rng(seed)
    st = initialize(
        SpeciesSpec.photon(), geom, 0, lambda x: x * 0,
        None, None, None, sim.options.dt, 256, seed=1, dtype=np.float32,
    )
    n = st.alive.shape[0]
    alive = rng.random(n) < 0.5
    # cells straddling both edges by up to 3 (migration cadence M <= 3)
    cell = rng.integers(-3, geom.n_loc + 3, n).astype(np.int32)
    st = dataclasses.replace(
        st,
        alive=jnp.asarray(alive),
        weight=jnp.asarray(np.where(alive, 1.0, 0.0).astype(np.float32)),
        cell=jnp.asarray(cell),
        x=jnp.asarray(rng.random(n, dtype=np.float32)),
        ux=jnp.asarray(rng.standard_normal(n).astype(np.float32)),
    )
    return sim.shard_particles(st)


def _alive_rows(st):
    a = np.asarray(st.alive)
    rows = np.stack(
        [np.asarray(st.cell)[a].astype(np.float64),
         np.asarray(st.x)[a], np.asarray(st.ux)[a],
         np.asarray(st.weight)[a]], axis=1,
    )
    return sorted(map(tuple, np.round(rows, 6)))


@pytest.mark.parametrize("periodic", [True, False],
                         ids=["periodic", "edges"])
def test_wrap_kill_matches_exchange_semantics(periodic):
    """What a send-to-self + reinsert produces (reference
    mod.rs:311-315 + the edge-kill of mod.rs:309-329), computed in
    numpy, vs the in-place shortcut."""
    sim, geom = _sim(periodic)
    st = _state(sim, geom)
    cell0 = np.asarray(st.cell)
    alive0 = np.asarray(st.alive)
    if periodic:
        exp_cell = cell0 + np.where(cell0 < 0, geom.n_loc, 0) \
            - np.where(cell0 >= geom.n_loc, geom.n_loc, 0)
        exp_alive = alive0
    else:
        killed = alive0 & ((cell0 < geom.interior_start)
                           | (cell0 >= geom.interior_end))
        exp_cell = cell0
        exp_alive = alive0 & ~killed
    ref = dataclasses.replace(
        st,
        cell=jnp.asarray(exp_cell.astype(np.int32)),
        alive=jnp.asarray(exp_alive),
        weight=jnp.where(jnp.asarray(exp_alive), st.weight, 0.0),
        ux=jnp.where(jnp.asarray(exp_alive), st.ux, 0.0),
    )
    got, ovf2 = sim._wrap_kill(st)
    assert int(ovf2) == 0
    assert _alive_rows(ref) == _alive_rows(got)
    # wrapped cells are back in local range (periodic) / only interior
    # survivors remain (edge kill)
    a = np.asarray(got.alive)
    cells = np.asarray(got.cell)[a]
    if periodic:
        assert cells.min() >= 0 and cells.max() < geom.n_loc
    else:
        assert (cells >= geom.interior_start).all()
        assert (cells < geom.interior_end).all()


def test_sim_selects_shortcut_on_one_device():
    sim, geom = _sim(True)
    _fused, mig = sim._mig_fns()
    st = _state(sim, geom, seed=2)
    out, ovf = mig(st, geom, "x", 0, 64)
    # the shortcut moves no slots: row identity is preserved
    np.testing.assert_array_equal(
        np.asarray(out.alive), np.asarray(st.alive)
    )
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(st.x))
    assert not np.array_equal(np.asarray(out.cell), np.asarray(st.cell))
