"""Packed-layout fast path (``ops.fused.PackedState``): the fused
species rides the scanned step as one hot matrix + aux/weight arrays.
These tests pin (a) the pack/unpack round trip, (b) kernel equivalence
with the column-per-array kernel, (c) the packed edge migration, and
(d) end-to-end equivalence of a full ``Simulation.run``.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opal_tpu import constants as const
from opal_tpu.grid import HALO, GridGeometry
from opal_tpu.ops import fused as F
from opal_tpu.sim import SimOptions, Simulation, counter_total
from opal_tpu.species import SpeciesSpec, initialize

F32 = jnp.float32


def _electron_state(n, n_loc, block, seed=0, drift=0.05):
    """A cell-sorted electron ParticleState with one particle per cell
    row pattern (unique sort keys -> deterministic order)."""
    rng = np.random.default_rng(seed)
    cell = np.sort(rng.integers(0, n_loc, n)).astype(np.int32)
    x = rng.uniform(0.01, 0.99, n)
    ux = drift * np.where(rng.uniform(size=n) > 0.5, 1.0, -1.0)
    uy = 0.01 * rng.standard_normal(n)
    uz = 0.01 * rng.standard_normal(n)
    gamma = np.sqrt(1.0 + ux**2 + uy**2 + uz**2)
    from opal_tpu.species import ParticleState, _empty_fields

    fields = _empty_fields(SpeciesSpec.electron(), n, np.float32)
    fields.update(
        cell=cell, x=x.astype(np.float32), prev_x=x.astype(np.float32),
        y=rng.standard_normal(n).astype(np.float32),
        z=rng.standard_normal(n).astype(np.float32),
        weight=np.full(n, 2.0e5, np.float32),
        ux=ux.astype(np.float32), uy=uy.astype(np.float32),
        uz=uz.astype(np.float32), gamma=gamma.astype(np.float32),
        chi=np.zeros(n, np.float32),
        tau=rng.exponential(size=n).astype(np.float32),
        work=np.zeros(n, np.float32),
        alive=np.ones(n, bool),
    )
    return ParticleState(**{
        k: (None if v is None else jnp.asarray(v)) for k, v in fields.items()
    })


def test_pack_unpack_roundtrip():
    block = 256
    st = _electron_state(1024, 16, block)
    ps = F.pack_fused(st, block)
    assert ps.h.shape == (4, len(F.H_COLS), 2, 128)
    st2 = F.unpack_fused(ps, st)
    for name in ("cell", "x", "y", "z", "ux", "uy", "uz", "gamma",
                 "weight", "work", "chi", "tau", "prev_x"):
        a, b = getattr(st, name), getattr(st2, name)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
    np.testing.assert_array_equal(np.asarray(st.alive), np.asarray(st2.alive))


def test_packed_kernel_matches_column_kernel():
    """Same sorted state, same anchors -> identical columns and deposit
    slab from both kernel layouts (the physics helpers are shared; only
    the IO layout differs)."""
    block, W, n_loc = 256, 16, 16
    n = 1024
    st = _electron_state(n, n_loc, block)
    n_rows = n_loc + 2 * HALO + 2 * F.PAD
    spec = F.FusedSpec(
        block=block, window=W, n_rows=n_rows, dx=500.0,
        dt=0.95 * 500.0 / const.SPEED_OF_LIGHT,
        charge=const.ELEMENTARY_CHARGE * -1.0, mass=const.ELECTRON_MASS,
        pusher="vay", row_off=HALO + F.PAD,
    )
    rng = np.random.default_rng(3)
    eb = jnp.asarray(rng.standard_normal((n_rows, 8)) * 1e3, F32)
    eb = eb.at[:, 6:].set(0.0)
    anchors = F.block_anchors(spec, st.cell)

    cols, miss, slab, anch2 = F.fused_push_deposit(
        spec, anchors, st.cell, st.x, st.y, st.z, st.ux, st.uy, st.uz,
        st.gamma, st.weight, st.work, eb, interpret=True,
    )
    ps = F.pack_fused(st, block)
    H2, A2, slab2, anch2p = F.fused_push_deposit_packed(
        spec, anchors, ps.h, ps.weight, eb, interpret=True,
    )
    flat = lambda a: np.asarray(a).reshape(n)
    np.testing.assert_array_equal(np.asarray(cols["cell"]), flat(H2[:, 0]))
    np.testing.assert_array_equal(np.asarray(cols["x"]), flat(H2[:, 1]))
    np.testing.assert_array_equal(np.asarray(cols["y"]), flat(H2[:, 2]))
    np.testing.assert_array_equal(np.asarray(cols["z"]), flat(H2[:, 3]))
    np.testing.assert_array_equal(np.asarray(cols["ux"]), flat(H2[:, 4]))
    np.testing.assert_array_equal(np.asarray(cols["uy"]), flat(H2[:, 5]))
    np.testing.assert_array_equal(np.asarray(cols["uz"]), flat(H2[:, 6]))
    np.testing.assert_array_equal(np.asarray(cols["gamma"]), flat(H2[:, 7]))
    np.testing.assert_array_equal(np.asarray(cols["work"]), flat(H2[:, 8]))
    np.testing.assert_array_equal(np.asarray(cols["prev_x"]), flat(A2[:, 0]))
    np.testing.assert_array_equal(np.asarray(cols["chi"]), flat(A2[:, 1]))
    np.testing.assert_array_equal(np.asarray(cols["gh"]), flat(A2[:, 2]))
    np.testing.assert_array_equal(np.asarray(miss), flat(A2[:, 3]))
    np.testing.assert_array_equal(np.asarray(slab), np.asarray(slab2))
    np.testing.assert_array_equal(np.asarray(anch2), np.asarray(anch2p))


@pytest.mark.physics
def test_packed_edge_window_covers_boundary_upper_half_block():
    """Regression: with window <= block (kb == 1) the block-floored
    tail window [t0, t0+K) excluded an alive/dead boundary in the
    upper half-block (e.g. n_alive=1824 -> window [1536,1792)):
    right-leavers above it were never exchanged and the dead pool was
    invisible to arrivals.  kb is now floored at 2."""
    ndev, nx, npc = 4, 128, 57  # 1824 alive/device, 8 blocks of 256
    geom = GridGeometry(nx=nx, dx=500.0, xmin=0.0, n_devices=ndev)
    dt = 0.95 * 500.0 / const.SPEED_OF_LIGHT
    opts = SimOptions(
        dt=dt, current_deposition=True, migration=True,
        fused_pusher=True, fused_block=256, fused_window=40,
        fused_resort_every=4, fused_misfit_capacity=128,
        migration_every=3, migration_window=256, migration_capacity=64,
        packed_fused=True,
    )
    espec = SpeciesSpec.electron()
    sim = Simulation(geom, opts, {"electron": espec}, dtype=jnp.float32)
    state = initialize(
        espec, geom, npc,
        density=lambda x: np.full_like(np.asarray(x, float), 20.0),
        ux=lambda x, u, nr: 0.2 * np.sign(u - 0.5),
        uy=lambda x, u, nr: np.zeros_like(x),
        uz=lambda x, u, nr: np.zeros_like(x),
        dt=dt, capacity_per_device=256 * 8, seed=0, dtype=np.float32,
    )
    species = {"electron": sim.shard_particles(state)}
    E, B, J, rho = sim.init_fields()
    res = sim.run(
        E, B, J, rho, species, 0.0, jax.random.key(0),
        sim.zero_counters(), 24,
    )
    sp = res[4]["electron"]
    alive = np.asarray(sp.alive)
    cell = np.asarray(sp.cell)
    assert alive.sum() == nx * npc  # none lost
    assert counter_total(res[6]["electron"]) == 0
    n_loc = nx // ndev
    assert ((cell[alive] >= 0) & (cell[alive] < n_loc)).all()


def _mini_sim(packed: bool, nsteps: int = 8, npc: int = 1):
    """A small periodic two-stream run; npc=1 gives unique sort keys so
    packed and unpacked pipelines see identical particle orders."""
    ndev = 4
    nx = 128
    geom = GridGeometry(nx=nx, dx=500.0, xmin=0.0, n_devices=ndev)
    dt = 0.95 * 500.0 / const.SPEED_OF_LIGHT
    opts = SimOptions(
        dt=dt, current_deposition=True, migration=True,
        fused_pusher=True, fused_block=256, fused_window=40,
        fused_resort_every=4, fused_misfit_capacity=128,
        migration_every=3, migration_window=512, migration_capacity=64,
        packed_fused=packed,
        # the packed kernel always computes the full output set; bitwise
        # parity with the column kernel needs lite off (the lite work
        # chain re-associates by 1 ULP)
        fused_lite=0,
    )
    espec = SpeciesSpec.electron()
    sim = Simulation(geom, opts, {"electron": espec}, dtype=jnp.float32)
    drift = 0.2
    state = initialize(
        espec, geom, npc,
        density=lambda x: np.full_like(np.asarray(x, float), 20.0),
        ux=lambda x, u, nr: drift * np.sign(u - 0.5),
        uy=lambda x, u, nr: np.zeros_like(x),
        uz=lambda x, u, nr: np.zeros_like(x),
        dt=dt, capacity_per_device=256 * 2, seed=0, dtype=np.float32,
    )
    species = {"electron": sim.shard_particles(state)}
    E, B, J, rho = sim.init_fields()
    res = sim.run(
        E, B, J, rho, species, 0.0, jax.random.key(0),
        sim.zero_counters(), nsteps,
    )
    return res


@pytest.mark.physics
def test_packed_run_matches_unpacked():
    """Full scanned/shard_mapped run: the packed pipeline reproduces
    the unpacked one bit-for-bit (unique sort keys, shared kernels)."""
    r_packed = _mini_sim(True)
    r_plain = _mini_sim(False)
    for i, name in [(0, "E"), (1, "B"), (2, "J"), (3, "rho")]:
        np.testing.assert_array_equal(
            np.asarray(r_packed[i]), np.asarray(r_plain[i]), err_msg=name
        )
    sp_p, sp_u = r_packed[4]["electron"], r_plain[4]["electron"]
    for name in ("cell", "x", "ux", "uy", "uz", "gamma", "weight",
                 "work", "alive"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sp_p, name)),
            np.asarray(getattr(sp_u, name)), err_msg=name,
        )
    # no overflow in either pipeline
    assert counter_total(r_packed[6]["electron"]) == 0
    assert counter_total(r_plain[6]["electron"]) == 0


@pytest.mark.physics
def test_packed_migration_conserves_particles():
    """Fast drift forces boundary crossings every few steps; the packed
    edge exchange must conserve the global alive count and keep every
    cell in range."""
    res = _mini_sim(True, nsteps=24)
    sp = res[4]["electron"]
    alive = np.asarray(sp.alive)
    cell = np.asarray(sp.cell)
    assert alive.sum() == 128  # nx * npc, none lost
    assert counter_total(res[6]["electron"]) == 0
    n_loc = 128 // 4
    assert ((cell[alive] >= 0) & (cell[alive] < n_loc)).all()
    w = np.asarray(sp.weight)
    assert (w[alive] > 0).all() and (w[~alive] == 0).all()
