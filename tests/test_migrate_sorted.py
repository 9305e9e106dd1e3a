"""Sorted-pipeline migration: invariants and parity with the classic
exchange (reference semantics: ``src/particle/mod.rs:284-375``)."""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from opal_tpu.grid import GridGeometry
from opal_tpu.parallel.migrate import migrate, migrate_compact, migrate_sorted
from opal_tpu.species import ParticleState, SpeciesSpec, _empty_fields


def _random_state(geom, cap_per_dev, n_alive_per_dev, seed, spill=True):
    """Host state with alive particles in random slots/cells, a few of
    which have just left their subdomain (cell -1 or n_loc)."""
    rng = np.random.default_rng(seed)
    ndev = geom.n_devices
    f = _empty_fields(SpeciesSpec.electron(), ndev * cap_per_dev, np.float64)
    for d in range(ndev):
        slots = d * cap_per_dev + rng.choice(
            cap_per_dev, n_alive_per_dev, replace=False
        )
        cells = rng.integers(0, geom.n_loc, n_alive_per_dev)
        if spill:
            k = max(1, n_alive_per_dev // 8)
            cells[:k] = -1
            cells[k : 2 * k] = geom.n_loc
        f["alive"][slots] = True
        f["cell"][slots] = cells
        f["x"][slots] = rng.random(n_alive_per_dev)
        f["prev_x"][slots] = rng.random(n_alive_per_dev)
        f["weight"][slots] = 1.0 + rng.random(n_alive_per_dev)
        u = rng.normal(size=(n_alive_per_dev, 3))
        f["ux"][slots], f["uy"][slots], f["uz"][slots] = u.T
        f["gamma"][slots] = np.sqrt(1.0 + np.sum(u**2, axis=1))
        f["tau"][slots] = rng.exponential(size=n_alive_per_dev)
        f["work"][slots] = rng.normal(size=n_alive_per_dev)
    return ParticleState(**{k: (None if v is None else jnp.asarray(v)) for k, v in f.items()})


def _run(fn, state, geom, cap):
    from opal_tpu.fields import make_mesh

    mesh = make_mesh(geom.n_devices)
    specs = jax.tree_util.tree_map(
        lambda a: P("x", *([None] * (a.ndim - 1))), state
    )

    def device_fn(st):
        ai = jax.lax.axis_index("x")
        out, ovf = fn(st, geom, "x", ai, cap)
        return out, jax.lax.psum(ovf, "x")

    return jax.jit(
        jax.shard_map(
            device_fn, mesh=mesh, in_specs=(specs,),
            out_specs=(specs, P()), check_vma=False,
        )
    )(state)


def _alive_multiset(state, geom, ndev, cap_per_dev):
    """(global_cell, weight, ux) triples of alive particles, sorted —
    an order-independent fingerprint of the physical content."""
    al = np.asarray(state.alive)
    dev = np.arange(al.shape[0]) // cap_per_dev
    g = dev * geom.n_loc + np.asarray(state.cell)
    rows = np.stack(
        [g[al], np.asarray(state.weight)[al], np.asarray(state.ux)[al],
         np.asarray(state.x)[al], np.asarray(state.work)[al]], axis=1
    )
    return rows[np.lexsort(rows.T[::-1])]


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_sorted_matches_classic_content(ndev):
    geom = GridGeometry(nx=8 * ndev * 4 // ndev * ndev, dx=1.0, xmin=0.0,
                        n_devices=ndev)
    geom = GridGeometry(nx=32 * ndev, dx=1.0, xmin=0.0, n_devices=ndev)
    cap = 256
    state = _random_state(geom, cap, 96, seed=3)

    out_s, ovf_s = _run(migrate_sorted, state, geom, 64)
    out_c, ovf_c = _run(migrate, state, geom, 64)

    assert int(ovf_s) == 0 and int(ovf_c) == 0
    a = _alive_multiset(out_s, geom, ndev, cap)
    b = _alive_multiset(out_c, geom, ndev, cap)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


@pytest.mark.parametrize("ndev", [1, 4])
def test_sorted_invariants(ndev):
    geom = GridGeometry(nx=32 * ndev, dx=1.0, xmin=0.0, n_devices=ndev)
    cap = 256
    state = _random_state(geom, cap, 100, seed=11)
    out, ovf = _run(migrate_sorted, state, geom, 64)
    assert int(ovf) == 0

    cells = np.asarray(out.cell).reshape(ndev, cap)
    alive = np.asarray(out.alive).reshape(ndev, cap)
    for d in range(ndev):
        # the WHOLE cell column (live placeholder included) is
        # non-decreasing — the sort-free deposition invariant
        assert np.all(np.diff(cells[d]) >= 0), d
        # every cell (alive or placeholder) lies in [0, n_loc)
        assert cells[d].min() >= 0 and cells[d].max() < geom.n_loc
        # no alive particle remains out of domain
        assert np.all(cells[d][alive[d]] >= 0)
        assert np.all(cells[d][alive[d]] < geom.n_loc)


def test_sorted_tight_capacity():
    """High fill fraction: rl_start + cap exceeds the buffer length, so
    the right-arrival write must be a bounded scatter (a clamped
    dynamic_update_slice would shift the block onto live rows)."""
    ndev = 4
    geom = GridGeometry(nx=24 * ndev, dx=1.0, xmin=0.0, n_devices=ndev)
    cap = 384
    state = _random_state(geom, cap, 300, seed=7)
    n0 = int(jnp.sum(state.alive))

    out_s, ovf_s = _run(migrate_sorted, state, geom, 96)
    out_c, ovf_c = _run(migrate, state, geom, 96)

    assert int(jnp.sum(out_s.alive)) + int(ovf_s) == n0
    assert int(ovf_s) == 0 and int(ovf_c) == 0
    a = _alive_multiset(out_s, geom, ndev, cap)
    b = _alive_multiset(out_c, geom, ndev, cap)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)

    cells = np.asarray(out_s.cell).reshape(ndev, cap)
    for d in range(ndev):
        assert np.all(np.diff(cells[d]) >= 0), d
        assert cells[d].min() >= 0 and cells[d].max() < geom.n_loc


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_compact_matches_classic_content(ndev):
    """migrate_compact (index-table exchange) moves exactly the same
    physical content as the full-state variant."""
    geom = GridGeometry(nx=32 * ndev, dx=1.0, xmin=0.0, n_devices=ndev)
    cap = 256
    state = _random_state(geom, cap, 96, seed=3)

    out_c, ovf_c = _run(migrate_compact, state, geom, 64)
    out_f, ovf_f = _run(migrate, state, geom, 64)

    assert int(ovf_c) == 0 and int(ovf_f) == 0
    a = _alive_multiset(out_c, geom, ndev, cap)
    b = _alive_multiset(out_f, geom, ndev, cap)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)
    # retired rows are inert: weight/u zeroed, cell in range
    al = np.asarray(out_c.alive)
    assert np.all(np.asarray(out_c.weight)[~al] == 0.0)
    cells = np.asarray(out_c.cell)
    assert cells.min() >= 0 and cells.max() < geom.n_loc


def test_compact_non_periodic_deletes_at_edges():
    ndev = 4
    geom = GridGeometry(
        nx=32 * ndev, dx=1.0, xmin=0.0, n_devices=ndev,
        left_boundary="laser", right_boundary="absorbing",
    )
    cap = 256
    state = _random_state(geom, cap, 96, seed=5)
    out_c, ovf_c = _run(migrate_compact, state, geom, 64)
    out_f, ovf_f = _run(migrate, state, geom, 64)
    a = _alive_multiset(out_c, geom, ndev, cap)
    b = _alive_multiset(out_f, geom, ndev, cap)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)
    assert int(ovf_c) == int(ovf_f)


def test_sorted_arrival_with_no_left_flux():
    """Regression: a device with NO arrivals-from-left must keep its
    dead rows in the tail so arrivals-from-right can land.  (A
    fixed-size front gap consumed every dead row and dropped the
    arrival as 'overflow' while free slots existed.)"""
    ndev = 2
    geom = GridGeometry(nx=16 * ndev, dx=1.0, xmin=0.0, n_devices=ndev)
    cap = 64
    state = _random_state(geom, cap, 60, seed=2, spill=False)
    # device 1: one left-leaver -> arrives at device 0 from the right
    cells_h = np.array(state.cell)
    leaver = cap + np.flatnonzero(np.asarray(state.alive)[cap:])[0]
    cells_h[leaver] = -1
    state = dataclasses.replace(state, cell=jnp.asarray(cells_h))
    n0 = int(jnp.sum(state.alive))

    out, ovf = _run(migrate_sorted, state, geom, 16)
    assert int(ovf) == 0
    assert int(jnp.sum(out.alive)) == n0
    cells = np.asarray(out.cell).reshape(ndev, cap)
    for d in range(ndev):
        assert np.all(np.diff(cells[d]) >= 0), d
        assert cells[d].min() >= 0 and cells[d].max() < geom.n_loc


def test_sorted_preserves_particle_count_periodic():
    ndev = 4
    geom = GridGeometry(nx=32 * ndev, dx=1.0, xmin=0.0, n_devices=ndev)
    cap = 256
    state = _random_state(geom, cap, 100, seed=5)
    n0 = int(jnp.sum(state.alive))
    out, ovf = _run(migrate_sorted, state, geom, 64)
    assert int(jnp.sum(out.alive)) + int(ovf) == n0


def _sorted_state(geom, cap_per_dev, n_alive_per_dev, seed):
    """Cell-SORTED per-device state (alive rows ascending by cell, dead
    pool at the tail) with leavers at both edges — the layout
    migrate_edges is contracted to (fused pipeline + sort_state)."""
    rng = np.random.default_rng(seed)
    ndev = geom.n_devices
    f = _empty_fields(SpeciesSpec.electron(), ndev * cap_per_dev, np.float64)
    for d in range(ndev):
        cells = np.sort(rng.integers(0, geom.n_loc, n_alive_per_dev))
        k = max(1, n_alive_per_dev // 10)
        cells[:k] = -1          # left leavers at the head
        cells[-k:] = geom.n_loc  # right leavers at the alive tail
        sl = slice(d * cap_per_dev, d * cap_per_dev + n_alive_per_dev)
        f["alive"][sl] = True
        f["cell"][sl] = cells
        f["x"][sl] = rng.random(n_alive_per_dev)
        f["prev_x"][sl] = rng.random(n_alive_per_dev)
        f["weight"][sl] = 1.0 + rng.random(n_alive_per_dev)
        u = rng.normal(size=(n_alive_per_dev, 3))
        f["ux"][sl], f["uy"][sl], f["uz"][sl] = u.T
        f["gamma"][sl] = np.sqrt(1.0 + np.sum(u**2, axis=1))
        f["tau"][sl] = rng.exponential(size=n_alive_per_dev)
        f["work"][sl] = rng.normal(size=n_alive_per_dev)
        # dead tail keeps an in-range placeholder cell (sort_state
        # contract)
        tail = slice(d * cap_per_dev + n_alive_per_dev,
                     (d + 1) * cap_per_dev)
        f["cell"][tail] = geom.n_loc - 1
    return ParticleState(**{
        k: (None if v is None else jnp.asarray(v)) for k, v in f.items()
    })


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_edges_matches_compact_content(ndev):
    from opal_tpu.parallel.migrate import migrate_edges

    geom = GridGeometry(nx=32 * ndev, dx=1.0, xmin=0.0, n_devices=ndev)
    cap = 256
    state = _sorted_state(geom, cap, 200, seed=5)

    edges = partial(migrate_edges, window=64)
    out_e, ovf_e = _run(edges, state, geom, 24)
    out_c, ovf_c = _run(migrate_compact, state, geom, 24)

    assert int(ovf_e) == 0 and int(ovf_c) == 0
    a = _alive_multiset(out_e, geom, ndev, cap)
    b = _alive_multiset(out_c, geom, ndev, cap)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)
    # arrivals landed in-domain; no alive row left out of range
    cells = np.asarray(out_e.cell)
    alive = np.asarray(out_e.alive)
    assert np.all(cells[alive] >= 0)
    assert np.all(cells[alive] < geom.n_loc)


def test_edges_counts_out_of_window_leavers():
    """A leaver hiding OUTSIDE the head/tail windows is not exchanged
    but must be counted into the overflow (never silent)."""
    from opal_tpu.parallel.migrate import migrate_edges

    ndev = 2
    geom = GridGeometry(nx=32 * ndev, dx=1.0, xmin=0.0, n_devices=ndev)
    cap = 256
    state = _sorted_state(geom, cap, 200, seed=9)
    # plant a stray leaver in the middle of device 0 (row 100)
    cell = state.cell.at[100].set(-1)
    state = dataclasses.replace(state, cell=cell)

    edges = partial(migrate_edges, window=64)
    out, ovf = _run(edges, state, geom, 32)
    assert int(ovf) == 1
    # the stray is untouched, still flagged out-of-domain
    assert int(out.cell[100]) == -1


def test_edges_asymmetric_flux_spills_into_dead_pool():
    """More left-arrivals than left-leavers: the excess must land in
    free slots (the tail dead pool), not be dropped."""
    from opal_tpu.parallel.migrate import migrate_edges

    ndev = 2
    geom = GridGeometry(nx=32 * ndev, dx=1.0, xmin=0.0, n_devices=ndev)
    cap = 256
    # device 0: many right-leavers; device 1: few leavers
    rng = np.random.default_rng(3)
    f = _empty_fields(SpeciesSpec.electron(), ndev * cap, np.float64)
    for d in range(ndev):
        n_alive = 200
        cells = np.sort(rng.integers(0, geom.n_loc, n_alive))
        if d == 0:
            cells[-20:] = geom.n_loc  # 20 right-leavers, no left
        sl = slice(d * cap, d * cap + n_alive)
        f["alive"][sl] = True
        f["cell"][sl] = cells
        f["weight"][sl] = 1.0 + rng.random(n_alive)
        u = rng.normal(size=(n_alive, 3))
        f["ux"][sl], f["uy"][sl], f["uz"][sl] = u.T
        f["gamma"][sl] = np.sqrt(1.0 + np.sum(u**2, axis=1))
        f["tau"][sl] = 1.0
        f["work"][sl] = 0.0
        f["cell"][d * cap + n_alive:(d + 1) * cap] = geom.n_loc - 1
    state = ParticleState(**{
        k: (None if v is None else jnp.asarray(v)) for k, v in f.items()
    })
    n0 = int(jnp.sum(state.alive))

    edges = partial(migrate_edges, window=64)
    out, ovf = _run(edges, state, geom, 32)
    assert int(ovf) == 0
    assert int(jnp.sum(out.alive)) == n0
    cells = np.asarray(out.cell)
    alive = np.asarray(out.alive)
    assert np.all(cells[alive] >= 0) and np.all(cells[alive] < geom.n_loc)


def test_edges_pad_deletions_do_not_go_negative():
    """Non-periodic boundary absorptions in the pad region (laser
    boundary: cells in [0, left_pad) on device 0) are deletions, not
    exchanges — they must not drive the overflow counter negative."""
    from opal_tpu.parallel.migrate import migrate_edges

    ndev = 2
    geom = GridGeometry(
        nx=64, dx=1.0, xmin=0.0, n_devices=ndev,
        left_boundary="laser", right_boundary="absorbing",
    )
    cap = 256
    rng = np.random.default_rng(4)
    f = _empty_fields(SpeciesSpec.electron(), ndev * cap, np.float64)
    n_pad = 12
    # the whole interior [interior_start, interior_end) lives on device
    # 0 here (the absorbing damping pad fills device 1), so the test
    # population goes on device 0: n_pad rows inside the laser pad
    # (g < interior_start -> absorbed) plus interior rows that stay
    n_alive = 150
    cells = np.sort(np.concatenate([
        np.arange(n_pad) % geom.left_pad,
        rng.integers(geom.left_pad, geom.left_pad + 60, n_alive - n_pad),
    ]))
    sl = slice(0, n_alive)
    f["alive"][sl] = True
    f["cell"][sl] = cells
    f["weight"][sl] = 1.0
    f["gamma"][sl] = 1.0
    f["tau"][sl] = 1.0
    f["work"][sl] = 0.0
    f["cell"][n_alive:] = geom.n_loc - 1
    state = ParticleState(**{
        k: (None if v is None else jnp.asarray(v)) for k, v in f.items()
    })
    n0 = int(jnp.sum(state.alive))

    edges = partial(migrate_edges, window=64)
    out, ovf = _run(edges, state, geom, 32)
    assert int(ovf) == 0, f"overflow counter went to {int(ovf)}"
    # the pad particles were absorbed (deleted), nothing else changed
    assert int(jnp.sum(out.alive)) == n0 - n_pad


def test_sort_state_rowgather_exact_equivalence():
    """The rowgather strategy (key+iota sort + one row permutation
    gather) must reproduce the payload sort bit-for-bit: lax.sort is
    stable, so the iota payload IS the payload-sort permutation."""
    from opal_tpu.parallel.migrate import sort_state

    geom = GridGeometry(nx=64, dx=1.0, xmin=0.0, n_devices=1)
    state = _random_state(geom, 512, 300, seed=11)
    for keep_chi in (False, True):
        a = jax.jit(
            lambda s: sort_state(s, geom.n_loc, keep_chi=keep_chi)
        )(state)
        b = jax.jit(
            lambda s: sort_state(
                s, geom.n_loc, keep_chi=keep_chi, rowgather=True
            )
        )(state)
        for fld in type(state).__dataclass_fields__:
            va, vb = getattr(a, fld), getattr(b, fld)
            if va is None:
                assert vb is None, fld
                continue
            assert np.array_equal(np.asarray(va), np.asarray(vb)), fld
