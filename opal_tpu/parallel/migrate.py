"""Particle migration between device subdomains.

Replaces the reference's sort + slice + synchronous-send exchange
(``src/particle/mod.rs:284-375``) with fixed-capacity send buffers and
``lax.ppermute`` over the mesh ring — shape-stable, no sorting
required.  Particles that cross a non-periodic global boundary are
deleted, as in the reference (leavers with no neighbour are dropped).

Buffer overflow (more leavers in one step than the migration capacity)
loses the excess particles; the count is accumulated and surfaced in
diagnostics rather than silently ignored.  Leaving particles travel at
most one cell per step (CFL), so a generous capacity makes overflow
practically impossible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, tree_util

from ..grid import GridGeometry
from ..species import ParticleState


def migrate(
    state: ParticleState,
    geom: GridGeometry,
    axis_name: str,
    axis_index,
    send_capacity: int,
):
    """Exchange particles that left the local subdomain.

    Returns ``(state, overflow_count)``.  ``state.cell`` must hold the
    post-push device-local cell; leavers have cell < 0 or >= n_loc.
    """
    n_loc = geom.n_loc
    ndev = geom.n_devices
    periodic = geom.left_boundary == "periodic"

    go_left = state.alive & (state.cell < 0)
    go_right = state.alive & (state.cell >= n_loc)

    if not periodic:
        # Delete at the global domain edges (reference: no neighbour ->
        # leavers dropped, mod.rs:309-329).  The interior spans
        # [left_pad, left_pad + nx) in extended cells; a particle
        # entering a boundary zone is gone.
        g = axis_index * n_loc + state.cell
        out_left = g < geom.interior_start
        out_right = g >= geom.interior_end
        deleted = state.alive & (out_left | out_right)
        go_left = go_left & ~out_left & ~out_right
        go_right = go_right & ~out_left & ~out_right
    else:
        deleted = jnp.zeros_like(go_left)

    cap = min(send_capacity, state.alive.shape[0])
    # one 3-way key sort replaces two scatter-built compaction tables
    # (a 2.6M-source scatter costs ~12 ms on TPU; the sort ~4 ms):
    # leavers-left sort to the front, leavers-right to the back.
    n = state.alive.shape[0]
    key3 = jnp.where(go_left, 0, jnp.where(go_right, 2, 1)).astype(jnp.int8)
    perm = jnp.argsort(key3, stable=True)
    n_left = jnp.sum(go_left)
    n_right = jnp.sum(go_right)

    left_table = perm[:cap]
    right_table = perm[::-1][:cap]  # rightmost slots, reversed order
    lane = jnp.arange(cap)
    left_valid = lane < n_left
    right_valid = lane < n_right

    left_buf = tree_util.tree_map(lambda a: a[left_table], state)
    right_buf = tree_util.tree_map(lambda a: a[right_table], state)
    overflow = jnp.maximum(n_left - cap, 0) + jnp.maximum(n_right - cap, 0)

    # cell reindex for the receiving side (mod.rs:291-293, 366-368)
    left_buf = tree_util.tree_map_with_path(
        lambda p, a: a + n_loc if p[0].name == "cell" else a, left_buf
    )
    right_buf = tree_util.tree_map_with_path(
        lambda p, a: a - n_loc if p[0].name == "cell" else a, right_buf
    )

    perm_to_left = [(i, (i - 1) % ndev) for i in range(ndev)]
    perm_to_right = [(i, (i + 1) % ndev) for i in range(ndev)]

    from_right = tree_util.tree_map(
        lambda a: lax.ppermute(a, axis_name, perm_to_left), left_buf
    )
    from_right_valid = lax.ppermute(left_valid, axis_name, perm_to_left)
    from_left = tree_util.tree_map(
        lambda a: lax.ppermute(a, axis_name, perm_to_right), right_buf
    )
    from_left_valid = lax.ppermute(right_valid, axis_name, perm_to_right)

    # mark all leavers and boundary-deleted particles dead, clearing
    # their kinematics so later pushes are inert
    gone = go_left | go_right | deleted
    state = _clear(state, gone)

    # merge both receive buffers and insert into free slots
    recv = tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b]), from_left, from_right
    )
    recv_valid = jnp.concatenate([from_left_valid, from_right_valid])
    state, ins_overflow = insert(state, recv, recv_valid)
    return state, overflow + ins_overflow


def _clear(state: ParticleState, mask):
    def clr(path, a):
        name = path[0].name
        if name == "alive":
            return a & ~mask
        if name in ("cell", "weight"):
            return jnp.where(mask, 0, a).astype(a.dtype)
        if name == "u":
            return jnp.where(mask[:, None], 0.0, a)
        return a

    return tree_util.tree_map_with_path(clr, state)


def insert(state: ParticleState, buf: ParticleState, valid):
    """Scatter ``valid`` buffer entries into dead slots of ``state``.

    Returns (state, overflow) where overflow counts entries that found
    no free slot.  Used by migration and by photon emission.
    """
    n = state.alive.shape[0]
    m = valid.shape[0]
    dead = ~state.alive
    n_free = jnp.sum(dead)

    # table of the first min(m, n_free) dead slots: a stable sort on
    # the alive bit (False sorts first) beats the equivalent
    # full-length prefix-sum scatter ~3x on TPU
    slots = jnp.argsort(state.alive, stable=True)[:m].astype(jnp.int32)

    rank = jnp.cumsum(valid) - 1  # destination rank among valid entries
    ok = valid & (rank < n_free) & (rank < m)
    dest = slots[jnp.clip(rank, 0, m - 1)]
    # route rejected entries to a dummy slot index n (dropped by scatter)
    dest = jnp.where(ok, dest, n)

    def put(path, a, b):
        if a is None:
            return None
        name = path[0].name
        if name == "alive":
            return a.at[dest].set(ok, mode="drop")
        return a.at[dest].set(b, mode="drop")

    state = tree_util.tree_map_with_path(put, state, buf)
    overflow = jnp.sum(valid) - jnp.sum(ok)
    return state, overflow
