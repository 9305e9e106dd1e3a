"""Particle migration between device subdomains.

Replaces the reference's sort + slice + synchronous-send exchange
(``src/particle/mod.rs:284-375``) with fixed-capacity send buffers and
``lax.ppermute`` over the mesh ring — shape-stable: one 4-way key sort
compacts leavers to the buffer ends and exposes the dead slots for
insertion, and the whole SoA travels as a single packed matrix.
Particles that cross a non-periodic global boundary are deleted, as in
the reference (leavers with no neighbour are dropped).

Buffer overflow (more leavers in one step than the migration capacity)
loses the excess particles; the count is accumulated and surfaced in
diagnostics rather than silently ignored.  Leaving particles travel at
most one cell per step (CFL), so a generous capacity makes overflow
practically impossible.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from jax import lax, tree_util

from ..grid import GridGeometry
from ..species import ParticleState


def _layout(state: ParticleState):
    """(name, flat width, dtype, trailing shape) per non-None field, in
    dataclass order."""
    out = []
    for f in dataclasses.fields(state):
        a = getattr(state, f.name)
        if a is not None:
            w = 1 if a.ndim == 1 else int(np.prod(a.shape[1:]))
            out.append((f.name, w, a.dtype, a.shape[1:]))
    return out


def pack_state(state: ParticleState, dtype) -> jnp.ndarray:
    """Flatten the whole SoA into one (N, K) float matrix for
    transport.  Integer cells are exact in float (|cell| << 2^24) and
    the alive bit becomes 0/1 — see :func:`unpack_state`.

    Per-field tree_map transport costs one kernel launch per field per
    hop; at the measured ~0.5 ms/launch inside a device loop that
    dwarfs the data movement, so migration moves a single matrix.
    """
    pieces = []
    for name, w, _, _ in _layout(state):
        a = getattr(state, name)
        pieces.append(a.reshape(a.shape[0], w).astype(dtype))
    return jnp.concatenate(pieces, axis=1)


def unpack_state(packed: jnp.ndarray, template: ParticleState) -> ParticleState:
    """Inverse of :func:`pack_state` (shapes/dtypes from template)."""
    fields = {f.name: None for f in dataclasses.fields(template)}
    i = 0
    for name, w, dt, tail in _layout(template):
        sl = packed[:, i : i + w]
        a = sl.reshape((packed.shape[0],) + tail) if tail else sl[:, 0]
        if dt == jnp.bool_:
            a = a > 0.5
        elif jnp.issubdtype(dt, jnp.integer):
            a = jnp.round(a).astype(dt)
        else:
            a = a.astype(dt)
        fields[name] = a
        i += w
    return ParticleState(**fields)


def _column_index(state: ParticleState, field: str) -> int:
    i = 0
    for name, w, _, _ in _layout(state):
        if name == field:
            return i
        i += w
    raise KeyError(field)


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
    # ONE 4-way key sort yields the send tables at both ends AND the
    # dead-slot table for insertion in the middle (scatter-built
    # compaction tables cost ~3x more, and a separate dead-slot sort
    # would double the sort cost): left-leavers | dead | alive | right.
    n = state.alive.shape[0]
    gone = go_left | go_right | deleted
    dead_after = ~(state.alive & ~gone)
    key4 = jnp.where(
        go_left, 0, jnp.where(go_right, 3, jnp.where(dead_after, 1, 2))
    ).astype(jnp.int8)
    perm = jnp.argsort(key4, stable=True)
    n_left = jnp.sum(go_left)
    n_right = jnp.sum(go_right)

    left_table = perm[:cap]
    right_table = perm[::-1][:cap]  # rightmost slots, reversed order
    lane = jnp.arange(cap)
    left_valid = lane < n_left
    right_valid = lane < n_right
    overflow = jnp.maximum(n_left - cap, 0) + jnp.maximum(n_right - cap, 0)

    # --- packed transport: one matrix instead of one op per field ----
    fdtype = state.x.dtype
    packed = pack_state(state, fdtype)
    K = packed.shape[1]
    cell_col = _column_index(state, "cell")

    # cell reindex for the receiving side (mod.rs:291-293, 366-368)
    left_rows = packed[left_table].at[:, cell_col].add(n_loc)
    right_rows = packed[right_table].at[:, cell_col].add(-n_loc)

    perm_to_left = [(i, (i - 1) % ndev) for i in range(ndev)]
    perm_to_right = [(i, (i + 1) % ndev) for i in range(ndev)]
    from_right = lax.ppermute(left_rows, axis_name, perm_to_left)
    from_right_valid = lax.ppermute(left_valid, axis_name, perm_to_left)
    from_left = lax.ppermute(right_rows, axis_name, perm_to_right)
    from_left_valid = lax.ppermute(right_valid, axis_name, perm_to_right)

    # mark all leavers and boundary-deleted particles dead, zeroing
    # cell/weight/u/alive so later pushes and deposits are inert
    clear_cols = np.zeros(K, bool)
    for f in ("cell", "weight", "alive"):
        clear_cols[_column_index(state, f)] = True
    uc = _column_index(state, "u")
    clear_cols[uc : uc + 3] = True
    packed = jnp.where(
        gone[:, None] & jnp.asarray(clear_cols)[None, :], 0.0, packed
    )

    # --- insert received rows into dead slots ------------------------
    recv = jnp.concatenate([from_left, from_right])
    recv_valid = jnp.concatenate([from_left_valid, from_right_valid])
    m = recv_valid.shape[0]
    # free slots for insertion = the key-1 region perm[n_left : ...]
    # (dead slots that are NOT this step's leavers; leavers sort into
    # the end buckets, so their slots only become reusable next step)
    n_free = jnp.sum(dead_after) - n_left - n_right
    rank = jnp.cumsum(recv_valid) - 1
    ok = recv_valid & (rank < n_free)
    slot_idx = jnp.clip(n_left + rank, 0, n - 1).astype(jnp.int32)
    dest = jnp.where(ok, perm[slot_idx], n)
    packed = packed.at[dest].set(recv, mode="drop")
    ins_overflow = jnp.sum(recv_valid) - jnp.sum(ok)

    state = unpack_state(packed, state)
    return state, overflow + ins_overflow


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
