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

import jax
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
    for f in ("ux", "uy", "uz"):
        clear_cols[_column_index(state, f)] = True
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


_BIG = 2**30


def migrate_sorted(
    state: ParticleState,
    geom: GridGeometry,
    axis_name: str,
    axis_index,
    send_capacity: int,
):
    """Migration fused with the sorted-pipeline maintenance sort.

    One cell-argsort + one row-permutation apply establishes the layout

        [ gap (dead, sized to arrivals-from-left) |
          left-leavers | interior | right-leavers | dead tail ]

    after which the exchange is pure slicing: leavers ship as contiguous
    rows over the ``ppermute`` ring, left arrivals land right-aligned in
    the gap and right arrivals extend into the tail.  The state exits
    **strictly cell-non-decreasing** with dead rows carrying in-range
    placeholder cells (0 in the gap, ``n_loc - 1`` in the tail) — the
    invariant that lets deposition skip its own sort and gives the
    fused push kernel bounded per-block cell windows.

    Same physics as :func:`migrate` / the reference's sort + splice +
    ssend/recv exchange (``src/particle/mod.rs:284-375``): leavers with
    no neighbour (non-periodic global edge) are dropped, capacity
    overflow is counted, and CFL guarantees one-cell-per-step motion.

    Arrivals that find no room (left: gap exhausted; right: capacity
    tail exhausted) are dropped and counted as overflow, exactly like
    send-buffer overflow.  ``cap`` is clamped to ``capacity/4``.

    Returns ``(state, overflow_count)``.
    """
    n_loc, ndev = geom.n_loc, geom.n_devices
    periodic = geom.left_boundary == "periodic"
    n = state.alive.shape[0]
    cap = int(min(send_capacity, n // 4))

    alive, cell = state.alive, state.cell
    go_left = alive & (cell < 0)
    go_right = alive & (cell >= n_loc)
    if not periodic:
        # delete at the global domain edges (mod.rs:309-329)
        g = axis_index * n_loc + cell
        out_left = g < geom.interior_start
        out_right = g >= geom.interior_end
        deleted = alive & (out_left | out_right)
        go_left = go_left & ~out_left & ~out_right
        go_right = go_right & ~out_left & ~out_right
    else:
        deleted = jnp.zeros_like(alive)

    n_left = jnp.sum(go_left)
    n_right = jnp.sum(go_right)
    nl_c = jnp.minimum(n_left, cap)
    nr_c = jnp.minimum(n_right, cap)

    perm_to_left = [(i, (i - 1) % ndev) for i in range(ndev)]
    perm_to_right = [(i, (i + 1) % ndev) for i in range(ndev)]
    # exchange the leaver COUNTS first (scalar hop): the front gap is
    # sized to exactly the arrivals-from-left, so every remaining dead
    # row stays in the tail for arrivals-from-right.  (A fixed-size gap
    # can strand all slack at the front and drop arrivals while free
    # slots exist.)  The counts also give the arrival masks, replacing
    # per-lane validity ppermutes.
    n_arr_l = lax.ppermute(nr_c, axis_name, perm_to_right)
    n_arr_r = lax.ppermute(nl_c, axis_name, perm_to_left)

    dead = ~alive | deleted
    dead_rank = jnp.cumsum(dead.astype(jnp.int32))
    front_gap = dead & (dead_rank <= n_arr_l)
    skey = jnp.where(
        front_gap, -_BIG, jnp.where(dead, _BIG, cell)
    ).astype(jnp.int32)

    n_gap = jnp.sum(front_gap)
    n_live = jnp.sum(alive & ~deleted)  # leavers still count as live

    # pack with dead rows pre-fixed: alive cleared for deletions, tail
    # placeholder cell so the sorted cell column is non-decreasing
    fixed = dataclasses.replace(
        state,
        cell=jnp.where(dead, n_loc - 1, cell).astype(cell.dtype),
        alive=alive & ~deleted,
    )
    fdtype = state.x.dtype
    packed = pack_state(fixed, fdtype)
    K = packed.shape[1]
    # multi-operand payload sort, NOT argsort + row gather: payloads
    # ride the sort network with tiled access, while applying a random
    # permutation afterwards is a latency-bound gather (measured 36 vs
    # 97 ms at 2.6M x 14 columns on v5e)
    sorted_cols = lax.sort(
        (skey, *(packed[:, i] for i in range(K))), num_keys=1
    )
    packed = jnp.stack(sorted_cols[1:], axis=1)
    cell_col = _column_index(state, "cell")
    alive_col = _column_index(state, "alive")

    lane = jnp.arange(cap)
    ll_start = n_gap
    rl_start = n_gap + n_live - nr_c

    send_left = lax.dynamic_slice_in_dim(packed, ll_start, cap)
    send_left = send_left.at[:, cell_col].add(n_loc)  # reindex (mod.rs:291)
    # rl_start + cap may exceed n; a dynamic_slice would clamp the read
    # start and ship live interior rows, so gather with fill instead
    # (valid leaver rows rl_start..rl_start+nr_c are always in range)
    send_right = jnp.take(
        packed, rl_start + lane, axis=0, mode="fill", fill_value=0.0
    )
    send_right = send_right.at[:, cell_col].add(-n_loc)
    overflow = jnp.maximum(n_left - cap, 0) + jnp.maximum(n_right - cap, 0)

    from_right = lax.ppermute(send_left, axis_name, perm_to_left)
    from_left = lax.ppermute(send_right, axis_name, perm_to_right)
    fl_valid = lane < n_arr_l
    fr_valid = lane < n_arr_r

    # mark leaver rows dead with sorted-compatible placeholder cells
    riota = jnp.arange(n)
    m_gap = riota < n_gap
    m_ll = (riota >= ll_start) & (riota < ll_start + n_left)
    # ALL right-leavers go dead (unsent ones are dropped as overflow);
    # leaving them alive would keep cells >= n_loc in the live region
    m_rl = (riota >= n_gap + n_live - n_right) & (riota < n_gap + n_live)
    packed = packed.at[:, alive_col].set(
        jnp.where(m_ll | m_rl, 0.0, packed[:, alive_col])
    )
    packed = packed.at[:, cell_col].set(
        jnp.where(
            m_gap | m_ll, 0.0,
            jnp.where(m_rl, float(n_loc - 1), packed[:, cell_col]),
        )
    )

    # left arrivals: right-aligned into the gap (cells are exactly 0,
    # so gap(0) <= arrivals(0) <= interior stays non-decreasing)
    na = jnp.minimum(n_arr_l, n_gap)
    start_l = n_gap - na
    ex = lax.dynamic_slice_in_dim(packed, start_l, cap)
    block = jnp.where((fl_valid & (lane < na))[:, None], from_left, ex)
    packed = lax.dynamic_update_slice_in_dim(packed, block, start_l, 0)
    overflow = overflow + (n_arr_l - na)

    # right arrivals: overwrite the right-leaver slots and extend into
    # the dead tail (cells are exactly n_loc - 1; tail placeholder
    # matches, so order is preserved).  Masked scatter, NOT a
    # dynamic_update_slice: rl_start + cap may exceed n and XLA would
    # clamp the start, shifting the block onto live rows.  Arrivals
    # past the end of the buffer are dropped and counted.
    idx_r = rl_start + lane
    fit = fr_valid & (idx_r < n)
    overflow = overflow + (n_arr_r - jnp.sum(fit))
    rows = jnp.where(fit, idx_r, n)
    packed = packed.at[rows].set(
        jnp.where(fit[:, None], from_right, 0.0), mode="drop"
    )

    return unpack_state(packed, state), overflow


def _gather_rows(state: ParticleState, idx):
    """(len(idx), K) packed rows gathered per column (out-of-range
    indices yield zeros)."""
    pieces = []
    for name, w, _, _ in _layout(state):
        a = getattr(state, name)
        rows = jnp.take(a, idx, axis=0, mode="fill", fill_value=0)
        pieces.append(rows.reshape(idx.shape[0], w).astype(state.x.dtype))
    return jnp.concatenate(pieces, axis=1)


def _scatter_rows(state: ParticleState, idx, packed, valid):
    """Scatter packed rows into ``state`` at ``idx`` (rows with
    ``valid`` False are dropped via an out-of-range index)."""
    n = state.alive.shape[0]
    dest = jnp.where(valid, idx, n)
    fields = {}
    i = 0
    for name, w, dt, tail in _layout(state):
        sl = packed[:, i : i + w]
        v = sl.reshape((idx.shape[0],) + tail) if tail else sl[:, 0]
        if dt == jnp.bool_:
            v = v > 0.5
        elif jnp.issubdtype(dt, jnp.integer):
            v = jnp.round(v).astype(dt)
        else:
            v = v.astype(dt)
        fields[name] = getattr(state, name).at[dest].set(v, mode="drop")
        i += w
    return dataclasses.replace(state, **fields)


def migrate_compact(
    state: ParticleState,
    geom: GridGeometry,
    axis_name: str,
    axis_index,
    send_capacity: int,
):
    """Leaver-count-proportional migration (same semantics as
    :func:`migrate`): leavers and free slots are located with ONE
    blocked cumulative sum + searchsorted index tables, so all data
    movement is (send_capacity, K)-sized.  The full-state variant pays
    a stable argsort, a pack/unpack round trip and full-length masked
    clears (~17 ms at 2.6M rows on v5e) for work that involves a few
    thousand rows (~2 ms here).

    Reference: sort + splice + ssend/recv (src/particle/mod.rs:284-375).
    """
    from ..ops.deposit import _cumsum_cols

    n_loc, ndev = geom.n_loc, geom.n_devices
    periodic = geom.left_boundary == "periodic"
    n = state.alive.shape[0]
    cap = int(min(send_capacity, n // 2))

    alive, cell = state.alive, state.cell
    go_left = alive & (cell < 0)
    go_right = alive & (cell >= n_loc)
    if not periodic:
        # delete at the global domain edges (mod.rs:309-329)
        g = axis_index * n_loc + cell
        out_left = g < geom.interior_start
        out_right = g >= geom.interior_end
        deleted = alive & (out_left | out_right)
        go_left = go_left & ~out_left & ~out_right
        go_right = go_right & ~out_left & ~out_right
    else:
        deleted = jnp.zeros_like(alive)

    gone = go_left | go_right | deleted
    dead_after = ~alive | gone
    # ONE blocked cumsum + ONE batched searchsorted yields all four
    # index tables (left/right send rows, retired rows, free slots):
    # separate cumsums + searchsorteds cost ~3 full-length passes and
    # four binary-search kernels (~5 ms at 2.6M rows on v5e).
    # dead_after is exactly the post-retire free mask, so the free-slot
    # table can be built from the same pass.
    m4 = jnp.stack(
        [go_left, go_right, gone, dead_after], axis=1
    ).astype(jnp.int32)
    cum = _cumsum_cols(m4)
    n_left = cum[-1, 0]
    n_right = cum[-1, 1]
    n_free = cum[-1, 3]

    q = jnp.arange(1, 2 * cap + 1, dtype=cum.dtype)
    tabs = jax.vmap(jnp.searchsorted, in_axes=(1, None))(cum, q).astype(
        jnp.int32
    )
    lt = tabs[0, :cap]
    rt = tabs[1, :cap]
    gt = tabs[2]
    ft = tabs[3]
    lane = jnp.arange(cap)
    lvalid = lane < n_left
    rvalid = lane < n_right
    overflow = jnp.maximum(n_left - cap, 0) + jnp.maximum(n_right - cap, 0)

    cell_col = _column_index(state, "cell")
    send_left = _gather_rows(state, lt).at[:, cell_col].add(n_loc)
    send_right = _gather_rows(state, rt).at[:, cell_col].add(-n_loc)

    perm_to_left = [(i, (i - 1) % ndev) for i in range(ndev)]
    perm_to_right = [(i, (i + 1) % ndev) for i in range(ndev)]
    n_arr_l = lax.ppermute(
        jnp.minimum(n_right, cap), axis_name, perm_to_right
    )
    n_arr_r = lax.ppermute(jnp.minimum(n_left, cap), axis_name, perm_to_left)
    from_right = lax.ppermute(send_left, axis_name, perm_to_left)
    from_left = lax.ppermute(send_right, axis_name, perm_to_right)

    # retire leavers and boundary-deleted rows: clear alive plus the
    # fields later passes might read through dead rows (cell in range,
    # weight/momentum zero -> inert in push, deposit, energy sums)
    zero32 = jnp.zeros((2 * cap,), jnp.float32)
    state = dataclasses.replace(
        state,
        alive=state.alive.at[gt].set(False, mode="drop"),
        cell=state.cell.at[gt].set(0, mode="drop"),
        weight=state.weight.at[gt].set(
            zero32.astype(state.weight.dtype), mode="drop"
        ),
        ux=state.ux.at[gt].set(zero32.astype(state.ux.dtype), mode="drop"),
        uy=state.uy.at[gt].set(zero32.astype(state.uy.dtype), mode="drop"),
        uz=state.uz.at[gt].set(zero32.astype(state.uz.dtype), mode="drop"),
    )

    # arrivals land in free slots (leaver slots just vacated included;
    # ft/n_free come from the dead_after column of the fused cumsum)
    recv = jnp.concatenate([from_left, from_right])
    rlane = jnp.arange(2 * cap)
    rv = jnp.concatenate([lane < n_arr_l, lane < n_arr_r])
    rrank = jnp.cumsum(rv.astype(jnp.int32)) - 1
    ok = rv & (rrank < n_free) & (rrank < 2 * cap)
    slots = jnp.take(ft, jnp.clip(rrank, 0, 2 * cap - 1), mode="clip")
    state = _scatter_rows(state, slots, recv, ok)
    ins_overflow = jnp.sum(rv.astype(jnp.int32)) - jnp.sum(ok.astype(jnp.int32))
    return state, overflow + ins_overflow


def sort_state(
    state: ParticleState, n_loc: int, keep_chi: bool = False,
    rowgather: bool = False,
) -> ParticleState:
    """Local cell re-sort: alive rows ascending by cell, dead rows to
    the tail with in-range placeholder cell ``n_loc - 1``.

    No exchange — this is the periodic maintenance sort of the fused
    kernel's resort cadence (``SimOptions.fused_resort_every``): the
    per-block window bases taken from a freshly sorted state stay valid
    for k further steps if widened by k cells (CFL bounds cell motion
    to one per step); arrivals inserted meanwhile land anywhere and are
    covered by the kernel's misfit fallback.

    Uses the same multi-operand payload sort as :func:`migrate_sorted`
    (payloads ride the sort network; argsort + row gather is a
    latency-bound 2.7x slower on v5e).

    Columns that the next push recomputes before anything reads them do
    NOT ride the sort (each payload column costs ~1/14 of the sort):
    ``prev_x`` (overwritten by the push), ``gamma`` (= sqrt(1+|u|^2),
    recomputed here in one elementwise pass), and ``chi`` (a pure
    output of the field gather; zeroed, dead rows are masked wherever
    chi is read)."""
    dead = ~state.alive
    # chi is normally a pure output of the next field gather (zeroed,
    # not sorted); the QED per-step sort runs AFTER the push and BEFORE
    # emission consumes chi, so there it must ride the sort
    skip = {"prev_x", "gamma"} if keep_chi else {"prev_x", "gamma", "chi"}
    reduced = dataclasses.replace(
        state,
        cell=jnp.where(dead, n_loc - 1, state.cell).astype(state.cell.dtype),
        **{k: None for k in skip if getattr(state, k) is not None},
    )
    packed = pack_state(reduced, state.x.dtype)
    K = packed.shape[1]
    # key = (cell, sign(ux)): the direction refinement keeps the state
    # strictly CELL-sorted (deposition segments and edge migration are
    # unaffected) but separates counter-streaming populations into
    # different kernel blocks.  Each block then drifts COHERENTLY and
    # the kernel's exact per-block re-anchoring tracks it at any
    # velocity — without the refinement a block holding both beams
    # disperses at 2v per step and overruns its field window (mass
    # misfits at relativistic v).  Thermal spread still disperses a
    # block, but only at the velocity SPREAD, not the bulk speed.
    skey = jnp.where(
        dead, _BIG,
        2 * reduced.cell + (state.ux > 0.0).astype(jnp.int32),
    ).astype(jnp.int32)
    if rowgather:
        # A/B strategy (SimOptions.sort_rowgather): 2-operand key+iota
        # sort, then ONE row-batched permutation gather of the packed
        # state.  Round-1 measured this 2.7x slower at 2.1M with
        # per-column gathers; the round-2 re-pricing (gather cost is
        # bound by ROW count, not bytes) says a single (n, K) row
        # gather should beat the K-operand sort network at 8.4M.
        n = packed.shape[0]
        _, perm = lax.sort(
            (skey, jnp.arange(n, dtype=jnp.int32)), num_keys=1
        )
        sorted_st = unpack_state(packed[perm], reduced)
    else:
        out = lax.sort(
            (skey, *(packed[:, i] for i in range(K))), num_keys=1
        )
        sorted_st = unpack_state(jnp.stack(out[1:], axis=1), reduced)
    rebuilt = {}
    if state.prev_x is not None:
        rebuilt["prev_x"] = sorted_st.x
    if state.gamma is not None:
        rebuilt["gamma"] = jnp.sqrt(
            1.0 + sorted_st.ux**2 + sorted_st.uy**2 + sorted_st.uz**2
        ).astype(state.gamma.dtype)
    if state.chi is not None and not keep_chi:
        rebuilt["chi"] = jnp.zeros_like(state.chi)
    return dataclasses.replace(sorted_st, **rebuilt)


def insert(state: ParticleState, buf: ParticleState, valid):
    """Scatter ``valid`` buffer entries into dead slots of ``state``.

    Returns (state, overflow) where overflow counts entries that found
    no free slot.  Used by migration and by photon emission.

    For large entry counts the per-field scatters are ROW-BATCHED: all
    ~19 particle fields are staged into one (n, width) matrix and
    written with a single row scatter.  Scatter cost on TPU is bound by
    row count, not bytes (measured 2.5 ms per 262k-row column scatter
    at 2.1M on v5e), so 19 column scatters cost ~19x one row scatter
    while the staging stack/unstack are streaming passes (~1 ms).
    """
    from ..ops.fused import misfit_compact

    n = state.alive.shape[0]
    m = valid.shape[0]

    # Free-slot table.  The general path (first min(m, n_free) dead
    # slots, ascending) costs a full-buffer single-key sort (~6 ms at
    # 2.6M rows on v5e) EVERY step it runs — the dominant fixed cost of
    # the emission pass.  But while the buffer still has a contiguous
    # dead TAIL of >= m rows past the high-water mark (true for the
    # whole filling phase of an emission run: slots are handed out
    # ascending, deaths only punch holes below the mark), the next m
    # free slots are simply consecutive — no sort.  lax.cond is cheap
    # here: the branch values are the (m,) slot table, not particle
    # state (the conditional-buffer pathology is buffer-length
    # operands).
    if m < n:
        iota_n = jnp.arange(n, dtype=jnp.int32)
        hi = jnp.max(jnp.where(state.alive, iota_n, np.int32(-1))) + 1
        slots = lax.cond(
            hi + m <= n,
            lambda alive: hi + jnp.arange(m, dtype=jnp.int32),
            lambda alive: misfit_compact(
                (~alive).astype(jnp.float32), m
            )[0],
            state.alive,
        )
    else:
        slots = misfit_compact((~state.alive).astype(jnp.float32), m)[0]

    rank = jnp.cumsum(valid) - 1  # destination rank among valid entries
    in_cap = valid & (rank < m)
    dest = jnp.where(in_cap, slots[jnp.clip(rank, 0, m - 1)], n)
    ok = in_cap & (dest < n)
    # route rejected entries to a dummy slot index n (dropped by scatter)
    dest = jnp.where(ok, dest, n)
    overflow = jnp.sum(valid) - jnp.sum(ok)

    if m <= 65536:
        # per-column scatters: ~19 small scatters sized by the ENTRY
        # count.  The staged row-batch below touches the whole buffer
        # (two full-state layout passes) regardless of m — measured
        # ~99 ms/step at a 2.6M-row photon buffer on v5e — so it only
        # pays once the entry count is a sizable fraction of the
        # buffer.
        def put(path, a, b):
            if a is None:
                return None
            name = path[0].name
            if name == "alive":
                return a.at[dest].set(ok, mode="drop")
            return a.at[dest].set(b, mode="drop")

        return tree_util.tree_map_with_path(put, state, buf), overflow

    # ---- row-batched path ------------------------------------------
    # stage dtype: wide enough to round-trip every field exactly
    # (f32 state + i32 cells < 2^24 fit f32; under x64 everything is
    # f64 with cells < 2^53)
    sdt = state.x.dtype
    names, widths, scols, bcols = [], [], [], []
    for f in dataclasses.fields(ParticleState):
        a = getattr(state, f.name)
        if a is None:
            continue
        b = ok if f.name == "alive" else getattr(buf, f.name)
        w = 1 if a.ndim == 1 else int(np.prod(a.shape[1:]))
        names.append(f.name)
        widths.append(w)
        scols.append(a.reshape(n, w).astype(sdt))
        bcols.append(b.reshape(m, w).astype(sdt))
    stage = jnp.concatenate(scols, axis=1)
    rows = jnp.concatenate(bcols, axis=1)
    stage = stage.at[dest].set(rows, mode="drop")
    out, off = {}, 0
    for name, w in zip(names, widths):
        a = getattr(state, name)
        col = stage[:, off:off + w].reshape(a.shape)
        out[name] = col.astype(a.dtype)
        off += w
    return dataclasses.replace(state, **out), overflow


def _window_rows(a, K, t0):
    """Rows [0:K] + [t0:t0+K] of a column, as (2K, w).  ``t0`` is the
    (traced) tail-window start — anchored just below the alive/dead
    boundary, NOT the array end: the dead pool above the top alive
    rows can far exceed K."""
    w = 1 if a.ndim == 1 else int(np.prod(a.shape[1:]))
    z = (jnp.zeros((), t0.dtype),) * (a.ndim - 1)
    tail = lax.dynamic_slice(a, (t0,) + z, (K,) + a.shape[1:])
    return jnp.concatenate([a[:K].reshape(K, w), tail.reshape(K, w)])


def migrate_edges(
    state: ParticleState,
    geom: GridGeometry,
    axis_name: str,
    axis_index,
    send_capacity: int,
    window: int,
):
    """Migration for a cell-sorted state: every leaver, every freed
    slot and the dead pool live in the head/tail ``window`` rows, so
    the entire exchange — masks, cumulative-sum index tables, packing,
    retirement, insertion — is O(window), and the write-back is two
    contiguous dynamic-slice updates per column.  The full-length
    variants (:func:`migrate_compact`) pay several full-array passes
    (leaver cumsum, retire/insert scatters): ~8 ms per exchange at
    8.4M rows on v5e vs well under 1 ms here.

    Sortedness contract (maintained by the fused pipeline): candidates
    to leave sit within ``window`` rows of the array ends, and
    ``sort_state`` keeps the dead pool at the tail.  Left arrivals are
    inserted into the lowest free slots (the slots left-leavers just
    vacated — their blocks cover the entry cells, so arrivals usually
    fit their kernel window immediately), right arrivals into the
    highest (vacated right-leaver slots, then the dead pool).  A cheap
    full-length reduction counts any leaver OUTSIDE the windows into
    the overflow counter rather than exchanging it (with a sane window
    this never fires; the count keeps it loud, never silent).

    Reference: sort + splice + ssend/recv (src/particle/mod.rs:284-375).
    """
    n = state.alive.shape[0]
    K = int(min(window, n // 2))
    cap = int(min(send_capacity, K // 2))
    fdtype = state.x.dtype

    # tail window: centred on the alive/dead boundary (sorted states
    # keep dead rows at the tail, so the top alive rows — the
    # right-leaver candidates — sit just below row sum(alive); edge
    # retire/insert punches local holes, which the window slack and
    # the out-of-window insurance count absorb).  Clamped to [K, n-K]
    # so the two windows never overlap.
    t0 = jnp.clip(
        jnp.sum(state.alive.astype(jnp.int32)) - K // 2, K, n - K
    ).astype(jnp.int32)

    alive_w = _window_rows(state.alive, K, t0)[:, 0]
    # insurance counts: leavers outside the windows are not exchanged —
    # count them (one fused full-length reduction)
    tot_l = jnp.sum(state.alive & (state.cell < 0))
    tot_r = jnp.sum(state.alive & (state.cell >= geom.n_loc))

    W = pack_state_window(state, K, t0, fdtype)
    W, overflow = _edges_core(
        W, alive_w, _column_index(state, "cell"),
        _column_index(state, "gamma"), geom, axis_name, axis_index,
        tot_l, tot_r, K, cap,
    )
    return unpack_state_window(W, state, K, t0), overflow


def _edges_core(W, alive_w, cell_col, gamma_col, geom, axis_name,
                axis_index, tot_l, tot_r, K, cap):
    """The edge exchange on a (2K, C) head+tail window matrix ``W``
    whose rows are particles (column ``cell_col`` is the float cell,
    ``gamma_col`` the Lorentz factor; retired rows zero everything but
    gamma).  Shared by :func:`migrate_edges` (ParticleState layout) and
    :func:`migrate_edges_packed` (fused packed layout).  Returns
    (W_new, overflow)."""
    n_loc, ndev = geom.n_loc, geom.n_devices
    periodic = geom.left_boundary == "periodic"
    fdtype = W.dtype
    cell_w = W[:, cell_col]

    go_left = alive_w & (cell_w < 0)
    go_right = alive_w & (cell_w >= n_loc)
    # out-of-slab rows captured by the window, BEFORE the non-periodic
    # deletion filter: tot_l/tot_r count exactly these over the full
    # buffer, so the overflow comparison must use the same predicate
    # (pad-region deletions have in-slab cells and belong to neither
    # side — subtracting them drove the counter negative)
    out_slab_w = go_left | go_right
    if not periodic:
        g = cell_w + (axis_index * n_loc).astype(fdtype)
        out_left = g < geom.interior_start
        out_right = g >= geom.interior_end
        deleted = alive_w & (out_left | out_right)
        go_left = go_left & ~out_left & ~out_right
        go_right = go_right & ~out_left & ~out_right
    else:
        deleted = jnp.zeros_like(alive_w)
    gone = go_left | go_right | deleted
    free_after = ~alive_w | gone

    missed = (tot_l + tot_r) - jnp.sum(out_slab_w)

    m4 = jnp.stack([go_left, go_right, gone, free_after], axis=1).astype(
        jnp.int32
    )
    cum = jnp.cumsum(m4, axis=0)
    n_left = cum[-1, 0]
    n_right = cum[-1, 1]
    nf = cum[-1, 3]

    q = jnp.arange(1, 2 * cap + 1, dtype=cum.dtype)
    tabs = jax.vmap(jnp.searchsorted, in_axes=(1, None))(cum, q).astype(
        jnp.int32
    )
    lt = tabs[0, :cap]
    rt = tabs[1, :cap]
    gt = tabs[2]
    # per-half free-slot tables, LOWEST rows first: arrivals then land
    # in the slots leavers just vacated (whose kernel blocks cover the
    # entry cells), or failing that in the pool rows closest to the
    # alive region.  Allocating right arrivals from the global highest
    # free rows instead stacks them at the deep end of the dead pool,
    # exhausting the window's free slots after a few exchanges (and
    # then silently... loudly dropping arrivals).
    nf_h = cum[K - 1, 3]
    free_t_cum = cum[:, 3] - nf_h  # free-rank within the tail half
    fh = jnp.searchsorted(cum[:K, 3], q[:cap]).astype(jnp.int32)
    ft = (K + jnp.searchsorted(free_t_cum[K:], q)).astype(jnp.int32)
    nf_t = nf - nf_h

    lane = jnp.arange(cap)
    overflow = (
        jnp.maximum(n_left - cap, 0) + jnp.maximum(n_right - cap, 0)
        + missed
    )

    send_left = jnp.take(W, lt, axis=0, mode="fill", fill_value=0.0)
    send_left = send_left.at[:, cell_col].add(float(n_loc))
    send_right = jnp.take(W, rt, axis=0, mode="fill", fill_value=0.0)
    send_right = send_right.at[:, cell_col].add(-float(n_loc))

    perm_to_left = [(i, (i - 1) % ndev) for i in range(ndev)]
    perm_to_right = [(i, (i + 1) % ndev) for i in range(ndev)]
    n_arr_l = lax.ppermute(
        jnp.minimum(n_right, cap), axis_name, perm_to_right
    )
    n_arr_r = lax.ppermute(jnp.minimum(n_left, cap), axis_name, perm_to_left)
    from_right = lax.ppermute(send_left, axis_name, perm_to_left)
    from_left = lax.ppermute(send_right, axis_name, perm_to_right)

    # retire leavers/deleted: zero the row (alive 0, weight 0,
    # momentum 0, cell 0 — in range, inert everywhere) EXCEPT gamma,
    # which stays 1 — dead rows still flow through u/gamma divisions
    # (unfused velocity, kernel reads) and 0/0 would seed NaNs that
    # survive multiplication by the zero weight
    retire_row = jnp.zeros((W.shape[1],), fdtype).at[gamma_col].set(1.0)
    W = W.at[gt].set(retire_row, mode="drop")

    # insert: left arrivals take the lowest free head-half slots,
    # right arrivals the lowest free tail-half slots; left arrivals
    # beyond the head's free count spill into the tail AFTER the right
    # side's allocation.  Only arrivals exceeding the combined free
    # count are dropped + counted.
    vl = lane < n_arr_l
    vr = lane < n_arr_r
    n_r_used = jnp.minimum(n_arr_r, nf_t)
    ok_r = vr & (lane < n_r_used)
    dest_r = jnp.where(ok_r, jnp.take(ft, lane, mode="clip"), 2 * K)
    in_head = lane < nf_h
    spill = lane - nf_h + n_r_used  # tail free-rank of spilled lefts
    ok_l = vl & (in_head | (spill < jnp.minimum(nf_t, 2 * cap)))
    dest_l = jnp.where(
        ok_l,
        jnp.where(
            in_head,
            jnp.take(fh, lane, mode="clip"),
            jnp.take(ft, jnp.clip(spill, 0, 2 * cap - 1), mode="clip"),
        ),
        2 * K,
    )
    W = W.at[dest_l].set(
        jnp.where(ok_l[:, None], from_left, 0.0), mode="drop"
    )
    W = W.at[dest_r].set(
        jnp.where(ok_r[:, None], from_right, 0.0), mode="drop"
    )
    ins_overflow = (
        jnp.sum(vl.astype(jnp.int32)) + jnp.sum(vr.astype(jnp.int32))
        - jnp.sum(ok_l.astype(jnp.int32)) - jnp.sum(ok_r.astype(jnp.int32))
    )
    return W, overflow + ins_overflow


def pack_state_window(
    state: ParticleState, K: int, t0, dtype
) -> jnp.ndarray:
    """(2K, C) packed matrix of the head/tail windows (column layout of
    :func:`pack_state`)."""
    pieces = []
    for name, w, _, _ in _layout(state):
        pieces.append(
            _window_rows(getattr(state, name), K, t0).astype(dtype)
        )
    return jnp.concatenate(pieces, axis=1)


def unpack_state_window(
    W: jnp.ndarray, state: ParticleState, K: int, t0
) -> ParticleState:
    """Write the packed windows back into ``state`` via two contiguous
    dynamic-slice updates per column."""
    fields = {}
    i = 0
    for name, w, dt, tail in _layout(state):
        a = getattr(state, name)
        sl = W[:, i : i + w]
        v = sl.reshape((2 * K,) + tail) if tail else sl[:, 0]
        if dt == jnp.bool_:
            v = v > 0.5
        elif jnp.issubdtype(dt, jnp.integer):
            v = jnp.round(v).astype(dt)
        else:
            v = v.astype(dt)
        zeros = (jnp.zeros((), t0.dtype),) * (a.ndim - 1)
        a = lax.dynamic_update_slice(
            a, v[:K], (jnp.zeros((), t0.dtype),) + zeros
        )
        a = lax.dynamic_update_slice(a, v[K:], (t0,) + zeros)
        fields[name] = a
        i += w
    return dataclasses.replace(state, **fields)


def migrate_edges_packed(
    ps,
    geom: GridGeometry,
    axis_name: str,
    axis_index,
    send_capacity: int,
    window: int,
):
    """:func:`migrate_edges` on the fused packed layout
    (``ops.fused.PackedState``): the head/tail windows are extracted as
    whole blocks (block-aligned, so each is one static/dynamic slice of
    the 4-D hot matrix), the shared :func:`_edges_core` runs the
    exchange on the (2K, C) window matrix, and the result is written
    back with one static and one dynamic block-slice update per array.

    ``alive`` is encoded as ``weight > 0`` (the packed-layout
    invariant); retired rows zero the weight column, which is exactly
    the dead encoding.
    """
    from ..ops.fused import A_COLS, H_COLS

    nblk, CH, RB, _ = ps.h.shape
    CA = ps.aux.shape[1]
    block = RB * 128
    n = nblk * block
    # kb >= 2 blocks: b0 floors (n_alive - K/2) to a block, so the
    # alive/dead boundary lands in [t0 + K/2, t0 + K/2 + block) — it is
    # guaranteed inside the window [t0, t0 + K) only when block <= K/2.
    # With kb == 1 a boundary in the upper half-block would fall OUTSIDE
    # the tail window: right-leavers just below it would never exchange
    # and the dead pool would be invisible to arrivals.
    kb = max(2, -(-window // block))
    if nblk < 2 * kb:
        # too small for block-aligned non-overlapping windows: the
        # head+tail windows must cover leavers AND the dead pool, so
        # run the exchange over the WHOLE array (cheap in this regime —
        # it only triggers when capacity/device < 2*window rows)
        return _edges_packed_full(
            ps, geom, axis_name, axis_index, send_capacity
        )
    K = kb * block
    cap = int(min(send_capacity, K // 2))
    fdtype = ps.h.dtype

    alive_full = ps.weight > 0.0
    cell_full = ps.h[:, 0]
    n_alive = jnp.sum(alive_full.astype(jnp.int32))
    # block-aligned tail window centred on the alive/dead boundary
    b0 = jnp.clip((n_alive - K // 2) // block, kb, nblk - kb).astype(
        jnp.int32
    )
    t0 = b0 * block
    z = jnp.zeros((), jnp.int32)

    head_h = ps.h[:kb]
    tail_h = lax.dynamic_slice(ps.h, (b0, z, z, z), (kb, CH, RB, 128))
    head_a = ps.aux[:kb]
    tail_a = lax.dynamic_slice(ps.aux, (b0, z, z, z), (kb, CA, RB, 128))
    head_w = ps.weight[:kb]
    tail_w = lax.dynamic_slice(ps.weight, (b0, z, z), (kb, RB, 128))

    # (2K, C) window matrix: H_COLS + A_COLS + weight [+ tau]
    col = lambda h4, t4, c: jnp.concatenate(
        [h4[:, c].reshape(K), t4[:, c].reshape(K)]
    )
    cols = [col(head_h, tail_h, c) for c in range(CH)]
    cols += [col(head_a, tail_a, c) for c in range(CA)]
    cols.append(
        jnp.concatenate([head_w.reshape(K), tail_w.reshape(K)])
    )
    if ps.tau is not None:
        cols.append(
            jnp.concatenate(
                [ps.tau[:K], lax.dynamic_slice(ps.tau, (t0,), (K,))]
            ).astype(fdtype)
        )
    W = jnp.stack(cols, axis=1)
    w_col = CH + CA
    alive_w = W[:, w_col] > 0.0

    tot_l = jnp.sum(alive_full & (cell_full < 0.0))
    tot_r = jnp.sum(alive_full & (cell_full >= geom.n_loc))

    W, overflow = _edges_core(
        W, alive_w, H_COLS.index("cell"), H_COLS.index("gamma"),
        geom, axis_name, axis_index, tot_l, tot_r, K, cap,
    )

    # write-back: one static + one dynamic block-slice update per array
    to4 = lambda v: v.reshape(kb, RB, 128)
    hh = jnp.stack([to4(W[:K, c]) for c in range(CH)], axis=1)
    th = jnp.stack([to4(W[K:, c]) for c in range(CH)], axis=1)
    ha = jnp.stack([to4(W[:K, CH + c]) for c in range(CA)], axis=1)
    ta = jnp.stack([to4(W[K:, CH + c]) for c in range(CA)], axis=1)
    h = lax.dynamic_update_slice(ps.h.at[:kb].set(hh), th, (b0, z, z, z))
    aux = lax.dynamic_update_slice(
        ps.aux.at[:kb].set(ha), ta, (b0, z, z, z)
    )
    weight = lax.dynamic_update_slice(
        ps.weight.at[:kb].set(to4(W[:K, w_col])), to4(W[K:, w_col]),
        (b0, z, z),
    )
    tau = ps.tau
    if ps.tau is not None:
        tc = w_col + 1
        tau = lax.dynamic_update_slice(
            ps.tau.at[:K].set(W[:K, tc].astype(ps.tau.dtype)),
            W[K:, tc].astype(ps.tau.dtype), (t0,),
        )
    return type(ps)(h=h, aux=aux, weight=weight, tau=tau), overflow


def sort_packed(ps, n_loc: int):
    """:func:`sort_state` on the fused packed layout: one multi-operand
    payload sort keyed by (cell, sign(ux)) with dead rows (weight <= 0)
    to the tail under placeholder cell ``n_loc - 1``.  gamma and prev_x
    are rebuilt (cheaper than riding the sort), chi is zeroed and gh
    reset — exactly the :func:`sort_state` column policy.  Returns the
    sorted PackedState."""
    nblk, CH, RB, _ = ps.h.shape
    n = nblk * RB * 128
    flat = lambda a: a.reshape(n)
    cell = flat(ps.h[:, 0])
    x = flat(ps.h[:, 1])
    y = flat(ps.h[:, 2])
    z = flat(ps.h[:, 3])
    ux = flat(ps.h[:, 4])
    uy = flat(ps.h[:, 5])
    uz = flat(ps.h[:, 6])
    work = flat(ps.h[:, 8])
    weight = flat(ps.weight)
    dead = weight <= 0.0
    cell = jnp.where(dead, float(n_loc - 1), cell)
    skey = jnp.where(
        dead, _BIG,
        2 * cell.astype(jnp.int32) + (ux > 0.0).astype(jnp.int32),
    ).astype(jnp.int32)
    ops = [skey, cell, x, y, z, ux, uy, uz, work, weight]
    if ps.tau is not None:
        ops.append(ps.tau.astype(ps.h.dtype))
    out = lax.sort(tuple(ops), num_keys=1)
    (cell, x, y, z, ux, uy, uz, work, weight) = out[1:10]
    gamma = jnp.sqrt(1.0 + ux * ux + uy * uy + uz * uz)
    to4 = lambda a: a.reshape(nblk, RB, 128)
    h = jnp.stack(
        [to4(c) for c in (cell, x, y, z, ux, uy, uz, gamma, work)], axis=1
    )
    aux = jnp.stack(
        [to4(x), jnp.zeros_like(to4(x)), jnp.ones_like(to4(x)),
         jnp.zeros_like(to4(x))], axis=1,
    )
    tau = ps.tau
    if ps.tau is not None:
        tau = out[10].astype(ps.tau.dtype)
    return type(ps)(h=h, aux=aux, weight=to4(weight), tau=tau), cell


def _edges_packed_full(ps, geom, axis_name, axis_index, send_capacity):
    """Whole-array fallback of :func:`migrate_edges_packed` for states
    too small for block-aligned windows: head = rows [0, n/2), tail =
    rows [n/2, n) — everything is covered, nothing can be missed by
    window placement."""
    from ..ops.fused import A_COLS, H_COLS

    nblk, CH, RB, _ = ps.h.shape
    CA = ps.aux.shape[1]
    n = nblk * RB * 128
    K = n // 2
    cap = int(min(send_capacity, K // 2))
    fdtype = ps.h.dtype

    flat = lambda a: a.reshape(n)
    cols = [flat(ps.h[:, c]) for c in range(CH)]
    cols += [flat(ps.aux[:, c]) for c in range(CA)]
    cols.append(flat(ps.weight))
    if ps.tau is not None:
        cols.append(ps.tau.astype(fdtype))
    W = jnp.stack(cols, axis=1)
    w_col = CH + CA
    alive_w = W[:, w_col] > 0.0
    cell_full = W[:, 0]
    tot_l = jnp.sum(alive_w & (cell_full < 0.0))
    tot_r = jnp.sum(alive_w & (cell_full >= geom.n_loc))

    W, overflow = _edges_core(
        W, alive_w, H_COLS.index("cell"), H_COLS.index("gamma"),
        geom, axis_name, axis_index, tot_l, tot_r, K, cap,
    )

    to4 = lambda v: v.reshape(nblk, RB, 128)
    h = jnp.stack([to4(W[:, c]) for c in range(CH)], axis=1)
    aux = jnp.stack([to4(W[:, CH + c]) for c in range(CA)], axis=1)
    weight = to4(W[:, w_col])
    tau = ps.tau
    if ps.tau is not None:
        tau = W[:, w_col + 1].astype(ps.tau.dtype)
    return type(ps)(h=h, aux=aux, weight=weight, tau=tau), overflow
