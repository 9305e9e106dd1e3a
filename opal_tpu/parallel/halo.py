"""Halo exchange over the device ring.

Replaces the reference's even/odd-ordered synchronous MPI sends
(``src/grid/yee.rs:351-452``) with ``lax.ppermute`` shifts along the
mesh axis — a pure ring pattern that XLA schedules over ICI with no
deadlock-avoidance choreography.  With a single device the permutation
maps the device to itself, reproducing the reference's self-send
shortcut (``yee.rs:365-369``) so 1-device runs exercise the identical
code path.

Conventions: slabs are owned-cells-only arrays; ``edge_*`` helpers
extract the HALO outermost owned cells.  Non-periodic global edges
replace wrapped data with zeros (fields) or drop it (currents).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..grid import HALO, GridGeometry


def _perm_from_left(n):
    """Data flows left -> right: device i receives from i-1."""
    return [(i, (i + 1) % n) for i in range(n)]


def _perm_from_right(n):
    return [((i + 1) % n, i) for i in range(n)]


def exchange_fields(E, B, geom: GridGeometry, axis_name: str, axis_index):
    """Build halo-extended slabs: prepend/append the neighbours' edge
    cells (the reference's overlay_ghost field copy, ``yee.rs:97-104``).

    Returns (E_slab, B_slab) with shape (n_loc + 2 HALO, 3).  At a
    non-periodic global edge the halo is zero — those cells lie outside
    the extended grid and the Maxwell update there is discarded by the
    next exchange or boundary load.
    """
    n = geom.n_devices
    periodic = geom.left_boundary == "periodic"

    packed = jnp.stack([E, B])
    right_edge = packed[:, -HALO:]  # my rightmost owned -> right neighbour
    left_edge = packed[:, :HALO]  # my leftmost owned -> left neighbour

    from_left = lax.ppermute(right_edge, axis_name, _perm_from_left(n))
    from_right = lax.ppermute(left_edge, axis_name, _perm_from_right(n))

    if not periodic:
        is_first = (axis_index == 0)[None, None, None]
        is_last = (axis_index == n - 1)[None, None, None]
        from_left = jnp.where(is_first, 0.0, from_left)
        from_right = jnp.where(is_last, 0.0, from_right)

    slab = jnp.concatenate([from_left, packed, from_right], axis=1)
    return slab[0], slab[1]


def fold_currents(J_slab, rho_slab, geom: GridGeometry, axis_name: str, axis_index):
    """Fold halo-deposited currents into the owners' edge cells (the
    reference's overlay current add, ``yee.rs:105-113``).

    ``J_slab``/``rho_slab`` have halo extents; returns owned-only
    (n_loc, 3) and (n_loc,) arrays with neighbour spill added.  At a
    non-periodic edge the wrapped spill is dropped (the reference
    performs no exchange there).
    """
    n = geom.n_devices
    periodic = geom.left_boundary == "periodic"

    packed = jnp.concatenate([J_slab, rho_slab[:, None]], axis=1)  # (n+2H, 4)
    my_left_spill = packed[:HALO]  # belongs to left neighbour's right edge
    my_right_spill = packed[-HALO:]  # belongs to right neighbour's left edge

    from_right = lax.ppermute(my_left_spill, axis_name, _perm_from_right(n))
    from_left = lax.ppermute(my_right_spill, axis_name, _perm_from_left(n))

    if not periodic:
        is_first = (axis_index == 0)[None, None]
        is_last = (axis_index == n - 1)[None, None]
        from_left = jnp.where(is_first, 0.0, from_left)
        from_right = jnp.where(is_last, 0.0, from_right)

    owned = packed[HALO:-HALO]
    owned = owned.at[:HALO].add(from_left)
    owned = owned.at[-HALO:].add(from_right)
    return owned[:, :3], owned[:, 3]


def psum(x, axis_name: str):
    return lax.psum(x, axis_name)


def exchange_fields_local(E, B, geom: GridGeometry):
    """:func:`exchange_fields` for the replicated-field mode: every
    device holds the WHOLE grid, so the halo is a local wrap (periodic)
    or zeros (non-periodic) — no collective."""
    periodic = geom.left_boundary == "periodic"
    packed = jnp.stack([E, B])
    if periodic:
        from_left = packed[:, -HALO:]
        from_right = packed[:, :HALO]
    else:
        from_left = jnp.zeros_like(packed[:, :HALO])
        from_right = from_left
    slab = jnp.concatenate([from_left, packed, from_right], axis=1)
    return slab[0], slab[1]


def fold_currents_local(J_slab, rho_slab, geom: GridGeometry):
    """:func:`fold_currents` for the replicated-field mode: spill wraps
    locally (periodic) or is dropped (non-periodic).  The caller psums
    the folded (J, rho) over the mesh to combine the per-device
    particle shards' deposits."""
    periodic = geom.left_boundary == "periodic"
    packed = jnp.concatenate([J_slab, rho_slab[:, None]], axis=1)
    owned = packed[HALO:-HALO]
    if periodic:
        owned = owned.at[:HALO].add(packed[-HALO:])
        owned = owned.at[-HALO:].add(packed[:HALO])
    return owned[:, :3], owned[:, 3]
