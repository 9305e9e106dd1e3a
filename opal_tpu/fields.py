"""Field-only simulation core: the scanned, shard_mapped Maxwell step.

This module wires together halo exchange, boundary loading and the Yee
advance into a single device function; :mod:`opal_tpu.sim` builds the
full PIC step on top of the same structure.  The inner loop over
steps-between-outputs is a ``lax.scan`` *inside* ``shard_map``, so an
entire output block compiles to one XLA program with ICI collectives —
the TPU-native replacement for the reference's per-step MPI
synchronize (``src/main.rs:238-267``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .grid import HALO, GridGeometry, apply_boundaries, em_field_energy_local, global_cells
from .ops import maxwell
from .parallel import halo


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1D device mesh over the spatial axis 'x'."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"mesh needs {n_devices} devices but only {len(devices)} "
                f"are available (platform "
                f"'{devices[0].platform if devices else '?'}'); for a "
                "virtual multi-device run set XLA_FLAGS="
                f"--xla_force_host_platform_device_count={n_devices} and "
                "use the CPU backend"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("x",))


def zero_fields(geom: GridGeometry, mesh: Mesh, dtype=jnp.float64,
                replicated: bool = False):
    """Sharded (or, in replicated-field mode, device-replicated)
    owned-cell field arrays (E, B, J, rho)."""
    if replicated:
        sharding3 = NamedSharding(mesh, P(None, None))
        sharding1 = NamedSharding(mesh, P(None))
    else:
        sharding3 = NamedSharding(mesh, P("x", None))
        sharding1 = NamedSharding(mesh, P("x"))
    E = jax.device_put(jnp.zeros((geom.n_ext, 3), dtype), sharding3)
    B = jax.device_put(jnp.zeros((geom.n_ext, 3), dtype), sharding3)
    J = jax.device_put(jnp.zeros((geom.n_ext, 3), dtype), sharding3)
    rho = jax.device_put(jnp.zeros((geom.n_ext,), dtype), sharding1)
    return E, B, J, rho


def field_step(E, B, geom: GridGeometry, t, dt, laser_y, laser_z, antenna, axis_index):
    """One field-only step on a device: exchange, current load,
    boundaries, Yee advance.  Returns owned (E, B, J, rho)."""
    E_slab, B_slab = halo.exchange_fields(E, B, geom, "x", axis_index)

    J = jnp.zeros_like(E)
    rho = jnp.zeros(E.shape[0], E.dtype)
    if antenna is not None:
        J = antenna(J, t, global_cells(geom, axis_index))

    E_own, B_own = apply_boundaries(
        E_slab[HALO:-HALO], B_slab[HALO:-HALO], geom, axis_index, t, dt, laser_y, laser_z
    )
    E_slab = E_slab.at[HALO:-HALO].set(E_own)
    B_slab = B_slab.at[HALO:-HALO].set(B_own)

    J_slab = jnp.pad(J, ((HALO, HALO), (0, 0)))
    E_slab, B_slab = maxwell.advance(
        E_slab, B_slab, J_slab, dt, geom.dx, sm_mask(geom, axis_index)
    )
    return E_slab[HALO:-HALO], B_slab[HALO:-HALO], J, rho


def electrostatic_init(E, B, J, rho, geom: GridGeometry, axis_name, axis_index):
    """Consistent initial fields from deposited charge/current
    (reference ``YeeGrid::initialize``, ``src/grid/yee.rs:644-747`` —
    gated off by ``if false`` at ``main.rs:174`` but part of the grid
    interface).  Solves, over the extended grid,

        dEx/dx = rho / eps0,   dBy/dx = mu0 jz,   dBz/dx = -mu0 jy,

    with boundary values from the infinite-sheet fields of the total
    charge/current (``yee.rs:691-700``).  The reference's rank-serial
    prefix chain (receive left ghost, sweep, send right) becomes a
    device-parallel global cumulative sum: local ``cumsum`` plus an
    exclusive prefix of per-device totals via ``all_gather`` — O(n_loc)
    per device with one small collective instead of a serialized ring.

    ``axis_name=None`` means the inputs are already global (replicated-
    field mode: every device holds the whole grid and J/rho were psum'd
    by the caller) — no collectives are issued; a mesh axis name here
    would double-count the totals by the mesh size.

    Arguments are owned-cell slabs; returns updated (E, B).  Ey, Ez and
    Bx are untouched (zero-initialised).  The sweep starts after the
    left boundary zone; left-zone cells get the domain boundary fields
    added on top (``yee.rs:705-712``).  For periodic grids the sweep
    base is cell 0 (the reference never exercises initialize on a
    periodic grid).
    """
    from . import constants as const

    eps0 = const.VACUUM_PERMITTIVITY
    mu0 = const.VACUUM_PERMEABILITY
    dx = geom.dx
    n = geom.n_devices

    g = global_cells(geom, axis_index)
    interior = (g >= geom.interior_start) & (g < geom.interior_end)

    rho_tot = jnp.sum(jnp.where(interior, rho, 0.0))
    jy_tot = jnp.sum(jnp.where(interior, J[:, 1], 0.0))
    jz_tot = jnp.sum(jnp.where(interior, J[:, 2], 0.0))
    if axis_name is not None:
        rho_tot = halo.psum(rho_tot, axis_name)
        jy_tot = halo.psum(jy_tot, axis_name)
        jz_tot = halo.psum(jz_tot, axis_name)

    dom_Ex = -rho_tot * dx / (2.0 * eps0)
    dom_By = -mu0 * jz_tot * dx / 2.0
    dom_Bz = mu0 * jy_tot * dx / 2.0

    sweep = g >= geom.left_pad

    def global_cumsum(c):
        local = jnp.cumsum(c)
        if axis_name is None:
            return local
        totals = lax.all_gather(local[-1], axis_name)
        prefix = jnp.sum(
            jnp.where(jnp.arange(n) < axis_index, totals, 0.0)
        )
        return local + prefix

    cum_Ex = global_cumsum(jnp.where(sweep, dx * rho / eps0, 0.0))
    cum_By = global_cumsum(jnp.where(sweep, mu0 * dx * J[:, 2], 0.0))
    cum_Bz = global_cumsum(jnp.where(sweep, -mu0 * dx * J[:, 1], 0.0))

    E = E.at[:, 0].set(
        jnp.where(sweep, dom_Ex + cum_Ex, E[:, 0] + dom_Ex)
    )
    B = B.at[:, 1].set(
        jnp.where(sweep, dom_By + cum_By, B[:, 1] + dom_By)
    )
    B = B.at[:, 2].set(
        jnp.where(sweep, dom_Bz + cum_Bz, B[:, 2] + dom_Bz)
    )
    return E, B


def sm_mask(geom: GridGeometry, axis_index):
    """Silver-Müller mask on the halo-extended slab: slab index 0
    (ghost-parity, see :func:`opal_tpu.ops.maxwell.advance_e`) plus the
    global extended cell 0 when the left boundary injects a laser."""
    n_slab = geom.n_loc + 2 * HALO
    idx = jnp.arange(n_slab)
    mask = idx == 0
    if geom.left_boundary == "laser":
        g = axis_index * geom.n_loc + idx - HALO
        mask = mask | (g == 0)
    return mask


class FieldSolver:
    """Drives field-only runs (used by the boundary-condition test
    suite, mirroring ``yee.rs:891-1080``)."""

    def __init__(
        self,
        geom: GridGeometry,
        mesh: Mesh,
        dt: float,
        laser_y: Callable | None = None,
        laser_z: Callable | None = None,
        antenna: Callable | None = None,
        dtype=jnp.float64,
    ):
        self.geom = geom
        self.mesh = mesh
        self.dt = float(dt)
        self.dtype = dtype
        zero = lambda t, x: jnp.zeros((), dtype)
        self.laser_y = laser_y or zero
        self.laser_z = laser_z or zero
        self.antenna = antenna
        self._run = jax.jit(self._build_run(), static_argnames=("nsteps",))

    def _build_run(self):
        geom, dt = self.geom, self.dt
        laser_y, laser_z, antenna = self.laser_y, self.laser_z, self.antenna

        def device_fn(E, B, t0, nsteps):
            ai = lax.axis_index("x")

            def body(carry, _):
                E, B, t = carry
                E, B, _, _ = field_step(
                    E, B, geom, t, dt, laser_y, laser_z, antenna, ai
                )
                return (E, B, t + dt), None

            (E, B, t), _ = lax.scan(body, (E, B, t0), None, length=nsteps)
            return E, B, t

        def run(E, B, t0, nsteps):
            return jax.shard_map(
                partial(device_fn, nsteps=nsteps),
                mesh=self.mesh,
                check_vma=False,
                in_specs=(P("x", None), P("x", None), P()),
                out_specs=(P("x", None), P("x", None), P()),
            )(E, B, t0)

        return run

    def run(self, E, B, t0: float, nsteps: int):
        return self._run(E, B, jnp.asarray(t0, self.dtype), nsteps=nsteps)

    def em_field_energy(self, E, B) -> float:
        def device_fn(E, B):
            ai = lax.axis_index("x")
            local = em_field_energy_local(E, B, self.geom, ai)
            return halo.psum(local, "x")

        out = jax.shard_map(
            device_fn,
            mesh=self.mesh,
            in_specs=(P("x", None), P("x", None)),
            out_specs=P(),
        )(E, B)
        return float(out)

    def fields_at_interior(self, E, B, cell: int, xi: float):
        """Pointwise staggered interpolation for tests (``yee.rs:499``)."""
        from .ops.interp import fields_at

        Eh = jnp.asarray(E)
        Bh = jnp.asarray(B)
        idx = jnp.asarray([self.geom.interior_start + cell])
        Ep, Bp = fields_at(Eh, Bh, idx, jnp.asarray([xi], Eh.dtype))
        return np.asarray(Ep[0]), np.asarray(Bp[0])
