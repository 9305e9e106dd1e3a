"""Particle species: fixed-capacity structure-of-arrays state.

The reference's ``Population<T>`` (``src/particle/mod.rs:141-376``)
holds a growable ``Vec`` of particle structs; on TPU every shape must
be static, so a species is a pytree of per-field arrays with a fixed
per-device capacity and an ``alive`` mask.  Emission *appends* by
claiming dead slots; absorption and out-of-domain losses *delete* by
clearing the mask (reference deletions: ``interactions.rs:291-309``,
``mod.rs:291-373``).

Momentum convention follows the reference: ``u`` is p/(mc) for massive
species and the momentum in units of m_e c for photons; ``gamma``
stores the Lorentz factor (massive) or |k| (photons).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as const
from .grid import GridGeometry


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "cell",
        "x",
        "prev_x",
        "y",
        "z",
        "weight",
        "ux",
        "uy",
        "uz",
        "gamma",
        "chi",
        "tau",
        "tau_abs",
        "tau_st",
        "work",
        "birth_time",
        "alive",
        "pol",
        "basis",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class ParticleState:
    """Per-device SoA particle storage (all arrays length = capacity).

    Optional per-species fields are ``None`` when unused: ``tau``/
    ``work`` exist for electrons, ``tau_abs``/``tau_st``/``birth_time``
    for photons.
    """

    cell: jnp.ndarray  # (N,) int32, device-local owned-cell index
    x: jnp.ndarray  # (N,) fractional offset in [0, 1)
    prev_x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    weight: jnp.ndarray
    # momentum components as three flat columns — a (N, 3) array costs
    # a strided slice per component read and a re-stack per write on
    # every hot-path use, and tiles poorly on TPU
    ux: jnp.ndarray
    uy: jnp.ndarray
    uz: jnp.ndarray
    gamma: jnp.ndarray
    chi: jnp.ndarray
    tau: jnp.ndarray | None
    tau_abs: jnp.ndarray | None
    tau_st: jnp.ndarray | None
    work: jnp.ndarray | None
    birth_time: jnp.ndarray | None
    alive: jnp.ndarray  # (N,) bool
    # photon polarization (photon.rs:24-25): Jones vector over a basis
    # transverse to k.  pol = (N, 4) [re a1, im a1, re a2, im a2];
    # basis = (N, 6) the two (unit) basis vectors flattened ((N, 2, 3)
    # would tile as T(2,128) on TPU, wasting 125/128 lanes).
    pol: jnp.ndarray | None = None
    basis: jnp.ndarray | None = None

    @property
    def capacity(self) -> int:
        return self.cell.shape[0]

    @property
    def u(self) -> jnp.ndarray:
        """(N, 3) view of the momentum columns (convenience for
        diagnostics and setup paths; hot paths use the columns
        directly — this stacks a fresh array every call)."""
        xp = jnp if isinstance(self.ux, jnp.ndarray) else np
        return xp.stack([self.ux, self.uy, self.uz], axis=1)


@dataclasses.dataclass(frozen=True)
class SpeciesSpec:
    """Static description of a species."""

    name: str
    kind: str  # 'electron' | 'ion' | 'photon'
    charge: float = 0.0  # SI, per real particle
    mass: float = 0.0  # SI
    output: tuple[str, ...] = ()

    @staticmethod
    def electron(output=()) -> "SpeciesSpec":
        return SpeciesSpec(
            "electron", "electron", const.ELECTRON_CHARGE, const.ELECTRON_MASS,
            tuple(output),
        )

    @staticmethod
    def ion(name, charge_state, mass_number, output=()) -> "SpeciesSpec":
        return SpeciesSpec(
            name,
            "ion",
            charge_state * const.ELEMENTARY_CHARGE,
            mass_number * const.PROTON_MASS,
            tuple(output),
        )

    @staticmethod
    def photon(output=()) -> "SpeciesSpec":
        return SpeciesSpec("photon", "photon", 0.0, 0.0, tuple(output))


def dead_default(fname: str, is_photon: bool) -> float:
    """Dead-slot fill value for one column — the single source of
    truth (used by :func:`_empty_fields`, :func:`shard_even` and the
    checkpoint resharding).  tau columns are +inf so dead slots never
    trigger emission/absorption; photon gamma is |k| = 0, massive
    gamma 1 so energy formulas stay finite."""
    if fname in ("tau", "tau_abs", "tau_st"):
        return np.inf
    if fname == "birth_time":
        return -np.inf
    if fname == "gamma":
        return 0.0 if is_photon else 1.0
    return 0.0


def _empty_fields(spec: SpeciesSpec, n: int, dtype, work_dtype=None):
    inf = np.full(n, np.inf, dtype)
    fields = dict(
        cell=np.zeros(n, np.int32),
        x=np.zeros(n, dtype),
        prev_x=np.zeros(n, dtype),
        y=np.zeros(n, dtype),
        z=np.zeros(n, dtype),
        weight=np.zeros(n, dtype),
        ux=np.zeros(n, dtype),
        uy=np.zeros(n, dtype),
        uz=np.zeros(n, dtype),
        gamma=np.ones(n, dtype),
        chi=np.zeros(n, dtype),
        tau=None,
        tau_abs=None,
        tau_st=None,
        work=None,
        birth_time=None,
        alive=np.zeros(n, bool),
        pol=None,
        basis=None,
    )
    if spec.kind == "electron":
        fields["tau"] = inf.copy()
        # the work integral accumulates q c (u.E) dt / gamma every step
        # for the whole run (electron.rs:278-280): under mixed
        # precision it lives in the FIELD dtype (f64) so 1e4+-step
        # ledgers close below 1e-5 (BASELINE.md r4)
        fields["work"] = np.zeros(n, work_dtype or dtype)
    if spec.kind == "photon":
        fields["gamma"] = np.zeros(n, dtype)  # |k|; 0 for dead slots
        fields["tau_abs"] = inf.copy()
        fields["tau_st"] = inf.copy()
        fields["birth_time"] = np.full(n, -np.inf, dtype)
        fields["pol"] = np.zeros((n, 4), dtype)
        fields["basis"] = np.zeros((n, 6), dtype)
    return fields


def initialize(
    spec: SpeciesSpec,
    geom: GridGeometry,
    npc: int,
    density: Callable,
    ux: Callable,
    uy: Callable,
    uz: Callable,
    dt: float,
    capacity_per_device: int,
    seed: int = 0,
    dtype=np.float64,
    work_dtype=None,
) -> ParticleState:
    """Sample the initial distribution (``mod.rs:172-203``), host-side.

    Per interior cell: ``nreal = density(x_centre) * dx`` real particles
    shared equally by ``npc`` macroparticles; positions uniform in the
    cell; momenta from ``u*(x, urand, nrand)``; optical depths ~ Exp(1).
    Returns a host-side ParticleState laid out per device: the global
    arrays have shape (n_devices * capacity_per_device, ...) with each
    device's particles in its own contiguous block.
    """
    rng = np.random.default_rng(seed)
    fields = _empty_fields(
        spec, geom.n_devices * capacity_per_device, dtype, work_dtype
    )

    if npc > 0:
        cells = np.arange(geom.nx)
        x_centre = geom.xmin + (cells + 0.5) * geom.dx
        nreal = (
            np.broadcast_to(
                np.asarray(density(x_centre), dtype=np.float64), x_centre.shape
            )
            * geom.dx
        )
        active = nreal > 0.0
        weights = np.where(active, nreal / npc, 0.0)

        cell_rep = np.repeat(cells[active], npc)
        w_rep = np.repeat(weights[active], npc)
        n = cell_rep.size

        xi = rng.random(n)
        real_x = geom.xmin + (cell_rep + xi) * geom.dx
        u = np.stack(
            [
                np.broadcast_to(
                    np.asarray(f(real_x, rng.random(n), rng.standard_normal(n)),
                               dtype=np.float64), (n,)
                )
                for f in (ux, uy, uz)
            ],
            axis=-1,
        )

        # device decomposition: owned-cell index on the owning device
        g = cell_rep + geom.left_pad  # extended-grid cell
        dev = g // geom.n_loc
        local_cell = g - dev * geom.n_loc

        counts = np.bincount(dev, minlength=geom.n_devices)
        if counts.max() > capacity_per_device:
            raise ValueError(
                f"species {spec.name}: device particle count "
                f"{counts.max()} exceeds capacity {capacity_per_device}"
            )

        # slot index within the owning device's block
        order = np.argsort(dev, kind="stable")
        slot_in_dev = np.empty(n, np.int64)
        start = 0
        for d, cnt in enumerate(counts):
            sel = order[start : start + cnt]
            slot_in_dev[sel] = np.arange(cnt)
            start += cnt
        slots = dev * capacity_per_device + slot_in_dev

        u2 = np.sum(u * u, axis=-1)
        if spec.kind == "photon":
            k0 = np.sqrt(u2)
            vx_over_c = np.where(k0 > 0, u[:, 0] / np.maximum(k0, 1e-300), 0.0)
            gamma_like = k0
        else:
            gamma_like = np.sqrt(1.0 + u2)
            vx_over_c = u[:, 0] / gamma_like
        prev_x = xi - const.SPEED_OF_LIGHT * vx_over_c * dt / geom.dx

        fields["cell"][slots] = local_cell.astype(np.int32)
        fields["x"][slots] = xi
        fields["prev_x"][slots] = prev_x
        fields["weight"][slots] = w_rep
        fields["ux"][slots] = u[:, 0]
        fields["uy"][slots] = u[:, 1]
        fields["uz"][slots] = u[:, 2]
        fields["gamma"][slots] = gamma_like
        fields["alive"][slots] = True
        if spec.kind == "electron":
            fields["tau"][slots] = rng.exponential(size=n)
        if spec.kind == "photon":
            # match the reference's draw order (photon.rs:126-133)
            rng.exponential(size=n)  # tau[0], unused
            rng.exponential(size=n)  # tau[1], unused
            fields["tau_abs"][slots] = rng.exponential(size=n)
            fields["tau_st"][slots] = rng.exponential(size=n)
            fields["birth_time"][slots] = 0.0
            # unpolarized, basis = [k, k] placeholder (photon.rs:107-108)
            fields["basis"][slots, 0:3] = u
            fields["basis"][slots, 3:6] = u

    return ParticleState(**{k: (None if v is None else np.asarray(v)) for k, v in fields.items()})


def initialize_device(
    spec: SpeciesSpec,
    geom: GridGeometry,
    mesh,
    npc: int,
    density: Callable,
    ux: Callable,
    uy: Callable,
    uz: Callable,
    dt: float,
    capacity_per_device: int,
    seed: int = 0,
    dtype=jnp.float64,
    work_dtype=None,
) -> ParticleState:
    """Sample the initial distribution **on device** under shard_map.

    Same physics as :func:`initialize` (``mod.rs:172-203``) but all
    large arrays are generated on their owning device: only the (nx,)
    per-cell weight table crosses host->device.  The momentum
    callables must be JAX-traceable (the expression DSL is); random
    draws use counter-based keys folded per device, so the sampled
    *distribution* matches the host path while the exact streams
    differ (SURVEY §7 RNG parity note).

    Requires ``capacity_per_device >= n_loc * npc``.
    """
    from jax.sharding import PartitionSpec as P

    if npc > 0 and capacity_per_device < geom.n_loc * npc:
        raise ValueError(
            f"device init needs capacity >= n_loc*npc = {geom.n_loc * npc}, "
            f"got {capacity_per_device}"
        )

    # host side: per-interior-cell macroparticle weight (nx is small)
    x_centre = geom.xmin + (np.arange(geom.nx) + 0.5) * geom.dx
    nreal = (
        np.broadcast_to(
            np.asarray(density(x_centre), dtype=np.float64), x_centre.shape
        )
        * geom.dx
    )
    w_cell_host = np.zeros(geom.n_ext, np.float64)
    if npc > 0:
        w_cell_host[geom.interior_start : geom.interior_end] = np.where(
            nreal > 0.0, nreal / npc, 0.0
        )
    w_cell = jax.device_put(
        jnp.asarray(w_cell_host.reshape(geom.n_devices, geom.n_loc), dtype),
        jax.sharding.NamedSharding(mesh, P("x", None)),
    )

    cap = capacity_per_device
    n_loc = geom.n_loc

    def device_fn(w_loc):
        # w_loc arrives as (1, n_loc) from the sharded (ndev, n_loc)
        w_loc = w_loc[0]
        ai = jax.lax.axis_index("x")
        key = jax.random.fold_in(jax.random.key(seed), ai)
        lane = jnp.arange(cap)
        local_cell = (lane // max(npc, 1)).astype(jnp.int32)
        in_range = lane < n_loc * npc
        local_cell = jnp.where(in_range, local_cell, 0)
        w = jnp.where(in_range, w_loc[local_cell], 0.0)
        alive = in_range & (w > 0.0)

        k_xi, k_ur, k_nr, k_tau = jax.random.split(key, 4)
        xi = jax.random.uniform(k_xi, (cap,), dtype)
        g = ai * n_loc + local_cell  # extended-grid cell
        real_x = (g - geom.left_pad + xi) * geom.dx + geom.xmin
        urand = jax.random.uniform(k_ur, (cap,), dtype)
        nrand = jax.random.normal(k_nr, (cap,), dtype)
        u = jnp.stack(
            [
                jnp.broadcast_to(jnp.asarray(f(real_x, urand, nrand), dtype), (cap,))
                for f in (ux, uy, uz)
            ],
            axis=-1,
        )
        u2 = jnp.sum(u * u, axis=-1)
        if spec.kind == "photon":
            k0 = jnp.sqrt(u2)
            vx_over_c = jnp.where(k0 > 0, u[:, 0] / jnp.maximum(k0, 1e-30), 0.0)
            gamma_like = k0
        else:
            gamma_like = jnp.sqrt(1.0 + u2)
            vx_over_c = u[:, 0] / gamma_like
        prev_x = xi - const.SPEED_OF_LIGHT * vx_over_c * dt / geom.dx

        zero = jnp.zeros(cap, dtype)
        fields = dict(
            cell=local_cell,
            x=jnp.where(alive, xi, 0.0),
            prev_x=jnp.where(alive, prev_x, 0.0),
            y=zero,
            z=zero,
            weight=jnp.where(alive, w, 0.0),
            ux=jnp.where(alive, u[:, 0], 0.0),
            uy=jnp.where(alive, u[:, 1], 0.0),
            uz=jnp.where(alive, u[:, 2], 0.0),
            gamma=jnp.where(alive, gamma_like, 0.0 if spec.kind == "photon" else 1.0),
            chi=zero,
            tau=None,
            tau_abs=None,
            tau_st=None,
            work=None,
            birth_time=None,
            alive=alive,
        )
        if spec.kind == "electron":
            fields["tau"] = jnp.where(
                alive, jax.random.exponential(k_tau, (cap,), dtype), jnp.inf
            )
            fields["work"] = jnp.zeros(cap, work_dtype or dtype)
        if spec.kind == "photon":
            ka, kb = jax.random.split(k_tau)
            fields["tau_abs"] = jnp.where(
                alive, jax.random.exponential(ka, (cap,), dtype), jnp.inf
            )
            fields["tau_st"] = jnp.where(
                alive, jax.random.exponential(kb, (cap,), dtype), jnp.inf
            )
            fields["birth_time"] = jnp.where(alive, 0.0, -jnp.inf)
            fields["pol"] = jnp.zeros((cap, 4), dtype)
            fields["basis"] = jnp.where(
                alive[:, None], jnp.concatenate([u, u], axis=1), 0.0
            )
        return ParticleState(**fields)

    probe = _probe_state(spec, dtype)
    out_specs = ParticleState(
        **{
            f.name: (
                None
                if getattr(probe, f.name) is None
                else P("x", *([None] * (getattr(probe, f.name).ndim - 1)))
            )
            for f in dataclasses.fields(ParticleState)
        }
    )
    return jax.shard_map(
        device_fn, mesh=mesh, in_specs=P("x", None), out_specs=out_specs,
        check_vma=False,
    )(w_cell)


def _probe_state(spec: SpeciesSpec, dtype) -> ParticleState:
    """A 1-slot host state used to know which optional fields exist."""
    return ParticleState(**_empty_fields(spec, 1, np.float64))


def kinetic_energy_weights(spec: SpeciesSpec, state: ParticleState):
    """Per-particle kinetic energy in joules (macroparticle), using the
    cancellation-free gamma-1 form for massive species
    (``electron.rs:122-126``, ``ion.rs:128-134``, ``photon.rs:224-226``).
    """
    to_joules = 1.0e6 * const.ELECTRON_MASS_MEV * const.ELEMENTARY_CHARGE
    u2 = state.ux**2 + state.uy**2 + state.uz**2
    if spec.kind == "photon":
        ke = state.weight * state.gamma * to_joules
    elif spec.kind == "ion":
        mass_ratio = spec.mass / const.ELECTRON_MASS
        gamma_m1 = u2 / (1.0 + jnp.sqrt(1.0 + u2))
        ke = state.weight * gamma_m1 * mass_ratio * to_joules
    else:
        ke = state.weight * u2 / (state.gamma + 1.0) * to_joules
    return jnp.where(state.alive, ke, 0.0)


def shard_even(state: ParticleState, n_shards: int,
               capacity_per_shard: int) -> ParticleState:
    """Re-chunk a single-block host-side state (``initialize`` with a
    1-device geometry: alive-prefix rows ordered by cell) into
    ``n_shards`` equal-count contiguous chunks, each padded to
    ``capacity_per_shard`` — the replicated-field mode's particle
    decomposition.  Equal-count contiguous chunks of a cell-ordered
    population ARE the density-balanced split of the reference
    (``grid/mod.rs:157-206``): every shard holds the same number of
    macroparticles, spanning however many cells that takes.
    """
    import dataclasses as _dc

    alive = np.asarray(state.alive)
    n_alive = int(alive.sum())
    if not alive[:n_alive].all():
        raise ValueError("shard_even needs an alive-prefix layout")
    chunk = -(-n_alive // n_shards) if n_alive else 0
    if chunk > capacity_per_shard:
        raise ValueError(
            f"shard chunk {chunk} exceeds capacity {capacity_per_shard}"
        )
    out = {}
    for f in _dc.fields(state):
        a = getattr(state, f.name)
        if a is None:
            out[f.name] = None
            continue
        a = np.asarray(a)
        new = np.zeros((n_shards * capacity_per_shard,) + a.shape[1:],
                       a.dtype)
        if f.name != "alive":
            new[...] = dead_default(f.name, state.tau_abs is not None)
        for s in range(n_shards):
            lo = min(s * chunk, n_alive)
            hi = min(lo + chunk, n_alive)
            new[s * capacity_per_shard : s * capacity_per_shard + hi - lo] = (
                a[lo:hi]
            )
        out[f.name] = new
    return ParticleState(**out)
