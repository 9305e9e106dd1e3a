"""The particle-in-cell simulation core.

One fused, scanned, shard_mapped step reproducing the reference's hot
loop order (``src/main.rs:238-267``):

1. push each species (gather fields, advance momentum/position)
2. migrate particles across device boundaries (ppermute ring)
3. photon absorption (optional)            [qed]
4. photon emission (optional)              [qed]
5. clear + deposit currents
6. halo synchronize (fold currents, refresh ghosts) + boundary load
7. Yee field advance (B half, E full, B half)

Because field halos are refreshed at the *start* of the next step's
push (with values identical to the reference's locally-advanced
ghosts — see the analysis in ``grid.py``), the step body orders
exchange first without changing semantics.

The steps-between-outputs block runs as nested ``lax.scan``s inside
``jax.shard_map`` — a whole output interval compiles to one XLA
program with ICI collectives, replacing per-step MPI calls.  The
migration exchange closes every M-step block and the maintenance sort
opens every R-step period as STATICALLY scheduled scan phases; no
per-step ``lax.cond`` ever carries particle state (each such cond
measured 2-7 ms/step of conditional-buffer copies at 8.4M rows).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, tree_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import constants as const
from .fields import make_mesh, sm_mask, zero_fields
from .grid import HALO, GridGeometry, apply_boundaries, em_field_energy_local
from .ops import maxwell
from .ops.deposit import deposit, deposit_sorted
from .ops.interp import fields_at
from .ops.pusher import boris_push, photon_chi, photon_push, vay_push
from .parallel import halo
from .parallel.migrate import migrate, migrate_sorted
from .species import ParticleState, SpeciesSpec, kinetic_energy_weights


# ----------------------------------------------------------------------
# 64-bit-safe loss counters without jax_enable_x64
# ----------------------------------------------------------------------
# Counters ride the scan carry as (2,) int32 pairs [hi, lo] in base
# 2**30: a plain int32 counter can wrap within ONE bench run (the r2
# capture logged 1.95e9 losses, within 10% of silent i32 wraparound —
# VERDICT r2 weak #2), and int64 arrays only exist under
# jax_enable_x64, which f32 bench runs do not enable.  Per-step
# increments are bounded by total buffer capacity (< 2**30), so
# lo + inc never wraps and the carry is 0 or 1.

def counter_add(c, inc):
    """Accumulate a per-step increment (int32 scalar < 2**30) into a
    [hi, lo] counter pair."""
    lo = c[1] + inc.astype(jnp.int32)
    carry = lo >> 30
    return jnp.stack([c[0] + carry, lo - (carry << 30)])


def counter_total(c) -> int:
    """Host-side value of a counter pair (also accepts legacy scalar
    counters, e.g. from an old checkpoint)."""
    a = np.asarray(c)
    if a.ndim == 0:
        return int(a)
    return (int(a[0]) << 30) + int(a[1])


@dataclasses.dataclass(frozen=True)
class SimOptions:
    """Static physics/runtime switches.

    The reference's compile-time cargo features (``Cargo.toml:24-31``)
    become trace-time booleans here: each combination compiles its own
    specialized step.
    """

    dt: float
    current_deposition: bool = True
    photon_emission: bool = False
    photon_absorption: bool = False
    # feature-flag equivalents
    radiation_reaction: bool = True  # 'no_radiation_reaction' inverted
    beaming: bool = True  # 'no_beaming' inverted
    stimulated_emission: bool = True  # 'no_stimulated_emission' inverted
    immobile_photons: bool = False
    # per-event absorption/stimulated-emission records
    # ('extra_absorption_output' / 'extra_stimulated_emission_output',
    # interactions.rs:267-289): events append to a fixed per-device
    # ring drained by the driver at output time
    extra_absorption_output: bool = False
    extra_stimulated_emission_output: bool = False
    event_log_capacity: int = 4096
    # emission filters (main.rs:81-83)
    photon_energy_min: float | None = None  # MeV
    photon_angle_max: float | None = None  # rad, about -x axis
    max_formation_length: float | None = None  # m
    # absorption controls (main.rs:84-85 / interactions.rs:145)
    max_displacement: float | None = None
    absorption_stop_time: float | None = None
    # capacity planning
    migration_capacity: int = 4096
    # events (absorption + stimulated) fired per device per step are
    # bounded by this: the kick/copy/record machinery runs in
    # (EVC,)-row event space, and events beyond the bound are deferred
    # (depths restored, photon re-walks next step — a counted delay).
    # The bound is what keeps the kick unconditional: a full-length
    # fallback cond carried 13 buffer-length operands on the VMEM
    # stack and could not compile at 8.39M rows (r4 qed-8m).
    absorption_event_capacity: int = 4096
    absorption_candidates: int = 64
    # candidates examined per sequential pass of the absorption walk:
    # each pass is vectorized over (photons, block); only ceil(K/block)
    # passes run serially.  With the one-hot event-column fetch, 32
    # measured fractionally faster than one 64-wide pass on v5e (r3:
    # 112.5 vs 115.3 ms at 2.1M/655k; before it, 64 won by 25% —
    # take_along_axis gathers dominated per-pass cost)
    absorption_block: int = 32
    # active-set compaction of the absorption walk: 0 = walk the whole
    # photon buffer (exact reference cadence); > 0 = gather at most
    # this many active-with-cell-mates photons per step (excess is
    # delayed one step and counted as overflow).  The walk costs
    # O(rows x candidates), so this bounds the pass by the real pair
    # population instead of the buffer capacity.
    absorption_active_capacity: int = 0
    # same compaction for the emission pass: per-step emitters are
    # sparse (rate * dt << 1), yet the sampler's table machinery runs
    # for every electron row.  0 = off; > 0 = sample at most this many
    # emitters per step (excess keeps tau < 0 and emits next step,
    # counted as overflow).
    emission_active_capacity: int = 0
    # photon-buffer insert bound per emission step: kept photons are
    # compacted to at most this many rows before the slot scatter, so
    # the insert is sized by the real emission count instead of the
    # sampler's active capacity (whose full-buffer staging measured
    # ~99 ms/step at 2.6M rows on v5e).  -1 = auto
    # (max(16384, active/8)); 0 = unbounded.  Emitters beyond the
    # bound are DEFERRED (no recoil, tau stays negative, they emit on
    # a later step) and counted — a delay, never an energy-ledger
    # violation.
    emission_insert_capacity: int = -1
    # upper bound on any particle's per-step cell drift, in cells (the
    # CFL default 0.95 is always safe).  Slow-drift decks (two-stream
    # class) may set the measured bound: migration can then be DEFERRED
    # far beyond the HALO-1 step cap — particles roam up to 2 cells out
    # of the slab (the deposit/gather reach through the halo machinery)
    # between exchanges, so drift * M <= 2 cells is the real
    # constraint, not M <= 3 steps.  Rows beyond the reach are routed
    # to the misfit fallback and their dropped deposit taps COUNTED as
    # losses (sizing errors are loud, never silent).
    max_drift_cells_per_step: float = 0.95
    # absorption pairing without the per-step electron sort: between
    # maintenance sorts the fused state is NEARLY sorted (rows move
    # only at sorts/exchanges), so per-cell candidate BRACKETS from
    # monotone envelopes + exact per-candidate cell masks replace the
    # per-step payload sort (~36 ms/step at 2.1M on v5e).  Applies to
    # the fused electron path only; the unfused/f64 path keeps the
    # exact sort.  0 = per-step sort (round-3 behavior), 1 = bracketed
    # (default).
    absorption_bracketed: int = 1
    # sort the absorption active-set index table so working-length
    # gathers/scatters see monotone buffer addresses (physics
    # identical — selection unchanged; A/B knob, r5)
    absorption_sorted_active: int = 1
    seed: int = 0
    # diagnostics: disable the migration exchange (bench A/B only —
    # particles leaving their slab are then lost)
    migration: bool = True
    # deposition algorithm: 'sorted' (argsort + segmented sums — fast
    # on TPU, blocked summation order) or 'scatter' (XLA scatter-add,
    # index summation order)
    deposit_method: str = "sorted"
    # sorted particle pipeline for NON-fused species: migration keeps
    # them strictly cell-sorted (migrate_sorted), making deposition
    # sort-free.  Default OFF: measured on v5e, the full-length packed
    # row gather it pays costs more than the deposition payload sort
    # it saves (134 vs 61 ms/step at 2.1M).  The fused pipeline does
    # NOT need it — it manages its own maintenance sorts and edge
    # migration.
    sorted_pipeline: bool = False
    # fused Pallas gather+push+deposit kernel (ops/fused.py) for
    # electron-kind species.  Requires the sorted pipeline (bounded
    # per-block cell windows), f32 state, and per-device capacity a
    # multiple of fused_block; silently falls back to the unfused ops
    # otherwise.  Alive particles outside their block window (region
    # edges, fresh arrivals) are handled by a compacted fallback pass
    # of the unfused ops, sized by fused_misfit_capacity.
    fused_pusher: bool = False
    fused_block: int = 4096
    fused_window: int = 32
    fused_misfit_capacity: int = 1024
    # logical blocks per fused-kernel grid program (FusedSpec.subblocks):
    # amortizes Mosaic's per-program overhead without widening the
    # per-block window.  Must divide the per-device block count; falls
    # back to 1 when it does not.
    fused_subblocks: int = 1
    # packed fast path for fused species: inside the scanned run the
    # species is carried as ONE (nblk, 9, RB, 128) hot matrix + aux/
    # weight arrays (ops.fused.PackedState) so the kernel moves 2
    # monolithic block DMAs instead of ~24 per-column ones.  Measured
    # on v5e (2026-08-19 A/B + combo sweep): ~6% SLOWER than the column
    # kernel — per-block DMA count was not the bottleneck — so it is
    # OFF by default and kept as an A/B knob.  Packing happens once per
    # run() call; the public ParticleState API is unchanged.  Disabled
    # automatically for QED runs (the per-step interaction passes are
    # column-oriented).
    packed_fused: bool = False
    # field gather via one-hot MXU contraction instead of the W-cell
    # select-sum loop (FusedSpec.mxu_gather) — A/B knob
    mxu_gather: bool = False
    # static unrolled W-loop gather (default; measured 7.3% faster
    # than the dynamic span-bounded loop on v5e, r5b) — 0 selects the
    # dynamic variant for wide-window decks
    static_gather: bool = True
    # mixed-precision QED decks: run the (unfused) electron push
    # arithmetic in the field dtype (f64), rounding only the stored
    # state — the all-f32 chain's field-phase-correlated rounding bias
    # (+22.6 J over a colliding_beams crossing, ledger_closure
    # --no-emission r5) is what kept the shipped ledger above the 1e-5
    # closure target.  Set by cli.build for mixed QED decks; ignored
    # by the fused kernel (Mosaic has no f64).
    push_f64_compute: bool = False
    # maintenance-sort strategy (migrate.sort_state): key+iota sort +
    # one row-batched permutation gather instead of the multi-operand
    # payload sort — A/B knob (the sort phase is ~2.3 ms/step of the
    # 8.2 ms bench step at R=256; gather cost re-priced as row-count-
    # bound in round 2)
    sort_rowgather: bool = False
    # lite fused kernel (FusedSpec.lite): skip the chi/gamma-half/
    # prev_x outputs and their compute where nothing consumes them
    # (ions always; electrons on non-QED decks — chi is then refreshed
    # lazily at output time).  -1 = auto, 0 = off (full outputs; also
    # restores bitwise parity with the packed layout, whose kernel
    # always computes the full set).
    fused_lite: int = -1
    # resort cadence R: a LOCAL payload re-sort (migrate.sort_state)
    # opens every R-step period as a statically scheduled phase (no
    # per-step cond); between sorts the kernel re-anchors each block
    # every step from its own fit-row minima, so the window only needs
    # the block's cell span plus dispersion slack.  Fresh migration
    # arrivals that land outside their block's window fall back to the
    # misfit path until the next sort.  1 = re-sort inside every step.
    fused_resort_every: int = 1
    # migration cadence M: with HALO=4 ghost cells a particle may roam
    # a few cells past its subdomain before field gathers or deposits
    # leave the slab (ghost fields are refreshed and ghost currents
    # folded every step, so the physics is exchange-order independent).
    # The exchange then runs as a statically scheduled phase closing
    # every M-step block (M <= 3); with M == 1 it instead stays inline
    # in the step, before the QED passes (reference order).  Forced to
    # 1 when QED interactions are on (absorption buckets by in-domain
    # cell).
    migration_every: int = 1
    # 'compact' (leaver-count-proportional index tables; ~2 ms) or
    # 'full' (stable-argsort compaction of the whole state; ~17 ms at
    # 2.6M rows) — same exchange semantics
    migration_method: str = "compact"
    # fused/sorted species instead use the O(window) edge exchange
    # (migrate_edges): leavers and free slots of a cell-sorted state
    # all live in the head/tail rows, so nothing full-length is
    # touched.  The window must cover the rows of the two boundary
    # cells plus drift (~2-4x particles-per-cell); leavers outside it
    # are counted into the overflow counter, never silently kept.
    migration_window: int = 16384
    # replicated-field mode (load balancing for nonuniform decks, the
    # TPU answer to the reference's balanced decomposition,
    # grid/mod.rs:157-206): every device holds the WHOLE grid (grid
    # work is tiny next to particles) and the particle population is
    # split into equal-count contiguous chunks — perfect compute
    # balance regardless of the density profile.  Deposited currents
    # are psum'd over the mesh each step; there is no halo exchange
    # and no particle migration (cells are global; boundary crossings
    # wrap or kill in place).  Requires geom.n_devices == 1 with the
    # mesh carrying the real device count.  Incompatible with
    # photon_absorption (pairing needs spatially-local shards).
    replicate_fields: bool = False
    # debug/profiling ONLY: skip the misfit fallback pass entirely
    # (misfit rows are then neither pushed nor deposited — wrong
    # physics; used by tools/phase_bench.py to attribute step time)
    debug_skip_misfit: bool = False
    # debug/profiling ONLY: comma-separated absorb() sections to skip
    # ("walk", "kicks", "insert", "scatter", "book") — wrong physics;
    # used by tools/absorb_micro.py to attribute the absorption pass
    debug_absorb_ablate: str = ""


class Simulation:
    """Owns the mesh, geometry, species registry and jitted step."""

    def __init__(
        self,
        geom: GridGeometry,
        options: SimOptions,
        species: dict[str, SpeciesSpec],
        mesh: Mesh | None = None,
        laser_y: Callable | None = None,
        laser_z: Callable | None = None,
        dtype=jnp.float64,
        field_dtype=None,
    ):
        """``dtype`` is the particle-state precision; ``field_dtype``
        (default: same) the grid-field precision.  Mixed precision —
        f32 particles + f64 fields — keeps the fused Pallas path (f32
        only) while the Yee integration, current accumulation and
        energy sums run in f64 (SURVEY §7 item 7).  Requires
        jax_enable_x64 when field_dtype is f64."""
        self.geom = geom
        self.options = options
        self.specs = dict(species)
        self.mesh = mesh if mesh is not None else make_mesh(geom.n_devices)
        if options.replicate_fields:
            if geom.n_devices != 1:
                raise ValueError(
                    "replicate_fields needs geom.n_devices == 1 (the "
                    "mesh carries the real device count)"
                )
            # photon_absorption works here too (r4): pairing runs over
            # an all-gathered per-cell candidate table with kick
            # records routed to their owner devices
            # (interactions.absorb replicated mode)
        self.dtype = dtype
        self.field_dtype = field_dtype if field_dtype is not None else dtype
        # Pallas interpret mode keyed on the MESH platform, not
        # jax.default_backend(): with a site hook pre-registering a TPU
        # plugin, the default backend can be TPU while this sim's mesh
        # is the virtual CPU one (or vice versa after a backend-init
        # fallback).  tests/test_tpu_lowering.py overrides this to
        # cross-lower the Mosaic path without hardware.
        self._interpret = self.mesh.devices.flat[0].platform == "cpu"
        zero = lambda t, x: jnp.zeros((), self.field_dtype)
        self.laser_y = laser_y or zero
        self.laser_z = laser_z or zero
        self._run = jax.jit(self._build_run(), static_argnames=("nsteps",))
        # donating variant built lazily (Simulation.run(donate=True)):
        # input/output aliasing halves the peak HBM footprint of the
        # particle state — required at north-star scale (1e8 rows x 13
        # f32 columns = 5.2 GB state; without aliasing the program
        # holds inputs + outputs + workspace and OOMs a 16 GB v5e)
        self._run_donated = None

    # ------------------------------------------------------------------
    # state plumbing
    # ------------------------------------------------------------------

    def shard_particles(self, state: ParticleState) -> ParticleState:
        """Device-put a host-side ParticleState with the per-device block
        layout produced by ``species.initialize``."""
        def put(a):
            if a is None:
                return None
            spec = P("x", *([None] * (a.ndim - 1)))
            return jax.device_put(jnp.asarray(a), NamedSharding(self.mesh, spec))

        return tree_util.tree_map(put, state)

    def _pspec(self, state_tree):
        return tree_util.tree_map(
            lambda a: P("x", *([None] * (a.ndim - 1))), state_tree
        )

    # ------------------------------------------------------------------
    # the step
    # ------------------------------------------------------------------

    def _push_species(self, name, st: ParticleState, E_slab, B_slab, t):
        geom, opt = self.geom, self.options
        spec = self.specs[name]
        if spec.kind == "photon" and not opt.photon_absorption:
            # chi has no physics consumer without the absorption pass
            # (it only feeds the cross sections, photon.rs:320-341) and
            # is instantaneous, not accumulated — skip the full-capacity
            # field gather here and refresh it at output/checkpoint time
            # (refresh_photon_chi); the ballistic push is elementwise
            if opt.immobile_photons:
                return st
            cell, x, prev_x, y, z, _ = photon_push(
                st.cell, st.x, st.y, st.z, st.u, None, None,
                geom.dx, opt.dt,
            )
            return dataclasses.replace(
                st, cell=cell, x=x, prev_x=prev_x, y=y, z=z
            )
        idx = st.cell + HALO
        Ep, Bp = fields_at(E_slab, B_slab, idx, st.x)
        # mixed precision: particles advance in their own dtype —
        # except under push_f64_compute, where the electron push
        # ARITHMETIC runs on the raw f64 fields and only the stored
        # state rounds to f32 (see pusher.vay_push compute_dtype)
        f64_push = (
            opt.push_f64_compute and spec.kind == "electron"
            and st.x.dtype != self.field_dtype
        )
        if not f64_push:
            Ep = Ep.astype(st.x.dtype)
            Bp = Bp.astype(st.x.dtype)

        if spec.kind == "electron":
            res = vay_push(
                st.cell, st.x, st.y, st.z, st.u, st.gamma, st.tau, st.work,
                Ep, Bp, geom.dx, opt.dt,
                classical_rates=not opt.radiation_reaction,
                compute_dtype=self.field_dtype if f64_push else None,
            )
            st = dataclasses.replace(
                st,
                cell=res.cell, x=res.x, prev_x=res.prev_x, y=res.y, z=res.z,
                ux=res.u[:, 0], uy=res.u[:, 1], uz=res.u[:, 2],
                gamma=res.gamma, chi=res.chi, tau=res.tau,
                work=res.work,
            )
        elif spec.kind == "ion":
            q = jnp.full_like(st.x, spec.charge)
            m = jnp.full_like(st.x, spec.mass)
            cell, x, prev_x, y, z, u, gamma_m1, _chi = boris_push(
                st.cell, st.x, st.y, st.z, st.u, q, m, Ep, Bp, geom.dx, opt.dt
            )
            st = dataclasses.replace(
                st, cell=cell, x=x, prev_x=prev_x, y=y, z=z,
                ux=u[:, 0], uy=u[:, 1], uz=u[:, 2],
                gamma=1.0 + gamma_m1,
            )
        elif spec.kind == "photon":
            if opt.immobile_photons:
                return st
            cell, x, prev_x, y, z, chi = photon_push(
                st.cell, st.x, st.y, st.z, st.u, Ep, Bp, geom.dx, opt.dt
            )
            st = dataclasses.replace(
                st, cell=cell, x=x, prev_x=prev_x, y=y, z=z, chi=chi
            )
        return st

    def _velocity(self, spec: SpeciesSpec, st: ParticleState):
        c = const.SPEED_OF_LIGHT
        if spec.kind == "photon":
            k0 = jnp.maximum(st.gamma, 1e-300)
            return c * st.u / k0[:, None]
        return c * st.u / st.gamma[:, None]

    @property
    def _event_log(self) -> bool:
        return (
            self.options.extra_absorption_output
            or self.options.extra_stimulated_emission_output
        )

    def _fused_applicable(self, name, st) -> bool:
        """Trace-time check that the fused Pallas kernel can serve this
        species (see SimOptions.fused_pusher)."""
        from .ops import fused as F

        if isinstance(st, F.PackedState):
            return True  # only packed because it was applicable
        opt, geom = self.options, self.geom
        n_rows = geom.n_loc + 2 * HALO + 2 * F.PAD
        # current_deposition is NOT required: deposition-off decks
        # (colliding_beams.yaml) run the same kernel with the deposit
        # section skipped (FusedSpec.dep_skip) — dropping to the
        # unfused ops for them was a ~6x pusher regression
        return (
            opt.fused_pusher
            and opt.migration
            and self.specs[name].kind in ("electron", "ion")
            and st.x.dtype == jnp.float32
            and st.x.shape[0] % opt.fused_block == 0
            # Mosaic requires the kernel block's sublane dim divisible
            # by 8: blocks under 1024 rows only lower in interpret
            # mode (the r3 hole_boring rerun crashed at blk=512 with
            # subblocks degraded to 1 by a prime block count)
            and (opt.fused_block >= 1024 or self._interpret)
            and n_rows * 96 <= 8 * 2**20  # EB + out slabs in VMEM
            # window read/write (base-2 .. base+W+2) must fit the table
            and opt.fused_window + 4 <= n_rows
        )

    def _packed_applicable(self, name, st) -> bool:
        """Trace-time check for the packed fast path (see
        SimOptions.packed_fused): fused-applicable, QED off (the
        interaction passes are column-oriented), and the state not
        already packed."""
        from .ops import fused as F

        opt = self.options
        return (
            opt.packed_fused
            and not (opt.photon_emission or opt.photon_absorption)
            and not isinstance(st, F.PackedState)
            and self._fused_applicable(name, st)
        )

    def _fused_spec(self, name):
        from .ops import fused as F

        opt, geom = self.options, self.geom
        spec = self.specs[name]
        qed_on = opt.photon_emission or opt.photon_absorption
        return F.FusedSpec(
            block=opt.fused_block, window=opt.fused_window,
            n_rows=geom.n_loc + 2 * HALO + 2 * F.PAD,
            dx=geom.dx, dt=opt.dt,
            charge=spec.charge, mass=spec.mass,
            pusher="vay" if spec.kind == "electron" else "boris",
            row_off=HALO + F.PAD,
            dep_skip=not opt.current_deposition,
            # chi/gh feed the QED passes (electrons only); prev_x is
            # read back only by the QED event log.  Ions never need
            # them; electrons only on QED decks.  Stale electron chi is
            # refreshed lazily at output time (refresh_electron_chi).
            lite=(
                (spec.kind != "electron" or not qed_on)
                and opt.fused_lite != 0
            ),
            # only electrons carry the work integral (species.py)
            work_out=spec.kind == "electron",
            # mixed precision (f32 particles, f64 fields): the work
            # column is field-dtype (species initialization) and the
            # kernel outputs bare increments accumulated outside in
            # f64 — in-kernel f32 accumulation over 1e4+ steps was the
            # ledger-precision limiter (BASELINE.md r4).  All-f32 and
            # all-f64 runs keep accumulate-in-place semantics.
            work_inc=(
                spec.kind == "electron"
                and self.field_dtype != self.dtype
            ),
            mxu_gather=opt.mxu_gather,
            static_gather=opt.static_gather,
            subblocks=max(1, opt.fused_subblocks),
        )

    def _fused_push_deposit(self, name, st, E_slab, B_slab, anchors):
        """Fused gather+push+deposit (ops/fused.py) plus the compacted
        unfused fallback for alive rows outside their block window.

        Depositing before migration is equivalent to the reference's
        post-migration deposit: a one-cell leaver deposits into halo
        rows, and fold_currents adds them to the neighbour exactly as
        the reference's overlay of ghost currents (yee.rs:97-113).

        Returns (state, J_add, rho_add, misfit_overflow,
        anchors_next) — the last being the kernel's exact per-block
        window bases for the NEXT step (min of post-push fit-row cells
        minus slack), which replace the old pessimistic carried-anchor
        decrement and let the window track the block instead of
        widening with the resort cadence."""
        from .ops import fused as F

        opt, geom = self.options, self.geom
        spec = self.specs[name]
        fspec = self._fused_spec(name)
        eb = F.make_eb_rows(E_slab, B_slab)
        # the kernel forms the macrocharge (weight * charge) and the
        # table-row shift itself — dead rows carry weight 0 (invariant
        # of initialization, migration retire and sort placeholders),
        # so no masked copy of the weight column is materialized here
        cols, miss, out_slab, anchors_next = F.fused_push_deposit(
            fspec, anchors, st.cell, st.x, st.y, st.z,
            st.ux, st.uy, st.uz, st.gamma, st.weight,
            st.work if fspec.work_out and not fspec.work_inc else None,
            eb,
            interpret=self._interpret,
        )

        # optical depth decrements OUTSIDE the kernel (any tau update
        # inside made Mosaic's optimizer effectively hang when the
        # kernel sat in the scanned QED step): the kernel outputs chi
        # and gamma_half, and rate(chi=0)=0 keeps dead/misfit rows
        # inert (electron.rs:287)
        # (skipped when emission is off: tau is then inf/unconsumed,
        # so the always-decrement of the reference is a no-op)
        tau_new = st.tau
        if (
            spec.kind == "electron" and st.tau is not None
            and opt.photon_emission
        ):
            from .qed import emission as em

            rate_fn = (
                em.rate if opt.radiation_reaction else em.classical_rate
            )
            tau_new = (
                st.tau - rate_fn(cols["chi"], cols["gh"]) * opt.dt
            ).astype(st.tau.dtype)

        upd = dict(
            cell=cols["cell"].astype(st.cell.dtype),
            x=cols["x"], y=cols["y"], z=cols["z"],
            ux=cols["ux"], uy=cols["uy"], uz=cols["uz"],
            gamma=cols["gamma"],
        )
        if not fspec.lite:
            # lite kernels skip these outputs: prev_x/chi ride the
            # carry unchanged (prev_x is consumed by nothing between
            # steps; stale chi is refreshed at output time)
            upd["prev_x"] = cols["prev_x"]
            upd["chi"] = cols["chi"]
        if st.tau is not None:
            upd["tau"] = tau_new
        if st.work is not None and fspec.work_out:
            if fspec.work_inc:
                # compensated accumulation: the f32 increment lands in
                # the field-dtype (f64) column — see FusedSpec.work_inc
                upd["work"] = st.work + cols["winc"].astype(st.work.dtype)
            else:
                upd["work"] = cols["work"]

        # fallback: compact misfits, run the unfused ops on the (small)
        # compacted rows, scatter back.  Runs UNCONDITIONALLY: when no
        # misfits exist every index table entry lands past the array
        # (fill/drop modes make the gathers inert and the scatters
        # no-ops), and the whole chain is sized by fused_misfit_capacity
        # except one blocked cumsum.  Wrapping it in lax.cond instead
        # forced all 13 particle columns through conditional buffers:
        # measured 7.4 ms/step of copy overhead at 8.4M rows on v5e —
        # several times the cost of just running the fallback.
        names = tuple(upd)

        def _fallback(ops):
            upd_t, out_slab = ops
            mtab, movf = F.misfit_compact(miss, opt.fused_misfit_capacity)
            tk = lambda a, fill: jnp.take(
                a, mtab, axis=0, mode="fill", fill_value=fill
            )
            m_cell = tk(st.cell, 0)
            m_x = tk(st.x, 0.0)
            m_u = jnp.stack(
                [tk(st.ux, 0.0), tk(st.uy, 0.0), tk(st.uz, 0.0)], axis=1
            )
            m_q = tk(st.weight, 0.0).astype(jnp.float32) * jnp.float32(
                spec.charge
            )
            Ep, Bp = fields_at(E_slab, B_slab, m_cell + HALO, m_x)
            Ep = Ep.astype(st.x.dtype)
            Bp = Bp.astype(st.x.dtype)
            if spec.kind == "electron":
                # non-emission decks: the main path skips the tau
                # decrement (unconsumed, see the tau note above) — the
                # fallback matches, saving a gather + a scatter + the
                # rate's table evaluation at fallback length
                emit_on = opt.photon_emission and st.tau is not None
                res = vay_push(
                    m_cell, m_x, tk(st.y, 0.0), tk(st.z, 0.0), m_u,
                    tk(st.gamma, 1.0),
                    tk(st.tau, jnp.inf) if emit_on
                    else jnp.full_like(m_x, jnp.inf),
                    tk(st.work, 0.0), Ep, Bp, geom.dx, opt.dt,
                    classical_rates=not opt.radiation_reaction,
                )
                fb = dict(
                    cell=res.cell, x=res.x, prev_x=res.prev_x, y=res.y,
                    z=res.z, ux=res.u[:, 0], uy=res.u[:, 1],
                    uz=res.u[:, 2], gamma=res.gamma, chi=res.chi,
                    work=res.work,
                )
                if emit_on:
                    fb["tau"] = res.tau
                vel = const.SPEED_OF_LIGHT * res.u / res.gamma[:, None]
            else:
                qv = jnp.full_like(m_x, spec.charge)
                mv = jnp.full_like(m_x, spec.mass)
                cell_b, x_b, px_b, y_b, z_b, u_b, gm1, _chi = boris_push(
                    m_cell, m_x, tk(st.y, 0.0), tk(st.z, 0.0), m_u, qv,
                    mv, Ep, Bp, geom.dx, opt.dt,
                )
                gb = 1.0 + gm1
                fb = dict(
                    cell=cell_b, x=x_b, prev_x=px_b, y=y_b, z=z_b,
                    ux=u_b[:, 0], uy=u_b[:, 1], uz=u_b[:, 2], gamma=gb,
                )
                vel = const.SPEED_OF_LIGHT * u_b / gb[:, None]
            if opt.current_deposition:
                # one-hot MXU deposit into the kernel's tap slab: its
                # own grid-space deposit chain (scatter OR one-hot +
                # shifted adds) cost ~1.9-2.0 ms/step even at 256
                # fallback rows on v5e (the whole chain's dominant
                # cost, r4 misfit micro) — sharing the kernel's slab
                # and fold removes those ops entirely
                out_slab = F.deposit_into_slab(
                    out_slab, fb["cell"] + fspec.row_off, fb["x"],
                    fb["prev_x"], m_q, vel, geom.dx, opt.dt,
                )
            sc = lambda a, v: a.at[mtab].set(v.astype(a.dtype), mode="drop")
            out = tuple(
                sc(u_col, fb[fname]) if fname in fb else u_col
                for fname, u_col in zip(names, upd_t)
            )
            # deposit-reach violations: rows beyond [-HALO+2,
            # n_loc+HALO-3] lose out-of-slab deposit taps (dropped by
            # the scatter) — counted as losses so a wrong
            # max_drift_cells_per_step estimate voids the run loudly
            # (counts repeat while the row stays out of reach)
            if opt.current_deposition:
                viol = (m_q != 0.0) & (
                    (m_cell < -(HALO - 2))
                    | (m_cell > geom.n_loc + HALO - 3)
                )
                movf = movf + jnp.sum(viol.astype(jnp.int32))
            return out, out_slab, movf.astype(jnp.int32)

        if opt.debug_skip_misfit:
            movf = jnp.zeros((), jnp.int32)
        else:
            upd_t, out_slab, movf = _fallback(
                (tuple(upd[k] for k in names), out_slab)
            )
            upd = dict(zip(names, upd_t))
        J_add, rho_add = F.fold_out_slab(out_slab)
        return (
            dataclasses.replace(st, **upd), J_add, rho_add, movf,
            anchors_next,
        )

    def _packed_push_deposit(self, name, ps, E_slab, B_slab, anchors):
        """:meth:`_fused_push_deposit` on the packed layout: one
        monolithic block read + two writes per grid step instead of ~24
        per-column DMAs, plus the compacted unfused fallback indexing
        the 4-D hot matrix directly.  QED is never on here
        (see :meth:`_packed_applicable`), so there is no tau update.

        Returns (PackedState, J_add, rho_add, misfit_overflow,
        anchors_next)."""
        from .ops import fused as F

        opt, geom = self.options, self.geom
        spec = self.specs[name]
        fspec = self._fused_spec(name)
        eb = F.make_eb_rows(E_slab, B_slab)
        H_new, A_new, out_slab, anchors_next = F.fused_push_deposit_packed(
            fspec, anchors, ps.h, ps.weight, eb,
            interpret=self._interpret,
        )
        ps = F.PackedState(h=H_new, aux=A_new, weight=ps.weight, tau=ps.tau)

        if opt.debug_skip_misfit:
            J_add, rho_add = F.fold_out_slab(out_slab)
            return ps, J_add, rho_add, jnp.zeros((), jnp.int32), anchors_next

        # ---- compacted misfit fallback (see _fused_push_deposit for
        # why it runs unconditionally) --------------------------------
        nblk, CH, RB, _ = H_new.shape
        block = RB * 128
        n = nblk * block
        miss = A_new[:, F.A_COLS.index("miss")].reshape(n)
        mtab, movf = F.misfit_compact(miss, opt.fused_misfit_capacity)
        valid = mtab < n
        # Flat row indices into the contiguous hot matrix.  Indexing
        # H_new[blk, :, sub, lane] (rows across the middle column dim)
        # makes XLA materialize a full TRANSPOSED copy of H to get the
        # rows contiguous — 2x 377 MB of copies per step at bench scale
        # — so gather/scatter through flat indices instead.  Invalid
        # slots (mtab == n) land past the buffer end: the gather clamps
        # (masked below), the scatters drop.
        pin = mtab % block
        idx = ((mtab // block) * (CH * block) + pin)[:, None] \
            + block * jnp.arange(CH, dtype=mtab.dtype)[None, :]
        rows = H_new.reshape(-1)[idx]              # (cap, CH) pre-push
        rows = jnp.where(valid[:, None], rows, 0.0)
        m_cell = rows[:, 0].astype(jnp.int32)
        m_x = rows[:, 1]
        m_u = rows[:, 4:7]
        m_g = jnp.where(valid, rows[:, 7], 1.0)
        m_w = jnp.where(valid, ps.weight.reshape(-1)[mtab], 0.0)
        m_q = m_w * jnp.float32(spec.charge)
        if opt.current_deposition:
            # deposit-reach violations -> losses (see _fused_push_deposit)
            viol = (m_q != 0.0) & (
                (m_cell < -(HALO - 2)) | (m_cell > geom.n_loc + HALO - 3)
            )
            movf = movf + jnp.sum(viol.astype(jnp.int32))
        Ep, Bp = fields_at(E_slab, B_slab, m_cell + HALO, m_x)
        Ep = Ep.astype(jnp.float32)
        Bp = Bp.astype(jnp.float32)
        if spec.kind == "electron":
            res = vay_push(
                m_cell, m_x, rows[:, 2], rows[:, 3], m_u, m_g,
                jnp.full_like(m_x, jnp.inf), rows[:, 8], Ep, Bp,
                geom.dx, opt.dt,
                classical_rates=not opt.radiation_reaction,
            )
            out9 = jnp.stack(
                [res.cell.astype(jnp.float32), res.x, res.y, res.z,
                 res.u[:, 0], res.u[:, 1], res.u[:, 2], res.gamma,
                 res.work], axis=1,
            )
            prev_x, chi = res.prev_x, res.chi
            vel = const.SPEED_OF_LIGHT * res.u / res.gamma[:, None]
        else:
            qv = jnp.full_like(m_x, spec.charge)
            mv = jnp.full_like(m_x, spec.mass)
            cell_b, x_b, px_b, y_b, z_b, u_b, gm1, _chi = boris_push(
                m_cell, m_x, rows[:, 2], rows[:, 3], m_u, qv, mv,
                Ep, Bp, geom.dx, opt.dt,
            )
            gb = 1.0 + gm1
            out9 = jnp.stack(
                [cell_b.astype(jnp.float32), x_b, y_b, z_b,
                 u_b[:, 0], u_b[:, 1], u_b[:, 2], gb, rows[:, 8]], axis=1,
            )
            prev_x, chi = px_b, jnp.zeros_like(x_b)
            vel = const.SPEED_OF_LIGHT * u_b / gb[:, None]
        if opt.current_deposition:
            out_slab = F.deposit_into_slab(
                out_slab, out9[:, 0].astype(jnp.int32) + fspec.row_off,
                out9[:, 1], prev_x, m_q, vel, geom.dx, opt.dt,
            )
        J_add, rho_add = F.fold_out_slab(out_slab)
        h = H_new.reshape(-1).at[idx].set(
            out9.astype(jnp.float32), mode="drop"
        ).reshape(H_new.shape)
        CA = A_new.shape[1]
        aidx = ((mtab // block) * (CA * block) + pin)[:, None] \
            + block * jnp.arange(2, dtype=mtab.dtype)[None, :]
        aux = A_new.reshape(-1).at[aidx].set(
            jnp.stack([prev_x, chi], axis=1).astype(jnp.float32),
            mode="drop",
        ).reshape(A_new.shape)
        ps = F.PackedState(h=h, aux=aux, weight=ps.weight, tau=ps.tau)
        return ps, J_add, rho_add, movf.astype(jnp.int32), anchors_next

    def _wrap_kill(self, st):
        """Replicated-mode 'migration': cells are global, so boundary
        crossings wrap in place (periodic) or kill the particle
        (non-periodic global edge — the reference drops leavers with no
        neighbour, mod.rs:309-329).  No slots move; a wrapped particle
        is a kernel misfit until the next maintenance sort.  Returns
        (state, overflow=0)."""
        from .ops import fused as F

        geom = self.geom
        n_loc = geom.n_loc
        periodic = geom.left_boundary == "periodic"
        zero = jnp.zeros((), jnp.int32)
        if isinstance(st, F.PackedState):
            cell = st.h[:, 0]
            if periodic:
                new = (
                    cell
                    + jnp.where(cell < 0.0, float(n_loc), 0.0)
                    - jnp.where(cell >= n_loc, float(n_loc), 0.0)
                )
                return (
                    type(st)(
                        h=st.h.at[:, 0].set(new), aux=st.aux,
                        weight=st.weight, tau=st.tau,
                    ),
                    zero,
                )
            out = (cell < geom.interior_start) | (cell >= geom.interior_end)
            return (
                type(st)(
                    h=st.h, aux=st.aux,
                    weight=jnp.where(out, 0.0, st.weight), tau=st.tau,
                ),
                zero,
            )
        if periodic:
            cell = (
                st.cell
                + jnp.where(st.cell < 0, n_loc, 0)
                - jnp.where(st.cell >= n_loc, n_loc, 0)
            ).astype(st.cell.dtype)
            return dataclasses.replace(st, cell=cell), zero
        out = st.alive & (
            (st.cell < geom.interior_start) | (st.cell >= geom.interior_end)
        )
        return (
            dataclasses.replace(
                st,
                alive=st.alive & ~out,
                weight=jnp.where(out, 0.0, st.weight),
                ux=jnp.where(out, 0.0, st.ux),
                uy=jnp.where(out, 0.0, st.uy),
                uz=jnp.where(out, 0.0, st.uz),
                cell=jnp.where(out, 0, st.cell).astype(st.cell.dtype),
            ),
            zero,
        )

    def _cadences(self, species):
        """Trace-time (M, R): migration-exchange and maintenance-sort
        cadences in steps.  Both are STATIC — the run schedule nests
        scans around them instead of wrapping per-step ``lax.cond``s
        (each cond forced the whole particle state through conditional
        buffers: measured 12.7 ms/step of pure copy overhead at 8.4M
        particles on v5e, more than the kernel itself)."""
        opt = self.options
        drift = float(opt.max_drift_cells_per_step)
        if drift < 0.5:
            # slow-drift deck (two-stream class): the binding
            # constraint is excursion ceil(drift * M) <= HALO - 2
            # cells (deposit/gather reach), NOT a step count — the
            # exchange can defer all the way to the sort cadence
            # (each exchange at M=3 cost ~1.17 ms/step of the 7.4 ms
            # bench step on v5e, r4 ladder)
            m_cap = int((HALO - 2) / max(drift, 1e-9))
        else:
            m_cap = HALO - 1
        M = max(1, min(opt.migration_every, m_cap))
        if opt.current_deposition and any(
            self.specs[n].charge != 0.0
            and not self._fused_applicable(n, species[n])
            for n in self.specs
        ):
            # the unfused deposit's -2 tap wraps the slab for particles
            # 3+ cells out of domain (fused deposition has PAD rows of
            # margin); with the exchange at migration-block end the
            # deposit can see M cells of drift, so M <= HALO - 3
            M = min(M, max(1, int((HALO - 3) / max(drift, 1e-9)))
                    if drift < 0.5 else HALO - 3)
        # QED no longer forces M = 1: absorption pairs over the
        # halo-extended cell range [-HALO, n_loc + HALO)
        # (interactions.absorb), so out-of-domain particles keep
        # interacting with their co-located partners between exchanges
        R = max(1, opt.fused_resort_every)
        return M, R

    def _mig_fns(self):
        """(fused-species, other-species) migration functions.  Fused
        species stay cell-sorted, so they take the O(window) edge
        exchange; everything else uses the full-state variants."""
        from .ops import fused as F
        from .parallel.migrate import (
            migrate_compact, migrate_edges, migrate_edges_packed,
        )

        opt = self.options

        if opt.replicate_fields:
            wk = lambda st, geom, axis_name, ai, cap: self._wrap_kill(st)
            return wk, wk

        def mig_fused(st, geom, axis_name, ai, cap):
            if isinstance(st, F.PackedState):
                return migrate_edges_packed(
                    st, geom, axis_name, ai, cap, opt.migration_window
                )
            return migrate_edges(
                st, geom, axis_name, ai, cap, opt.migration_window
            )

        mig_plain = (
            migrate_compact
            if opt.migration_method == "compact" else migrate
        )
        if self.geom.n_devices == 1 and not opt.sorted_pipeline:
            # single-device domain mode: the exchange is a self-send
            # (reference mod.rs:311-315).  Species with no sorted-layout
            # contract (photons; non-fused fallbacks) then need no slot
            # movement at all — boundary crossings wrap in place
            # (periodic) or kill at the global edge, identical to what
            # a send-to-self + reinsert produces.  The full
            # migrate_compact machinery (12-operand payload sort at
            # buffer length) was ~2/3 of the emission-only QED step at
            # a 2.6M photon buffer on v5e (BASELINE.md r2g ladder).
            # sorted_pipeline keeps migrate_sorted: there the exchange
            # doubles as the layout-restoring sort.
            mig_plain = lambda st, geom, axis_name, ai, cap: (
                self._wrap_kill(st)
            )
        mig = migrate_sorted if opt.sorted_pipeline else mig_plain
        return mig_fused, mig

    def _sort_phase(self, carry, ai):
        """Maintenance sort of every fused species + fresh exact block
        anchors.  Runs once per sort period (statically scheduled)."""
        from .ops import fused as F
        from .parallel.migrate import sort_packed, sort_state

        geom = self.geom
        E, B, J, rho, species, t, counters, events, anchors_d = carry
        new_anchors = dict(anchors_d)
        for name in self.specs:
            if isinstance(species[name], F.PackedState):
                fspec = self._fused_spec(name)
                ps, cell_sorted = sort_packed(species[name], geom.n_loc)
                new_anchors[name] = F.block_anchors(fspec, cell_sorted)
                species = {**species, name: ps}
            elif self._fused_applicable(name, species[name]):
                fspec = self._fused_spec(name)
                st = sort_state(
                    species[name], geom.n_loc,
                    rowgather=self.options.sort_rowgather,
                )
                new_anchors[name] = F.block_anchors(fspec, st.cell)
                species = {**species, name: st}
        return (E, B, J, rho, species, t, counters, events, new_anchors)

    def _migrate_phase(self, carry, ai):
        """Exchange leavers of every species over the ring.  Runs at
        the end of each M-step migration block (statically scheduled;
        with M == 1 migration instead stays inline in the step, before
        the QED passes, matching the reference order)."""
        geom, opt = self.geom, self.options
        E, B, J, rho, species, t, counters, events, anchors_d = carry
        mig_fused, mig = self._mig_fns()
        for name in self.specs:
            sp_mig = (
                mig_fused
                if self._fused_applicable(name, species[name]) else mig
            )
            st, ovf = sp_mig(
                species[name], geom, "x", ai, opt.migration_capacity
            )
            counters = {
                **counters, name: counter_add(counters[name], halo.psum(ovf, "x"))
            }
            species = {**species, name: st}
        return (E, B, J, rho, species, t, counters, events, anchors_d)

    def _device_step(self, carry, key, ai, inline_sort, inline_migrate):
        from .ops import fused as F
        from .parallel.migrate import sort_packed, sort_state

        geom, opt = self.geom, self.options
        E, B, _J_prev, _rho_prev, species, t, counters, events, anchors_d = (
            carry
        )

        if opt.replicate_fields:
            # replicated fields: every device holds the whole grid;
            # the 'exchange' is a local wrap and the boundary/geometry
            # index is always 0 (single global domain)
            fi = jnp.zeros((), jnp.int32)
            E_slab, B_slab = halo.exchange_fields_local(E, B, geom)
        else:
            fi = ai
            E_slab, B_slab = halo.exchange_fields(E, B, geom, "x", ai)

        # 1-2: push (+ inline migrate when M == 1), species by species
        # (reference order: electrons, ions, photons — main.rs:240-244)
        mig_fused, mig = self._mig_fns()
        fused_dep = {}
        new_anchors = dict(anchors_d)
        for name in self.specs:
            if isinstance(species[name], F.PackedState):
                fspec = self._fused_spec(name)
                ps0 = species[name]
                if inline_sort:
                    ps0, cell_sorted = sort_packed(ps0, geom.n_loc)
                    anch = F.block_anchors(fspec, cell_sorted)
                else:
                    anch = anchors_d[name]
                st, J_add, rho_add, movf, anch_next = (
                    self._packed_push_deposit(
                        name, ps0, E_slab, B_slab, anch
                    )
                )
                new_anchors[name] = anch_next
                fused_dep[name] = (J_add, rho_add)
                counters = {
                    **counters, name: counter_add(counters[name], halo.psum(movf, "x"))
                }
                sp_mig = mig_fused
            elif self._fused_applicable(name, species[name]):
                fspec = self._fused_spec(name)
                st0 = species[name]
                if inline_sort:
                    # R == 1: re-sort every step
                    st0 = sort_state(
                        st0, geom.n_loc, rowgather=opt.sort_rowgather
                    )
                    anch = F.block_anchors(fspec, st0.cell)
                else:
                    # between the statically scheduled sort phases the
                    # kernel's own per-block fit-row minimum from the
                    # PREVIOUS step is exact (cells move <= 1
                    # cell/step and the kernel subtracts the slack)
                    anch = anchors_d[name]
                st, J_add, rho_add, movf, anch_next = (
                    self._fused_push_deposit(
                        name, st0, E_slab, B_slab, anch
                    )
                )
                new_anchors[name] = anch_next
                fused_dep[name] = (J_add, rho_add)
                counters = {
                    **counters, name: counter_add(counters[name], halo.psum(movf, "x"))
                }
                sp_mig = mig_fused
            else:
                st = self._push_species(
                    name, species[name], E_slab, B_slab, t
                )
                sp_mig = mig
            if opt.migration and inline_migrate:
                st, ovf = sp_mig(
                    st, geom, "x", ai, opt.migration_capacity
                )
                counters = {
                    **counters, name: counter_add(counters[name], halo.psum(ovf, "x"))
                }
            species = {**species, name: st}

        # 3-4: QED interactions.  The fused ABSORPTION path pairs over
        # the nearly-sorted state via monotone-envelope brackets
        # (absorption_bracketed, default) — no per-step sort; with
        # absorption_bracketed=0 it instead re-sorts the electron
        # species right after migration (one sort serving both the
        # pairing and the next step's kernel anchors).
        # Emission-only decks (colliding_beams physics) skip it:
        # emission samples per-electron with no pairing and only
        # changes momentum (recoil), never cell order, so anchors stay
        # maintained by the regular resort cadence exactly as on
        # non-QED decks — a full per-step payload sort (~36 ms at 2.1M
        # on v5e) for nothing.
        e_presorted = False
        e_bracketed = False
        if (
            opt.photon_absorption
            and "electron" in self.specs
            and self._fused_applicable("electron", species["electron"])
        ):
            if opt.absorption_bracketed:
                # no per-step sort: the pairing brackets the nearly-
                # sorted state (interactions.absorb bracketed mode);
                # kernel amins keep the anchors exact
                e_bracketed = True
            else:
                st_e = sort_state(
                    species["electron"], geom.n_loc, keep_chi=True,
                    rowgather=opt.sort_rowgather,
                )
                species = {**species, "electron": st_e}
                new_anchors["electron"] = F.block_anchors(
                    self._fused_spec("electron"), st_e.cell
                )
                e_presorted = True
        if opt.photon_absorption:
            from .interactions import absorb

            key, sub = jax.random.split(key)
            res = absorb(
                self, species, t, jax.random.fold_in(sub, ai),
                axis_index=ai, presorted=e_presorted,
                bracketed=e_bracketed,
                replicated=opt.replicate_fields,
            )
            if self._event_log:
                species, ovf, dfr, (rec, want) = res
                ring, count = events
                cap = ring.shape[0]
                # `count` is the TOTAL events seen (may exceed cap);
                # only min(count, cap) rows are stored.  The writer
                # surfaces the difference as a counted overflow — drops
                # are never silent (the reference dumps every event,
                # interactions.rs:267-289).
                rank = jnp.cumsum(want) - 1 + jnp.minimum(count, cap)
                dest = jnp.where(want & (rank < cap), rank, cap)
                ring = ring.at[dest].set(rec, mode="drop")
                count = count + jnp.sum(want)
                events = (ring, count)
            else:
                species, ovf, dfr = res
            counters = {
                **counters,
                "photon": counter_add(counters["photon"], halo.psum(ovf, "x")),
                "qed_deferred": counter_add(
                    counters["qed_deferred"], halo.psum(dfr, "x")
                ),
            }
        if opt.photon_emission:
            from .interactions import emit_radiation

            key, sub = jax.random.split(key)
            species, ovf, dfr = emit_radiation(
                self, species, t, jax.random.fold_in(sub, ai)
            )
            counters = {
                **counters,
                "photon": counter_add(counters["photon"], halo.psum(ovf, "x")),
                "qed_deferred": counter_add(
                    counters["qed_deferred"], halo.psum(dfr, "x")
                ),
            }

        # 5: deposition
        n_slab = geom.n_loc + 2 * HALO
        J_slab = jnp.zeros((n_slab, 3), E.dtype)
        rho_slab = jnp.zeros((n_slab,), E.dtype)
        if opt.current_deposition:
            for name, (J_add, rho_add) in fused_dep.items():
                J_slab = J_slab + J_add.astype(E.dtype)
                rho_slab = rho_slab + rho_add.astype(E.dtype)
            # the sorted pipeline leaves each species cell-sorted after
            # migration (dead rows hold in-range placeholder cells), so
            # the deposition payload sort is skipped entirely
            presorted = (
                opt.sorted_pipeline
                and opt.migration
                and opt.deposit_method == "sorted"
                # skipped exchanges leave cells +-1 unsorted
                and inline_migrate
            )
            for name, spec in self.specs.items():
                if spec.charge == 0.0 or name in fused_dep:
                    continue
                st = species[name]
                macrocharge = jnp.where(st.alive, st.weight * spec.charge, 0.0)
                if opt.deposit_method == "sorted":
                    J_slab, rho_slab = deposit_sorted(
                        J_slab, rho_slab, st.cell + HALO, st.x, st.prev_x,
                        macrocharge, self._velocity(spec, st), geom.dx,
                        opt.dt, presorted=presorted,
                    )
                else:
                    J_slab, rho_slab = deposit(
                        J_slab, rho_slab, st.cell + HALO, st.x, st.prev_x,
                        macrocharge, self._velocity(spec, st), geom.dx,
                        opt.dt,
                    )
        # 6: synchronize + boundary load
        if opt.replicate_fields:
            # combine the per-device particle shards' deposits
            J, rho = halo.fold_currents_local(J_slab, rho_slab, geom)
            J = halo.psum(J, "x")
            rho = halo.psum(rho, "x")
        else:
            J, rho = halo.fold_currents(J_slab, rho_slab, geom, "x", ai)
        E_own, B_own = apply_boundaries(
            E_slab[HALO:-HALO], B_slab[HALO:-HALO], geom, fi, t, opt.dt,
            self.laser_y, self.laser_z,
        )
        E_slab = E_slab.at[HALO:-HALO].set(E_own)
        B_slab = B_slab.at[HALO:-HALO].set(B_own)
        J_slab = jnp.pad(J, ((HALO, HALO), (0, 0)))

        # 7: field advance
        E_slab, B_slab = maxwell.advance(
            E_slab, B_slab, J_slab, opt.dt, geom.dx, sm_mask(geom, fi)
        )
        E = E_slab[HALO:-HALO]
        B = B_slab[HALO:-HALO]

        return (
            E, B, J, rho, species, t + opt.dt, counters, events,
            new_anchors,
        ), None

    def _init_fused_aux(self, species):
        """Scan-carried per-species block window bases.  Bases start as
        placeholders — the statically scheduled sort phase recomputes
        them before the first fused step of every run."""
        from .ops import fused as F

        anchors = {}
        for name in self.specs:
            st = species[name]
            if isinstance(st, F.PackedState):
                anchors[name] = jnp.full((st.h.shape[0],), 2, jnp.int32)
            elif self._fused_applicable(name, st):
                nblk = st.x.shape[0] // self.options.fused_block
                anchors[name] = jnp.full((nblk,), 2, jnp.int32)
        return anchors

    def _build_run(self):
        log = self._event_log

        def device_fn(E, B, J, rho, species, t0, key, counters, events, nsteps):
            from .ops import fused as F

            ai = lax.axis_index("x")
            opt = self.options
            M, R = self._cadences(species)
            any_fused = any(
                self._fused_applicable(n, species[n]) for n in self.specs
            )
            # packed fast path: carry fused species through the scan as
            # the packed hot/aux layout (one pack + unpack per run call)
            templates = {}
            for n in self.specs:
                if self._packed_applicable(n, species[n]):
                    templates[n] = species[n]
                    species = {
                        **species,
                        n: F.pack_fused(species[n], opt.fused_block),
                    }
            # static schedule (see _cadences): per-step conds replaced
            # by nested scans.  inline_migrate keeps the exchange
            # inside the step (before the QED passes) when it must run
            # every step; otherwise a migrate phase closes each M-step
            # block.  The maintenance sort opens each R-step period.
            inline_migrate = not opt.migration or M == 1
            inline_sort = any_fused and R == 1
            sort_phase = any_fused and R > 1

            def step(carry, step_key):
                return self._device_step(
                    carry, step_key, ai, inline_sort, inline_migrate
                )

            def scan1(body, carry, xs):
                # lax.scan over a length-1 leading axis is staged as
                # eval_jaxpr -> a ``closed_call`` whose operands
                # XLA:TPU allocates on the VMEM *stack*: with the whole
                # particle state among the operands that is 13 x 42 MB
                # at 8.39M rows and the program cannot compile at all
                # (the r4 qed-8m RESOURCE_EXHAUSTED — every
                # small-steps-per-program QED bench tripped it).
                # Inline the single iteration instead.
                if xs.shape[0] == 1:
                    carry, _ = body(carry, xs[0])
                    return carry
                carry, _ = lax.scan(body, carry, xs)
                return carry

            def run_steps(carry, keys):
                # keys: (k, ...) -> k steps (k static)
                if keys.shape[0] == 0:
                    return carry
                return scan1(step, carry, keys)

            def run_block(carry, keys):
                # one migration block: M steps then the exchange
                carry = run_steps(carry, keys)
                if not inline_migrate:
                    carry = self._migrate_phase(carry, ai)
                return carry

            def run_blocks(carry, keys):
                # keys: (nb * Mb,) -> nb blocks + a partial tail block
                Mb = 1 if inline_migrate else M
                nb = keys.shape[0] // Mb
                if nb and inline_migrate:
                    carry = run_steps(carry, keys[: nb * Mb])
                elif nb:
                    body = lambda c, k: (run_block(c, k), None)
                    carry = scan1(
                        body, carry, keys[: nb * Mb].reshape(nb, Mb)
                    )
                if keys.shape[0] % Mb:
                    carry = run_block(carry, keys[nb * Mb:])
                return carry

            keys = jax.random.split(key, nsteps)
            anchors = self._init_fused_aux(species)
            carry = (E, B, J, rho, species, t0, counters, events, anchors)
            if not sort_phase:
                carry = run_blocks(carry, keys)
            else:
                Mb = 1 if inline_migrate else M
                R_eff = max(Mb, (R // Mb) * Mb)
                n_per = nsteps // R_eff

                def period(carry, pkeys):
                    carry = self._sort_phase(carry, ai)
                    return run_blocks(carry, pkeys), None

                if n_per:
                    carry = scan1(
                        period, carry,
                        keys[: n_per * R_eff].reshape(n_per, R_eff),
                    )
                if nsteps % R_eff:
                    carry = self._sort_phase(carry, ai)
                    carry = run_blocks(carry, keys[n_per * R_eff:])
            carry = carry[:-1]  # drop the internal anchors leg
            if templates:
                E_, B_, J_, rho_, sp_out, *tail = carry
                sp_out = {
                    **sp_out,
                    **{
                        n: F.unpack_fused(sp_out[n], templates[n])
                        for n in templates
                    },
                }
                carry = (E_, B_, J_, rho_, sp_out, *tail)
            if not log:
                carry = carry[:-1]  # drop the unused events leg
            return carry

        def run(E, B, J, rho, species, t0, key, counters, *rest, nsteps):
            events = rest[0] if log else self.zero_events()
            sp_specs = self._pspec(species)
            ev_spec = (P("x", None), P("x"))
            out_tail = (ev_spec,) if log else ()
            if self.options.replicate_fields:
                f3, f1 = P(None, None), P(None)
            else:
                f3, f1 = P("x", None), P("x")
            return jax.shard_map(
                partial(device_fn, nsteps=nsteps),
                mesh=self.mesh,
                check_vma=False,
                in_specs=(
                    f3, f3, f3, f1,
                    sp_specs, P(), P(), P(), ev_spec,
                ),
                out_specs=(
                    f3, f3, f3, f1,
                    sp_specs, P(), P(),
                ) + out_tail,
            )(E, B, J, rho, species, t0, key, counters, events)

        return run

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def init_fields(self):
        return zero_fields(
            self.geom, self.mesh, self.field_dtype,
            replicated=self.options.replicate_fields,
        )

    def initialize_fields(self, E, B, J, rho, species):
        """Electrostatic/magnetostatic field setup from the initial
        particle distribution (reference ``main.rs:174-183`` +
        ``yee.rs:644-747``): deposit charge/current, fold halos, then
        solve the Gauss/Ampère prefix sweep.  Returns (E, B, J, rho)."""
        from .fields import electrostatic_init

        geom, opt = self.geom, self.options

        def device_fn(E, B, species):
            ai = lax.axis_index("x")
            n_slab = geom.n_loc + 2 * HALO
            J_slab = jnp.zeros((n_slab, 3), E.dtype)
            rho_slab = jnp.zeros((n_slab,), E.dtype)
            for name, spec in self.specs.items():
                if spec.charge == 0.0:
                    continue
                st = species[name]
                macrocharge = jnp.where(st.alive, st.weight * spec.charge, 0.0)
                J_slab, rho_slab = deposit(
                    J_slab, rho_slab, st.cell + HALO, st.x, st.prev_x,
                    macrocharge, self._velocity(spec, st), geom.dx, opt.dt,
                )
            if opt.replicate_fields:
                J, rho = halo.fold_currents_local(J_slab, rho_slab, geom)
                J = halo.psum(J, "x")
                rho = halo.psum(rho, "x")
                # J/rho are now global on every device: no further
                # collectives (an axis here would double-count the
                # sheet-field totals by the mesh size)
                E, B = electrostatic_init(
                    E, B, J, rho, geom, None, jnp.zeros((), jnp.int32)
                )
            else:
                J, rho = halo.fold_currents(J_slab, rho_slab, geom, "x", ai)
                E, B = electrostatic_init(E, B, J, rho, geom, "x", ai)
            return E, B, J, rho

        sp_specs = self._pspec(species)
        if opt.replicate_fields:
            f3, f1 = P(None, None), P(None)
        else:
            f3, f1 = P("x", None), P("x")
        return jax.jit(
            jax.shard_map(
                device_fn,
                mesh=self.mesh,
                check_vma=False,
                in_specs=(f3, f3, sp_specs),
                out_specs=(f3, f3, f3, f1),
            )
        )(E, B, species)

    def zero_counters(self):
        # committed with the replicated sharding the step returns, so a
        # second run() call with carried-over counters hits the same
        # executable (uncommitted inputs would change the input avals
        # and force a ~20s recompile through the remote-compile path)
        rep = NamedSharding(self.mesh, P())
        names = list(self.specs)
        if self.options.photon_emission or self.options.photon_absorption:
            # QED work pushed to a later step by the active-set
            # compactions / candidate bound — a delay, not a loss;
            # reported separately from the overflow losses
            names.append("qed_deferred")
        # (2,) int32 [hi, lo] base-2**30 pairs — see counter_add: an
        # int32 scalar can wrap within one bench run and int64 needs
        # jax_enable_x64 (VERDICT r2 weak #2)
        return {
            name: jax.device_put(jnp.zeros((2,), jnp.int32), rep)
            for name in names
        }

    def zero_events(self):
        """Empty per-device event-record ring: (ring, per-device count).
        Zero-capacity when event logging is off (zero cost to thread)."""
        cap = self.options.event_log_capacity if self._event_log else 0
        itype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
        n = self.mesh.shape["x"]  # mesh size (geom.n_devices is 1 in
        # replicated-field mode; the ring is per mesh device)
        ring = jax.device_put(
            jnp.zeros((n * cap, 14), self.dtype),
            NamedSharding(self.mesh, P("x", None)),
        )
        count = jax.device_put(
            jnp.zeros((n,), itype), NamedSharding(self.mesh, P("x"))
        )
        return ring, count

    def run(self, E, B, J, rho, species, t0, key, counters, nsteps: int,
            events=None, donate=False):
        """Advance ``nsteps`` steps; returns (E, B, J, rho, species, t,
        counters[, events]) with J/rho from the final step (for output
        parity).  ``events`` (and the extra return leg) exist only when
        an extra-output feature flag is enabled.

        With ``donate=True`` the state arguments (fields, species,
        counters, events) are DONATED: the caller must not touch the
        passed-in arrays afterwards (rebind them to the returned ones).
        Long-running drivers (bench, CLI spans) use this — it lets XLA
        alias inputs onto outputs and halves the state footprint, the
        difference between fitting 1e8 macroparticles on a 16 GB chip
        or not."""
        rest = ()
        if self._event_log:
            rest = (events if events is not None else self.zero_events(),)
        # t rides the scan carry in the FIELD dtype: under the default
        # mixed precision (f32 particles, f64 fields) an f32 t would
        # accumulate per-step rounding and skew the laser phase
        # laser_y(t, x) late in long runs
        t0 = jax.device_put(
            jnp.asarray(t0, self.field_dtype), NamedSharding(self.mesh, P())
        )
        runner = self._run
        if donate:
            if self._run_donated is None:
                dn = (0, 1, 2, 3, 4, 7) + ((8,) if self._event_log else ())
                self._run_donated = jax.jit(
                    self._build_run(), static_argnames=("nsteps",),
                    donate_argnums=dn,
                )
            runner = self._run_donated
        return runner(
            E, B, J, rho, species, t0, key, counters, *rest, nsteps=nsteps,
        )

    def em_field_energy(self, E, B) -> float:
        if self.options.replicate_fields:
            # every device holds the whole (identical) grid
            return float(
                em_field_energy_local(
                    jnp.asarray(E), jnp.asarray(B), self.geom, 0
                )
            )

        def device_fn(E, B):
            ai = lax.axis_index("x")
            return halo.psum(em_field_energy_local(E, B, self.geom, ai), "x")

        return float(
            jax.shard_map(
                device_fn, mesh=self.mesh,
                in_specs=(P("x", None), P("x", None)), out_specs=P(),
            )(E, B)
        )

    def total_kinetic_energy(self, name: str, state: ParticleState) -> float:
        """Global kinetic energy of a species in joules
        (``mod.rs:227-240``).  The reduction runs in the field dtype
        (f64 under mixed precision): an f32 sum over 1e6+ terms adds
        ~1e-7-level noise to a ledger targeting 1e-5 closure."""
        ke = kinetic_energy_weights(self.specs[name], state)
        if ke.dtype != self.field_dtype:
            ke = ke.astype(self.field_dtype)
        return float(jnp.sum(ke))

    @property
    def electron_chi_is_lazy(self) -> bool:
        """True when the stepping path may leave electron chi stale:
        the lite fused kernel (non-QED decks) skips the per-step chi
        diagnostic; callers refresh it before outputs/checkpoints."""
        return (
            self.options.fused_pusher
            and self.options.fused_lite != 0
            and not (
                self.options.photon_emission
                or self.options.photon_absorption
            )
        )

    def refresh_electron_chi(self, E, B, st: ParticleState) -> ParticleState:
        """Recompute electron chi from the current momenta and fields.

        The lite fused kernel (FusedSpec.lite — non-QED decks) skips
        the per-step chi output: chi is then a pure diagnostic
        (histogram axis), so the CLI refreshes it once per output
        instead of once per step.  The refreshed value is the
        instantaneous invariant at the full step — equal to the
        reference's stored half-step value to O(dt)."""
        from .ops.pusher import electron_chi

        geom, opt = self.geom, self.options

        def device_fn(E, B, cell, x, ux, uy, uz, gamma):
            if opt.replicate_fields:
                E_slab, B_slab = halo.exchange_fields_local(E, B, geom)
            else:
                ai = lax.axis_index("x")
                E_slab, B_slab = halo.exchange_fields(E, B, geom, "x", ai)
            Ep, Bp = fields_at(E_slab, B_slab, cell + HALO, x)
            return electron_chi(
                ux, uy, uz, gamma, Ep.astype(x.dtype), Bp.astype(x.dtype)
            )

        f3 = P(None, None) if opt.replicate_fields else P("x", None)
        chi = jax.jit(
            jax.shard_map(
                device_fn, mesh=self.mesh, check_vma=False,
                in_specs=(f3, f3) + (P("x"),) * 6,
                out_specs=P("x"),
            )
        )(E, B, st.cell, st.x, st.ux, st.uy, st.uz, st.gamma)
        return dataclasses.replace(st, chi=chi)

    def refresh_photon_chi(self, E, B, st: ParticleState) -> ParticleState:
        """Recompute photon chi from the current positions and fields.

        With ``photon_absorption`` off the step skips the per-step
        photon field gather (see ``_push_species``) because chi is an
        instantaneous diagnostic there (``photon.rs:165-176``) — the
        CLI calls this before outputs/checkpoints so ``chi`` histogram
        specs and saved state stay fresh.  No-op-cheap: one gather per
        output block instead of one per step."""
        geom, opt = self.geom, self.options

        def device_fn(E, B, cell, x, u):
            if opt.replicate_fields:
                E_slab, B_slab = halo.exchange_fields_local(E, B, geom)
            else:
                ai = lax.axis_index("x")
                E_slab, B_slab = halo.exchange_fields(E, B, geom, "x", ai)
            Ep, Bp = fields_at(E_slab, B_slab, cell + HALO, x)
            return photon_chi(u, Ep.astype(x.dtype), Bp.astype(x.dtype))

        f3 = P(None, None) if opt.replicate_fields else P("x", None)
        chi = jax.jit(
            jax.shard_map(
                device_fn, mesh=self.mesh, check_vma=False,
                in_specs=(f3, f3, P("x"), P("x"), P("x", None)),
                out_specs=P("x"),
            )
        )(E, B, st.cell, st.x, st.u)
        return dataclasses.replace(st, chi=chi)
