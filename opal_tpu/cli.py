"""Command-line driver: ``python -m opal_tpu input.yaml``.

Reproduces the reference's program lifecycle (``src/main.rs:48-286``):
read the YAML configuration, build the grid and particle populations,
then alternate output dumps with blocks of simulation steps, printing
runtime/ETA progress lines.  Output files land next to the input file,
as in the reference.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

from . import constants as const
from .config import Config, ConfigError
from .diagnostics import output as out
from .diagnostics.progress import ettc, pretty_duration, simulation_time
from .grid import GridGeometry, balanced_counts, load_imbalance
from .species import SpeciesSpec, initialize, shard_even


def _required_capacity(geom: GridGeometry, npc: int, density) -> int:
    """Worst-case per-device particle count for an initial sampling."""
    if npc <= 0:
        return 8
    cells = np.arange(geom.nx)
    x_centre = geom.xmin + (cells + 0.5) * geom.dx
    ne = np.broadcast_to(
        np.asarray(density(x_centre), dtype=np.float64), x_centre.shape
    )
    active = ne * geom.dx > 0.0
    g = cells[active] + geom.left_pad
    dev = g // geom.n_loc
    counts = np.bincount(dev, minlength=geom.n_devices)
    return int(counts.max()) * npc


def _round_up(n: int, m: int = 8) -> int:
    return max(m, ((n + m - 1) // m) * m)


def fused_auto_sizing(span_gap: int, w_max: int, resort: int,
                      v_spread: float, r_pinned: bool = False):
    """Fused window/cadence auto-sizing, shared by :func:`build` and
    the physics-oracle tests (so the oracles exercise the SHIPPED
    formula, not hand-picked windows).

    The kernel fits rel in [1, W-3] with a min-1 per-step re-anchor,
    so a block spanning ``gap`` cells sustains while gap <= W - 4; the
    window must cover the sorted span + ``resort`` steps of velocity-
    spread dispersion (populations separate at v_spread * 0.95
    cells/step) + slack 2.  When the window would exceed the device's
    field table (``w_max``), the sort cadence shrinks until it fits
    (unless the user pinned it).  Returns ``(window, resort)``."""
    dcells = lambda r: int(np.ceil(0.95 * v_spread * r))
    if not r_pinned:
        # shrink the sort cadence while (a) the window would not fit
        # the device field table, or (b) the dispersion term dominates
        # the window (> 2x the span+stencil part): the kernel's gather
        # cost is ~22*W VPU ops per particle, so for fast decks
        # sorting more often is cheaper than a dispersion-wide window
        while resort > 8 and (
            _round_up(span_gap + 6 + dcells(resort), 8) > w_max
            or dcells(resort) > 2 * (span_gap + 6)
        ):
            resort //= 2
    auto_w = _round_up(span_gap + 6 + dcells(resort), 8)
    return max(8, min(512, auto_w, w_max)), resort


def build(path: Path, n_devices: int | None = None, dtype=None,
          field_dtype=None):
    """Parse an input file and construct the Simulation plus initial
    state.  Returns (sim, state-dict, run-parameters)."""
    import jax
    import jax.numpy as jnp

    from .sim import SimOptions, Simulation

    input_cfg = Config.from_file(path)
    input_cfg.with_context("constants")

    nx = input_cfg.read_usize("control", "nx")
    xmin = input_cfg.read_f64("control", "xmin")
    dx = input_cfg.read_f64("control", "dx")
    dt = 0.95 * dx / const.SPEED_OF_LIGHT
    tstart = input_cfg.read_f64("control", "start")
    tend = input_cfg.read_f64("control", "end")
    current_deposition = input_cfg.read_bool("control", "current_deposition")
    n_outputs = input_cfg.read_usize("control", "n_outputs")
    try:
        balance = input_cfg.read_bool("control", "balance")
    except ConfigError:
        balance = True  # balance by default (main.rs:76)
    try:
        # electrostatic field setup (yee.rs:644-747; the reference
        # gates this off at main.rs:174 — opt-in here)
        initialise_fields = input_cfg.read_bool("control", "initialise_fields")
    except ConfigError:
        initialise_fields = False
    try:
        # checkpoint/resume is an opal_tpu extension: the reference has
        # no checkpointing of any kind (main.rs:185, SURVEY §5)
        checkpoint_enabled = input_cfg.read_bool("control", "checkpoint")
    except ConfigError:
        checkpoint_enabled = False

    photon_emission = input_cfg.read_bool("qed", "photon_emission")
    photon_absorption = input_cfg.read_bool("qed", "photon_absorption")

    # The reference's compile-time cargo features (Cargo.toml:24-31)
    # become an optional `features` section of runtime booleans; each
    # combination traces its own specialized step (SURVEY C22).
    def feature(name):
        try:
            return input_cfg.read_bool("features", name)
        except ConfigError:
            return False

    radiation_reaction = not feature("no_radiation_reaction")
    beaming = not feature("no_beaming")
    stimulated_emission_on = not feature("no_stimulated_emission")
    immobile_photons = feature("immobile_photons")
    extra_absorption_output = feature("extra_absorption_output")
    extra_stimulated_output = feature("extra_stimulated_emission_output")
    # joules -> MeV (main.rs:81)
    _pe_min = input_cfg.read_opt_f64("qed", "photon_energy_min")
    photon_energy_min = (
        None if _pe_min is None else 1.0e-6 * _pe_min / const.ELEMENTARY_CHARGE
    )
    photon_angle_max = input_cfg.read_opt_f64("qed", "photon_angle_max")
    max_formation_length = input_cfg.read_opt_f64("qed", "max_formation_length")
    # NOTE: the reference passes disable_qed_after into absorb()'s
    # max_displacement (metres) parameter and disable_absorption_after
    # into stop_time (main.rs:84-85, 246-248); mapping preserved.
    max_displacement = input_cfg.read_opt_f64("qed", "disable_qed_after")
    stop_time = input_cfg.read_opt_f64("qed", "disable_absorption_after")

    # laser section present -> laser/absorbing boundaries (main.rs:95-101)
    if input_cfg.contains("laser"):
        laser_y = input_cfg.func2("laser", "Ey", ("t", "x"))
        laser_z = input_cfg.func2("laser", "Ez", ("t", "x"))
        left_bdy, right_bdy = "laser", "absorbing"
    else:
        laser_y = laser_z = None
        left_bdy, right_bdy = "periodic", "periodic"

    # optional TPU-runtime tuning (an opal_tpu extension section)
    def tpu_opt(field, default):
        try:
            return input_cfg.read_f64("tpu", field)
        except ConfigError:
            return default

    if n_devices is None:
        n_devices = int(tpu_opt("devices", 0)) or len(jax.devices())

    geom = GridGeometry(
        nx=nx, dx=dx, xmin=xmin, n_devices=n_devices,
        left_boundary=left_bdy, right_boundary=right_bdy,
    )

    # replicated-field mode (the TPU load-balancing answer to the
    # reference's balanced decomposition, grid/mod.rs:157-206): chosen
    # automatically for strongly nonuniform decks — every device holds
    # the whole grid and the particles split into equal-count chunks.
    # tpu: replicate_fields: 0/1 overrides the auto choice.
    _rep_opt = int(tpu_opt("replicate_fields", -1))
    if _rep_opt < 0:
        imb = 1.0
        if balance and n_devices > 1:
            try:
                _epc0 = input_cfg.read_usize("electrons", "npc")
                if _epc0 > 0:
                    imb = load_imbalance(
                        geom, input_cfg.func("electrons", "ne", "x")
                    )
            except ConfigError:
                pass
        # absorption decks replicate too (r4): pairing runs over an
        # all-gathered per-cell candidate table with owner-routed
        # kicks (interactions.absorb replicated mode), so the
        # reference's balanced-split behavior (grid/mod.rs:157-206)
        # has no carve-out anymore.  The table must fit its memory
        # guard after the gather — bounded by the same n_ext cap the
        # fused kernel's VMEM field table already imposes.
        replicate = (
            imb >= 1.5 and n_devices > 1
            # the whole field table must fit VMEM for the fused kernel
            and geom.n_ext <= 80_000
        )
        replicate_blocked_by_absorption = False
        if replicate and photon_absorption:
            # the gathered candidate table must fit its memory guard
            # (interactions.CAND_TABLE_MAX_BYTES); beyond that the deck
            # falls back to domain decomposition with the skew notice
            from .interactions import CAND_TABLE_MAX_BYTES
            from .grid import HALO as _H

            _K = int(tpu_opt("absorption_candidates", 256))
            _B = 32
            _kl = -(-max(1, -(-_K // n_devices)) // _B) * _B
            _bytes = (nx + 2 * _H) * _kl * 8 * n_devices * 4
            if _bytes > CAND_TABLE_MAX_BYTES:
                replicate = False
                replicate_blocked_by_absorption = True
    else:
        replicate = bool(_rep_opt) and n_devices > 1
        replicate_blocked_by_absorption = False
    mesh_devices = n_devices
    if replicate:
        geom = GridGeometry(
            nx=nx, dx=dx, xmin=xmin, n_devices=1,
            left_boundary=left_bdy, right_boundary=right_bdy,
        )

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if field_dtype is None:
        field_dtype = dtype
    capacity_factor = tpu_opt("capacity_factor", 1.5)
    migration_capacity = int(tpu_opt("migration_capacity", 16384))
    absorption_candidates = int(tpu_opt("absorption_candidates", 256))
    # QED active-set compactions: -1 = auto-size from the species
    # capacities (resolved once those are known below), 0 = off,
    # N = explicit rows per step
    absorption_active = int(tpu_opt("absorption_active_capacity", -1))
    emission_active = int(tpu_opt("emission_active_capacity", -1))
    emission_insert = int(tpu_opt("emission_insert_capacity", -1))
    absorption_events = int(tpu_opt("absorption_event_capacity", 4096))
    seed = int(tpu_opt("seed", 0))
    sorted_pipeline = bool(tpu_opt("sorted_pipeline", 0))
    # the fused Pallas pipeline is the default for f32 runs (it is the
    # measured-fastest path by ~6x and falls back to the unfused ops
    # per species when inapplicable); f64 runs use the unfused ops —
    # Mosaic has no f64 path
    fused_default = 1 if dtype == jnp.float32 else 0
    qed_on = photon_emission or photon_absorption
    # mixed-precision QED decks default to the UNFUSED pipeline with
    # f64-compute push: the fused kernel's f32 arithmetic carries a
    # field-phase-correlated energy bias (+1.6e-6 of the electron
    # energy per crossing) that kept the radiated-energy ledger above
    # the 1e-5 closure target (BASELINE.md r5).  QED decks are small
    # (reference examples: 4e5 macroparticles) and their step cost is
    # dominated by the emission/absorption machinery, so the unfused
    # push is cheap there; tpu: fused_pusher: 1 forces the kernel
    # back.
    if qed_on and field_dtype == jnp.float64 and dtype == jnp.float32:
        fused_default = 0
    fused_pusher = bool(tpu_opt("fused_pusher", fused_default))
    push_f64_compute = (
        not fused_pusher and qed_on
        and field_dtype == jnp.float64 and dtype == jnp.float32
    )
    block_explicit = int(tpu_opt("fused_block", -1))
    # 8192 at the narrowest window measured fastest on v5e for non-QED
    # steps (2026-08-20 r2h: 1.165e9 pushes/s/chip, +13.6% over
    # 4096 x W=16 — the old combo sweep's "8192 is 3% worse" was the
    # auto-window growth, not the block).  The QED kernel variant
    # carries more per-block VMEM temporaries and OOMs the 16 MB
    # scoped-vmem budget above 2048, so QED decks stay at 2048.
    qed_deck = photon_emission or photon_absorption
    fused_block = (
        block_explicit if block_explicit > 0 else (2048 if qed_deck else 8192)
    )
    _r_opt = int(tpu_opt("fused_resort_every", 0))
    r_pinned = _r_opt > 0
    fused_resort_every = _r_opt if r_pinned else 64
    migration_every = int(tpu_opt("migration_every", 0))  # 0 = auto
    # The shared fused window must fit EVERY fused species' block span:
    # size from the minimum npc across electrons/ions (an ion species
    # with fewer particles per cell spans more cells per block); the
    # edge-migration window instead scales with the maximum (rows per
    # cell at the boundary).
    npcs = []
    for _sec in ("electrons", "ions"):
        try:
            _v = int(input_cfg.read_usize(_sec, "npc"))
            if _v > 0:
                npcs.append(_v)
        except ConfigError:
            pass
    epc_for_w = max(1, min(npcs)) if npcs else 1
    npc_max = max(npcs) if npcs else 1
    if fused_pusher and block_explicit <= 0:
        # capacities must be block multiples; shrink the block (min
        # 128) rather than let the rounding inflate a small run's
        # buffers (and with them every sort/walk/migration pass)
        try:
            ne_est = input_cfg.func("electrons", "ne", "x")
            est = int(
                _required_capacity(geom, epc_for_w, ne_est)
                * capacity_factor
            )
            if replicate:
                # replicated mode shards particles evenly; capacities
                # are per mesh device
                est = -(-est // mesh_devices)
        except ConfigError:
            est = 0
        # Mosaic requires >= 8 sublane rows per kernel block: the
        # hardware floor is fused_block = 1024 (8 x 128 lanes); the
        # interpret-mode tests may go lower, but build() never does.
        while (
            est and fused_block > 1024
            and _round_up(est, fused_block) > est * 1.25
        ):
            fused_block //= 2
        # cap the block so a sorted block spans <= ~32 cells: at low
        # npc the span is blk/npc, and the window must cover it — the
        # r3 hole_boring capture at npc=25 ran blk=8192 blocks
        # spanning 328 cells, forcing a 300+-cell window (or, as
        # shipped, massive misfit losses).  Smaller blocks cost
        # per-program overhead, compensated by fused_subblocks below.
        while fused_block > 1024 and -(-fused_block // epc_for_w) > 32:
            fused_block //= 2
    # Window auto-sizing is DEFERRED until after species
    # initialization: the sustainable window is the block's sorted cell
    # span PLUS the velocity dispersion the block accumulates between
    # maintenance sorts, and the dispersion estimate needs the
    # initialized momenta (see the block after species init below).
    span_gap = -(-fused_block // epc_for_w)
    from .grid import HALO
    from .ops.fused import PAD
    # the window read must fit the per-device field table
    w_max = (geom.n_loc + 2 * HALO + 2 * PAD - 8) // 8 * 8

    np_dtype = np.float64 if dtype == jnp.float64 else np.float32
    # the electron work integral accumulates every step for the whole
    # run: keep it in the field dtype (f64 under mixed precision) so
    # long-run ledgers close below 1e-5 (see FusedSpec.work_inc)
    np_work_dtype = np.float64 if field_dtype == jnp.float64 else np_dtype

    # ---- species ------------------------------------------------------
    specs: dict[str, SpeciesSpec] = {}
    states = {}
    capacities = {}

    def _init_species(sp, npc_, dens, iux, iuy, iuz, seed_,
                      per_dev_cap=None):
        """Generate one species and shard it: domain mode directly at
        per-device capacity; replicated mode via a single-domain
        generation buffer + equal-count ``shard_even``.
        ``per_dev_cap`` fixes the per-device capacity (photons need
        emission headroom beyond the initial population); ``None``
        derives it from the population and ``capacity_factor``.
        Returns (state, per-device capacity)."""
        if replicate:
            host = initialize(
                sp, geom, npc_, dens, iux, iuy, iuz, dt,
                # single-domain generation capacity: all alive rows
                _round_up(int(_required_capacity(geom, npc_, dens))),
                seed=seed_, dtype=np_dtype, work_dtype=np_work_dtype,
            )
            cap = per_dev_cap
            if cap is None:
                n_alive = int(np.asarray(host.alive).sum())
                cap = _round_up(
                    int(-(-n_alive // mesh_devices) * capacity_factor)
                )
                if fused_pusher and cap >= fused_block:
                    cap = _round_up(cap, fused_block)
            return shard_even(host, mesh_devices, cap), cap
        cap = per_dev_cap
        if cap is None:
            cap = _round_up(
                int(_required_capacity(geom, npc_, dens) * capacity_factor)
            )
            if fused_pusher and cap >= fused_block:
                # fused kernel needs capacity % block == 0; smaller
                # species stay un-padded (the kernel is inapplicable
                # and the unfused ops serve them).  Big decks round to
                # 4 blocks so the block count has small divisors (a
                # prime count forces subblocks = 1).
                mult = fused_block * (4 if cap >= 64 * fused_block else 1)
                cap = _round_up(cap, mult)
        return (
            initialize(
                sp, geom, npc_, dens, iux, iuy, iuz, dt, cap, seed=seed_,
                dtype=np_dtype, work_dtype=np_work_dtype,
            ),
            cap,
        )

    epc = input_cfg.read_usize("electrons", "npc")
    eospec = input_cfg.read_strings("electrons", "output")
    especs = SpeciesSpec.electron(eospec)
    specs["electron"] = especs
    balance_info = None
    if epc > 0:
        ne = input_cfg.func("electrons", "ne", "x")
        if balance:
            # Reference's density-balanced split (grid/mod.rs:157-206).
            # On TPU the field shards stay uniform (SPMD shapes); the
            # balanced counts quantify the imbalance and the worst-slab
            # capacity already covers it (see grid.balanced_counts).
            counts = balanced_counts(nx, xmin, dx, n_devices, ne)
            balance_info = dict(
                counts=counts.tolist(),
                imbalance=load_imbalance(geom, ne),
            )
        ux = input_cfg.func3("electrons", "ux", ("x", "urand", "nrand"))
        uy = input_cfg.func3("electrons", "uy", ("x", "urand", "nrand"))
        uz = input_cfg.func3("electrons", "uz", ("x", "urand", "nrand"))
        states["electron"], capacities["electron"] = _init_species(
            especs, epc, ne, ux, uy, uz, seed,
        )
    else:
        cap = 8
        states["electron"] = initialize(
            especs, geom, 0, lambda x: x * 0, None, None, None, dt, cap,
            seed=seed, dtype=np_dtype, work_dtype=np_work_dtype,
        )
        capacities["electron"] = cap

    ipc = input_cfg.read_usize("ions", "npc")
    if ipc > 0:
        iname = input_cfg.read_string("ions", "name")
        z = input_cfg.read_f64("ions", "Z")
        a = input_cfg.read_f64("ions", "A")
        iospec = input_cfg.read_strings("ions", "output")
        ispecs = SpeciesSpec.ion(iname, z, a, iospec)
        ni = input_cfg.func("ions", "ni", "x")
        ux = input_cfg.func3("ions", "ux", ("x", "urand", "nrand"))
        uy = input_cfg.func3("ions", "uy", ("x", "urand", "nrand"))
        uz = input_cfg.func3("ions", "uz", ("x", "urand", "nrand"))
        specs["ion"] = ispecs
        states["ion"], capacities["ion"] = _init_species(
            ispecs, ipc, ni, ux, uy, uz, seed + 1,
        )

    if photon_emission or photon_absorption:
        ppc = input_cfg.read_usize("photons", "npc")
        pospec = input_cfg.read_strings("photons", "output")
        pspecs = SpeciesSpec.photon(pospec)
        specs["photon"] = pspecs
        pcap = int(tpu_opt("photon_capacity", 0))
        if pcap == 0:
            pcap = max(4096, 4 * capacities["electron"])
        pcap = _round_up(pcap)
        if ppc > 0:
            nph = input_cfg.func("photons", "nph", "x")
            ux = input_cfg.func3("photons", "ux", ("x", "urand", "nrand"))
            uy = input_cfg.func3("photons", "uy", ("x", "urand", "nrand"))
            uz = input_cfg.func3("photons", "uz", ("x", "urand", "nrand"))
            states["photon"], _ = _init_species(
                pspecs, ppc, nph, ux, uy, uz, seed + 2, per_dev_cap=pcap,
            )
        elif replicate:
            # empty per-device buffers for emission
            host = initialize(
                pspecs, geom, 0, lambda x: x * 0, None, None, None, dt, 8,
                seed=seed + 2, dtype=np_dtype,
            )
            states["photon"] = shard_even(host, mesh_devices, pcap)
        else:
            states["photon"] = initialize(
                pspecs, geom, 0, lambda x: x * 0, None, None, None, dt, pcap,
                seed=seed + 2, dtype=np_dtype,
            )
        capacities["photon"] = pcap

    # Resolve the auto-sized QED active-set compactions now that the
    # species capacities are known.  Emission drains FIFO by buffer
    # order (an emitter's tau resets on emission, so delayed rows reach
    # the front within a few steps); absorption rotates its scan origin
    # per step (interactions.absorb), so an undersized capacity degrades
    # to slower-than-physical depth decrements — overflow is counted and
    # surfaced like every other capacity, never silent.
    if emission_active < 0:
        # cap/32 (was cap/8): the emission machinery scales with EC
        # (r4f ladder: 2.3x end-to-end emission-only going 327k->64k at
        # 2.1M, zero deferral even at cap/64 on the bench beam deck).
        # Excess emitters defer one step (counted backlog), never lost.
        emission_active = (
            _round_up(max(4096, capacities["electron"] // 32))
            if photon_emission else 0
        )
    if absorption_active < 0:
        absorption_active = (
            _round_up(max(4096, capacities.get("photon", 0) // 4))
            if photon_absorption else 0
        )

    # ---- fused window / cadence sizing (needs the initial momenta) ---
    # Between maintenance sorts a block's cell span grows by the
    # VELOCITY SPREAD of its rows: counter-streaming populations
    # separate at (v_max - v_min) cells per c*dt (the kernel's
    # per-step re-anchor absorbs bulk drift but not spread).  The fit
    # test accepts rel in [1, W-3] and the re-anchor sits at min - 1,
    # so a block spanning ``gap`` cells sustains while gap <= W - 4;
    # the window must cover the sorted span + R steps of dispersion +
    # slack 2.  The spread estimate comes from the initialized momenta
    # of the fused (electron/ion) species; in-field acceleration past
    # it lands in the counted misfit fallback, never silently (round 2
    # shipped a zero-headroom formula with an off-by-one span estimate
    # and froze up to 31% of pushes per step — VERDICT r2 weak #1).
    # floor for cold decks: periodic deposition decks are the
    # instability class (two_stream) — saturation traps particles at
    # several times the initial drift, and the r5b full-duration
    # two_stream lost 15.1M pushes to misfit-capacity overflow when
    # the 0.05 floor under-covered the saturated spread.  0.1 costs
    # ~15% window on the reference deck and nothing on big-npc decks.
    v_spread = (
        0.1 if left_bdy == "periodic" and current_deposition else 0.05
    )
    for _nm, _st in states.items():
        if specs[_nm].kind not in ("electron", "ion"):
            continue
        _al = np.asarray(_st.alive)
        if _al.any():
            _vx = np.asarray(_st.ux)[_al] / np.asarray(_st.gamma)[_al]
            v_spread = max(v_spread, float(_vx.max() - _vx.min()))
    if left_bdy == "laser":
        # a laser deck heats its particles to v ~ c regardless of the
        # initial momenta (the r3 hole_boring capture lost 6M ion
        # updates to misfit-fallback overflow when the cold-start
        # estimate undersized the window): size for the CFL worst case
        # and let fused_auto_sizing trade sort cadence for window width
        v_spread = 1.9
    auto_w, fused_resort_every = fused_auto_sizing(
        span_gap, w_max, fused_resort_every, v_spread,
        r_pinned=r_pinned or not fused_pusher,
    )
    fused_window = int(tpu_opt("fused_window", auto_w))
    fused_window = max(8, min(fused_window, w_max))
    # deferred migration (r4): for slow decks the exchange cadence is
    # bounded by the 2-cell deposit/gather reach, ceil(drift*M) <= 2,
    # not by a step count.  Auto (migration_every = 0): defer up to the
    # sort cadence using 4x the initialized peak |vx| as the drift
    # bound (in-field acceleration past it is a counted loss, never
    # silent — instability trapping reaches ~2.5x the drift).  Laser
    # decks heat to ~c and keep the per-step exchange.
    max_drift = 0.95
    if migration_every == 0:
        v_peak = 0.05
        for _nm, _st in states.items():
            if specs[_nm].kind not in ("electron", "ion"):
                continue
            _al = np.asarray(_st.alive)
            if _al.any():
                _vx = np.abs(
                    np.asarray(_st.ux)[_al] / np.asarray(_st.gamma)[_al]
                )
                v_peak = max(v_peak, float(_vx.max()))
        if left_bdy != "laser" and fused_pusher:
            # 8x (was 4x): the r5b full-duration two_stream lost 15.1M
            # deposit taps — instability saturation drives leavers to
            # ~5.5x the initial drift, so at M = 1.8/(4 v0) the
            # fastest leavers overran the 2-cell deposit reach for the
            # tail of every exchange period.  8x covers saturation
            # with margin; the extra exchanges cost ~0.1 ms/step.
            max_drift = min(0.95, 8.0 * v_peak * 0.95)
            migration_every = max(
                1, min(fused_resort_every, int(1.8 / max_drift))
            )
        else:
            migration_every = 1
    # edge-exchange window: cover the leaver front, which marches
    # npc * v rows/step through the (row-static) sorted state between
    # maintenance sorts.  Sized for the CFL worst case (1 cell/step
    # over a resort period) at the largest npc.
    auto_mw = _round_up(npc_max * (fused_resort_every + 3), 8)
    migration_window = int(tpu_opt("migration_window", max(4096, auto_mw)))
    # misfit fallback: the exact-physics correctness net for rows
    # outside their block window (heating past the dispersion
    # estimate, fresh migration arrivals).  Scales with the particle
    # population (ADVICE r2: a fixed 1024 saturates on large decks);
    # laser decks get a larger floor (violent heating phases).
    # Overflow beyond it is counted, never silent.
    # periodic deposition decks are the instability class: saturation
    # scatters particles past any cold-start dispersion estimate, and
    # the r5c full-duration two_stream overflowed the //64 capacity by
    # ~700 rows/step at the saturation transition (282k counted
    # losses); //16 ran CLEAN (r5d bisect) at no measurable step cost
    # on small decks
    _mis_div = 16 if (
        left_bdy == "laser"
        or (left_bdy == "periodic" and current_deposition)
    ) else 64
    auto_misfit = _round_up(
        max(1024, sum(capacities.values()) // _mis_div)
    )
    fused_misfit_capacity = int(
        tpu_opt("fused_misfit_capacity", auto_misfit)
    )

    options = SimOptions(
        dt=dt,
        current_deposition=current_deposition,
        photon_emission=photon_emission,
        photon_absorption=photon_absorption,
        radiation_reaction=radiation_reaction,
        beaming=beaming,
        stimulated_emission=stimulated_emission_on,
        immobile_photons=immobile_photons,
        extra_absorption_output=extra_absorption_output,
        extra_stimulated_emission_output=extra_stimulated_output,
        photon_energy_min=photon_energy_min,
        photon_angle_max=photon_angle_max,
        max_formation_length=max_formation_length,
        max_displacement=max_displacement,
        absorption_stop_time=stop_time,
        migration_capacity=migration_capacity,
        absorption_candidates=absorption_candidates,
        absorption_active_capacity=absorption_active,
        emission_active_capacity=emission_active,
        push_f64_compute=push_f64_compute,
        emission_insert_capacity=emission_insert,
        absorption_event_capacity=absorption_events,
        seed=seed,
        # NOTE: no coupling to fused_pusher — the fused path manages
        # its own sorting (maintenance sorts + edge migration) and the
        # sorted_pipeline option only changes NON-fused species, where
        # it is measured slower
        sorted_pipeline=sorted_pipeline,
        fused_pusher=fused_pusher,
        # packed layout measured ~6% slower than the column kernel on
        # v5e (2026-08-19 sweep) — off by default, kept as an A/B knob
        packed_fused=bool(tpu_opt("packed_fused", 0)),
        fused_block=fused_block,
        fused_window=fused_window,
        # several logical blocks per kernel grid program amortize the
        # per-program overhead: ~131k rows/program measured fastest on
        # v5e (r3 sweeps: blk8192 x subblocks 16 = +6% over subblocks
        # 1); QED kernel variants carry more VMEM per block, so QED
        # decks target 8k.  The driver degrades to the largest divisor
        # of the block count when this does not divide it.
        fused_subblocks=int(tpu_opt(
            "fused_subblocks",
            max(1, (8192 if qed_deck else 131072) // fused_block),
        )),
        fused_resort_every=fused_resort_every,
        fused_misfit_capacity=fused_misfit_capacity,
        migration_every=migration_every,
        migration_window=migration_window,
        max_drift_cells_per_step=max_drift,
        replicate_fields=replicate,
    )

    from .fields import make_mesh

    sim = Simulation(
        geom, options, specs, laser_y=laser_y, laser_z=laser_z,
        mesh=make_mesh(mesh_devices) if replicate else None,
        dtype=dtype, field_dtype=field_dtype,
    )
    species = {k: sim.shard_particles(v) for k, v in states.items()}

    total_steps = int((tend - tstart) / dt)
    run_params = dict(
        tstart=tstart, tend=tend, n_outputs=n_outputs,
        total_steps=total_steps, capacities=capacities,
        balance_info=balance_info, replicated=replicate,
        replicate_blocked_by_absorption=replicate_blocked_by_absorption,
        initialise_fields=initialise_fields,
        checkpoint=checkpoint_enabled,
        # device watchdog guard: the tunnel-attached TPU kills any
        # single program whose device wall time exceeds ~30-90 s
        # (measured 2026-08-19, tools/qed_fault_bisect.sh), so output
        # blocks are executed as a loop of <=steps_per_block-step
        # programs.  0 = auto (50 for QED decks, 1000 otherwise);
        # negative = never split.
        steps_per_block=int(tpu_opt("steps_per_block", 0)),
    )
    return sim, species, run_params


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="opal_tpu", description="TPU-native 1d3v PIC simulation"
    )
    parser.add_argument("input", help="path to YAML input configuration")
    parser.add_argument("--devices", type=int, default=None,
                        help="number of mesh devices (default: all)")
    parser.add_argument("--f32", action="store_true",
                        help="run everything in float32 (bench mode)")
    parser.add_argument("--f64", action="store_true",
                        help="run everything in float64 (parity mode; "
                             "the unfused ops — Mosaic has no f64). "
                             "Default is MIXED precision: f32 particles "
                             "on the fused Pallas path + f64 fields/"
                             "energy integration")
    parser.add_argument("--resume", action="store_true",
                        help="resume from checkpoint.npz in the output dir")
    parser.add_argument("--profile", metavar="DIR", default=None,
                        help="write a jax.profiler trace of the run")
    parser.add_argument("--coordinator", metavar="HOST:PORT", default=None,
                        help="multi-process run: coordinator address for "
                             "jax.distributed.initialize (the reference's "
                             "mpirun analogue, main.rs:49). Launch one "
                             "process per host with the same coordinator "
                             "and consecutive --process-id values")
    parser.add_argument("--num-processes", type=int, default=None,
                        help="multi-process run: total process count")
    parser.add_argument("--process-id", type=int, default=None,
                        help="multi-process run: this process's rank")
    args = parser.parse_args(argv)

    import os

    import jax

    # Site hooks may pre-register a TPU plugin as the default platform;
    # honour an explicit JAX_PLATFORMS=cpu request regardless.
    env_platforms = os.environ.get("JAX_PLATFORMS", "")
    if env_platforms and "cpu" in env_platforms.split(","):
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass

    if args.coordinator is not None:
        # multi-process operation (MPI analogue): must run before any
        # backend use so every process sees the global device set
        if args.num_processes is None or args.process_id is None:
            print(
                "opal_tpu: --coordinator requires --num-processes and "
                "--process-id",
                file=sys.stderr,
            )
            return 1
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    if args.f32 and args.f64:
        print("opal_tpu: --f32 and --f64 are mutually exclusive",
              file=sys.stderr)
        return 1
    if not args.f32:
        # mixed (default) and --f64 both integrate fields in f64
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    path = Path(args.input)
    output_dir = path.parent

    try:
        sim, species, rp = build(
            path, n_devices=args.devices,
            dtype=jnp.float64 if args.f64 else jnp.float32,
            field_dtype=jnp.float32 if args.f32 else jnp.float64,
        )
    except (ConfigError, ValueError) as exc:
        print(f"opal_tpu: {exc}", file=sys.stderr)
        print("Usage: python -m opal_tpu input-file", file=sys.stderr)
        return 1
    geom, opt = sim.geom, sim.options

    n_outputs = rp["n_outputs"]
    total_steps = rp["total_steps"]
    steps_bt_output = max(total_steps // max(n_outputs, 1), 1)

    # Device-watchdog guard (see build(): steps_per_block): never let a
    # single compiled program run long enough to trip the tunnel
    # device's per-program wall-time kill (~30-90 s, measured
    # 2026-08-19).  Chunks are balanced so at most two program shapes
    # compile per run.
    spb = rp.get("steps_per_block", 0)
    if spb == 0:
        qed_on = sim.options.photon_emission or sim.options.photon_absorption
        slow_path = (
            sim.dtype == jnp.float64 or not sim.options.fused_pusher
        )
        # the f64/unfused step is ~6-30x the fused f32 one; a 1000-step
        # program then exceeds the device's per-program wall-time kill
        # (~30-90 s) — the 2026-08-20 f64 two_stream run crashed the
        # TPU worker exactly this way
        spb = 50 if qed_on else (200 if slow_path else 1000)
    if spb > 0 and steps_bt_output > spb + spb // 2:
        nchunks = -(-steps_bt_output // spb)
        run_chunk = -(-steps_bt_output // nchunks)
    else:
        run_chunk = steps_bt_output

    def run_span(E, B, J, rho, species, t, span_key, counters, nsteps):
        """Advance nsteps as a loop of <=run_chunk-step programs,
        threading the event ring through the chunks (identical
        semantics to one program; only the RNG stream regroups)."""
        events = sim.zero_events() if sim._event_log else None
        done = 0
        while done < nsteps:
            n = min(run_chunk, nsteps - done)
            span_key, sub = jax.random.split(span_key)
            # donate=True: state buffers alias input->output, halving
            # the particle-state HBM footprint (the difference between
            # fitting a 1e8-row deck on a 16 GB chip or not).  All
            # output-time consumers (host_view, energies, checkpoint,
            # refresh_electron_chi) read the RETURNED arrays before the
            # next span donates them.
            res = sim.run(
                E, B, J, rho, species, float(t), sub, counters, n,
                events=events, donate=True,
            )
            E, B, J, rho, species, t, counters = res[:7]
            if sim._event_log:
                events = res[7]
            done += n
        return E, B, J, rho, species, t, counters, events

    ndev = sim.mesh.shape["x"]
    multihost = jax.process_count() > 1
    rank0 = jax.process_index() == 0
    if multihost and rank0:
        # Multi-host pods (MPI-across-nodes analogue, main.rs:49):
        # the step itself is plain SPMD over the global mesh; output
        # and checkpoint arrays are materialized with process-local
        # all-gathers (multihost_utils) and written by process 0 only.
        # Exercised in CI only via the single-host path — flagged so a
        # pod operator knows this surface is the least-travelled one.
        print(
            f"[multi-host: {jax.process_count()} processes over {ndev} "
            "devices; outputs/checkpoints all-gather across hosts and "
            "are written by process 0]",
            file=sys.stderr,
        )

    def host_view(tree):
        """Pull a (possibly cross-host-sharded) pytree to host numpy.
        Single-process: plain np.asarray (no copy of the gather kind).
        Multi-host: process_allgather materializes the global value on
        every process (outputs are small next to step compute)."""
        if not multihost:
            return jax.tree.map(
                lambda a: None if a is None else np.asarray(a), tree,
                is_leaf=lambda a: a is None,
            )
        from jax.experimental import multihost_utils

        return jax.tree.map(
            lambda a: None if a is None
            else np.asarray(multihost_utils.process_allgather(a, tiled=True)),
            tree, is_leaf=lambda a: a is None,
        )

    kind = jax.devices()[0].device_kind
    if not rank0:
        # quiet non-zero ranks: every process runs the same SPMD loop,
        # but banners/progress lines belong to process 0 alone
        sys.stdout = open(os.devnull, "w")
    if opt.replicate_fields:
        print(
            f"Running {ndev} task{'s' if ndev > 1 else ''} on {kind} "
            f"(replicated fields, equal-count particle shards)..."
        )
    else:
        print(
            f"Running {ndev} task{'s' if ndev > 1 else ''} "
            f"on {kind} ({geom.n_loc} cells/device)..."
        )
    if not opt.radiation_reaction:
        print("[radiation reaction disabled, using classical emission rates]")
    if not opt.beaming:
        print("[neglecting angular component of photon spectrum]")
    if not opt.stimulated_emission and opt.photon_absorption:
        print("[stimulated emission disabled, running with absorption only]")
    if opt.immobile_photons:
        print("[photon push disabled]")
    if opt.fused_pusher:
        fused_on = [n for n in species if sim._fused_applicable(n, species[n])]
        print(f"[fused pusher: {', '.join(fused_on) if fused_on else 'no applicable species (unfused ops)'}]")
    bi = rp.get("balance_info")
    if bi is not None and bi["imbalance"] > 1.5 and not opt.replicate_fields:
        print(
            f"[density-balanced split would use cells/task = {bi['counts']}; "
            f"uniform slabs carry a {bi['imbalance']:.2f}x worst-case "
            f"particle load — capacity is sized for the heaviest slab]"
        )
        if rp.get("replicate_blocked_by_absorption"):
            print(
                "[replicated-field balancing is unavailable for this "
                "absorption deck: the all-gathered pairing table "
                "exceeds its memory budget at this grid size — lower "
                "tpu: absorption_candidates to re-enable; expect up to "
                f"{bi['imbalance']:.2f}x per-device compute skew]"
            )

    E, B, J, rho = sim.init_fields()
    if rp.get("initialise_fields"):
        E, B, J, rho = sim.initialize_fields(E, B, J, rho, species)
    counters = sim.zero_counters()
    key = jax.random.key(opt.seed)
    t = rp["tstart"]
    first_output = 0
    if args.resume:
        from . import checkpoint

        try:
            first_output, t, E, B, J, rho, species, key, counters = (
                checkpoint.load(output_dir, sim)
            )
            print(f"Resuming from output {first_output} (t = {simulation_time(t)})")
        except FileNotFoundError:
            print(
                f"opal_tpu: no {checkpoint.FILENAME} in {output_dir}",
                file=sys.stderr,
            )
            return 1
        except ValueError as exc:
            print(f"opal_tpu: {exc}", file=sys.stderr)
            return 1
    runtime = time.monotonic()

    def dump(index):
        if sim.electron_chi_is_lazy:
            # the lite fused kernel (non-QED decks) skips the per-step
            # chi diagnostic; refresh before output and checkpoint so
            # chi histograms/saved state are current
            species["electron"] = sim.refresh_electron_chi(
                E, B, species["electron"]
            )
        if (
            "photon" in species
            and not opt.photon_absorption
            and not opt.immobile_photons
        ):
            # the step skips the per-step photon chi update when no
            # absorption pass consumes it; refresh before output and
            # checkpoint so chi histograms/saved state are current
            species["photon"] = sim.refresh_photon_chi(
                E, B, species["photon"]
            )
        # one host materialization serves checkpoint + every writer;
        # on multi-host meshes this is the process-local all-gather
        E_h, B_h, J_h, rho_h = host_view((E, B, J, rho))
        species_h = {k: host_view(v) for k, v in species.items()}
        if rp.get("checkpoint"):
            from . import checkpoint

            # hoisted above the rank0 guard: counters are fully
            # replicated today (host_view's all-gather short-circuits),
            # but a device-sharded counter entered on rank 0 only
            # would deadlock a multi-host run
            counters_h = host_view(counters)
            if rank0:
                checkpoint.save(
                    output_dir, index, float(t), E_h, B_h, J_h, rho_h,
                    species_h, key, counters_h, n_devices=ndev,
                    n_loc=geom.n_loc, replicated=opt.replicate_fields,
                )
        if rank0:
            out.write_grid_data(output_dir, index, E_h, B_h, J_h, rho_h,
                                geom)
            for skey, spec in sim.specs.items():
                out.write_particle_outputs(
                    output_dir, index, spec, species_h[skey], geom,
                    rp["capacities"][skey], replicated=rp["replicated"],
                )
        fe = sim.em_field_energy(E, B)
        ke_src = species_h if multihost else species
        ee = sim.total_kinetic_energy("electron", ke_src["electron"])
        ie = (
            sim.total_kinetic_energy("ion", ke_src["ion"])
            if "ion" in species else 0.0
        )
        pe = (
            sim.total_kinetic_energy("photon", ke_src["photon"])
            if "photon" in species else 0.0
        )
        if rank0:
            out.write_energies(output_dir, index, fe, ee, ie, pe)

    last_deferred = 0
    for i in range(first_output, n_outputs):
        dump(i)
        if i > first_output:
            done = (i - first_output) * steps_bt_output
            total = (n_outputs - first_output) * steps_bt_output
            print(
                f"Output {i: >4} at t = {simulation_time(t)}, "
                f"RT = {pretty_duration(time.monotonic() - runtime)}, "
                f"ETTC = {pretty_duration(ettc(runtime, done, total))}..."
            )
        else:
            print(f"Output {i: >4} at t = {simulation_time(t)}...")
        sys.stdout.flush()

        key, sub = jax.random.split(key)
        if args.profile and i == first_output + 1:
            # profile the second block: the first includes compilation
            with jax.profiler.trace(args.profile):
                res = run_span(
                    E, B, J, rho, species, float(t), sub, counters,
                    steps_bt_output,
                )
                jax.block_until_ready(res[:7])
        else:
            res = run_span(
                E, B, J, rho, species, float(t), sub, counters, steps_bt_output
            )
        E, B, J, rho, species, t, counters = res[:7]
        if sim._event_log:
            # materialize on EVERY rank: the event ring is
            # device-sharded, so host_view() runs a cross-process
            # all-gather — entering it on rank 0 only would hang a
            # multi-host run at the first output span
            events_h = host_view(res[7])
            if rank0:
                out.write_event_log(sys.stderr, events_h, sim.options)
        from .sim import counter_total

        deferred = counter_total(counters.get("qed_deferred", 0))
        lost = {k: counter_total(v) for k, v in counters.items()
                if k != "qed_deferred" and counter_total(v) > 0}
        if lost and rank0:
            print(f"warning: buffer-overflow particle losses: {lost}",
                  file=sys.stderr)
        if deferred > last_deferred and rank0:
            print(
                f"note: QED active-set backlog: {deferred} particle-steps "
                "deferred to later steps so far (delays, not losses; raise "
                "tpu: absorption/emission_active_capacity to shrink)",
                file=sys.stderr,
            )
            last_deferred = deferred

    dump(n_outputs)
    print(
        f"Output {n_outputs: >4} at t = {simulation_time(float(t))}, "
        f"RT = {pretty_duration(time.monotonic() - runtime)}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
