"""QED interactions coupling particle populations.

Photon emission (radiation reaction) and one-photon absorption /
stimulated emission, redesigned from the reference's Rayon-parallel,
dynamically-growing implementation (``src/particle/interactions.rs``)
into shape-stable masked array programs:

* ``emit_radiation``: every electron whose optical depth fell below
  zero samples the quantum (or classical) synchrotron spectrum,
  recoils, and scatters its photon into a dead slot of the photon
  buffer (``interactions.rs:45-107``, ``electron.rs:208-251``).
* ``absorb``: photons pair with electrons sharing their cell.  The
  reference scans electrons sequentially per photon and stops at the
  first event; here block-vectorized passes walk the cell-sorted
  electron segment — per-candidate optical-depth decrements become
  in-block cumulative sums with first-crossing-wins selection,
  preserving the "first event wins" semantics
  (``interactions.rs:145-340``).

RNG is counter-based (threefry): every (step, purpose, lane) gets an
independent stream, replacing the reference's per-chunk Xoshiro jumps.
Parity is at the distribution level, as fixed in SURVEY §7.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from jax import lax

from . import constants as const
from .parallel.migrate import insert
from .qed import cross_sections, emission
from .species import ParticleState

_TINY = 1.0e-300

#: per-cell candidate-table budget for the absorption walk (ADVICE r2):
#: the table is persistent (n_cells, ceil(K/B)*B, 7) — above this the
#: walk falls back to transient photon-bounded gathers
CAND_TABLE_MAX_BYTES = 256 * 2**20


def _tiny(dtype) -> float:
    """Guard epsilon by dtype: 1e-300 underflows to 0.0 in f32 (the
    mixed-precision state dtype), defeating divide/log guards."""
    return 1.0e-37 if dtype == jnp.float32 else _TINY


from .vec3 import orthogonal as _orthogonal, rotate_around as _rotate_around


def emit_radiation(sim, species, t, key):
    """Emission pass over the electron population; returns
    ``(species, lost, deferred)``: ``lost`` counts photons that found
    no free buffer slot on this device (real losses); ``deferred``
    counts emitters beyond the active-set capacity OR the per-step
    insert bound (``emission_insert_capacity``) — their tau stays
    negative and their momentum is untouched, so they emit on a later
    step (a delay, not a loss; the energy ledger is unaffected).
    ``sim`` supplies options/geometry (any object with ``.options``
    and ``.geom``)."""
    opt = sim.options
    e = species["electron"]
    ph = species["photon"]

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    n = e.alive.shape[0]
    emits = e.alive & (e.tau < 0.0)

    # Active-set compaction (see the absorb pass): per-step emitters
    # are sparse by construction (rate * dt << 1), yet the sampler's
    # table machinery runs for every buffer row.  With
    # ``emission_active_capacity`` set, only up to EC emitter rows are
    # gathered through the sampler; the excess is counted and emits
    # next step.
    EC = int(getattr(opt, "emission_active_capacity", 0) or 0)
    compact = 0 < EC < n
    if compact:
        from .ops.fused import misfit_compact

        etab, eovf = misfit_compact(emits.astype(jnp.float32), EC)
        wi = jnp.clip(etab, 0, n - 1)
        valid_w = etab < n
        # ROW-BATCHED working-set gather: one (EC, 8) row gather
        # instead of 8 column gathers — gather cost on TPU is bound by
        # row count, not bytes (measured ~8 ms per 262k-row column
        # gather from 2.1M on v5e)
        sdt = e.x.dtype
        _gnames = ("chi", "gamma", "ux", "uy", "uz", "x", "weight",
                   "cell")
        _stk = jnp.stack(
            [getattr(e, nm).astype(sdt) for nm in _gnames], axis=1
        )
        _rows = _stk[wi]
        _gcol = {nm: _rows[:, j] for j, nm in enumerate(_gnames)}

        def g(a, _map={}):
            # serve the stacked columns; anything else gathers directly
            for nm in _gnames:
                col = getattr(e, nm)
                if a is col:
                    return _gcol[nm].astype(col.dtype)
            return a[wi]

        m = EC
    else:
        eovf = jnp.zeros((), jnp.int32)
        etab = None
        valid_w = emits
        g = lambda a: a
        m = n

    shape = (m,)
    dtype = e.x.dtype
    r1 = jax.random.uniform(k1, shape, dtype)
    r2 = jax.random.uniform(k2, shape, dtype)
    r3 = jax.random.uniform(k3, shape, dtype)

    chi_w, gamma_w = g(e.chi), g(e.gamma)
    if opt.radiation_reaction:
        omega_mc2, theta, cphi = emission.sample(chi_w, gamma_w, r1, r2, r3)
    else:
        omega_mc2, theta, cphi = emission.classical_sample(
            chi_w, gamma_w, r1, r2, r3
        )

    if compact:
        u_w = jnp.stack(
            [_gcol["ux"], _gcol["uy"], _gcol["uz"]], axis=1
        ).astype(e.ux.dtype)
    else:
        u_w = e.u  # one (N, 3) stack of the momentum columns
    u_norm = jnp.sqrt(jnp.maximum(jnp.sum(u_w * u_w, axis=-1), _tiny(u_w.dtype)))
    parallel = u_w / u_norm[:, None]
    perp = _rotate_around(_orthogonal(parallel), parallel, cphi)
    if opt.beaming:
        k_ph = omega_mc2[:, None] * (
            jnp.cos(theta)[:, None] * parallel + jnp.sin(theta)[:, None] * perp
        )
    else:
        k_ph = omega_mc2[:, None] * parallel

    formation_length = (
        2.0
        * gamma_w**2
        * theta
        * const.SPEED_OF_LIGHT
        * const.COMPTON_TIME
        / jnp.maximum(chi_w, _tiny(chi_w.dtype))
    )

    # --- filters (interactions.rs:74-97) ------------------------------
    # Computed BEFORE the recoil write-back so the insert-bound
    # deferral below can exclude its emitters from the update.
    k0 = jnp.sqrt(jnp.maximum(jnp.sum(k_ph * k_ph, axis=-1), _tiny(k_ph.dtype)))
    keep = valid_w
    if opt.photon_energy_min is not None:
        keep = keep & (k0 * const.ELECTRON_MASS_MEV >= opt.photon_energy_min)
    if opt.photon_angle_max is not None:
        angle = jnp.arccos(jnp.clip(-k_ph[:, 0] / k0, -1.0, 1.0))
        keep = keep & (angle <= opt.photon_angle_max)
    if opt.max_formation_length is not None:
        keep = keep & (formation_length < opt.max_formation_length)

    # --- insert-bound deferral (SimOptions.emission_insert_capacity) --
    # Kept photons are compacted to the insert bound so the buffer
    # columns and the slot scatter carry the real per-step emission
    # count, not the sampler's working length.  Keeps beyond the bound
    # are DEFERRED, not dropped: their emitter keeps its negative tau
    # and unmodified momentum and emits on a later step, so the cap is
    # a delay and never an energy-ledger violation (the reference
    # appends every photon, interactions.rs:105).
    EIC = int(getattr(opt, "emission_insert_capacity", 0) or 0)
    if EIC < 0:
        EIC = max(16384, m // 8)
    if 0 < EIC < m:
        ins_rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        defer_ins = keep & (ins_rank >= EIC)
        keep = keep & ~defer_ins
        n_defer = jnp.sum(defer_ins.astype(jnp.int32))
        valid_apply = valid_w & ~defer_ins
    else:
        defer_ins = None
        n_defer = jnp.zeros((), jnp.int32)
        valid_apply = valid_w

    # --- electron update: tau reset + recoil (electron.rs:210-239) ----
    # Filtered-out photons (min_energy/angle/formation) still recoil
    # their emitter — the emission happened, the photon just isn't
    # tracked (reference semantics, interactions.rs:74-97).  Only
    # insert-bound-deferred emitters are excluded.
    tau_draw = jax.random.exponential(k4, shape, dtype)
    if opt.radiation_reaction:
        u_new = u_w - k_ph
        gamma_new = jnp.sqrt(1.0 + jnp.sum(u_new * u_new, axis=-1))
        chi_new = chi_w * gamma_new / jnp.maximum(gamma_w, _tiny(gamma_w.dtype))
    else:
        u_new, gamma_new, chi_new = u_w, gamma_w, chi_w
    # cast back: the sampling tables are f64 and must not promote f32
    # state (breaks the scan carry dtype when x64 is enabled)
    if compact:
        # row-batched write-back: one (EC, 6) row scatter through a
        # staged matrix instead of 6 column scatters (see the gather
        # note above; the stage stack/unstack are streaming passes)
        sdt = e.x.dtype
        stage = jnp.stack(
            [e.ux.astype(sdt), e.uy.astype(sdt), e.uz.astype(sdt),
             e.gamma.astype(sdt), e.chi.astype(sdt),
             e.tau.astype(sdt)],
            axis=1,
        )
        rows = jnp.stack(
            [u_new[:, 0], u_new[:, 1], u_new[:, 2], gamma_new,
             chi_new, tau_draw], axis=1
        ).astype(sdt)
        etab_eff = (
            etab if defer_ins is None
            else jnp.where(defer_ins, jnp.asarray(n, etab.dtype), etab)
        )
        stage = stage.at[etab_eff].set(rows, mode="drop")
        e = dataclasses.replace(
            e,
            ux=stage[:, 0].astype(e.ux.dtype),
            uy=stage[:, 1].astype(e.uy.dtype),
            uz=stage[:, 2].astype(e.uz.dtype),
            gamma=stage[:, 3].astype(e.gamma.dtype),
            chi=stage[:, 4].astype(e.chi.dtype),
            tau=stage[:, 5].astype(e.tau.dtype),
        )
    else:
        sel = lambda new, old: jnp.where(valid_apply, new, old).astype(old.dtype)
        e = dataclasses.replace(
            e,
            ux=sel(u_new[:, 0], e.ux),
            uy=sel(u_new[:, 1], e.uy),
            uz=sel(u_new[:, 2], e.uz),
            gamma=sel(gamma_new, e.gamma),
            chi=sel(chi_new, e.chi),
            tau=sel(tau_draw, e.tau),
        )

    # --- photon construction (photon.rs:95-116, electron.rs:243-245) --
    total_keep = jnp.sum(keep.astype(jnp.int32))
    if 0 < EIC < m:
        from .ops.fused import misfit_compact

        ktab, _kovf = misfit_compact(keep.astype(jnp.float32), EIC)
        ki = jnp.clip(ktab, 0, m - 1)
        keep_c = ktab < m
        gi = lambda a: a[ki]
        mi = EIC
    else:
        ki = None
        keep_c = keep
        gi = lambda a: a
        mi = m
    x_w = gi(g(e.x))
    k_ph_i = gi(k_ph)
    k0_i = gi(k0)
    prev_x = x_w - const.SPEED_OF_LIGHT * k_ph_i[:, 0] * opt.dt / (
        jnp.maximum(k0_i, _tiny(k0_i.dtype)) * sim.geom.dx
    )
    ek = jax.random.split(k5, 2)
    buf = ParticleState(
        cell=gi(g(e.cell)),
        x=x_w,
        prev_x=prev_x.astype(dtype),
        y=jnp.zeros(mi, dtype),
        z=jnp.zeros(mi, dtype),
        weight=gi(g(e.weight)),
        ux=k_ph_i[:, 0].astype(dtype),
        uy=k_ph_i[:, 1].astype(dtype),
        uz=k_ph_i[:, 2].astype(dtype),
        gamma=k0_i.astype(dtype),
        chi=jnp.zeros(mi, dtype),
        tau=None,
        tau_abs=jax.random.exponential(ek[0], (mi,), dtype),
        tau_st=jax.random.exponential(ek[1], (mi,), dtype),
        work=None,
        birth_time=jnp.full(mi, t, dtype),
        alive=keep_c,
        # unpolarized, basis = [k, k] placeholder (photon.rs:107-108)
        pol=jnp.zeros((mi, 4), dtype),
        basis=jnp.concatenate([k_ph_i, k_ph_i], axis=1).astype(dtype),
    )
    ph, overflow = insert(ph, buf, keep_c)
    # any residual mismatch between the kept set and the compacted set
    # is a true loss (should be zero — the deferral above bounds the
    # kept count at EIC); insert-bound deferrals are counted as delays
    overflow = overflow + total_keep - jnp.sum(keep_c.astype(jnp.int32))
    return {**species, "electron": e, "photon": ph}, overflow, eovf + n_defer


def _blocked_cummax(v, block=65536):
    """Inclusive cummax along axis 0, two-level blocked (see
    ``ops.deposit._cumsum_cols`` — a flat particle-length scan is
    latency-bound on TPU)."""
    n = v.shape[0]
    pad = (-n) % block
    lowest = jnp.iinfo(v.dtype).min if jnp.issubdtype(v.dtype, jnp.integer) \
        else -jnp.inf
    vp = jnp.pad(v, (0, pad), constant_values=lowest)
    m = vp.reshape(-1, block)
    within = lax.cummax(m, axis=1)
    carry = lax.cummax(within[:, -1], axis=0)
    carry = jnp.concatenate(
        [jnp.full((1,), lowest, v.dtype), carry[:-1]]
    )
    return jnp.maximum(within, carry[:, None]).reshape(-1)[:n]


def _suffix_min(v, block=65536):
    """min(v[i:]) for each i (nondecreasing), via reversed cummax."""
    return -_blocked_cummax(-v[::-1], block)[::-1]


def absorb(sim, species, t, key, axis_index=None, presorted=False,
           bracketed=False, replicated=False, axis_name="x"):
    """Photon absorption / stimulated emission pass
    (``interactions.rs:145-340``).

    Electrons are sorted by cell; each photon walks its cell's electron
    segment (bounded by ``options.absorption_candidates``) accumulating
    optical-depth decrements until its first event.  Absorbed photons
    die and kick their electron by (w_ph/w_e) k; stimulated events
    append a photon with the electron's weight and kick by -k.

    Returns ``(species, lost, deferred)`` — or ``(species, lost,
    deferred, events)`` when either extra-output feature is enabled.
    ``lost`` counts stimulated-emission copies that found no free
    buffer slot (real losses); ``deferred`` counts photon-steps pushed
    to later steps (photons beyond the active-set capacity — depths
    untouched — plus photons whose cell-mate segment was truncated at
    ``absorption_candidates``).  ``events`` is a ``((n_ph, 14) record
    array, (n_ph,) valid mask)`` pair holding the reference's per-event
    dump row (``interactions.rs:267-289``): ``x t birth_time chi_g k0
    k1 k2 k3 chi_e p0 p1 p2 p3 kind`` with kind 1 = absorbed,
    2 = stimulated.
    """
    from .grid import HALO

    opt = sim.options
    geom = sim.geom
    e = species["electron"]
    ph = species["photon"]
    n_e = e.alive.shape[0]
    n_ph = ph.alive.shape[0]
    K = min(opt.absorption_candidates, n_e)
    # Replicated-field mode (grid/mod.rs:157-206 balanced-split
    # analogue): particles are equal-count sharded with NO spatial
    # locality, so a photon's cell-mates live on every device.  Each
    # device contributes ceil(K / ndev) candidates per cell to an
    # all-gathered global table; electron kicks are routed back to
    # their owners as tiny event records.
    ndev = int(sim.mesh.shape[axis_name]) if replicated else 1
    if replicated and ndev > 1:
        K = max(1, -(-K // ndev))
    elif ndev <= 1:
        replicated = False
    dtype = e.x.dtype
    # halo-aware pairing: with a migration cadence M > 1 particles roam
    # up to M-1 < HALO cells out of the local domain between exchanges;
    # bucketing over the extended range [-HALO, n_loc + HALO) keeps
    # co-located out-of-domain pairs interacting (the reference
    # migrates every step, mod.rs:247-376, so it never sees this case;
    # cross-device pairs split across a boundary wait for the next
    # exchange — at most M-1 steps)
    pad = HALO
    n_cells = geom.n_loc + 2 * pad
    # profiling-only section skips (SimOptions.debug_absorb_ablate)
    _ablate = set(
        x for x in (getattr(opt, "debug_absorb_ablate", "") or "").split(",")
        if x
    )

    # --- cell-sorted electron view ------------------------------------
    # one multi-operand sort carries the pairing table [p4 | chi | w]
    # through the sort network (a permutation gather afterwards is
    # latency-bound at scale — see deposit_sorted).  When the caller
    # just sorted the electron state (the fused QED path runs the
    # maintenance sort right after migration, serving both this pass
    # and the next step's kernel anchors), the sort is skipped: the
    # alive prefix is strictly cell-ascending and the dead tail's
    # placeholder cells never exceed n_loc - 1, so the masked key view
    # is already sorted.
    cell_mask = None
    if presorted:
        sorted_cells = jnp.where(e.alive, e.cell + pad, n_cells).astype(
            jnp.int32
        )
        order = jnp.arange(n_e, dtype=jnp.int32)
        eg_s, ux_s, uy_s, uz_s, chi_s, w_s = (
            e.gamma, e.ux, e.uy, e.uz, e.chi, e.weight,
        )
        cells = jnp.arange(n_cells, dtype=jnp.int32)
        seg_start = jnp.searchsorted(sorted_cells, cells, side="left")
        seg_end = jnp.searchsorted(sorted_cells, cells, side="right")
    elif bracketed:
        # NEARLY-sorted state (the fused pipeline between maintenance
        # sorts: rows only move at sorts/edge exchanges, cells drift
        # <= 1/step) — no per-step sort, no per-step permutation.
        # Monotone envelopes give EXACT per-cell brackets:
        #   lo_c = first row with cummax(cell) >= c  (rows before are
        #          all in cells < c),
        #   hi_c = first row with suffix-min(cell) > c (rows at/after
        #          are all in cells > c),
        # so [lo_c, hi_c) contains every cell-c row plus, under local
        # disorder, some neighbours — masked out per candidate by the
        # exact cell-equality bit below.  Correctness never depends on
        # sortedness; only bracket width (cost) does, and the QED
        # maintenance-sort cadence bounds it.  The per-step electron
        # payload sort this replaces cost ~36 ms/step at 2.1M on v5e.
        # Dead rows keep their in-range placeholder cells (a mid-array
        # n_cells sentinel would poison the cummax envelope and widen
        # every later bracket to the whole array); their weight is 0 by
        # the fused-pipeline invariant, so an admitted dead candidate
        # contributes zero probability and can never fire first.
        sorted_cells = (e.cell + pad).astype(jnp.int32)
        order = jnp.arange(n_e, dtype=jnp.int32)
        eg_s, ux_s, uy_s, uz_s, chi_s, w_s = (
            e.gamma, e.ux, e.uy, e.uz, e.chi, e.weight,
        )
        cell_mask = sorted_cells
        cells = jnp.arange(n_cells, dtype=jnp.int32)
        env_hi = _blocked_cummax(sorted_cells)
        env_lo = _suffix_min(sorted_cells)
        seg_start = jnp.searchsorted(env_hi, cells, side="left")
        seg_end = jnp.searchsorted(env_lo, cells, side="right")
    else:
        cell_key = jnp.where(e.alive, e.cell + pad, n_cells).astype(
            jnp.int32
        )
        (sorted_cells, order, eg_s, ux_s, uy_s, uz_s, chi_s, w_s) = lax.sort(
            (cell_key, jnp.arange(n_e, dtype=jnp.int32), e.gamma,
             e.ux, e.uy, e.uz, e.chi, e.weight),
            num_keys=1,
        )
        cells = jnp.arange(n_cells, dtype=jnp.int32)
        seg_start = jnp.searchsorted(sorted_cells, cells, side="left")
        seg_end = jnp.searchsorted(sorted_cells, cells, side="right")

    pcell = jnp.clip(ph.cell + pad, 0, n_cells - 1)
    # Per-photon segment bounds are gathered at WORKING length below
    # (two full-buffer row gathers here cost ~45 ms/step at a 2.6M
    # photon buffer on v5e); only the has-cell-mates bit needs a
    # full-length gather, and it is one boolean column.
    seg_len = seg_end - seg_start
    if replicated:
        # pairing visibility must be GLOBAL: a photon with only remote
        # cell-mates still walks (and defers on truncation) — one tiny
        # (n_cells,) psum
        seg_len = lax.psum(seg_len, axis_name)
    seg2 = jnp.stack([seg_start, seg_len], axis=1)  # (n_cells, 2)

    # --- photon skip conditions (interactions.rs:176-192) -------------
    PHOTON_E_ECRIT_CUTOFF = 1.0e-8
    energy = ph.gamma * const.ELECTRON_MASS_MEV
    active = ph.alive & (
        ph.chi * const.ELECTRON_MASS_MEV / jnp.maximum(energy, _tiny(energy.dtype))
        >= PHOTON_E_ECRIT_CUTOFF
    )
    if opt.absorption_stop_time is not None:
        active = active & (t - ph.birth_time <= opt.absorption_stop_time)
    if opt.max_displacement is not None:
        r_perp = jnp.hypot(ph.y, ph.z)
        active = active & (r_perp <= opt.max_displacement)

    ph_u = ph.u  # one (N, 3) stack of the photon momentum columns
    k4_ph = jnp.concatenate([ph.gamma[:, None], ph_u], axis=1)
    # packed (n_e, 6) electron table [p4 | chi | w] from the sorted
    # payloads: the candidate walk then does a single row gather per
    # block (separate column gathers fused into the cross-section math
    # make the TPU backend scalarize the whole computation)
    if bracketed:
        # column 6 carries the row's cell for the exact per-candidate
        # equality mask (cell indices are exact in f32 up to 2^24 —
        # far beyond any 1D grid the memory guard admits)
        e_table = jnp.stack(
            [eg_s, ux_s, uy_s, uz_s, chi_s, w_s,
             cell_mask.astype(dtype)], axis=-1,
        )
    else:
        e_table = jnp.stack([eg_s, ux_s, uy_s, uz_s, chi_s, w_s], axis=-1)
    cdt_dx = const.SPEED_OF_LIGHT * opt.dt / geom.dx

    # Per-CELL candidate table.  Every photon in cell c walks the SAME
    # electron rows (the first K of segment [seg_start[c], seg_end[c]),
    # interactions.rs:198-229), so the walk's electron rows are
    # gathered once per cell — (n_cells, K) rows — instead of once per
    # (photon, candidate) — (A, B) rows per block, the dominant
    # absorption cost at scale (a (262k, 32, 6) random row gather
    # costs ~50 ms on v5e; this drops the per-block gather to A rows
    # of one packed cell block each).  Column 6 is the candidate-valid
    # mask (beyond the cell's segment end), column 5 (weight) is
    # pre-masked to 0 so invalid candidates contribute zero
    # probability; the explicit mask still gates the event logic so a
    # clipped-index garbage row can never produce a NaN that survives.
    B = max(1, min(opt.absorption_block, K))
    nb = -(-K // B)
    # walk columns: [p4 | chi_e | w_e | ok] (+ local row index when
    # replicated, for kick routing)
    CC = 8 if replicated else 7
    # Memory guard (ADVICE r2): the table is a persistent
    # (n_cells, ceil(K/B)*B, CC) array — ~1.9 GB at n_loc ~ 256k with
    # K = 256.  Above 256 MB fall back to the transient per-photon
    # block gather (photon-bounded, the pre-table formulation), which
    # is slower per pass but never scales with the grid.  Replicated
    # mode REQUIRES the table (the walk reads the all-gathered global
    # copy), so its guard covers the gathered size.
    use_cell_table = n_cells * nb * B * CC * ndev * (
        4 if dtype == jnp.float32 else 8
    ) <= CAND_TABLE_MAX_BYTES
    if replicated and not use_cell_table:
        raise ValueError(
            "replicated absorption needs the per-cell candidate table "
            f"to fit {CAND_TABLE_MAX_BYTES >> 20} MB after the "
            f"all-gather (n_cells={n_cells}, K/device={K}, "
            f"devices={ndev}): lower tpu: absorption_candidates"
        )
    if use_cell_table:
        karr_k = jnp.arange(nb * B, dtype=jnp.int32)
        cand_idx = seg_start[:, None] + karr_k[None, :]  # (n_cells, nb*B)
        cand_ok = (karr_k[None, :] < K) & (cand_idx < seg_end[:, None])
        cand = e_table[jnp.clip(cand_idx, 0, n_e - 1)]
        if bracketed:
            # brackets may include neighbour-cell rows under local
            # disorder: mask them exactly (pairing stays strictly
            # same-cell, reference interactions.rs:198-229)
            cand_ok = cand_ok & (cand[..., 6] == cells[:, None].astype(dtype))
        parts = [
            cand[..., :5],
            jnp.where(cand_ok, cand[..., 5], 0.0)[..., None],
            cand_ok.astype(dtype)[..., None],
        ]
        if replicated:
            # UNSORTED local row (order maps the sorted table position
            # back to the buffer row the kick must land on)
            parts.append(
                order[jnp.clip(cand_idx, 0, n_e - 1)].astype(dtype)[..., None]
            )
        cand = jnp.concatenate(parts, axis=-1)
        cand_blocks = cand.reshape(n_cells, nb, B * CC)
        if replicated:
            # global table: device-major block axis, so pass bi serves
            # device bi // nb and the event's owner is recoverable
            gathered = lax.all_gather(
                cand_blocks, axis_name
            )  # (ndev, n_cells, nb, B*CC)
            cand_blocks = jnp.transpose(gathered, (1, 0, 2, 3)).reshape(
                n_cells, ndev * nb, B * CC
            )
            nb = ndev * nb

    # Optional active-set compaction: the walk costs O(buffer capacity
    # x K) even when most photon slots are dead or have no electron
    # cell-mates (e.g. photons that left the beam).  With
    # ``absorption_active_capacity`` set, only photons that are active
    # AND have cell-mates are gathered into an (A,)-row working set;
    # the excess beyond A is skipped this step (tau untouched — they
    # walk next step) and counted as overflow, like every other
    # capacity in this codebase.
    A = int(getattr(opt, "absorption_active_capacity", 0) or 0)
    compact = 0 < A < n_ph
    if compact:
        from .ops.fused import misfit_compact

        # Cell-mate screen WITHOUT a buffer-length row gather: the
        # exact test ``seg_len[pcell] > 0`` gathers one row per photon
        # from the (n_cells,) table — full-buffer row gathers run at
        # ~0.3 GB/s on v5e (~30 ms/step at a 2.6M photon buffer, the
        # single biggest absorption machinery cost).  The conservative
        # screen admits every photon inside the occupied cell RANGE
        # [cmin, cmax]: a superset of the exact set (in-range empty
        # cells admit photons whose candidate segment is empty — zero
        # probability, can never fire — they just spend an active slot;
        # the rotation fairness below keeps slot contention from
        # starving anyone).  Two scalar reductions over (n_cells,)
        # replace the gather.
        occ = seg_len > 0
        cmin = jnp.min(jnp.where(occ, cells, n_cells))
        cmax = jnp.max(jnp.where(occ, cells, -1))
        has_mates = active & (pcell >= cmin) & (pcell <= cmax)
        # Rotation fairness: misfit_compact selects the first A set rows
        # in buffer order, and the active set here is PERSISTENT (a
        # walked photon usually stays active) — under sustained overflow
        # a fixed origin would starve later-indexed photons forever
        # (their depths never decrement).  Rotating the scan origin by a
        # per-step random offset makes every active photon walk at least
        # every ceil(n_active / A) steps.
        rot = jax.random.randint(
            jax.random.fold_in(key, 3_000_017), (), 0, n_ph
        )
        atab_rot, aovf = misfit_compact(
            jnp.roll(has_mates, -rot).astype(jnp.float32), A
        )
        atab = jnp.where(atab_rot < n_ph, (atab_rot + rot) % n_ph, n_ph)
        if int(getattr(opt, "absorption_sorted_active", 1) or 0):
            # monotone working-set addresses: every working-length
            # gather/scatter (the (A,10) staging row gather, the tau
            # scatter-backs, the event-leg gathers) then walks the
            # photon buffer in address order instead of
            # rotation-scrambled order.  Selection is unchanged (same
            # rows walk — the walk is row-independent), so physics is
            # identical; the sort costs one (A,) single-key sort and
            # conveniently parks the n_ph overflow sentinels at the
            # tail.
            atab = jnp.sort(atab)
        wi = jnp.clip(atab, 0, n_ph - 1)
        w_active = atab < n_ph
        # ROW-BATCHED working-set gather: one (A, 10) row gather
        # instead of 9 column gathers (gather cost on TPU is bound by
        # row count, not bytes)
        _wstk = jnp.concatenate(
            [
                k4_ph.astype(dtype),
                jnp.stack(
                    [
                        ph.chi.astype(dtype),
                        ph.tau_abs.astype(dtype),
                        ph.tau_st.astype(dtype),
                        ph.weight.astype(dtype),
                        pcell.astype(dtype),
                    ],
                    axis=1,
                ),
            ],
            axis=1,
        )
        _wrows = _wstk[wi]
        w_k4 = _wrows[:, 0:4]
        w_chi = _wrows[:, 4]
        w_tau_abs0 = _wrows[:, 5].astype(ph.tau_abs.dtype)
        w_tau_st0 = _wrows[:, 6].astype(ph.tau_st.dtype)
        w_weight = _wrows[:, 7].astype(ph.weight.dtype)
        w_cell = _wrows[:, 8].astype(pcell.dtype)
        # per-photon segment bounds at working length: one (A,)-row
        # gather of the (n_cells, 2) table — exact integers
        _sl = seg2[w_cell]
        w_start = _sl[:, 0]
        w_end = _sl[:, 0] + _sl[:, 1]
        nw = A
    else:
        aovf = jnp.zeros((), jnp.int32)
        atab = None
        w_active = active
        w_start = seg_start[pcell]
        # seg_len (global under `replicated`) rather than local
        # seg_end: identical when not replicated
        w_end = w_start + seg_len[pcell]
        w_cell = pcell
        w_k4, w_chi = k4_ph, ph.chi
        w_tau_abs0, w_tau_st0 = ph.tau_abs, ph.tau_st
        nw = n_ph
    # deferred-walk accounting: count walked PHOTONS whose candidate
    # segment was truncated at K this step (units match the active-set
    # overflow — photon-steps delayed), not the raw excess-pair count
    # (a pair count wraps an int32 within one block on dense decks)
    overflow_pairs = jnp.sum(
        ((w_end - w_start > K * ndev) & w_active).astype(jnp.int32)
    )

    # Candidate walk, block-vectorized: each sequential pass examines a
    # (nw, B) block of cell-mates at once (the per-kernel launch cost
    # makes K truly-serial iterations prohibitive); within a block the
    # reference's one-at-a-time optical-depth decrements become
    # cumulative sums, and the first crossing wins — identical
    # first-event semantics (interactions.rs:244-258).  The electron
    # rows come from the per-cell candidate table: ONE (nw,)-row
    # gather of the photon's packed cell block per pass.

    # replicated mode carries extra per-event legs through the walk:
    # the partner's owner device + local row (kick routing), its weight
    # (kick scale), and — when the event log is on — its p4/chi for the
    # record (the partner's columns are not locally gatherable)
    want_events = (
        opt.extra_absorption_output or opt.extra_stimulated_emission_output
    )
    extra_names = ()
    if replicated:
        extra_names = ("ev_dev", "ev_we")
        if want_events:
            extra_names += ("ev_g", "ev_ux", "ev_uy", "ev_uz", "ev_chie")
    nb_loc = nb // ndev if replicated else nb

    # Prefetch ALL passes' candidate rows in ONE row gather.  The
    # per-pass ``blk[w_cell]`` gather costs ~row-count latency per
    # PASS (the walk's dominant data movement); gathering the photon's
    # whole packed cell row (nb*B*CC columns) once costs the same row
    # count ONCE, and each pass then reads a contiguous slice —
    # bandwidth-bound, not latency-bound.  Gated by a byte budget: at
    # very large active sets the (nw, nb*B*CC) staging tensor rivals
    # the particle state itself.
    prefetch_rows = None
    if use_cell_table:
        pf_bytes = nw * nb * B * CC * (4 if dtype == jnp.float32 else 8)
        if pf_bytes <= 2 << 30:
            prefetch_rows = cand_blocks.reshape(n_cells, nb * B * CC)[
                w_cell
            ].reshape(nw, nb, B, CC)

    def body(bi, carry):
        tau_abs, tau_st, done, ev_kind, ev_idx, extras = carry
        if prefetch_rows is not None:
            rows = lax.dynamic_index_in_dim(
                prefetch_rows, bi, axis=1, keepdims=False
            )  # (nw, B, CC)
            valid = (
                (~done)[:, None] & w_active[:, None] & (rows[..., 6] > 0.5)
            )
            w_e = rows[..., 5]
        elif use_cell_table:
            blk = lax.dynamic_index_in_dim(
                cand_blocks, bi, axis=1, keepdims=False
            )  # (n_cells, B*CC)
            rows = blk[w_cell].reshape(nw, B, CC)
            valid = (
                (~done)[:, None] & w_active[:, None] & (rows[..., 6] > 0.5)
            )
            w_e = rows[..., 5]
        else:
            idx = w_start[:, None] + bi * B + jnp.arange(B, dtype=jnp.int32)
            in_seg = (idx < w_end[:, None]) & (
                bi * B + jnp.arange(B, dtype=jnp.int32) < K
            )
            rows = e_table[jnp.clip(idx, 0, n_e - 1)]
            if bracketed:
                in_seg = in_seg & (
                    rows[..., 6] == w_cell[:, None].astype(rows.dtype)
                )
            valid = (~done)[:, None] & w_active[:, None] & in_seg
            w_e = jnp.where(valid, rows[..., 5], 0.0)
        p4 = rows[..., 0:4]
        chi_e = rows[..., 4]

        if opt.stimulated_emission:
            # one fused evaluation shares the kinematic invariants
            # between the two cross sections (both run on every pair)
            sig_abs, sig_st = cross_sections.pair_cross_sections(
                w_k4[:, None, :], p4, w_chi[:, None], chi_e
            )
            p_abs = jnp.where(valid, w_e * cdt_dx * sig_abs, 0.0)
            p_st = jnp.where(valid, w_e * cdt_dx * sig_st, 0.0)
        else:
            sig_abs, _ = cross_sections.photon_absorption(
                w_k4[:, None, :], p4, w_chi[:, None], chi_e
            )
            p_abs = jnp.where(valid, w_e * cdt_dx * sig_abs, 0.0)
            p_st = jnp.zeros_like(p_abs)

        cum_abs = jnp.cumsum(p_abs, axis=1)
        cum_st = jnp.cumsum(p_st, axis=1)
        # only a valid candidate column can fire (a dead or finished
        # photon's already-negative depth must not re-trigger)
        abs_fire = valid & ((tau_abs[:, None] - cum_abs) < 0.0)
        st_fire = valid & ((tau_st[:, None] - cum_st) < 0.0)
        k_abs = jnp.where(jnp.any(abs_fire, 1), jnp.argmax(abs_fire, 1), B)
        k_st = jnp.where(jnp.any(st_fire, 1), jnp.argmax(st_fire, 1), B)
        k_ev = jnp.minimum(k_abs, k_st)
        event = k_ev < B
        both = event & (k_abs == k_st)

        # column fetch at the event index via a one-hot masked sum:
        # exactly one column fires per row, fuses into the (nw, B)
        # elementwise pipeline — take_along_axis lowers to a per-row
        # gather, latency-bound at walk length (4 of them per pass)
        kc = jnp.clip(k_ev, 0, B - 1)[:, None]
        oh = jnp.arange(B, dtype=jnp.int32)[None, :] == kc
        take = lambda m: jnp.sum(jnp.where(oh, m, 0.0), axis=1)
        pa_k, ps_k = take(p_abs), take(p_st)
        r = jax.random.uniform(jax.random.fold_in(key, bi), (nw,), dtype)
        choose_abs = r < pa_k / jnp.maximum(pa_k + ps_k, _tiny(pa_k.dtype))
        absorbed_now = event & (
            (both & choose_abs) | (~both & (k_abs < k_st))
        )
        stim_now = event & ~absorbed_now

        # optical depths: decrement by the full block without an event,
        # else stop at the event column (the reference stops scanning).
        # The cross sections compute in f64; cast back so an f32 state
        # under jax_enable_x64 keeps its carry dtype.
        new_abs = (
            tau_abs - jnp.where(event, take(cum_abs), cum_abs[:, -1])
        ).astype(tau_abs.dtype)
        new_st = (
            tau_st - jnp.where(event, take(cum_st), cum_st[:, -1])
        ).astype(tau_st.dtype)
        exp1 = jax.random.exponential(
            jax.random.fold_in(key, 1000 + bi), (2, nw), dtype
        )
        new_abs = jnp.where(stim_now & both, exp1[0], new_abs)
        new_st = jnp.where(stim_now, exp1[1], new_st)

        ev_kind = jnp.where(event, jnp.where(absorbed_now, 1, 2), ev_kind)
        if replicated:
            # the partner's LOCAL row rides column 7 of the gathered
            # table; its owner is the pass's device stripe
            row_ev = take(rows[..., 7]).astype(jnp.int32)
            ev_idx = jnp.where(event, row_ev, ev_idx)
            upd_ex = dict(
                ev_dev=jnp.where(
                    event, (bi // nb_loc).astype(jnp.int32),
                    extras["ev_dev"],
                ),
                ev_we=jnp.where(event, take(w_e), extras["ev_we"]),
            )
            if want_events:
                upd_ex.update(
                    ev_g=jnp.where(event, take(p4[..., 0]), extras["ev_g"]),
                    ev_ux=jnp.where(event, take(p4[..., 1]), extras["ev_ux"]),
                    ev_uy=jnp.where(event, take(p4[..., 2]), extras["ev_uy"]),
                    ev_uz=jnp.where(event, take(p4[..., 3]), extras["ev_uz"]),
                    ev_chie=jnp.where(event, take(chi_e), extras["ev_chie"]),
                )
            extras = {**extras, **upd_ex}
        else:
            # sorted-electron index of the event column, reconstructed
            # from the segment start (no (nw, B) index tensor
            # materialized)
            idx_ev = jnp.clip(
                w_start + bi * B + jnp.clip(k_ev, 0, B - 1), 0, n_e - 1
            )
            ev_idx = jnp.where(event, idx_ev.astype(jnp.int32), ev_idx)
        return (new_abs, new_st, done | event, ev_kind, ev_idx, extras)

    init = (
        w_tau_abs0,
        w_tau_st0,
        jnp.zeros(nw, bool),
        jnp.zeros(nw, jnp.int32),
        jnp.zeros(nw, jnp.int32),
        {
            nm: jnp.zeros(nw, jnp.int32 if nm == "ev_dev" else dtype)
            for nm in extra_names
        },
    )
    if "walk" in _ablate:
        tau_abs, tau_st, done, ev_kind, ev_idx, ev_extras = init
    else:
        tau_abs, tau_st, done, ev_kind, ev_idx, ev_extras = lax.fori_loop(
            0, nb, body, init
        )

    # --- event-capacity deferral ---------------------------------------
    # At most EVC events fire per device per step: an event whose rank
    # exceeds EVC is CANCELLED — the photon's depths are restored to
    # their pre-walk values, no kick/kill/copy happens, and it re-walks
    # (and near-certainly re-fires) next step.  A pure counted delay,
    # like the active-set deferrals.  This hard bound is what lets the
    # kick run UNCONDITIONALLY in (EVC,)-row event space: the old
    # ``lax.cond(n_ev <= EVC, small, full)`` carried ~13 full
    # buffer-length operands, which XLA:TPU allocates on the VMEM stack
    # inside the scanned step — at 8.39M rows that is 13 x 42 MB and
    # the program cannot compile at all (r4 qed-8m RESOURCE_EXHAUSTED,
    # reproduced chiplessly via bench --aot).
    from .ops.deposit import _cumsum_cols as _cs

    nw_len = ev_kind.shape[0]
    EVC = min(
        int(getattr(opt, "absorption_event_capacity", 0) or 4096), nw_len
    )
    ev_live = ev_kind > 0
    ev_rank = _cs(ev_live.astype(jnp.int32)[:, None])[:, 0] - 1
    ev_over = ev_live & (ev_rank >= EVC)
    tau_abs = jnp.where(ev_over, w_tau_abs0, tau_abs).astype(tau_abs.dtype)
    tau_st = jnp.where(ev_over, w_tau_st0, tau_st).astype(tau_st.dtype)
    ev_kind = jnp.where(ev_over, 0, ev_kind)
    n_ev_deferred = jnp.sum(ev_over.astype(jnp.int32))

    if compact:
        # Scatter the walked depths back; photons beyond the active
        # capacity keep their depths and fire no event.  EVENT
        # APPLICATION (kicks, bookkeeping masks, stimulated copies,
        # event records) stays in the (A,)-row working space: the
        # full-length formulation costs ~n_ph scatter/gather rows per
        # step even when no event fired (the kick alone is 3
        # buffer-length scatter-adds).
        if "scatter" in _ablate:
            full_tau_abs, full_tau_st = ph.tau_abs, ph.tau_st
        else:
            full_tau_abs = ph.tau_abs.at[atab].set(tau_abs, mode="drop")
            full_tau_st = ph.tau_st.at[atab].set(tau_st, mode="drop")
        gp = lambda a: a[wi]          # photon column -> working rows
        ph_u_w = w_k4[:, 1:4]
        ph_w_w = w_weight
    else:
        full_tau_abs, full_tau_st = tau_abs, tau_st
        gp = lambda a: a
        ph_u_w = ph_u
        ph_w_w = ph.weight

    absorbed = ev_kind == 1          # (working length)
    stimulated = ev_kind == 2

    # --- optional per-event records (interactions.rs:267-289) ----------
    events = None
    if want_events:
        want = jnp.zeros_like(absorbed)
        if opt.extra_absorption_output:
            want = want | absorbed
        if opt.extra_stimulated_emission_output:
            want = want | stimulated
        ai = 0 if (axis_index is None or replicated) else axis_index
        x_glob = geom.xmin + (
            ai * geom.n_loc + gp(ph.cell) - geom.interior_start
            + gp(ph.x)
        ) * geom.dx
        if replicated:
            # the partner's columns rode the walk carry (it may live
            # on another device)
            p4_ev = jnp.stack(
                [ev_extras["ev_g"], ev_extras["ev_ux"],
                 ev_extras["ev_uy"], ev_extras["ev_uz"]], axis=1
            )
            chi_ev = ev_extras["ev_chie"]
        else:
            ev_e_rec = order[ev_idx]  # unsorted electron index
            p4_ev = jnp.stack(
                [e.gamma[ev_e_rec], e.ux[ev_e_rec], e.uy[ev_e_rec],
                 e.uz[ev_e_rec]], axis=1
            )
            chi_ev = e.chi[ev_e_rec]
        nw_rec = want.shape[0]
        rec = jnp.concatenate(
            [
                x_glob[:, None],
                jnp.full((nw_rec, 1), t, dtype),
                gp(ph.birth_time)[:, None],
                w_chi[:, None].astype(dtype),
                w_k4.astype(dtype),
                chi_ev[:, None].astype(dtype),
                p4_ev.astype(dtype),
                ev_kind[:, None].astype(dtype),
            ],
            axis=1,
        )
        events = (rec, want)

    # --- event space ---------------------------------------------------
    # Events are rare (exponential depths against ~1e-3 per-step
    # decrements), yet the kick/copy machinery was sized by the WALK
    # length: the partner-index and weight gathers, three kick scatters
    # and the stimulated-copy construction + insert all carried nw rows
    # per step even with ZERO events (ablation-measured: kicks 29 ms +
    # insert 99 ms of the 377 ms pass at 2.1M/655k on v5e).  Compact
    # the events to EVC rows: kicks run in event space whenever the
    # step's event count fits (lax.cond — exact either way, and the
    # cond operands are columns, not walk-length arrays); stimulated
    # copies are capacity-bounded per step like every other buffer
    # (overflow counted, never silent).
    from .ops.fused import misfit_compact as _mc

    ev_any = absorbed | stimulated
    etab2, _evovf = _mc(ev_any.astype(jnp.float32), EVC)
    vj = etab2 < nw_len
    j = jnp.clip(etab2, 0, nw_len - 1)
    abs_j = absorbed[j] & vj
    stim_j = stimulated[j] & vj
    if replicated:
        # the partner may be remote: row/weight rode the walk carry
        tgt = jnp.where(vj, ev_idx[j], n_e)
        tgt_c = jnp.clip(tgt, 0, n_e - 1)
        w_e_j = jnp.where(vj, ev_extras["ev_we"][j], 1.0)
        tgt_dev = jnp.where(vj, ev_extras["ev_dev"][j], -1)
    else:
        tgt = jnp.where(vj, order[jnp.clip(ev_idx[j], 0, n_e - 1)], n_e)
        tgt_c = jnp.clip(tgt, 0, n_e - 1)
        w_e_j = jnp.where(vj, e.weight[tgt_c], 1.0)
    k_u_j = ph_u_w[j]
    w_ph_j = ph_w_w[j]
    scale_abs_j = w_ph_j / jnp.maximum(w_e_j, _tiny(w_e_j.dtype))
    du_j = jnp.where(
        abs_j[:, None], scale_abs_j[:, None] * k_u_j,
        jnp.where(stim_j[:, None], -k_u_j, 0.0),
    )

    # --- electron kicks (electron.rs:256-262, interactions.rs:322-334) -
    # absorbed: du = (w_ph / w_e) * k ; stimulated: du = -k
    kick_lost = jnp.zeros((), jnp.int32)
    if replicated and "kicks" not in _ablate:
        # route kick records to their owners: all devices exchange the
        # tiny (EVC, 6) tables and each applies the rows targeting
        # itself.  Events beyond EVC would lose their electron kick
        # (the photon side already fired) — counted as losses.
        my = lax.axis_index(axis_name)
        act = (abs_j | stim_j).astype(dtype)
        recs = jnp.concatenate(
            [
                du_j.astype(dtype),
                tgt_c.astype(dtype)[:, None],
                tgt_dev.astype(dtype)[:, None],
                act[:, None],
            ],
            axis=1,
        )
        flat = lax.all_gather(recs, axis_name).reshape(-1, 6)
        mine = (flat[:, 4] == my.astype(dtype)) & (flat[:, 5] > 0.5)
        rtgt = jnp.where(mine, flat[:, 3].astype(jnp.int32), n_e)
        rtgt_c = jnp.clip(rtgt, 0, n_e - 1)
        ux1 = e.ux.at[rtgt].add(flat[:, 0].astype(e.ux.dtype), mode="drop")
        uy1 = e.uy.at[rtgt].add(flat[:, 1].astype(e.uy.dtype), mode="drop")
        uz1 = e.uz.at[rtgt].add(flat[:, 2].astype(e.uz.dtype), mode="drop")
        gx, gy, gz = ux1[rtgt_c], uy1[rtgt_c], uz1[rtgt_c]
        gnew = jnp.sqrt(1.0 + gx * gx + gy * gy + gz * gz)
        g1 = e.gamma.at[rtgt].set(gnew.astype(e.gamma.dtype), mode="drop")
        e = dataclasses.replace(e, ux=ux1, uy=uy1, uz=uz1, gamma=g1)
        # the event-capacity deferral bounds fired events at EVC, so
        # every kick record has a routing row — nothing can be lost
    elif "kicks" not in _ablate:
        # event-space kick, unconditional: the event-capacity deferral
        # above guarantees every fired event has a row in etab2
        ux1 = e.ux.at[tgt].add(du_j[:, 0].astype(e.ux.dtype), mode="drop")
        uy1 = e.uy.at[tgt].add(du_j[:, 1].astype(e.uy.dtype), mode="drop")
        uz1 = e.uz.at[tgt].add(du_j[:, 2].astype(e.uz.dtype), mode="drop")
        # gamma refresh at the kicked rows only; duplicate targets
        # resolve to the same value (recomputed from post-add u)
        gx, gy, gz = ux1[tgt_c], uy1[tgt_c], uz1[tgt_c]
        gnew = jnp.sqrt(1.0 + gx * gx + gy * gy + gz * gz)
        g1 = e.gamma.at[tgt].set(gnew.astype(e.gamma.dtype), mode="drop")
        e = dataclasses.replace(e, ux=ux1, uy=uy1, uz=uz1, gamma=g1)

    # --- photon bookkeeping -------------------------------------------
    if compact:
        # full-length kill mask from the working rows (one bool scatter)
        absorbed_full = jnp.zeros(n_ph, bool).at[atab].set(
            absorbed, mode="drop"
        )
    else:
        absorbed_full = absorbed
    if "book" not in _ablate:
        ph = dataclasses.replace(
            ph,
            tau_abs=full_tau_abs,
            tau_st=full_tau_st,
            alive=ph.alive & ~absorbed_full,
            weight=jnp.where(absorbed_full, 0.0, ph.weight),
            ux=jnp.where(absorbed_full, 0.0, ph.ux),
            uy=jnp.where(absorbed_full, 0.0, ph.uy),
            uz=jnp.where(absorbed_full, 0.0, ph.uz),
            cell=jnp.where(absorbed_full, 0, ph.cell),
        )

    # stimulated copies in event space: same momentum, electron's
    # weight, fresh depths.  The seed columns are EVC-row gathers and
    # the insert scatters at most EVC rows into dead slots (the old
    # working-length formulation staged the ENTIRE photon buffer
    # through insert() every step).  An absorbed row is never
    # stimulated, so the post-kill gathers only matter where stim_j is
    # set — and those rows are untouched.  Stimulated events beyond
    # EVC per step are dropped AND counted (the reference appends all,
    # interactions.rs:311-317; capacity overflow here is surfaced like
    # every other buffer bound, never silent).
    if not opt.stimulated_emission:
        # statically off (the no_stimulated_emission feature): no event
        # can be kind 2, so skip the copy construction + insert outright
        overflow = jnp.zeros((), jnp.int32)
    else:
        ks = jax.random.split(jax.random.fold_in(key, 2_000_003), 2)
        src = wi[j] if compact else j    # photon-buffer row of the seed
        gb = lambda a: a[src]
        buf = ParticleState(
            cell=gb(ph.cell),
            x=gb(ph.x),
            prev_x=gb(ph.prev_x),
            y=gb(ph.y),
            z=gb(ph.z),
            weight=w_e_j.astype(dtype),
            ux=k_u_j[:, 0].astype(dtype),
            uy=k_u_j[:, 1].astype(dtype),
            uz=k_u_j[:, 2].astype(dtype),
            gamma=w_k4[j, 0].astype(dtype),
            chi=w_chi[j].astype(dtype),
            tau=None,
            tau_abs=jax.random.exponential(ks[0], (EVC,), dtype),
            tau_st=jax.random.exponential(ks[1], (EVC,), dtype),
            work=None,
            birth_time=jnp.full(EVC, t, dtype),
            alive=stim_j,
            # stimulated copy inherits the seed photon's polarization
            pol=gb(ph.pol),
            basis=gb(ph.basis),
        )
        if "insert" in _ablate:
            overflow = jnp.zeros((), jnp.int32)
        else:
            ph, overflow = insert(ph, buf, stim_j)
            overflow = overflow + jnp.sum(stimulated) - jnp.sum(stim_j)
    out_species = {**species, "electron": e, "photon": ph}
    overflow = overflow + kick_lost
    deferred = overflow_pairs + aovf + n_ev_deferred
    if events is not None:
        return out_species, overflow, deferred, events
    return out_species, overflow, deferred
