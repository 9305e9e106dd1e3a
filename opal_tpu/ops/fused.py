"""Fused gather+push+deposit Pallas kernel (the PIC hot loop on TPU).

One kernel pass per particle block does what three XLA passes
(``ops.interp.fields_at`` -> ``ops.pusher.vay_push`` ->
``ops.deposit.deposit_sorted``) did: the particle columns are read from
HBM once, the field slab stays resident in VMEM, and the deposited
currents accumulate into a VMEM output slab.  Measured on v5e at 2.1M
particles: 1.6 ms vs 21.7 ms for the unfused (already sort-free)
chain — the unfused path pays ~15 full-length HBM round trips for
intermediates (gathered fields, 15 deposition values, cumsums) that
never leave VMEM here.

Reference semantics (same as the unfused ops): staggered b-spline field
interpolation ``src/grid/yee.rs:499-529``, Vay push
``src/particle/electron.rs:268-330``, charge-conserving deposition
``src/grid/yee.rs:551-641`` (including its stencil quirks — see
``ops/deposit.py``).

Requirements and shape contract
-------------------------------
* f32 only (Mosaic has no f64 path); f64 runs use the unfused ops.
* particle columns are (capacity,) arrays with capacity % BS == 0,
  viewed as (capacity/128, 128) tiles; BS particles per grid step.
* particles are *approximately* cell-sorted: per block b the kernel
  only sees field rows [base_b, base_b + W).  ``base`` comes from the
  per-block ``anchors`` (exact block minima when the state is sorted,
  see ``parallel.migrate.migrate_sorted``) minus the staleness slack
  ``k`` (steps since the last maintenance sort; cells move <= 1
  cell/step under CFL).  Alive particles outside their block window are
  NOT updated and NOT deposited; they are flagged in the ``miss`` output
  and handled by the caller's compacted fallback pass
  (``Simulation._fused_push_deposit``).
* the field slab is passed as an (n_rows, 8) table: columns
  Ex Ey Ez Bx By Bz 0 0, rows padded by ``PAD`` on both sides so every
  window and deposit row stays in range.

Deposit output layout
---------------------
The kernel accumulates an (n_rows, 16) slab whose 16 columns are the
reference's 15 deposition taps (5 longitudinal-flux cells for jx, 3
b-spline taps each for jy/jz, 3+1 for rho) plus one pad column, each
stored *unshifted* (at the particle's cell row).  :func:`fold_out_slab`
rolls each column by its tap offset and sums into (J, rho).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as const

F32 = jnp.float32

#: extra field-slab rows on each side so base-2 .. base+W+2 never leave
#: the table for any in-domain (or one-cell-out leaver) particle
PAD = 8

# the 16 deposit columns: (tap offset, target) target 0..2 = J xyz,
# 3 = rho, 4 = unused pad — mirrors ops.deposit._particle_values
COLS = (
    (-2, 0), (-1, 0), (0, 0), (1, 0), (2, 0),
    (-1, 1), (0, 1), (1, 1),
    (-1, 2), (0, 2), (1, 2),
    (-1, 3), (0, 3), (1, 3), (-2, 3), (0, 4),
)


class FusedSpec(NamedTuple):
    """Static configuration of one fused-kernel instantiation."""

    block: int          # particles per grid step (BS), multiple of 128
    window: int         # field cells visible per block (W)
    n_rows: int         # field table rows (n_slab + 2*PAD)
    dx: float
    dt: float
    charge: float       # species charge (for q/m in the push)
    mass: float
    pusher: str = "vay"  # "vay" (electrons) or "boris" (ions)
    # row offset: field-table row = particle cell + row_off
    # (HALO + PAD); the kernel does the shift itself so the caller
    # never materializes offset copies of the cell column
    row_off: int = 0
    # species charge sign/magnitude is folded into the macrocharge
    # inside the kernel: q = weight * charge (dead rows carry weight 0
    # — an invariant kept by initialization, migration retire and the
    # sort placeholder rows)
    # profiling ONLY: skip the deposit section (values + one-hot +
    # matmul) to attribute kernel time
    dep_skip: bool = False
    # non-QED fast path: skip the chi / gamma-half outputs AND their
    # compute (two extra sqrt + ~30 flops of the Vay push are only
    # needed to feed the optical-depth/absorption machinery,
    # electron.rs:283-287) and the prev_x output (consumed by nothing
    # between steps — deposition uses it in-kernel, the maintenance
    # sort rebuilds it as the sorted x, and only the QED event log
    # reads it back).  The caller carries chi/prev_x unchanged and
    # refreshes chi lazily at output time (Simulation.refresh_chi).
    lite: bool = False
    # carry + integrate the work column (electron.rs:278-280).  Off for
    # species that do not track work (ions: the Boris push leaves it
    # untouched, so reading+writing the column back is pure HBM waste).
    work_out: bool = True
    # compensated-work mode: the kernel outputs the per-step work
    # INCREMENT (no work input leg) and the caller accumulates it into
    # a work column wider than the particle state (f64 under the CLI's
    # mixed precision) — f32 in-kernel accumulation over 1e4+ steps is
    # the measured ledger-precision limiter (BASELINE.md r4: mixed
    # 4.4e-5 vs f64 9.1e-7 against the 1e-5 target of electron.rs:
    # 278-287's work integral).  Off (the default) keeps the legacy
    # accumulate-in-kernel path: all-f32 runs carry one fewer
    # full-length add outside the kernel.
    work_inc: bool = False
    # field gather via one-hot MXU matmul instead of the W-cell
    # select-sum loop: the b-spline has only 4 live taps (rel-1 ..
    # rel+2), so one (block x (W+4)) one-hot contracted against four
    # k-shifted copies of the window fetches exactly those taps on the
    # MXU, and the VPU only evaluates the 8 tap weights + 20 FMAs —
    # W-INDEPENDENT, vs ~22*W ops/particle for the loop.
    mxu_gather: bool = False
    # the fully-unrolled static W-loop gather (default) vs the dynamic
    # span-bounded fori_loop: the r5b hardware A/B measured the dynamic
    # loop 7.3% SLOWER end-to-end (1.204e9 vs 1.298e9 pushes/s at
    # 8.39M) — Mosaic software-pipelines the unrolled loop across
    # window cells, while a serial dynamic loop pays per-iteration
    # control + scalar-load overhead that exceeds the dead-tap savings
    # at W=16/span~2.  Kept as a knob for wide-window decks where the
    # span/W ratio is far smaller.
    static_gather: bool = True
    # logical blocks (window/anchor granularity) per grid program: the
    # kernel body loops over ``subblocks`` consecutive blocks, each
    # with its own window base.  Cuts the program count (and with it
    # the per-program DMA-issue/grid overhead) by the same factor
    # WITHOUT widening the window — at 8.4M particles and block=4096
    # the step runs 2048 programs, and per-program overhead is a
    # leading kernel cost candidate (see BASELINE.md r2e sweep).
    subblocks: int = 1


#: scalar literals fed to jnp.* ufuncs inside kernel code MUST be f32:
#: under jax_enable_x64 a Python float becomes a weak-f64 scalar whose
#: f32 conversion lands inside the jnp wrapper's sub-jaxpr, and Mosaic
#: has no f64->f32 cast (RecursionError through _convert_helper at
#: lowering).  Plain binary ops (a * 1.5) fold at trace time and are
#: safe; jnp.where/maximum/minimum with literal operands are not.
_ZERO = np.float32(0.0)
_ONE = np.float32(1.0)
_IM1 = np.int32(-1)
_IP1 = np.int32(1)
#: also used in BlockSpec index maps: a literal ``0`` there becomes an
#: i64 constant under jax_enable_x64 and Mosaic fails to legalize the
#: transform function (2026-08-19 hardware compile failure on every
#: default-precision CLI run)
_IZ = np.int32(0)


def _full_vmem(shape):
    """Whole-array VMEM BlockSpec with an EXPLICIT i32-zero index map.

    ``pl.BlockSpec(memory_space=pltpu.VMEM)`` makes JAX synthesize the
    index map, whose zero constants are i64 under jax_enable_x64 —
    Mosaic then fails to legalize the transform function exactly like
    a user map returning a literal ``0`` (see ``_IZ``)."""
    return pl.BlockSpec(
        shape, lambda i, c: (_IZ,) * len(shape), memory_space=pltpu.VMEM
    )


def _vmem_limit(spec: FusedSpec, n_cols: int, nblk: int) -> int:
    """Scoped-VMEM budget for one kernel instantiation.

    XLA RESERVES the full ``vmem_limit_bytes`` for the custom call: a
    flat 64 MB grab compiled fine on shallow grids but exhausted VMEM
    (128 MB on v5e) on deep-grid QED decks — nx = 65k at the 8.39M
    bench makes the resident (n_rows, 8) field table + (n_rows, 16)
    out-slab alone 6.3 MB, and the surrounding while body's own
    buffers no longer fit next to a 64 MB reservation ("allocating on
    stack for closed_call" RESOURCE_EXHAUSTED at every qed-8m
    compile).  Budget = double-buffered per-program particle blocks +
    2x EVERY resident full-VMEM ref (eb table, out slab, AND the
    (nblk, 128) amin output — 2.1 MB alone at 8.39M/blk2048) + a
    Mosaic scratch margin, floored at 24 MB (the measured QED-shape
    scratch need is ~17 MB, r2b) and capped at the old 64 MB.

    The margin is calibrated, not derived: the r5a capture measured
    the qed-8m (non-lite, blk2048 x sub4, nx 65k) shape's true Mosaic
    need at 35.89 MB, ~17 MB above the accountable blocks+refs — the
    non-lite kernel's extra output legs and QED-deck temporaries live
    entirely in scratch Mosaic does not itemize.  20 MB non-lite
    covers that point with headroom; lite kernels keep the 8 MB
    margin so the tuned non-QED declaration (~33 MB at bench shape)
    barely moves."""
    blocks = spec.block * spec.subblocks * n_cols * 4 * 2
    tables = 2 * (spec.n_rows * (8 + 16) * 4 + nblk * 128 * 4)
    need = blocks + tables + ((8 if spec.lite else 20) << 20)
    # deep grids: Mosaic's unitemized scratch tracks the resident
    # table size (hole_boring nx=20k lite measured 29.28 MB against a
    # 27.88 MB declaration, r5g) — add one more tables-worth there.
    # Gated at n_rows > 4096 so every shallow-grid program (the
    # hardware-verified bench configs) keeps a byte-identical
    # declaration.
    if spec.n_rows > 4096:
        need += tables
    return max(24 << 20, min(64 << 20, need))


def _reach_rows(spec: FusedSpec):
    """Static [lo, hi] bounds (table-row space) of cells whose deposit
    taps stay inside the [-HALO, n_loc + HALO) current slab after
    :func:`fold_out_slab` trims the PAD rows: cell in
    [-HALO+2, n_loc+HALO-3].  row_off = HALO + PAD, n_rows =
    n_loc + 2*HALO + 2*PAD."""
    return np.int32(PAD + 2), np.int32(spec.n_rows - PAD - 3)


def _w2(xh):
    """Second-order b-spline weight (``yee.rs:140-149``)."""
    a = jnp.abs(xh)
    inner = 0.75 - a * a
    outer = 1.125 - 1.5 * a + 0.5 * a * a
    return jnp.where(a > 1.5, _ZERO, jnp.where(a < 0.5, inner, outer))


def _copysign(v, s):
    """|v| with the sign of s, signed-zero aware, without bool-valued
    selects (Mosaic cannot truncate i8->i1 vectors): s=±0 is replaced
    by 1/s=±inf before the sign test."""
    sgn = jnp.where(s == 0.0, 1.0 / s, s)
    return jnp.where(sgn > 0.0, jnp.abs(v), -jnp.abs(v))


def _flux(x_i, x_f):
    """Boundary-crossing flux of the triangular shape (``yee.rs:185-204``)."""
    ai, af = jnp.abs(x_i), jnp.abs(x_f)
    v1 = _copysign(0.5 * (1.0 - ai) ** 2, -x_i)
    v2 = _copysign(0.5 * (1.0 - af) ** 2 - 0.5 * (1.0 - ai) ** 2, x_i - x_f)
    v3 = _copysign(ai * (1.0 - 0.5 * ai) + af * (1.0 - 0.5 * af), x_i)
    v4 = _copysign(0.5 * (1.0 - af) ** 2, x_f)
    inner_i = ai < 1.0
    inner_f = af < 1.0
    same = x_i * x_f >= 0.0
    return jnp.where(
        inner_i, jnp.where(~inner_f, v1, jnp.where(same, v2, v3)),
        jnp.where(inner_f, v4, _ZERO),
    )


def _gather_fields_static(spec, eb_ref, base, rel, relf, x, fitf):
    """The static select-sum gather: a fully unrolled W-cell loop
    (the DEFAULT — see FusedSpec.static_gather for the measured
    verdict vs the dynamic variant; results are bitwise identical —
    the dynamic loop's skipped taps contribute exact zeros)."""
    W = spec.window
    win = eb_ref[pl.ds(base, W), :]       # (W, 8): Ex Ey Ez Bx By Bz 0 0
    d = relf + x
    Ex = jnp.zeros_like(x); Ey = jnp.zeros_like(x); Ez = jnp.zeros_like(x)
    Bx = jnp.zeros_like(x); By = jnp.zeros_like(x); Bz = jnp.zeros_like(x)
    for wdx in range(W):
        ce = _w2(d - wdx)                 # edge taps (Ey, Ez)
        cc = _w2(d - wdx - 0.5)           # centred taps (Ex, By, Bz)
        Ex += cc * win[wdx, 0]
        Ey += ce * win[wdx, 1]
        Ez += ce * win[wdx, 2]
        By += cc * win[wdx, 4]
        Bz += cc * win[wdx, 5]
        Bx += jnp.where(rel == wdx, win[wdx, 3], _ZERO)
    return (Ex * fitf, Ey * fitf, Ez * fitf,
            Bx * fitf, By * fitf, Bz * fitf)


def _gather_fields(spec: FusedSpec, eb_ref, base, rel, relf, x, fitf):
    """Select-sum field gather over the block's LIVE cell span
    (staggered b-spline taps, ``yee.rs:499-529``).

    The window W is a capacity, not the working set: a sorted bench
    block spans only ~gap+dispersion cells (2-8 at dense npc), so a
    static W-iteration loop wastes ~17 VPU ops/particle on every dead
    cell.  The loop runs as a dynamic ``fori_loop`` over
    [min_rel - 1, max_rel + 2] of the FIT rows (the b-spline's tap
    support), cutting gather compute from O(W) to O(span) while W
    only costs VMEM — which lets the window widen (fewer misfits)
    without paying compute."""
    W = spec.window
    d = relf + x
    fit = fitf != 0.0
    # tap support of fit rows only: misfit rows must not widen the
    # loop.  ALL literals as np.int32: under jax_enable_x64 a bare int
    # inside jnp.where/maximum/minimum becomes a weak i64 scalar whose
    # i32 conversion Mosaic cannot lower (see the _ZERO note above —
    # this exact class killed the r5a two-stream-full stage).
    rel_f = jnp.where(fit, rel, np.int32(W - 3))
    lo = jnp.maximum(jnp.min(rel_f) - _IP1, _IZ)
    rel_c = jnp.where(fit, rel, _IP1)
    hi = jnp.minimum(jnp.max(rel_c) + np.int32(3), np.int32(W))  # excl.

    def body(wdx, acc):
        Ex, Ey, Ez, Bx, By, Bz = acc
        wf = wdx.astype(F32)
        r = base + wdx
        ce = _w2(d - wf)                  # edge taps (Ey, Ez)
        cc = _w2(d - wf - 0.5)            # centred taps (Ex, By, Bz)
        Ex += cc * eb_ref[r, 0]
        Ey += ce * eb_ref[r, 1]
        Ez += ce * eb_ref[r, 2]
        By += cc * eb_ref[r, 4]
        Bz += cc * eb_ref[r, 5]
        Bx += jnp.where(rel == wdx, eb_ref[r, 3], _ZERO)
        return (Ex, Ey, Ez, Bx, By, Bz)

    z = jnp.zeros_like(x)
    Ex, Ey, Ez, Bx, By, Bz = lax.fori_loop(
        lo, hi, body, (z, z, z, z, z, z)
    )
    return (Ex * fitf, Ey * fitf, Ez * fitf,
            Bx * fitf, By * fitf, Bz * fitf)


def _gather_fields_mxu(spec: FusedSpec, eb_ref, base, rel, relf, x, fitf):
    """Staggered b-spline gather as one one-hot MXU contraction.

    The spline support is 4 cells (offsets -1..+2 of ``rel``), so the
    W-cell select-sum loop wastes ~22*W VPU ops/particle on taps that
    are zero.  Here a (block, W) one-hot of ``rel`` is contracted once
    against four k-shifted copies of the window (concatenated to
    (W, 32)), landing exactly the 4 live rows x 8 field columns per
    particle in the MXU; the VPU then evaluates only the 8 tap weights
    and ~20 FMAs — independent of W.

    Bounds: fit rows have rel in [1, W-3], so the one-hot lane j = rel
    is in range; the k-shifted slices span rows [base-1, base+W+2),
    inside the table for any anchor in block_anchors' clip range
    [2, n_rows-W-2].  Non-fit rows either miss the one-hot entirely
    (G = 0) or are zeroed by ``fitf`` like the loop path."""
    W = spec.window
    RB = spec.block // 128
    j_iota = lax.broadcasted_iota(jnp.int32, (RB, W, 128), 1)
    O1 = (rel[:, None, :] == j_iota).astype(F32)
    # Wcat[j, 8k+c] = eb[base + (k-1) + j, c]  ->  G[p, 8k+c] =
    # eb[base + rel + (k-1), c], tap offsets k-1 in {-1, 0, 1, 2}
    Wcat = jnp.concatenate(
        [eb_ref[pl.ds(base + k - 1, W), :] for k in range(4)], axis=1
    )
    G = lax.dot_general(
        O1, Wcat, (((1,), (0,)), ((), ())), preferred_element_type=F32
    )  # (RB, 128, 32): per particle the 4 tap rows x 8 field columns
    # tap weights: edge taps at d - wdx, centred at d - wdx - 0.5 for
    # wdx = rel + (k-1); computed EXACTLY like the loop path (d first,
    # then subtract the integer tap index, both f32) so the two gather
    # paths agree bitwise.  _w2's 1.5-cell support covers these 4 taps.
    d = relf + x
    we = [_w2(d - (relf + np.float32(k - 1))) for k in range(4)]
    wc = [_w2(d - (relf + np.float32(k - 1)) - 0.5) for k in range(4)]
    g = lambda k, c: G[:, :, 8 * k + c]
    Ex = sum(wc[k] * g(k, 0) for k in range(4))
    Ey = sum(we[k] * g(k, 1) for k in range(4))
    Ez = sum(we[k] * g(k, 2) for k in range(4))
    Bx = g(1, 3)  # nearest-cell select: tap offset 0 is slice k=1
    By = sum(wc[k] * g(k, 4) for k in range(4))
    Bz = sum(wc[k] * g(k, 5) for k in range(4))
    return (Ex * fitf, Ey * fitf, Ez * fitf,
            Bx * fitf, By * fitf, Bz * fitf)


def _out_names(spec: FusedSpec):
    """Kernel output legs in positional order, per the spec flags."""
    names = ["ncell", "nx"]
    if not spec.lite:
        names.append("npx")
    names += ["ny", "nz", "nux", "nuy", "nuz", "ng"]
    if spec.work_out:
        names.append("nwork")
    if not spec.lite:
        names += ["ngh", "nchi"]
    names += ["miss", "amin", "out"]
    return names


def _kernel(spec: FusedSpec, c0_ref, *refs):
    # positional refs vary with the spec flags — unpack by name
    in_names = ["cell", "x", "y", "z", "ux", "uy", "uz", "g", "q"]
    if spec.work_out and not spec.work_inc:
        in_names.append("work")
    in_names.append("eb")
    out_names = _out_names(spec)
    r = dict(zip(in_names + out_names, refs))
    out_ref = r["out"]

    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.zeros((spec.n_rows, 16), F32)

    # one program serves ``subblocks`` consecutive logical blocks, each
    # with its own window base (FusedSpec.subblocks) — the loop is
    # unrolled at trace time over static row slices
    RBs = spec.block // 128
    for kb in range(spec.subblocks):
        _kernel_block(
            spec, r, c0_ref, b * spec.subblocks + kb,
            slice(kb * RBs, (kb + 1) * RBs),
        )


def _kernel_block(spec: FusedSpec, r, c0_ref, blk, sl):
    """Gather+push+deposit for ONE logical block: ``blk`` its index in
    the anchors/amin tables, ``sl`` its static row slice within the
    program's refs."""
    W = spec.window
    dt, dx = spec.dt, spec.dx
    C = const.SPEED_OF_LIGHT
    eb_ref, out_ref, amin_ref = r["eb"], r["out"], r["amin"]
    base = c0_ref[blk]

    cell = r["cell"][sl, :] + spec.row_off  # field-table row index
    rel = cell - base
    relf = rel.astype(F32)
    x = r["x"][sl, :]
    ux, uy, uz = r["ux"][sl, :], r["uy"][sl, :], r["uz"][sl, :]
    g = r["g"][sl, :]
    q = r["q"][sl, :] * F32(spec.charge)  # macrocharge from the weight

    # the kernel's TRUE bounds: the b-spline taps live at window rows
    # [rel-1, rel+2], so any rel in [1, W-3] gathers and deposits
    # correctly (deposit covers reln in [-2, W+1] via the padded
    # out-slab write).  Round 2 shipped [3, W-4] with a -4 re-anchor —
    # 4 cells of pure waste whose auto-window formula then broke
    # physics at the shipped defaults (VERDICT r2 weak #1).
    # Deposit REACH bound (r4): a fit row's folded taps must land in
    # the [-HALO, n_loc + HALO) current slab, i.e. cell in
    # [-HALO+2, n_loc+HALO-3] — beyond that fold_out_slab trims the
    # tap into the PAD region and charge would vanish silently.  With
    # migration deferred to the sort cadence (slow-drift decks,
    # SimOptions.max_drift_cells_per_step) rows CAN roam that far; the
    # fallback pushes them and counts their dropped taps as losses.
    lo_row, hi_row = _reach_rows(spec)
    fit = (
        (rel >= 1) & (rel <= W - 3)
        & (cell >= lo_row) & (cell <= hi_row)
    )
    miss = (q != 0.0) & ~fit
    upd = fit & (q != 0.0)

    # ---- field gather: select-sum loop or one-hot MXU contraction ---
    fitf = fit.astype(F32)
    _gather = (
        _gather_fields_mxu if spec.mxu_gather
        else _gather_fields_static if spec.static_gather
        else _gather_fields
    )
    Ex, Ey, Ez, Bx, By, Bz = _gather(
        spec, eb_ref, base, rel, relf, x, fitf
    )

    # work_inc: seed the integral at zero so _push_core's accumulate
    # yields the bare increment (the caller owns the wide accumulator)
    work_in = (
        None if not spec.work_out
        else jnp.zeros_like(ux) if spec.work_inc
        else r["work"][sl, :]
    )
    (unx, uny, unz, gn, ign, gh, chi, work, vty, vtz) = _push_core(
        spec, ux, uy, uz, g, work_in, Ex, Ey, Ez, Bx, By, Bz,
        lite=spec.lite,
    )

    prev = x
    xn = x + F32(C * dt / dx) * unx * ign
    fl = jnp.floor(xn)
    shift = jnp.where(
        fl < 0.0, _IM1, jnp.where(fl > 0.0, _IP1, _IZ)
    ).astype(cell.dtype)
    celln = cell + shift
    xn = xn - fl
    prevn = prev - fl

    r["ncell"][sl, :] = jnp.where(upd, celln, cell) - spec.row_off
    r["nx"][sl, :] = jnp.where(upd, xn, x)
    y_in, z_in = r["y"][sl, :], r["z"][sl, :]
    r["ny"][sl, :] = jnp.where(upd, y_in + vty * dt, y_in)
    r["nz"][sl, :] = jnp.where(upd, z_in + vtz * dt, z_in)
    r["nux"][sl, :] = jnp.where(upd, unx, ux)
    r["nuy"][sl, :] = jnp.where(upd, uny, uy)
    r["nuz"][sl, :] = jnp.where(upd, unz, uz)
    r["ng"][sl, :] = jnp.where(upd, gn, g)
    if not spec.lite:
        r["npx"][sl, :] = jnp.where(upd, prevn, x)
        # chi and gamma_half feed the OUT-OF-KERNEL optical-depth
        # update (qed.emission.rate): rate(chi=0) = 0, so zeroed
        # non-updated rows are naturally inert there
        r["ngh"][sl, :] = jnp.where(upd, gh, _ONE)
        r["nchi"][sl, :] = jnp.where(upd, chi, _ZERO)
    if spec.work_out:
        r["nwork"][sl, :] = (
            jnp.where(upd, work, work_in) if work is not None else work_in
        )
    r["miss"][sl, :] = miss.astype(F32)
    # exact per-block minimum of the post-push cell rows (fit rows
    # only, so stray arrivals cannot drag a block's window away from
    # its bulk); feeds the NEXT step's window base = min - 1, keeping
    # rel >= 1.  A block with NO fit rows recovers via the alive-row
    # cell minimum instead of the n_rows sentinel: round 2's sentinel
    # path poisoned the anchor permanently (clip parked it at the
    # table top and every row missed until the next maintenance sort,
    # VERDICT r2 weak #1).
    sent = np.int32(spec.n_rows)
    amin_fit = jnp.min(jnp.where(upd, celln, sent))
    amin_alive = jnp.min(jnp.where(q != 0.0, cell, sent))
    amin_ref[pl.ds(blk, 1), :] = jnp.full(
        (1, 128), jnp.where(amin_fit == sent, amin_alive, amin_fit),
        jnp.int32,
    )

    # ---- deposit: one-hot batched matmul over the window ------------
    if spec.dep_skip:
        return
    qd = jnp.where(upd, q, _ZERO)
    _deposit_block(spec, base, celln, xn, prevn, qd,
                   F32(C) * uny * ign, F32(C) * unz * ign, out_ref)


def _push_core(spec: FusedSpec, ux, uy, uz, g, work_in,
               Ex, Ey, Ez, Bx, By, Bz, *, lite=False):
    """The momentum update shared by both kernel layouts.  Returns
    (unx, uny, unz, gn, ign, gh, chi, work, vty, vtz) — new momentum,
    new gamma and its reciprocal (divides are ~7x a VPU multiply, so
    every 1/gamma consumer shares one), half-step gamma, quantum
    parameter, accumulated work, and the transverse velocities that
    advance y/z.  With ``lite`` the gh/chi/work legs are skipped
    (returned as None) — see FusedSpec.lite."""
    dt = spec.dt
    C = const.SPEED_OF_LIGHT
    alpha = spec.charge * dt / (2.0 * spec.mass * C)
    if spec.pusher == "vay":
        # ---- Vay push (electron.rs:268-330) -------------------------
        ig = 1.0 / g
        vx, vy, vz = C * ux * ig, C * uy * ig, C * uz * ig
        uhx = ux + alpha * (Ex + (vy * Bz - vz * By))
        uhy = uy + alpha * (Ey + (vz * Bx - vx * Bz))
        uhz = uz + alpha * (Ez + (vx * By - vy * Bx))
        gh = work = chi = None
        if (not lite) or work_in is not None:
            gh = jnp.sqrt(1.0 + uhx * uhx + uhy * uhy + uhz * uhz)
        if work_in is not None:
            work = work_in + spec.charge * C * (
                uhx * Ex + uhy * Ey + uhz * Ez
            ) * dt / gh
        if not lite:
            # chi from F.u at the half step
            fx = gh * Ex + C * (uhy * Bz - uhz * By)
            fy = gh * Ey + C * (uhz * Bx - uhx * Bz)
            fz = gh * Ez + C * (uhx * By - uhy * Bx)
            eu = Ex * uhx + Ey * uhy + Ez * uhz
            chi = jnp.sqrt(
                jnp.maximum(fx * fx + fy * fy + fz * fz - eu * eu, _ZERO)
            ) / const.CRITICAL_FIELD

        upx = uhx + alpha * Ex
        upy = uhy + alpha * Ey
        upz = uhz + alpha * Ez
        gp2 = 1.0 + upx * upx + upy * upy + upz * upz
        tvx, tvy, tvz = alpha * C * Bx, alpha * C * By, alpha * C * Bz
        ustar = upx * tvx + upy * tvy + upz * tvz
        t2 = tvx * tvx + tvy * tvy + tvz * tvz
        sig = gp2 - t2
        gn = jnp.sqrt(
            0.5 * sig + jnp.sqrt(0.25 * sig * sig + t2 + ustar * ustar)
        )
        ign = 1.0 / gn
        itx, ity, itz = tvx * ign, tvy * ign, tvz * ign
        s = 1.0 / (1.0 + itx * itx + ity * ity + itz * itz)
        udt = upx * itx + upy * ity + upz * itz
        unx = s * (upx + udt * itx + (upy * itz - upz * ity))
        uny = s * (upy + udt * ity + (upz * itx - upx * itz))
        unz = s * (upz + udt * itz + (upx * ity - upy * itx))
        # transverse positions advance with the OLD velocity
        # (electron.rs:315-316)
        vty, vtz = vy, vz
    else:
        # ---- Boris push (ion.rs:168-214): gamma-1 kept
        # cancellation-free for non-relativistic ions ----------------
        cBx, cBy, cBz = C * Bx, C * By, C * Bz
        umx = ux + alpha * Ex
        umy = uy + alpha * Ey
        umz = uz + alpha * Ez
        um2 = umx * umx + umy * umy + umz * umz
        gam = 1.0 + um2 / (1.0 + jnp.sqrt(1.0 + um2))
        tb = alpha / gam
        upx = umx + tb * (umy * cBz - umz * cBy)
        upy = umy + tb * (umz * cBx - umx * cBz)
        upz = umz + tb * (umx * cBy - umy * cBx)
        cB2 = cBx * cBx + cBy * cBy + cBz * cBz
        tp = 2.0 * tb / (1.0 + tb * tb * cB2)
        uplx = umx + tp * (upy * cBz - upz * cBy)
        uply = umy + tp * (upz * cBx - upx * cBz)
        uplz = umz + tp * (upx * cBy - upy * cBx)
        unx = uplx + alpha * Ex
        uny = uply + alpha * Ey
        unz = uplz + alpha * Ez
        un2 = unx * unx + uny * uny + unz * unz
        gn = 1.0 + un2 / (1.0 + jnp.sqrt(1.0 + un2))
        ign = 1.0 / gn
        if lite:
            chi = gh = work = None
        else:
            chi = jnp.zeros_like(ux)  # ions discard chi (sim parity)
            gh = gam
            work = work_in
        # transverse positions advance with the NEW velocity
        # (ion.rs:208-209)
        vty, vtz = C * uny * ign, C * unz * ign
    return unx, uny, unz, gn, ign, gh, chi, work, vty, vtz


def _deposit_block(spec: FusedSpec, base, celln, xn, prevn, qd, vmy, vmz,
                   out_ref):
    """One block's charge-conserving deposition (one-hot batched MXU
    matmul over the window), accumulated into the (n_rows, 16) slab.
    ``vmy``/``vmz`` are the post-push transverse velocities (callers
    form them from the shared 1/gamma).  The 1/dt and 1/dx factors are
    folded into per-particle prefactors: 15 VPU divides/particle
    otherwise (a divide costs ~7x a multiply)."""
    W = spec.window
    qf = qd * F32(1.0 / spec.dt)
    qx = qd * F32(1.0 / spec.dx)
    qy = qx * vmy
    qz = qx * vmz
    w_m1 = _w2(1.0 + xn)
    w_0 = _w2(xn)
    w_p1 = _w2(1.0 - xn)
    w_q = _w2(2.0 - xn)  # the reference's index-2 rho quirk
    vals = [
        qf * _flux(-1.5 - prevn, -1.5 - xn),
        qf * _flux(-0.5 - prevn, -0.5 - xn),
        qf * _flux(0.5 - prevn, 0.5 - xn),
        qf * _flux(1.5 - prevn, 1.5 - xn),
        qf * _flux(2.5 - prevn, 2.5 - xn),
        qy * w_m1, qy * w_0, qy * w_p1,
        qz * w_m1, qz * w_0, qz * w_p1,
        qx * w_m1, qx * w_0, qx * w_p1, qx * w_q,
        jnp.zeros_like(qd),
    ]
    RB = spec.block // 128
    V = jnp.stack(vals, axis=1)           # (RB, 16, 128)
    j_iota = lax.broadcasted_iota(jnp.int32, (RB, W + 4, 128), 1)
    reln = celln - base
    O = (reln[:, None, :] == j_iota - 2).astype(F32)
    # C3[r, j, c] = sum_lanes O[r, j, l] * V[r, c, l]  (MXU; the
    # swapped (V, O) orientation measured 6.0 vs 5.7 ms at 8.4M)
    C3 = lax.dot_general(
        O, V, (((2,), (2,)), ((0,), (0,))), preferred_element_type=F32
    )
    contrib = jnp.sum(C3, axis=0)          # (W+4, 16)
    out_ref[pl.ds(base - 2, W + 4), :] += contrib


def fused_push_deposit(spec: FusedSpec, anchors, cell, x, y, z, ux, uy,
                       uz, gamma, weight, work, eb_rows,
                       *, interpret=False):
    """Run the fused kernel over all particle blocks.

    Parameters: (capacity,) f32/int32 particle columns (capacity a
    multiple of ``spec.block``), per-block window bases ``anchors``
    (nblocks, i32; already offset so rel = cell - base lands in
    [3, W-4] for sorted particles), and the (n_rows, 8) field table.

    Returns ``(cols, miss, out_slab, anchors_next)`` where cols is a
    dict of updated columns (column set per the spec's lite/work_out
    flags), ``miss`` a f32 0/1 mask of alive-but-out-of-window rows,
    ``out_slab`` the (n_rows, 16) unshifted deposit accumulator, and
    ``anchors_next`` the exact per-block window bases for the next
    step (post-push fit-row cell minima minus CFL slack, clipped to
    the table).
    """
    n = cell.shape[0]
    RB = spec.block // 128
    nblk = n // spec.block
    # effective subblock factor: the largest divisor of the block count
    # not exceeding the requested one (degrade, don't fail — capacities
    # are rounded to fused_block, not to block * subblocks)
    KB = max(
        (k for k in range(1, min(spec.subblocks, nblk) + 1)
         if nblk % k == 0),
        default=1,
    )
    if KB != spec.subblocks:
        spec = spec._replace(subblocks=KB)
    as2d = lambda a, dtyp=F32: a.astype(dtyp).reshape(-1, 128)
    pspec = lambda: pl.BlockSpec(
        (KB * RB, 128), lambda i, c: (i, _IZ), memory_space=pltpu.VMEM
    )
    shape2 = (n // 128, 128)
    onames = _out_names(spec)
    shape_of = {
        "ncell": jax.ShapeDtypeStruct(shape2, jnp.int32),
        "amin": jax.ShapeDtypeStruct((nblk, 128), jnp.int32),
        "out": jax.ShapeDtypeStruct((spec.n_rows, 16), F32),
    }
    out_shapes = [
        shape_of.get(nm, jax.ShapeDtypeStruct(shape2, F32))
        for nm in onames
    ]
    out_specs = [
        # amin/out: full-array VMEM refs, one broadcast row per
        # program: Mosaic rejects sub-(8,128) blocked outputs, and
        # SMEM pads rows to 512 B (a (nblk, 1) SMEM output overflows
        # the 1 MB SMEM)
        _full_vmem(shape_of[nm].shape)
        if nm in ("amin", "out") else pspec()
        for nm in onames
    ]
    ins = [
        as2d(cell, jnp.int32), as2d(x), as2d(y), as2d(z), as2d(ux),
        as2d(uy), as2d(uz), as2d(gamma), as2d(weight),
    ]
    if spec.work_out and not spec.work_inc:
        ins.append(as2d(work))
    ins.append(eb_rows)
    outs = pl.pallas_call(
        functools.partial(_kernel, spec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk // KB,),
            in_specs=[pspec() for _ in range(len(ins) - 1)]
            + [_full_vmem(eb_rows.shape)],
            out_specs=tuple(out_specs),
        ),
        out_shape=tuple(out_shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(
                spec, len(ins) + len(onames), nblk
            )
        ),
        interpret=interpret,
    )(anchors.astype(jnp.int32), *ins)
    o = dict(zip(onames, outs))
    col_of = dict(
        ncell="cell", nx="x", npx="prev_x", ny="y", nz="z", nux="ux",
        nuy="uy", nuz="uz", ng="gamma", nwork="work", ngh="gh",
        nchi="chi",
    )
    cols = {
        col_of[nm]: o[nm].reshape(n) for nm in onames if nm in col_of
    }
    if spec.work_inc and "work" in cols:
        # increment semantics: rename so the caller cannot mistake it
        # for the accumulated integral
        cols["winc"] = cols.pop("work")
    miss, amin, out_slab = o["miss"], o["amin"], o["out"]
    # re-anchor at min - 1: the fit test's lower bound is rel >= 1 and
    # amin IS next step's pre-push minimum (cells move <= 1 cell/step
    # under CFL), so no further slack is needed — every extra cell here
    # is window capacity stolen from the top of the block
    anchors_next = jnp.clip(
        amin[:, 0] - 1, 2, spec.n_rows - spec.window - 2
    ).astype(jnp.int32)
    return cols, miss.reshape(n), out_slab, anchors_next


def make_eb_rows(E_slab, B_slab):
    """(n_slab, 3)+(n_slab, 3) field slabs -> padded (n_rows, 8) table."""
    n_slab = E_slab.shape[0]
    eb = jnp.zeros((n_slab + 2 * PAD, 8), F32)
    eb = eb.at[PAD:PAD + n_slab, 0:3].set(E_slab.astype(F32))
    eb = eb.at[PAD:PAD + n_slab, 3:6].set(B_slab.astype(F32))
    return eb


def fold_out_slab(out_slab):
    """(n_rows, 16) unshifted tap accumulator -> (n_slab, 3) J and
    (n_slab,) rho.  Column c with tap offset ``off`` contributes at
    row + off; rows written by the kernel stay >= 2 away from the
    table edge, so wrapped gather rows are exact (zero).

    All 16 columns are shifted in ONE take_along_axis and assembled in
    one fused elementwise pass — per-column ``jnp.roll``s would be ~26
    tiny kernels, ~1.4 ms of pure launch cost at n_rows ~ 1k on v5e."""
    n_rows = out_slab.shape[0]
    offs = jnp.asarray([off for off, _ in COLS])
    src = (jnp.arange(n_rows)[:, None] - offs[None, :]) % n_rows
    shifted = jnp.take_along_axis(out_slab, src, axis=0)  # (n_rows, 16)
    tgt = [t for _, t in COLS]
    J = jnp.stack(
        [
            sum(shifted[:, k] for k in range(len(COLS)) if tgt[k] == c)
            for c in range(3)
        ],
        axis=-1,
    )
    rho = sum(shifted[:, k] for k in range(len(COLS)) if tgt[k] == 3)
    return J[PAD:-PAD], rho[PAD:-PAD]


def deposit_into_slab(out_slab, row, x, prev_x, macrocharge, velocity,
                      dx, dt):
    """Misfit-fallback deposition accumulated into the kernel's
    (n_rows, 16) unshifted tap slab.

    The fallback previously deposited through its own grid-space path
    (``ops.deposit.deposit_onehot`` + 15 shifted-slice adds + J/rho
    adds) AFTER :func:`fold_out_slab` — ~20 extra small grid-length ops
    per step that dominated the whole fallback chain (~1.9 ms/step on
    v5e even at 256 rows, r4 misfit micro).  Here the taps land in the
    SAME (n_rows, 16) column layout the kernel accumulates
    (``_particle_values``'s column order matches ``COLS`` by
    construction), so one one-hot MXU contraction adds them into the
    slab and the single existing fold serves kernel + fallback alike.

    ``row`` is table-row space (cell + row_off).  Rows outside the
    deposit-reach bounds [PAD+2, n_rows-PAD-3] miss the one-hot and
    deposit NOTHING — callers count them as deposit-reach losses (the
    old path deposited their in-slab taps, but such rows void the run
    either way).  Dead/invalid rows must carry zero macrocharge."""
    from .deposit import _particle_values

    n_rows = out_slab.shape[0]
    vals, _plan = _particle_values(
        x, prev_x, macrocharge, velocity[:, 1], velocity[:, 2], dx, dt
    )
    vals = jnp.concatenate(
        [vals, jnp.zeros_like(vals[:, :1])], axis=1
    )  # the (0, 4) pad column
    lo = PAD + 2
    hi = n_rows - PAD - 3
    nr = hi - lo + 1
    O = (
        row[:, None] == (jnp.arange(nr, dtype=row.dtype) + lo)[None, :]
    ).astype(vals.dtype)
    contrib = lax.dot_general(
        O, vals, (((0,), (0,)), ((), ()))
    )  # (nr, 16)
    return out_slab.at[lo : hi + 1, :].add(contrib)


def block_anchors(spec: FusedSpec, cell):
    """Per-block window bases for a cell-sorted state, from the raw
    device-local cell column: per-block minima (an (nblk, block)
    reduction; dead rows carry in-range placeholder cells) shifted to
    table-row space and offset so rel lands at >= 1 (the fit test's
    true lower bound — see ``_kernel_block``).  Bases are clipped
    to [2, n_rows - W - 2] so neither the window read nor the deposit
    write (base-2 .. base+W+2) can leave the table — a dynamic slice
    whose start is out of range would CLAMP and silently shift the
    window onto the wrong rows."""
    mins = jnp.min(cell.reshape(-1, spec.block), axis=1)
    return jnp.clip(
        (mins + spec.row_off - 1).astype(jnp.int32),
        2, spec.n_rows - spec.window - 2,
    )


def misfit_compact(miss, capacity):
    """Indices of up to ``capacity`` misfit rows (prefix-compacted,
    ascending), plus the overflow count.  Rows beyond the capacity are
    dropped from processing (counted so the caller can surface it);
    entries beyond the total come back as n (dropped by the caller's
    fill/drop scatter modes).

    Two implementations with identical results, selected by capacity:

    * small capacities (the per-step misfit fallback, cap ~512): blocked
      two-level cumsum + searchsorted — the searchsorted is ~22 tiny
      binary-search gathers, sub-ms.
    * large capacities (QED active sets, cap ~1e5+): one single-key
      ``lax.sort`` of ``where(miss, iota, n)`` — measured 6.0 ms vs
      45 ms for the cumsum+searchsorted at 2.1M rows on v5e (the
      searchsorted 'scan' lowering is latency-bound at large query
      counts; the round-1 choice of cumsum+searchsorted was made on the
      CPU backend while the tunnel was down and inverts on real TPU).
    """
    m = miss > 0.5
    n = m.shape[0]
    if capacity > 4096:
        iota = jnp.arange(n, dtype=jnp.int32)
        table = lax.sort(jnp.where(m, iota, np.int32(n)))[:capacity]
        total = jnp.sum(m.astype(jnp.int32))
        return table, jnp.maximum(total - capacity, 0)
    from .deposit import _cumsum_cols

    R = _cumsum_cols(m.astype(jnp.int32)[:, None])[:, 0]
    table = jnp.searchsorted(
        R, jnp.arange(1, capacity + 1, dtype=R.dtype)
    ).astype(jnp.int32)
    total = R[-1]
    return table, jnp.maximum(total - capacity, 0)


# ----------------------------------------------------------------------
# Packed-layout fast path
# ----------------------------------------------------------------------
#
# The column-per-array kernel above moves ~24 separate (RB, 128) block
# DMAs per grid step (11 in + 13 out); at block = 2048 each is only
# 8 KB, and the per-step push+IO measured 3.7 ms of a 5.7 ms kernel at
# 8.4M particles on v5e — dominated by DMA inefficiency, not traffic
# (the raw bytes are ~1.7 ms at streaming bandwidth).  The packed
# layout carries the fused species as ONE hot matrix
#
#     H: (nblk, 9, RB, 128) f32   cols H_COLS (cell..work)
#
# read in a single ~72 KB DMA per block and written the same way, plus
# a kernel-derived aux matrix
#
#     A: (nblk, 4, RB, 128) f32   cols A_COLS (prev_x, chi, gh, miss)
#
# that never needs to be read back in (prev_x/chi are re-derived every
# step; sort_state already rebuilds them).  The weight column stays a
# separate read-only (nblk, RB, 128) array and ``alive`` is encoded as
# ``weight > 0`` (an invariant of initialization — species.py:348 —
# migration retirement and sort placeholders).  tau is handled entirely
# outside the kernel.

#: hot-matrix columns (kernel input AND output)
H_COLS = ("cell", "x", "y", "z", "ux", "uy", "uz", "gamma", "work")
#: aux-matrix columns (kernel output only, re-derived every step)
A_COLS = ("prev_x", "chi", "gh", "miss")


def _kernel_packed(spec: FusedSpec, c0_ref, h_ref, q_ref, eb_ref,
                   hn_ref, an_ref, amin_ref, out_ref):
    """Packed-layout variant of :func:`_kernel`: same physics, one
    monolithic block read (h_ref) and two block writes (hn/an)."""
    W = spec.window
    dt, dx = spec.dt, spec.dx
    C = const.SPEED_OF_LIGHT

    b = pl.program_id(0)
    base = c0_ref[b]

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.zeros((spec.n_rows, 16), F32)

    cellf = h_ref[0, 0]
    x = h_ref[0, 1]
    y = h_ref[0, 2]
    z = h_ref[0, 3]
    ux = h_ref[0, 4]
    uy = h_ref[0, 5]
    uz = h_ref[0, 6]
    g = h_ref[0, 7]
    work_in = h_ref[0, 8]
    cell = cellf.astype(jnp.int32) + spec.row_off
    rel = cell - base
    relf = rel.astype(F32)
    q = q_ref[0] * F32(spec.charge)

    # true bounds + deposit reach; see _kernel_block
    lo_row, hi_row = _reach_rows(spec)
    fit = (
        (rel >= 1) & (rel <= W - 3)
        & (cell >= lo_row) & (cell <= hi_row)
    )
    miss = (q != 0.0) & ~fit
    upd = fit & (q != 0.0)

    fitf = fit.astype(F32)
    _gather_p = (
        _gather_fields_static if spec.static_gather else _gather_fields
    )
    Ex, Ey, Ez, Bx, By, Bz = _gather_p(
        spec, eb_ref, base, rel, relf, x, fitf
    )
    (unx, uny, unz, gn, ign, gh, chi, work, vty, vtz) = _push_core(
        spec, ux, uy, uz, g, work_in, Ex, Ey, Ez, Bx, By, Bz
    )

    prev = x
    xn = x + F32(C * dt / dx) * unx * ign
    fl = jnp.floor(xn)
    shift = jnp.where(
        fl < 0.0, _IM1, jnp.where(fl > 0.0, _IP1, _IZ)
    ).astype(jnp.int32)
    celln = cell + shift
    xn = xn - fl
    prevn = prev - fl

    hn_ref[0, 0] = jnp.where(
        upd, (celln - spec.row_off).astype(F32), cellf
    )
    hn_ref[0, 1] = jnp.where(upd, xn, x)
    hn_ref[0, 2] = jnp.where(upd, y + vty * dt, y)
    hn_ref[0, 3] = jnp.where(upd, z + vtz * dt, z)
    hn_ref[0, 4] = jnp.where(upd, unx, ux)
    hn_ref[0, 5] = jnp.where(upd, uny, uy)
    hn_ref[0, 6] = jnp.where(upd, unz, uz)
    hn_ref[0, 7] = jnp.where(upd, gn, g)
    hn_ref[0, 8] = jnp.where(upd, work, work_in)
    an_ref[0, 0] = jnp.where(upd, prevn, x)
    an_ref[0, 1] = jnp.where(upd, chi, _ZERO)
    an_ref[0, 2] = jnp.where(upd, gh, _ONE)
    an_ref[0, 3] = miss.astype(F32)
    # fit-row min with alive-row recovery — see _kernel_block
    sent = np.int32(spec.n_rows)
    amin_fit = jnp.min(jnp.where(upd, celln, sent))
    amin_alive = jnp.min(jnp.where(q != 0.0, cell, sent))
    amin_ref[pl.ds(b, 1), :] = jnp.full(
        (1, 128), jnp.where(amin_fit == sent, amin_alive, amin_fit),
        jnp.int32,
    )

    if spec.dep_skip:
        return
    qd = jnp.where(upd, q, _ZERO)
    _deposit_block(spec, base, celln, xn, prevn, qd,
                   F32(C) * uny * ign, F32(C) * unz * ign, out_ref)


def fused_push_deposit_packed(spec: FusedSpec, anchors, H, weight, eb_rows,
                              *, interpret=False):
    """Packed-layout driver: H (nblk, 9, RB, 128), weight
    (nblk, RB, 128), anchors (nblk,) i32.  Returns
    (H_new, A_new, out_slab, anchors_next) — aux cols per A_COLS."""
    if spec.subblocks != 1:
        spec = spec._replace(subblocks=1)  # packed layout: one block/program
    nblk, _, RB, _ = H.shape
    out_shapes = (
        jax.ShapeDtypeStruct(H.shape, F32),
        jax.ShapeDtypeStruct((nblk, len(A_COLS), RB, 128), F32),
        jax.ShapeDtypeStruct((nblk, 128), jnp.int32),
        jax.ShapeDtypeStruct((spec.n_rows, 16), F32),
    )
    out_specs = (
        pl.BlockSpec((1, len(H_COLS), RB, 128),
                     lambda i, c: (i, _IZ, _IZ, _IZ),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, len(A_COLS), RB, 128),
                     lambda i, c: (i, _IZ, _IZ, _IZ),
                     memory_space=pltpu.VMEM),
        _full_vmem((nblk, 128)),
        _full_vmem((spec.n_rows, 16)),
    )
    H_new, A_new, amin, out_slab = pl.pallas_call(
        functools.partial(_kernel_packed, spec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((1, len(H_COLS), RB, 128),
                             lambda i, c: (i, _IZ, _IZ, _IZ),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RB, 128), lambda i, c: (i, _IZ, _IZ),
                             memory_space=pltpu.VMEM),
                _full_vmem(eb_rows.shape),
            ],
            out_specs=out_specs,
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(spec, 28, nblk)
        ),
        interpret=interpret,
    )(anchors.astype(jnp.int32), H, weight, eb_rows)
    anchors_next = jnp.clip(
        amin[:, 0] - 1, 2, spec.n_rows - spec.window - 2
    ).astype(jnp.int32)
    return H_new, A_new, out_slab, anchors_next


class PackedState(NamedTuple):
    """Fused-species state in the packed hot/aux layout (see module
    notes above).  ``tau`` is only present for electron species and is
    handled entirely outside the kernel (sort payload + migration
    window rows)."""

    h: jnp.ndarray            # (nblk, len(H_COLS), RB, 128) f32
    aux: jnp.ndarray          # (nblk, len(A_COLS), RB, 128) f32
    weight: jnp.ndarray       # (nblk, RB, 128) f32; alive == weight > 0
    tau: jnp.ndarray | None   # (n,) or None


def pack_fused(st, block: int) -> PackedState:
    """ParticleState (electron/ion fused contract) -> PackedState."""
    n = st.x.shape[0]
    nblk = n // block
    RB = block // 128
    to4 = lambda a: a.astype(F32).reshape(nblk, RB, 128)
    zero = jnp.zeros((nblk, RB, 128), F32)
    hc = dict(
        cell=to4(st.cell), x=to4(st.x), y=to4(st.y), z=to4(st.z),
        ux=to4(st.ux), uy=to4(st.uy), uz=to4(st.uz), gamma=to4(st.gamma),
        work=to4(st.work) if st.work is not None else zero,
    )
    ac = dict(
        prev_x=to4(st.prev_x),
        chi=to4(st.chi) if st.chi is not None else zero,
        gh=jnp.ones((nblk, RB, 128), F32),
        miss=zero,
    )
    return PackedState(
        h=jnp.stack([hc[c] for c in H_COLS], axis=1),
        aux=jnp.stack([ac[c] for c in A_COLS], axis=1),
        weight=to4(jnp.where(st.alive, st.weight, 0.0)),
        tau=st.tau,
    )


def unpack_fused(ps: PackedState, template):
    """PackedState -> ParticleState with the template's dtypes.  The
    alive mask is decoded from weight > 0 (see layout notes)."""
    import dataclasses

    n = template.x.shape[0]
    flat = lambda a: a.reshape(n)
    w = flat(ps.weight).astype(template.weight.dtype)
    rep = dict(
        cell=flat(ps.h[:, 0]).astype(template.cell.dtype),
        x=flat(ps.h[:, 1]), y=flat(ps.h[:, 2]), z=flat(ps.h[:, 3]),
        ux=flat(ps.h[:, 4]), uy=flat(ps.h[:, 5]), uz=flat(ps.h[:, 6]),
        gamma=flat(ps.h[:, 7]),
        prev_x=flat(ps.aux[:, 0]),
        weight=w, alive=w > 0,
    )
    if template.work is not None:
        # the packed layout accumulates work in f32 inside H (legacy
        # semantics even under mixed precision — packed is a non-QED
        # A/B knob); cast back to the column's dtype
        rep["work"] = flat(ps.h[:, 8]).astype(template.work.dtype)
    if template.chi is not None:
        rep["chi"] = flat(ps.aux[:, 1])
    if template.tau is not None:
        rep["tau"] = ps.tau
    return dataclasses.replace(template, **rep)
