"""Piecewise-monotone cubic Hermite interpolation, vectorized.

The reference evaluates and inverts tabulated CDFs with a scalar
Brent-style root finder (reference: ``src/qed/pwmci.rs:96-228``).  On
TPU, data-dependent iteration counts are hostile to XLA, so inversion
here is a fixed-count bisection on the same monotone cubic — 44
iterations shrink the bracket by 2**-44, far below the reference's
1e-6 relative tolerance, with fully static shapes.

Tables are prepared once on the host (tangent slopes with the
reference's monotonicity clamps, ``pwmci.rs:38-61``) and evaluated in
batch: ``tables`` may hold T distinct tables of n points each, and the
batched query supplies a per-query table index, which is how the
per-``delta`` angle CDFs are dispatched during spectrum sampling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax


BISECTION_ITERS = 44


class PreparedTables(NamedTuple):
    """Host-precomputed Hermite fit parameters for T tables of n points.

    Per segment s (between points s and s+1): end abscissae/ordinates and
    the monotonicity-clamped tangents at each end.
    """

    x: jnp.ndarray  # (T, n)
    f: jnp.ndarray  # (T, n)
    m0: jnp.ndarray  # (T, n-1) tangent at left end of each segment
    m1: jnp.ndarray  # (T, n-1) tangent at right end of each segment


def prepare(tables: np.ndarray) -> PreparedTables:
    """Precompute per-segment tangents for a (T, n, 2) or (n, 2) stack.

    Follows the reference's segment-local construction
    (``pwmci.rs:14-68``): tangents are the average of adjacent secants
    when they share a sign (else zero), then clamped — the left tangent
    against the segment secant, the right tangent against the *next*
    secant, exactly as the reference does.
    """
    tables = np.asarray(tables, dtype=np.float64)
    if tables.ndim == 2:
        tables = tables[None]
    T, n, _ = tables.shape
    x = tables[:, :, 0]
    f = tables[:, :, 1]
    sec = (f[:, 1:] - f[:, :-1]) / (x[:, 1:] - x[:, :-1])  # (T, n-1)
    # secants to the left/right of each segment, edges duplicated
    sec_l = np.concatenate([sec[:, :1], sec[:, :-1]], axis=1)
    sec_r = np.concatenate([sec[:, 1:], sec[:, -1:]], axis=1)

    m0 = np.where(sec_l * sec > 0.0, 0.5 * (sec_l + sec), 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        alpha = np.where(sec != 0.0, m0 / sec, 0.0)
    m0 = np.where((sec != 0.0) & (alpha > 3.0), 3.0 * sec, m0)

    m1 = np.where(sec * sec_r > 0.0, 0.5 * (sec + sec_r), 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        beta = np.where(sec_r != 0.0, m1 / sec_r, 0.0)
    m1 = np.where((sec_r != 0.0) & (beta > 3.0), 3.0 * sec_r, m1)

    # Keep host numpy arrays: they trace into jitted consumers as HLO
    # constants.  (Eager jnp arrays here would be closure-captured
    # device buffers — on remote-attached TPUs executing such a program
    # permanently degrades dispatch to a ~27 ms/call sync path.)
    return PreparedTables(
        x=np.ascontiguousarray(x),
        f=np.ascontiguousarray(f),
        m0=np.ascontiguousarray(m0),
        m1=np.ascontiguousarray(m1),
    )


def as_constants(prep: PreparedTables) -> PreparedTables:
    """Bind the host tables as (trace-time) jnp constants so traced
    indices can gather from them."""
    return PreparedTables(*(jnp.asarray(a) for a in prep))


#: f32 table-concat cache; preps are module-level constants (emission.py
#: builds them once at import), so id-keying cannot collide in practice
_CAT32_CACHE: dict = {}


def _cat_f32(prep: PreparedTables) -> np.ndarray:
    """Host-side (T, 4n-2) f32 concatenation [x | f | m0 | m1], cached
    per prepared-table stack (host numpy -> HLO constant)."""
    key = id(prep.x)
    cached = _CAT32_CACHE.get(key)
    if cached is None:
        cached = np.concatenate(
            [prep.x, prep.f, prep.m0, prep.m1], axis=1
        ).astype(np.float32)
        _CAT32_CACHE[key] = cached
    return cached


def _rows_f32(prep: PreparedTables, tidx):
    """Per-query table rows via a one-hot MXU contraction, f32.

    ``prep.x[tidx]``-style advanced indexing is a random row gather —
    latency-bound on TPU (measured: the emission sampler's row gathers
    dominated the QED step at ~0.4 s/step for 262k active rows).  A
    (Q, T) one-hot contracted against the (T, 4n-2) table concat fetches
    the same rows on the MXU in one pass; with exactly one 1.0 per row
    the contraction reproduces the f32-cast table values bit-exactly.

    Returns ``(x_rows, f_rows, m0_rows, m1_rows)`` with shapes
    (Q, n), (Q, n), (Q, n-1), (Q, n-1).
    """
    T, n = prep.x.shape
    cat = jnp.asarray(_cat_f32(prep))  # (T, 4n-2) trace-time constant
    if T == 1:
        rows = jnp.broadcast_to(cat[0], tidx.shape + (cat.shape[1],))
    else:
        onehot = (
            tidx[..., None] == jnp.arange(T, dtype=tidx.dtype)
        ).astype(jnp.float32)
        rows = lax.dot_general(
            onehot, cat, (((onehot.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return (
        rows[..., :n],
        rows[..., n:2 * n],
        rows[..., 2 * n:3 * n - 1],
        rows[..., 3 * n - 1:],
    )


def _segment_f32(x_rows, f_rows, m0_rows, m1_rows, seg):
    """Segment parameters from already-fetched rows, gather-free: a
    one-hot over the (tiny) segment axis replaces per-row dynamic
    indexing (``take_along_axis`` is still a random gather on TPU)."""
    nm1 = m0_rows.shape[-1]
    S = (
        seg[..., None] == jnp.arange(nm1, dtype=seg.dtype)
    ).astype(jnp.float32)
    pick = lambda r: jnp.sum(r * S, axis=-1)
    x0 = pick(x_rows[..., :-1])
    x1 = pick(x_rows[..., 1:])
    f0 = pick(f_rows[..., :-1])
    f1 = pick(f_rows[..., 1:])
    m0 = pick(m0_rows)
    m1 = pick(m1_rows)
    return x0, x1, f0, f1, m0, m1


def _segment(prep: PreparedTables, tidx, seg):
    """Gather per-query segment parameters (x0, x1, f0, f1, m0, m1)."""
    x0 = prep.x[tidx, seg]
    x1 = prep.x[tidx, seg + 1]
    f0 = prep.f[tidx, seg]
    f1 = prep.f[tidx, seg + 1]
    m0 = prep.m0[tidx, seg]
    m1 = prep.m1[tidx, seg]
    return x0, x1, f0, f1, m0, m1


def _hermite(x, x0, x1, f0, f1, m0, m1):
    """Cubic Hermite basis evaluation (pwmci.rs:70-77)."""
    h = x1 - x0
    t = (x - x0) / h
    omt = 1.0 - t
    h00 = (1.0 + 2.0 * t) * omt * omt
    h10 = t * omt * omt
    h01 = t * t * (3.0 - 2.0 * t)
    h11 = t * t * (t - 1.0)
    return f0 * h00 + f1 * h01 + h * (m0 * h10 + m1 * h11)


def evaluate(prep: PreparedTables, tidx, x):
    """Evaluate each query ``x`` on its table ``tidx``.

    Returns ``(value, in_range)`` where ``in_range`` is False when
    ``x`` exceeds the table's last abscissa (the reference returns
    ``None`` there, ``pwmci.rs:104-106``).  Below-range queries
    extrapolate with the first segment, as in the reference.

    f32 queries take the gather-free one-hot path (f32-cast tables,
    MXU row fetch — see :func:`_rows_f32`); f64 queries keep the
    advanced-indexing path with full-precision tables.
    """
    tidx = jnp.asarray(tidx)
    x = jnp.asarray(x)
    n = prep.x.shape[1]
    if x.dtype == jnp.float32:
        rows = _rows_f32(prep, tidx)
        x_rows = rows[0]
        idx = jnp.sum(x[..., None] > x_rows, axis=-1)
        in_range = idx < n
        seg = jnp.clip(idx - 1, 0, n - 2)
        pars = _segment_f32(*rows, seg)
        return _hermite(x, *pars), in_range
    prep = as_constants(prep)
    # smallest i with x <= table[i][0]; segment is (i-1, i)
    idx = jnp.sum(x[..., None] > prep.x[tidx], axis=-1)
    in_range = idx < n
    seg = jnp.clip(idx - 1, 0, n - 2)
    pars = _segment(prep, tidx, seg)
    return _hermite(x, *pars), in_range


def invert(prep: PreparedTables, tidx, fq):
    """Solve ``hermite(x) == fq`` on table ``tidx`` for each query.

    Returns ``(x, in_range)``; ``in_range`` is False when ``fq`` exceeds
    the table's last ordinate (reference returns ``None``,
    ``pwmci.rs:121-123``).  Uses fixed-count bisection (monotone cubic →
    bracketing is exact).

    Like :func:`evaluate`, f32 queries take the gather-free one-hot
    path; f64 queries keep the exact advanced-indexing path.
    """
    tidx = jnp.asarray(tidx)
    fq = jnp.asarray(fq)
    n = prep.f.shape[1]
    if fq.dtype == jnp.float32:
        rows = _rows_f32(prep, tidx)
        f_rows = rows[1]
        idx = jnp.sum(fq[..., None] > f_rows, axis=-1)
        in_range = idx < n
        seg = jnp.clip(idx - 1, 0, n - 2)
        x0, x1, f0, f1, m0, m1 = _segment_f32(*rows, seg)
    else:
        prep_c = as_constants(prep)
        idx = jnp.sum(fq[..., None] > prep_c.f[tidx], axis=-1)
        in_range = idx < n
        seg = jnp.clip(idx - 1, 0, n - 2)
        x0, x1, f0, f1, m0, m1 = _segment(prep_c, tidx, seg)

    # unrolled (not fori_loop): each halving is a handful of
    # elementwise ops, and unrolling lets XLA fuse the whole bisection
    # into one kernel — a device loop would pay the per-iteration
    # kernel-launch cost per halving
    a, b = x0, x1
    for _ in range(BISECTION_ITERS):
        mid = 0.5 * (a + b)
        fmid = _hermite(mid, x0, x1, f0, f1, m0, m1)
        go_right = fmid < fq
        a = jnp.where(go_right, mid, a)
        b = jnp.where(go_right, b, mid)
    return 0.5 * (a + b), in_range
