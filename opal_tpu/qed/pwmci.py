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
    """
    prep = as_constants(prep)
    tidx = jnp.asarray(tidx)
    x = jnp.asarray(x)
    n = prep.x.shape[1]
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
    """
    prep = as_constants(prep)
    tidx = jnp.asarray(tidx)
    fq = jnp.asarray(fq)
    n = prep.f.shape[1]
    idx = jnp.sum(fq[..., None] > prep.f[tidx], axis=-1)
    in_range = idx < n
    seg = jnp.clip(idx - 1, 0, n - 2)
    x0, x1, f0, f1, m0, m1 = _segment(prep, tidx, seg)

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
