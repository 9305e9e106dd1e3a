"""Fused gather+push+deposit kernel vs the unfused XLA ops.

Runs the Pallas kernel in interpreter mode on the CPU backend and
checks f32-level parity against fields_at + vay_push + deposit_sorted
(reference semantics: yee.rs:499-529, electron.rs:268-330,
yee.rs:551-641)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.physics

from opal_tpu import constants as const
from opal_tpu.ops import fused
from opal_tpu.ops.deposit import deposit_sorted
from opal_tpu.ops.interp import fields_at
from opal_tpu.ops.pusher import vay_push

F32 = jnp.float32
C = const.SPEED_OF_LIGHT
HALO = 4


def _setup(n=4 * 2048, nx=256, seed=0, emission_on=False, strays=0):
    rng = np.random.default_rng(seed)
    dx = 500.0
    dt = 0.95 * dx / C
    spec = fused.FusedSpec(
        block=2048, window=128, n_rows=nx + 2 * HALO + 2 * fused.PAD,
        dx=dx, dt=dt, charge=const.ELECTRON_CHARGE,
        mass=const.ELECTRON_MASS, row_off=HALO + fused.PAD,
    )
    cells = np.sort(rng.integers(0, nx, n)).astype(np.int32)
    sorted_cells = cells.copy()
    x = rng.random(n, dtype=np.float32)
    u = 0.5 * rng.standard_normal((n, 3)).astype(np.float32)
    u[:, 0] += 0.01
    g = np.sqrt(1.0 + np.sum(u * u, axis=1)).astype(np.float32)
    # weight column (the kernel multiplies in the species charge)
    q = np.full(n, 20.0 * dx / 8, np.float32)
    q[rng.random(n) < 0.05] = 0.0  # dead rows
    stray_rows = rng.choice(n, strays, replace=False) if strays else []
    for r in stray_rows:
        cells[r] = (cells[r] + nx // 2) % nx  # break the sort locally
    work = np.zeros(n, np.float32)
    tau = rng.exponential(size=n).astype(np.float32) * 10.0
    E = (2e3 * rng.standard_normal((nx + 2 * HALO, 3))).astype(np.float32)
    B = (1e-5 * rng.standard_normal((nx + 2 * HALO, 3))).astype(np.float32)
    return (spec, cells, x, u, g, q, work, tau, E, B, dx, dt, stray_rows,
            sorted_cells)


def _run_fused(spec, cells, x, u, g, q, work, tau, E, B,
               anchor_cells=None):
    eb = fused.make_eb_rows(jnp.asarray(E), jnp.asarray(B))
    # anchors come from the freshly SORTED cells (block_anchors is only
    # ever called right after sort_state); strays appear later
    anchors = fused.block_anchors(
        spec, jnp.asarray(cells if anchor_cells is None else anchor_cells)
    )
    zero = jnp.zeros_like(jnp.asarray(x))
    return fused.fused_push_deposit(
        spec, anchors, jnp.asarray(cells), jnp.asarray(x), zero, zero,
        jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]), jnp.asarray(u[:, 2]),
        jnp.asarray(g), jnp.asarray(q), jnp.asarray(work),
        eb, interpret=True,
    )


def _run_unfused(spec, cells, x, u, g, q, work, tau, E, B, emission_on):
    Ep, Bp = fields_at(jnp.asarray(E), jnp.asarray(B),
                       jnp.asarray(cells) + HALO, jnp.asarray(x))
    res = vay_push(
        jnp.asarray(cells), jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)),
        jnp.zeros_like(jnp.asarray(x)), jnp.asarray(u), jnp.asarray(g),
        jnp.asarray(tau) if emission_on else jnp.full(x.shape, jnp.inf, F32),
        jnp.asarray(work), Ep, Bp, spec.dx, spec.dt,
    )
    vel = C * res.u / res.gamma[:, None]
    n_slab = E.shape[0]
    macro = jnp.asarray(q) * F32(const.ELECTRON_CHARGE)
    J, rho = deposit_sorted(
        jnp.zeros((n_slab, 3), F32), jnp.zeros((n_slab,), F32),
        res.cell + HALO, res.x, res.prev_x, macro, vel,
        spec.dx, spec.dt,
    )
    return res, J, rho


def _assert_close(a, b, rtol, name):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(np.max(np.abs(b)), 1e-30)
    np.testing.assert_allclose(a, b, atol=rtol * scale, rtol=0, err_msg=name)


def test_fused_matches_unfused():
    emission_on = True
    spec, cells, x, u, g, q, work, tau, E, B, dx, dt, _, _sc = _setup()
    cols, miss, out_slab, anch_next = _run_fused(
        spec, cells, x, u, g, q, work, tau, E, B
    )
    # the kernel-emitted next-step anchors are the per-block fit-row
    # cell minima minus 1 (the fit test's true lower bound is rel >= 1;
    # clipped to the table).  All rows fit in this setup, so the
    # alive-row recovery path is not exercised here (see
    # test_default_windows.test_poisoned_anchor_recovers).
    live_cells = (
        np.asarray(cols["cell"]).reshape(-1, spec.block)
        + HALO + fused.PAD
    )
    live = (q != 0.0).reshape(-1, spec.block)
    expect = np.where(
        live.any(axis=1),
        np.where(live, live_cells, np.iinfo(np.int32).max).min(axis=1) - 1,
        spec.n_rows,
    )
    expect = np.clip(expect, 2, spec.n_rows - spec.window - 2)
    np.testing.assert_array_equal(np.asarray(anch_next), expect)
    res, Jref, rref = _run_unfused(
        spec, cells, x, u, g, q, work, tau, E, B, emission_on
    )
    assert float(jnp.sum(miss)) == 0.0

    live = q != 0.0
    for name, a, b, tol in [
        ("cell", np.asarray(cols["cell"])[live],
         np.asarray(res.cell)[live], 0.0),
        ("x", np.asarray(cols["x"])[live], np.asarray(res.x)[live], 3e-5),
        ("prev_x", np.asarray(cols["prev_x"])[live],
         np.asarray(res.prev_x)[live], 3e-5),
        ("ux", np.asarray(cols["ux"])[live], np.asarray(res.u)[live, 0], 3e-5),
        ("uy", np.asarray(cols["uy"])[live], np.asarray(res.u)[live, 1], 3e-5),
        ("uz", np.asarray(cols["uz"])[live], np.asarray(res.u)[live, 2], 3e-5),
        ("gamma", np.asarray(cols["gamma"])[live],
         np.asarray(res.gamma)[live], 3e-5),
        ("y", np.asarray(cols["y"])[live], np.asarray(res.y)[live], 3e-5),
        ("z", np.asarray(cols["z"])[live], np.asarray(res.z)[live], 3e-5),
        ("work", np.asarray(cols["work"])[live],
         np.asarray(res.work)[live], 1e-4),
        ("chi", np.asarray(cols["chi"])[live],
         np.asarray(res.chi)[live], 1e-4),
    ]:
        if tol == 0.0:
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            _assert_close(a, b, tol, name)
    # gamma_half output (feeds the out-of-kernel tau update): mirror
    # the half-step update from the gathered fields
    Ep, Bp = fields_at(jnp.asarray(E), jnp.asarray(B),
                       jnp.asarray(cells) + HALO, jnp.asarray(x))
    alpha = const.ELECTRON_CHARGE * dt / (2.0 * const.ELECTRON_MASS * C)
    v = C * u / g[:, None]
    uh = u + alpha * (np.asarray(Ep) + np.cross(v, np.asarray(Bp)))
    gh_ref = np.sqrt(1.0 + np.sum(uh * uh, axis=1))
    _assert_close(np.asarray(cols["gh"])[live], gh_ref[live], 3e-5, "gh")

    J, rho = fused.fold_out_slab(out_slab)
    _assert_close(J, Jref, 5e-4, "J")
    _assert_close(rho, rref, 5e-4, "rho")


def test_fused_misfits_flagged_and_untouched():
    (spec, cells, x, u, g, q, work, tau, E, B, dx, dt, strays,
     sorted_cells) = _setup(strays=40, seed=3)
    # only count strays that are alive and actually left their window
    cols, miss, out_slab, _anch = _run_fused(
        spec, cells, x, u, g, q, work, tau, E, B,
        anchor_cells=sorted_cells,
    )
    miss = np.asarray(miss) > 0.5
    assert miss.sum() > 0
    assert set(np.flatnonzero(miss)) <= set(strays)
    # misfit rows keep their original state
    np.testing.assert_array_equal(
        np.asarray(cols["cell"])[miss], cells[miss]
    )
    np.testing.assert_array_equal(np.asarray(cols["x"])[miss], x[miss])
    np.testing.assert_array_equal(np.asarray(cols["ux"])[miss], u[miss, 0])

    # misfit_compact returns exactly the flagged rows
    table, overflow = fused.misfit_compact(jnp.asarray(miss, F32), 64)
    got = set(int(i) for i in np.asarray(table) if i < len(cells))
    assert got == set(np.flatnonzero(miss))
    assert int(overflow) == 0


def test_fused_subblocks_parity():
    """FusedSpec.subblocks (several logical blocks per grid program) is
    numerically the single-block kernel: identical integer/mask outputs,
    few-ulp float parity (interpret mode compiles the two shapes with
    different FMA fusion, so bit equality is not guaranteed there)."""
    args = _setup(n=4 * 2048, nx=256, seed=3)
    spec = args[0]
    c1, m1, o1, a1 = _run_fused(*args[:10])
    c2, m2, o2, a2 = _run_fused(spec._replace(subblocks=4), *args[1:10])
    for k in c1:
        v1, v2 = np.asarray(c1[k]), np.asarray(c2[k])
        if v1.dtype.kind == "f":
            np.testing.assert_allclose(v1, v2, rtol=2e-5, atol=5e-7,
                                       err_msg=k)
        else:
            np.testing.assert_array_equal(v1, v2, err_msg=k)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_fused_subblocks_degrades_to_divisor():
    """A subblock factor that does not divide the block count degrades
    to the largest divisor instead of failing (capacities are rounded
    to fused_block, not block * subblocks)."""
    args = _setup(n=3 * 2048, nx=256, seed=5)  # 3 blocks
    spec = args[0]
    c1, m1, o1, a1 = _run_fused(*args[:10])
    # 2 does not divide 3 -> effective factor 1 (plus the in-kernel
    # clamp is exercised by test_fused_subblocks_parity above)
    c2, m2, o2, a2 = _run_fused(spec._replace(subblocks=2), *args[1:10])
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(
        np.asarray(c1["cell"]), np.asarray(c2["cell"])
    )
    np.testing.assert_allclose(
        np.asarray(c1["x"]), np.asarray(c2["x"]), rtol=2e-5, atol=5e-7
    )
