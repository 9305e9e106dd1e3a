"""One-hot MXU field gather (FusedSpec.mxu_gather): the 4 live
b-spline taps (offsets -1..+2 of rel) fetched by one one-hot
contraction must reproduce the W-cell select-sum loop.

Outside pallas the two paths are BITWISE equal (same tap values, same
f32 weight arithmetic `d - wdx`, same ascending accumulation).  Inside
a kernel the dot_general contraction may round differently from the
VPU select-sum chain (FMA/ordering), so kernel-level columns are
compared at a few-ULP tolerance; integer/structural outputs stay
exact."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from opal_tpu import constants as const
from jax.experimental import pallas as pl

from opal_tpu.ops import fused as F

pytestmark = pytest.mark.unit


_DS_T = type(pl.ds(0, 1))


class _HostRef:
    """Emulates eb_ref indexing on host: pl.ds window slices (the
    static/mxu gathers) AND scalar element reads (the dynamic
    span-bounded gather's per-cell taps)."""

    def __init__(self, a):
        self.a = a

    def __getitem__(self, idx):
        r, c = idx
        if isinstance(r, _DS_T):  # pl.ds slice
            return lax.dynamic_slice(
                self.a, (jnp.asarray(r.start, jnp.int32), jnp.int32(0)),
                (r.size, self.a.shape[1]),
            )
        return lax.dynamic_slice(
            self.a, (jnp.asarray(r, jnp.int32), jnp.int32(c)), (1, 1)
        )[0, 0]


def test_gather_bitwise_outside_pallas():
    W = 24
    spec = F.FusedSpec(
        block=128, window=W, n_rows=96, dx=500.0, dt=1.0,
        charge=-1.0, mass=1.0, row_off=0,
    )
    rng = np.random.default_rng(0)
    eb = jnp.asarray(rng.standard_normal((96, 8)).astype(np.float32))
    base = jnp.int32(10)
    rel = jnp.asarray(rng.integers(3, W - 4, (4, 128)).astype(np.int32))
    x = jnp.asarray(rng.random((4, 128), dtype=np.float32))
    fitf = jnp.ones((4, 128), jnp.float32)
    ref = _HostRef(eb)
    relf = rel.astype(jnp.float32)
    static = F._gather_fields_static(spec, ref, base, rel, relf, x, fitf)
    dyn = F._gather_fields(spec, ref, base, rel, relf, x, fitf)
    mxu = F._gather_fields_mxu(
        spec._replace(mxu_gather=True), ref, base, rel, relf, x, fitf,
    )
    for name, a, b, c in zip(
        "Ex Ey Ez Bx By Bz".split(), static, mxu, dyn
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )
        # the dynamic span-bounded loop skips only exact-zero taps;
        # its fori body is always traced, so XLA's FMA contraction
        # introduces ~1-ULP differences vs the eagerly-evaluated
        # static unroll (a harness artifact — inside the kernel both
        # compile through the same Mosaic pipeline)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=0, atol=2e-6,
            err_msg=name + " dyn",
        )


def _run_kernel(mxu: bool, pusher="vay", lite=False, seed=0):
    HALO = 4
    nx, npc, block, W = 64, 8, 128, 24
    n = nx * npc
    dx = 500.0
    dt = 0.95 * dx / const.SPEED_OF_LIGHT
    n_rows = nx + 2 * HALO + 2 * F.PAD
    spec = F.FusedSpec(
        block=block, window=W, n_rows=n_rows, dx=dx, dt=dt,
        charge=const.ELECTRON_CHARGE, mass=const.ELECTRON_MASS,
        pusher=pusher, row_off=HALO + F.PAD, lite=lite,
        mxu_gather=mxu,
    )
    rng = np.random.default_rng(seed)
    cell = jnp.asarray(np.sort(rng.integers(0, nx, n)).astype(np.int32))
    x = jnp.asarray(rng.random(n, dtype=np.float32))
    u = jnp.asarray(0.3 * rng.standard_normal((n, 3)).astype(np.float32))
    g = jnp.sqrt(1.0 + jnp.sum(u * u, axis=1))
    q = jnp.asarray(
        (20.0 * dx / npc) * (rng.random(n) > 0.1).astype(np.float32)
    )
    work = jnp.zeros((n,), jnp.float32)
    # field scales chosen so alpha*E*dt stays O(1e-3): the two gather
    # paths agree to a few ULPs, and a sane push keeps it that way
    # (extreme fields amplify ULP field noise through the Vay chain)
    E = (1e-3 * rng.standard_normal((n_rows - 2 * F.PAD, 3))).astype(
        np.float32
    )
    B = (1e-8 * rng.standard_normal((n_rows - 2 * F.PAD, 3))).astype(
        np.float32
    )
    eb = F.make_eb_rows(jnp.asarray(E), jnp.asarray(B))
    anchors = F.block_anchors(spec, cell)
    return F.fused_push_deposit(
        spec, anchors, cell, x,
        jnp.zeros_like(x), jnp.zeros_like(x), u[:, 0], u[:, 1], u[:, 2],
        g, q, work, eb, interpret=True,
    )


@pytest.mark.parametrize("pusher", ["vay", "boris"])
def test_mxu_gather_kernel_parity(pusher):
    cols_l, miss_l, out_l, an_l = _run_kernel(False, pusher=pusher)
    cols_m, miss_m, out_m, an_m = _run_kernel(True, pusher=pusher)
    assert set(cols_l) == set(cols_m)
    # structural outputs exact
    for k in ("cell",):
        np.testing.assert_array_equal(
            np.asarray(cols_l[k]), np.asarray(cols_m[k]), err_msg=k
        )
    np.testing.assert_array_equal(np.asarray(miss_l), np.asarray(miss_m))
    np.testing.assert_array_equal(np.asarray(an_l), np.asarray(an_m))
    # float columns at a few-ULP tolerance (dot_general rounding)
    for k in cols_l:
        if k == "cell":
            continue
        a, b = np.asarray(cols_l[k]), np.asarray(cols_m[k])
        scale = max(np.abs(a).max(), 1e-30)
        np.testing.assert_allclose(
            a, b, rtol=1e-5, atol=1e-5 * scale, err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(out_l), np.asarray(out_m), rtol=1e-4,
        atol=1e-5 * max(np.abs(np.asarray(out_l)).max(), 1e-30),
    )


def test_mxu_gather_kernel_parity_lite():
    cols_l, _, out_l, _ = _run_kernel(False, lite=True, seed=3)
    cols_m, _, out_m, _ = _run_kernel(True, lite=True, seed=3)
    assert set(cols_l) == set(cols_m)
    for k in cols_l:
        if k == "cell":
            continue
        a, b = np.asarray(cols_l[k]), np.asarray(cols_m[k])
        scale = max(np.abs(a).max(), 1e-30)
        np.testing.assert_allclose(
            a, b, rtol=1e-5, atol=1e-5 * scale, err_msg=k
        )
