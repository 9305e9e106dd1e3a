"""Benchmark: macroparticle push throughput of the full PIC step.

Runs a two-stream-style workload (periodic box, Vay push, deposition
on — the reference's ``examples/two_stream.yaml`` physics at
benchmark scale) for a timed block of steps on the default device(s),
and prints ONE json line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

``vs_baseline`` compares against an *estimated* single-CPU-node
throughput of the reference implementation: the reference publishes
no numbers (BASELINE.md), and Rust/cargo is not available in this
image to measure it.  The estimate is 64 cores x 5e6 pushes/s/core =
3.2e8 macroparticle-pushes/s — typical for Vay-push + Esirkepov
deposition PIC codes of this class on a modern node.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_NODE_PUSHES_PER_SEC = 3.2e8  # estimated reference CPU node

# Measured anchor for the estimate above: tools/cpu_ref_proxy.cc — an
# optimized native (C++/OpenMP) implementation of the reference's
# per-particle step work (field gather, Vay push incl. the
# unconditional work/chi/rate updates of electron.rs:278-287, flux
# deposition) measured 1.73e7 pushes/s/core f64 on this image's Xeon
# vCPU (2026-08-18).  64 cores x 1.73e7 = 1.1e9 — an upper bound for a
# reference node (real-code overhead and shared memory bandwidth push
# it down; see BASELINE.md "CPU proxy measurement").  Reported as
# vs_node_proxy alongside the legacy vs_baseline.
PROXY_NODE_PUSHES_PER_SEC = 1.1e9  # 64 x measured 1.73e7/core

# Backend-probe retry budget.  The axon-tunneled TPU in this image can
# be transiently broken in two ways (round-1 postmortem): backend init
# raises UNAVAILABLE (tunnel restarting), or the first device op HANGS
# for minutes while a killed client's queued work drains.  Both must be
# survived: the probe runs in a child process with a hard deadline and
# the parent only touches jax after a child succeeds.
# Worst-case time-to-JSON matters as much as tolerance: the driver may
# bound the whole capture, and a traceback-free JSON line after ~20 min
# is as useless as a traceback if the capture was killed at 10.  The
# backlog drains server-side in real time, so what buys recovery is the
# TOTAL probing window, not any single probe's deadline: 4 x 150 s of
# probing + 105 s of backoff ~= 12 min covers a multi-minute drain
# while keeping the all-dead worst case inside a 15-minute budget.
_PROBE_ATTEMPTS = 4
_PROBE_DEADLINE_S = 150
_PROBE_BACKOFF_S = (15, 30, 60)
_PROBE_CODE = """
import os
import jax
env = os.environ.get("JAX_PLATFORMS", "")
if env and "cpu" in env.split(","):
    # the site TPU hook ignores the env var; apply it explicitly so a
    # CPU-backend bench does not probe (and hang on) the TPU tunnel
    jax.config.update("jax_platforms", env)
import jax.numpy as jnp
ds = jax.devices()
jnp.zeros((8,)).block_until_ready()
print("OK", ds[0].platform, len(ds))
"""


def _auto_window(block, npc, resort, v_spread):
    """Fused window covering a block's sorted cell span plus ``resort``
    steps of velocity-spread dispersion plus the kernel's 4-cell fit
    margin plus 1 cell of safety (the kernel fits rel in [1, W-3] with
    a min-1 re-anchor, so sustainable span is W - 4).

    Granularity 4 and slack 5 (was 8 and 6): the bench deck's true
    sorted-block span grows to ~6.6 cells over R=320 (the dispersion
    ceil is itself conservative), and the r5d hardware A/B measured
    W=12 at 1.3788e9 pushes/s vs 1.2999e9 at the old W=16 — +6%,
    CLEAN.  Any sizing regression is loud: particle losses void the
    bench with an error JSON."""
    gap = -(-block // max(1, npc))
    disp = int(np.ceil(0.95 * v_spread * resort))
    return max(8, -(-(gap + 5 + disp) // 4) * 4)


def _emit_error(msg: str) -> None:
    """Emit the one required JSON line in degraded form and exit 0.

    The driver records stdout's JSON line; a traceback instead of a
    line voids the round's bench capture (round-1 lesson).
    """
    print(json.dumps({
        "metric": "macroparticle-pushes/sec/chip",
        "value": 0.0,
        "unit": "pushes/s",
        "vs_baseline": 0.0,
        "error": msg[:500],
    }))
    sys.exit(0)


def _probe_backend():
    """Verify the jax backend is reachable before the parent inits it.

    Each attempt probes in a CHILD process under a deadline, so a hung
    tunnel cannot hang the bench itself; on success the backlog has
    also drained, so the parent's own init is fast.  Emits a JSON error
    line and exits 0 once the retry budget is exhausted.
    """
    import subprocess

    last = "unknown"
    for attempt in range(_PROBE_ATTEMPTS):
        try:
            res = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE],
                capture_output=True, text=True, timeout=_PROBE_DEADLINE_S,
                cwd=os.path.dirname(os.path.abspath(__file__)) or None,
            )
            if res.returncode == 0 and "OK" in res.stdout:
                return
            last = (res.stderr.strip().splitlines() or ["rc=%d" % res.returncode])[-1]
        except subprocess.TimeoutExpired:
            last = f"probe hung past {_PROBE_DEADLINE_S}s (tunnel backlog?)"
        if attempt < _PROBE_ATTEMPTS - 1:
            delay = _PROBE_BACKOFF_S[min(attempt, len(_PROBE_BACKOFF_S) - 1)]
            print(
                f"# bench: backend probe failed (attempt {attempt + 1}/"
                f"{_PROBE_ATTEMPTS}): {last}; retrying in {delay}s",
                file=sys.stderr,
            )
            time.sleep(delay)
    _emit_error(f"backend probe failed after {_PROBE_ATTEMPTS} attempts: {last}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    # default size: 8M particles -- large enough that per-step fixed
    # costs (grid ops, migration tables, scan overhead) amortize; the
    # v5e single-chip optimum measured 2026-08-17 (3.4e8 pushes/s vs
    # 2.7e8 at 2M)
    parser.add_argument("--particles", type=float, default=8.0 * 2**20)
    parser.add_argument("--nx", type=int, default=0,
                        help="grid cells (0 = auto: 1024, or for --qed a "
                             "beam-deck geometry with ~128 particles/cell)")
    # 250 steps so the timed block contains a maintenance sort at the
    # default cadence (the schedule opens every run with one): shorter
    # blocks under-amortize the per-run sort
    # 1024 (was 250): per-call overhead + the once-per-program
    # maintenance sort cost ~0.6 ms/step at 250 steps — r4 measured
    # 1.139e9 -> 1.239e9 pushes/s/chip from this alone.  QED decks
    # drop to 50 via the --qed branch below.
    parser.add_argument("--steps", type=int, default=0)
    # the tunnel-attached device kills any single program that runs
    # ~30+ s wall (BASELINE.md 2026-08-19 bisect); QED steps are slow
    # enough that a 250-step program can trip it, so the timed block
    # runs as a loop of bounded-step programs (one executable, reused)
    parser.add_argument("--steps-per-program", type=int, default=-1,
                        help="max simulation steps per compiled program "
                             "(-1 = auto: 50 for --qed, else single "
                             "program; the timed block loops chunks)")
    parser.add_argument("--devices", type=int, default=None)
    parser.add_argument("--f64", action="store_true")
    parser.add_argument("--deposition", action="store_true", default=True)
    parser.add_argument("--no-deposition", dest="deposition", action="store_false")
    parser.add_argument("--no-migration", dest="migration", action="store_false",
                        default=True, help="bench A/B: skip the migration pass")
    parser.add_argument("--sorted-pipeline", dest="sorted_pipeline",
                        action="store_true", default=False,
                        help="bench A/B: cell-sorted pipeline (migrate_sorted "
                             "+ sort-free deposition)")
    parser.add_argument("--fused", dest="fused", action="store_const",
                        const=True, default=None,
                        help="fused Pallas gather+push+deposit kernel "
                             "(default: on, except QED decks >= 4e6 "
                             "particles — the kernel's scoped VMEM "
                             "cannot coexist with the deep-grid QED "
                             "while-body at nx ~ 65k, r5; the unfused "
                             "pipeline serves those, AOT-validated + "
                             "measured 9.85e6 pushes/s at 8.39M)")
    parser.add_argument("--no-fused", dest="fused", action="store_const",
                        const=False)
    # packed hot-matrix layout measured ~6% SLOWER than the column
    # kernel on v5e (2026-08-19 single-knob A/B + combo sweep): the
    # per-block DMA count was not the bottleneck.  Kept as an A/B knob.
    parser.add_argument("--packed", dest="packed", action="store_true",
                        default=False, help="bench A/B: packed hot-matrix "
                        "layout instead of the column-per-array kernel")
    parser.add_argument("--no-packed", dest="packed", action="store_false")
    parser.add_argument("--sort-rowgather", dest="sort_rowgather",
                        action="store_true", default=False,
                        help="bench A/B: maintenance sort as key+iota "
                        "sort + one row-batched permutation gather "
                        "instead of the multi-operand payload sort")
    parser.add_argument("--dynamic-gather", dest="static_gather",
                        action="store_false", default=True,
                        help="bench A/B: span-bounded dynamic gather "
                        "loop instead of the default unrolled W-loop "
                        "(measured 7.3%% slower on v5e, r5b)")
    parser.add_argument("--mxu-gather", action="store_true", default=False,
                        help="bench A/B: field gather as a one-hot MXU "
                        "contraction instead of the W-cell select-sum "
                        "loop")
    parser.add_argument("--no-lite", dest="lite", action="store_false",
                        default=True, help="bench A/B: full fused-kernel "
                        "output set (chi/gamma-half/prev_x legs) instead "
                        "of the lite non-QED fast path")
    parser.add_argument("--fused-window", type=int, default=0,
                        help="window cells per block (0 = auto: block "
                             "cell span + dispersion slack; the kernel "
                             "re-anchors every block every step, so no "
                             "resort-drift term is needed)")
    # 4096 beat 2048 by 11% and 8192 by 3% in the 2026-08-19 combo
    # sweep (fewer grid programs -> less per-block fixed cost); the
    # QED kernel variant OOMs scoped VMEM at 4096, so --qed stays 2048
    parser.add_argument("--fused-block", type=int, default=0,
                        help="particles per kernel grid step (0 = auto: "
                             "4096, or 2048 for --qed)")
    parser.add_argument("--fused-subblocks", type=int, default=0,
                        help="logical blocks per kernel grid program "
                             "(amortizes per-program overhead without "
                             "widening the window; 0 = auto: ~131k "
                             "rows/program, the r3-measured v5e "
                             "optimum — 8k for --qed)")
    parser.add_argument("--fused-resort", type=int, default=0,
                        help="maintenance-sort cadence (steps): the kernel "
                             "re-anchors blocks every step, so sorts only "
                             "bound block cell-span growth (dispersion). "
                             "0 = auto: 256, or 64 for --qed (the beam "
                             "marches ~1 cell/step, so the edge-migration "
                             "window grows with the cadence)")
    parser.add_argument("--misfit-capacity", type=int, default=0,
                        help="compacted misfit-fallback rows per step "
                             "(0 = auto: scales with particle count, "
                             "floor 256 — the 8.4M deck's peak misfit "
                             "load measured in (64, 128]/step, and the "
                             "fallback chain cost scales with this)")
    parser.add_argument("--migrate-every", type=int, default=0,
                        help="migration exchange cadence in steps.  0 = "
                             "auto: non-QED decks DEFER the exchange to "
                             "the maintenance-sort cadence (the bench "
                             "plasma drifts 0.0095 cells/step, so "
                             "particles stay within the 2-cell deposit/"
                             "gather reach for ~210 steps — "
                             "max_drift_cells_per_step); QED beam decks "
                             "keep 3 (CFL drift)")
    parser.add_argument("--capacity-factor", type=float, default=0.0,
                        help="particle-buffer slack over the initial "
                             "population (0 = auto: 1.25, shrinking to "
                             "1.1 at >= 5e7 rows so the state + sort "
                             "double-buffers stay inside 16 GB HBM — "
                             "the r4c 1e8 OOM)")
    parser.add_argument("--qed", action="store_true",
                        help="enable QED emission + absorption (adds a photon "
                             "population; colliding-beams-style workload)")
    parser.add_argument("--no-absorption", dest="absorption",
                        action="store_false", default=True,
                        help="with --qed: emission only (the exact "
                             "colliding_beams.yaml physics — the deck runs "
                             "photon_absorption: false)")
    parser.add_argument("--chi", type=float, default=0.02,
                        help="with --qed: target quantum parameter of the "
                             "gamma=1000 bench beam (sets the static B field; "
                             "default 0.02 ~ colliding_beams-crossing emission "
                             "rates, no buffer churn)")
    parser.add_argument("--absorption-block", type=int, default=32,
                        help="with --qed: candidates examined per walk "
                             "pass (B; K/B sequential passes)")
    parser.add_argument("--absorption-active", type=int, default=-1,
                        help="compact the absorption walk to at most N "
                             "active-with-cell-mates photons per step "
                             "(-1 = auto: photon capacity / 4, matching the "
                             "CLI default; 0 = walk the whole buffer)")
    parser.add_argument("--emission-active", type=int, default=-1,
                        help="sample at most N emitters per step (-1 = "
                             "auto: electron capacity / 8, matching the CLI "
                             "default; 0 = run the sampler over the whole "
                             "buffer)")
    parser.add_argument("--profile", metavar="DIR", default=None,
                        help="write a jax.profiler trace of the timed block")
    parser.add_argument("--aot", action="store_true",
                        help="no-chip mode: AOT-compile this exact bench "
                             "program for a v5e:1x1x1 topology on the CPU "
                             "host (full Mosaic pipeline — catches kernel "
                             "legalization failures and scoped-VMEM OOMs "
                             "before any chip time) and exit")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)

    if args.aot:
        os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
        os.environ.setdefault("TPU_SKIP_MDS_QUERY", "1")
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    # Honour an explicit JAX_PLATFORMS=cpu even when a TPU plugin
    # pre-registered itself as the default platform.
    env_platforms = os.environ.get("JAX_PLATFORMS", "")
    if env_platforms and "cpu" in env_platforms.split(","):
        try:
            jax.config.update("jax_platforms", env_platforms)
        except Exception:
            pass

    if args.f64:
        jax.config.update("jax_enable_x64", True)

    # persistent compilation cache: repeat captures of the same config
    # skip the multi-minute TPU compile (cache keys include the HLO and
    # compiler version, so stale hits are not a concern)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache"),
        )
    except Exception:
        pass

    if not args.aot:
        _probe_backend()
    import jax.numpy as jnp

    from opal_tpu import constants as const
    from opal_tpu.grid import GridGeometry
    from opal_tpu.sim import SimOptions, Simulation
    from opal_tpu.species import SpeciesSpec, initialize_device

    ndev = args.devices or len(jax.devices())
    if args.fused is None:
        args.fused = not (args.qed and args.particles >= 4e6)
    if not args.nx:
        # non-QED: dense-plasma geometry (two_stream-like, npc ~ 8k at
        # the 8.4M default).  QED: beam-deck geometry — the reference's
        # colliding_beams runs npc=100; a c-speed beam at npc ~ 8k/cell
        # would put thousands of leavers/step through every device
        # boundary and the migration machinery would dominate the
        # measurement
        args.nx = max(1024, int(args.particles) // 128) if args.qed \
            else 1024
    # non-QED drift bound: the two counter-streaming populations move
    # 0.0095 cells/step under CFL (BENCH_DRIFT_U below) — the window,
    # migration and deferred-exchange sizing all key on it
    BENCH_DRIFT_CELLS = 0.0095
    if not args.steps:
        # 1024-step timed blocks amortize per-call + once-per-program
        # sort costs (r4a: +9%); at north-star scale (>= 5e7 rows) 400
        # steps keeps the three blocks (2 warm + 1 timed) inside the
        # capture budget — the r4h program-length ladder showed length
        # is not the 1e8 lever (1.054e9 at spp100 vs 1.0587e9 at 200)
        args.steps = 50 if args.qed else (
            1024 if args.particles < 5e7 else 400
        )
    if not args.capacity_factor:
        # 1e8 rows x 13 f32 columns = 5.2 GB state; 1.25x slack plus
        # the sort double-buffer exceeded 16 GB HBM (r4c OOM) — the
        # r4d/r4k clean 1e8 captures all ran 1.1
        args.capacity_factor = 1.25 if args.particles < 5e7 else 1.1
    if not args.fused_resort:
        # 320 (r4i cadence stretch: 1.2724e9 vs 1.2537e9 at 192 —
        # fewer sorts; W stays 16 since disp(320) = 6 <= the window's
        # headroom).  The deferred-migration reach bound (drift *
        # exchange period <= HALO - 2 cells) is kept by exchanging
        # TWICE per sort period (migrate_every = resort // 2 below):
        # 160 * 0.0095 = 1.5 cells.
        # at north-star scale the r4k ladder measured R384 clean at
        # 1.18e9 (R320 untested there); at 8.39M R320 edges R384
        # (1.2724e9 vs 1.2688e9) — key the auto on scale
        args.fused_resort = 64 if args.qed else (
            256 if args.migrate_every
            else (320 if args.particles < 3.2e7 else 384)
        )
    if not args.migrate_every:
        # deferred exchange: one migration per HALF maintenance-sort
        # period (r4: each M=3 exchange cost ~1.17 ms/step of the 7.4
        # ms bench step; deferred it amortizes to ~0.01).  Half, not
        # full: 320 * 0.0095 = 3.0 cells would exceed the 2-cell
        # deposit/gather reach between exchanges; 160 * 0.0095 = 1.5
        # keeps the guarantee.  QED beams march at CFL speed — keep
        # the 3-step cadence there.
        args.migrate_every = 3 if args.qed else max(
            1, args.fused_resort // 2
        )
    if not args.fused_block:
        # 8192 with subblocks 16 (~131k rows/program) measured 1.171e9
        # pushes/s/chip on v5e (r3 sweep) at the honest W=16 window.
        # The QED kernel variant OOMs scoped VMEM above 2048, so --qed
        # keeps 2048.
        args.fused_block = 2048 if args.qed else 8192
    if not args.misfit_capacity:
        # the fallback-chain cost scales with CAPACITY, not live misfit
        # count (r4d: w16-m1024 cost 12%); r4k measured 2048 beating
        # the unbounded auto (3052) at 1e8 by 1.9% — cap the auto there
        args.misfit_capacity = min(
            2048, max(256, int(args.particles) // 32768)
        )
    if not args.fused_subblocks:
        # ~131k rows/program measured fastest non-QED on v5e (r3 sweep:
        # sub16 at blk8192 beat sub4/sub8 at every misfit capacity);
        # QED kernel variants carry more VMEM per block -> ~8k
        args.fused_subblocks = max(
            1, (8192 if args.qed else 131072) // args.fused_block
        )
    nx = args.nx - args.nx % ndev
    npc = max(1, int(args.particles) // nx)
    n_particles = nx * npc

    dx = 500.0
    dt = 0.95 * dx / const.SPEED_OF_LIGHT
    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=ndev)
    if args.qed:
        # colliding-beams physics: relativistic beam, QED on
        dx = 1.0e-8
        dt = 0.95 * dx / const.SPEED_OF_LIGHT
        geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=ndev)
    cap = int(n_particles // ndev * args.capacity_factor)
    if args.fused:  # fused kernel needs capacity % block == 0
        cap = -(-cap // args.fused_block) * args.fused_block
    # non-QED deck drift momentum (units of m_e c; v/c ~ u for u << 1)
    BENCH_DRIFT_U = 2.5e-24 / (const.ELECTRON_MASS * const.SPEED_OF_LIGHT)
    # auto-sized QED active-set compactions (mirrors cli.build; the
    # bench photon capacity equals the electron capacity)
    if args.emission_active < 0:
        # cap/32 (was cap/8): the r4f EC ladder measured the emission
        # machinery (row gather/scatter + sampler) scaling with EC —
        # 5.3e7 -> 1.2e8 pushes/s at 2.1M going 327k -> 64k, with ZERO
        # deferral even at 32k (real emitters/step ~ N rate dt).  An
        # undersized EC defers emission by a step (counted backlog
        # note), never loses it.
        args.emission_active = max(4096, cap // 32) if args.qed else 0
    if args.absorption_active < 0:
        args.absorption_active = max(4096, cap // 4) if args.qed else 0
    opts = SimOptions(
        dt=dt, current_deposition=args.deposition, migration=args.migration,
        photon_emission=args.qed,
        photon_absorption=args.qed and args.absorption,
        # sized for the real flux (CFL bounds leavers to one boundary
        # cell of particles per step; the non-QED bench plasma drifts
        # 0.01c, so ~20/side/step, while the QED beam marches 0.95
        # cells/step — npc leavers/side/step x the exchange cadence);
        # compact-migration searchsorted/gather/scatter cost scales
        # with this, so do not oversize -- oversizing 8x costs ~7 ms
        # per exchange on v5e.  Overflow is counted, never silent (sim
        # counters).
        migration_capacity=(
            -(-int(npc * args.migrate_every * 1.5 + 128) // 8) * 8
            if args.qed else
            # non-QED leaver flux: npc * drift-speed cells/step per
            # side x the exchange cadence (the fixed 512 of r2 voided
            # the 48M capture with 164k migration losses)
            -(-int(npc * args.migrate_every * 0.0095 * 1.5 + 384) // 8) * 8
        ),
        fused_misfit_capacity=args.misfit_capacity,
        absorption_candidates=64,
        absorption_block=args.absorption_block,
        absorption_active_capacity=args.absorption_active,
        emission_active_capacity=args.emission_active,
        sorted_pipeline=args.sorted_pipeline,
        fused_pusher=args.fused,
        packed_fused=args.packed,
        fused_lite=-1 if args.lite else 0,
        mxu_gather=args.mxu_gather,
        static_gather=args.static_gather,
        sort_rowgather=args.sort_rowgather,
        fused_subblocks=args.fused_subblocks,
        # the kernel re-anchors every block every step (exact fit-row
        # minima) and fits rel in [1, W-3], so a block spanning ``gap``
        # cells sustains while gap <= W - 4.  The bench knows its own
        # velocity spread exactly: the non-QED deck counter-streams at
        # +-drift (populations separate at 2v cells per c dt between
        # maintenance sorts), the QED beam is one-directional at ~c
        # (spread ~ 0).  W = ceil'd span + R steps of dispersion +
        # slack 2 — round 2's zero-headroom W=8 froze ~31% of pushes
        # and the captured 1.165e9 was void (VERDICT r2 weak #1).
        fused_window=args.fused_window or _auto_window(
            args.fused_block, npc, args.fused_resort,
            0.0 if args.qed else 2.0 * BENCH_DRIFT_U,
        ),
        fused_block=args.fused_block,
        fused_resort_every=args.fused_resort,
        migration_every=args.migrate_every,
        # lets _cadences honour a deferred --migrate-every (the CFL
        # default 0.95 caps M at 3 steps; the bench plasma's true
        # bound is 0.0095 cells/step)
        max_drift_cells_per_step=0.95 if args.qed else BENCH_DRIFT_CELLS,
        # the edge-exchange window must cover the leaver FRONT, which
        # marches npc * v rows/step through the (row-static) sorted
        # state between maintenance sorts: the bench plasma drifts
        # 0.01c (0.0095 cells/step under CFL); the QED beam 0.95
        migration_window=max(
            4096,
            -(-int(npc * ((0.95 if args.qed else 0.0095)
                          * args.fused_resort + 3)) // 8) * 8,
        ),
    )
    espec = SpeciesSpec.electron()
    specs = {"electron": espec}
    if args.qed:
        specs["photon"] = SpeciesSpec.photon()
    sim = Simulation(
        geom, opts, specs,
        dtype=jnp.float64 if args.f64 else jnp.float32,
    )

    drift = 2.5e-24 / (const.ELECTRON_MASS * const.SPEED_OF_LIGHT)
    # particles are generated on their owning devices: nothing big
    # crosses host->device (matters on remote-attached TPUs)
    if args.qed:
        ux_fn = lambda x, u, n: -1000.0 * (1.0 + 0.01 * n)
    else:
        ux_fn = lambda x, u, n: drift * (1.0 + 0.001 * n) * jnp.sign(u - 0.5)
    state = initialize_device(
        espec, geom, sim.mesh, npc,
        density=lambda x: jnp.full_like(jnp.asarray(x), 20.0),
        ux=ux_fn,
        uy=lambda x, u, n: jnp.zeros_like(x),
        uz=lambda x, u, n: jnp.zeros_like(x),
        dt=dt, capacity_per_device=cap, seed=0,
        dtype=jnp.float64 if args.f64 else jnp.float32,
    )
    species = {"electron": state}
    if args.qed:
        zero_fn = lambda x, u, n: jnp.zeros_like(jnp.asarray(x))
        species["photon"] = initialize_device(
            SpeciesSpec.photon(), geom, sim.mesh, 0,
            density=lambda x: jnp.zeros_like(jnp.asarray(x)),
            ux=zero_fn, uy=zero_fn, uz=zero_fn,
            dt=dt, capacity_per_device=cap, seed=1,
            dtype=jnp.float64 if args.f64 else jnp.float32,
        )
    E, B, J, rho = sim.init_fields()
    if args.qed:
        # Transverse field sized for a target quantum parameter on the
        # gamma=1000 beam: chi = gamma * B / B_crit.  The default
        # chi=0.02 emits ~0.25 photons/electron per 50 steps (the
        # colliding_beams crossing regime, chi_peak~0.12 but only a
        # fraction of the run emitting) so the 3x50-step bench fills
        # ~60% of the photon buffer with ZERO overflow churn.  chi=1
        # (the old deck) emits ~9/electron/50 steps — 7x capacity — and
        # measures nothing but overflow recycling while making the step
        # slow enough to trip the device's per-program wall-time
        # watchdog (see BASELINE.md, 2026-08-19 bisect).
        b0 = args.chi * const.CRITICAL_FIELD / (
            1000.0 * const.SPEED_OF_LIGHT
        )
        B = jax.device_put(jnp.zeros_like(B).at[:, 2].set(b0), B.sharding)
    counters = sim.zero_counters()
    key = jax.random.key(0)

    if args.steps_per_program < 0:
        # the tunnel watchdog kills ~30+ s programs: cap one program's
        # device time at ~16 s assuming ~1.2e9 pushes/s (over-estimates
        # at small N, where programs are short anyway)
        args.steps_per_program = (
            50 if args.qed
            else max(64, int(1.92e10 / max(1, n_particles)))
        )
    spp = args.steps_per_program or args.steps
    spp = min(spp, args.steps)
    # balance the chunks: a ragged tail (e.g. 400 steps at spp=192 ->
    # 192+192+16) compiles a second executable AND pays the
    # once-per-program maintenance sort for a 16-step program inside
    # the timed block — the r4k 1e8 capture ran spp=200 (exact halves)
    # and measured 1.8% over the auto's ragged 192
    spp = -(-args.steps // max(1, args.steps // spp))

    if args.aot:
        from jax.experimental import topologies
        from jax.sharding import SingleDeviceSharding

        from opal_tpu.fields import make_mesh

        if ndev != 1:
            _emit_error("--aot supports a single-chip topology only")
        topo = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:1x1x1",
            chips_per_host_bounds=(1, 1, 1),
        )
        sim_aot = Simulation(
            geom, opts, specs, mesh=make_mesh(1, devices=topo.devices),
            dtype=jnp.float64 if args.f64 else jnp.float32,
        )
        sim_aot._interpret = False
        sh = SingleDeviceSharding(topo.devices[0])
        absify = lambda x: jax.ShapeDtypeStruct(
            jnp.shape(x), jnp.asarray(x).dtype, sharding=sh
        )
        aargs = jax.tree.map(
            absify, (E, B, J, rho, species, 0.0, key, counters)
        )

        def stepfn(E, B, J, rho, species, t0, key, counters):
            return sim_aot.run(E, B, J, rho, species, t0, key, counters,
                               spp)

        t0 = time.monotonic()
        jax.jit(stepfn).trace(*aargs).lower().compile()
        print(json.dumps({
            "metric": "aot-compile",
            "value": round(time.monotonic() - t0, 1),
            "unit": "s",
            "vs_baseline": 1.0,
            "config": " ".join(argv if argv is not None else sys.argv[1:]),
        }))
        return

    def run_block(E, B, J, rho, species, t, counters, nsteps):
        # one executable (nsteps=spp) reused across the chunk loop; a
        # possible short tail chunk compiles a second shape once.  The
        # key splits per chunk (same scheme as the CLI's run_span)
        done, k = 0, key
        while done < nsteps:
            n = min(spp, nsteps - done)
            k, sub = jax.random.split(k)
            out = sim.run(E, B, J, rho, species, float(t), sub,
                          counters, n, donate=True)
            E, B, J, rho, species, t, counters = out
            done += n
        return out

    # warmup / compile — same program shape(s) as the timed block so
    # the cached executable(s) are reused.  Two warmup calls: the
    # second proves the carried-over state hits the same executable (a
    # sharding mismatch would silently recompile inside the timed
    # block).
    t0 = time.monotonic()
    out = run_block(E, B, J, rho, species, 0.0, counters, args.steps)
    jax.block_until_ready(out)
    compile_s = time.monotonic() - t0
    E, B, J, rho, species, t, counters = out
    out = run_block(E, B, J, rho, species, float(t), counters, args.steps)
    jax.block_until_ready(out)
    E, B, J, rho, species, t, counters = out

    if args.profile and jax.devices()[0].platform != "cpu":
        # jax.profiler.trace around a run on the tunnel-attached TPU in
        # this image wedges the device (round-1 postmortem); profiling
        # is CPU-only here.  Time with the scan harness instead.
        print("# bench: --profile disabled on non-cpu backends (wedges "
              "the axon tunnel); timing without a trace", file=sys.stderr)
        args.profile = None
    t0 = time.monotonic()
    if args.profile:
        with jax.profiler.trace(args.profile):
            out = run_block(
                E, B, J, rho, species, float(t), counters, args.steps
            )
            jax.block_until_ready(out)
    else:
        out = run_block(E, B, J, rho, species, float(t), counters,
                        args.steps)
        jax.block_until_ready(out)
    elapsed = time.monotonic() - t0

    pushes_per_sec = n_particles * args.steps / elapsed
    from opal_tpu.sim import counter_total

    counters = {k: counter_total(v) for k, v in out[6].items()}
    deferred = counters.pop("qed_deferred", 0)
    if any(counters.values()):
        # A nonzero loss counter means the step did NOT do the
        # reference's work (every particle pushed every step,
        # mod.rs:263-283): the throughput number is invalid.  Degrade
        # the bench to an error JSON instead of annotating a
        # healthy-looking capture (VERDICT r2 weak #1/#2).
        print(f"# ERROR buffer-overflow particle losses: {counters}",
              file=sys.stderr)
        _emit_error(
            "invalid: buffer-overflow particle losses "
            f"{counters} over {3 * args.steps} steps at "
            f"{pushes_per_sec / ndev:.4g} pushes/s/chip (number void: "
            "lost particles were not pushed/deposited)"
        )
    if deferred:
        print(f"# note: QED active-set backlog: {deferred} particle-steps "
              "deferred (delays, not losses)", file=sys.stderr)
    if args.verbose:
        print(
            f"# device={jax.devices()[0].device_kind} x{ndev} "
            f"N={n_particles:.3g} steps={args.steps} "
            f"compile={compile_s:.1f}s run={elapsed:.2f}s "
            f"steps/s={args.steps / elapsed:.2f}",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "macroparticle-pushes/sec/chip",
                "value": pushes_per_sec / ndev,
                "unit": "pushes/s",
                "vs_baseline": pushes_per_sec / BASELINE_NODE_PUSHES_PER_SEC,
                # measured-proxy node baseline (see PROXY_NODE_...):
                # this run's chips vs ONE 64-core reference CPU node
                "vs_node_proxy": pushes_per_sec / PROXY_NODE_PUSHES_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except KeyboardInterrupt:
        raise
    except Exception as exc:  # noqa: BLE001 - degrade, never traceback
        import traceback

        traceback.print_exc(file=sys.stderr)
        _emit_error(f"bench run failed: {exc!r}")
