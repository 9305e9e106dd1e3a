"""Microbenchmark of the fused Pallas kernel in isolation.

Times a lax.scan whose body is ONLY fused_push_deposit (state columns
fed back through the carry), so the number it prints is the kernel's
own per-step device time at the bench shapes — separating it from the
rest of the step (migration, sort, halo, field ops, misfit fallback).

Usage: python tools/kernel_bench.py [--particles 8.4e6] [--window 16]
       [--block 2048] [--steps 50] [--no-deposit-matmul]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--particles", type=float, default=8.0 * 2**20)
    p.add_argument("--nx", type=int, default=1024)
    p.add_argument("--window", type=int, default=16)
    p.add_argument("--block", type=int, default=2048)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--dep-skip", action="store_true")
    p.add_argument("--lite", action="store_true",
                   help="FusedSpec.lite: skip the chi/gamma-half/prev_x "
                        "output legs (the non-QED default path)")
    p.add_argument("--subblocks", type=int, default=1,
                   help="logical blocks per grid program "
                        "(FusedSpec.subblocks)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from opal_tpu import constants as const
    from opal_tpu.ops import fused as F

    HALO = 4
    nx = args.nx
    npc = max(1, int(args.particles) // nx)
    n = nx * npc
    n = -(-n // args.block) * args.block
    dx = 500.0
    dt = 0.95 * dx / const.SPEED_OF_LIGHT
    n_rows = nx + 2 * HALO + 2 * F.PAD
    spec = F.FusedSpec(
        block=args.block, window=args.window, n_rows=n_rows, dx=dx, dt=dt,
        charge=const.ELECTRON_CHARGE, mass=const.ELECTRON_MASS,
        dep_skip=args.dep_skip, row_off=HALO + F.PAD, lite=args.lite,
        subblocks=args.subblocks,
    )

    rng = np.random.default_rng(0)
    cells = np.sort(rng.integers(0, nx, n)).astype(np.int32)
    rows = jnp.asarray(cells)
    x = jnp.asarray(rng.random(n, dtype=np.float32))
    u = jnp.asarray(1e-2 * rng.standard_normal((n, 3)).astype(np.float32))
    g = jnp.sqrt(1.0 + jnp.sum(u * u, axis=1))
    # weight column (the kernel folds in the species charge itself)
    q = jnp.full((n,), 20.0 * dx / npc, jnp.float32)
    work = jnp.zeros((n,), jnp.float32)
    E = (2e3 * rng.standard_normal((nx + 2 * HALO, 3))).astype(np.float32)
    B = (1e-5 * rng.standard_normal((nx + 2 * HALO, 3))).astype(np.float32)
    eb = F.make_eb_rows(jnp.asarray(E), jnp.asarray(B))
    anchors = F.block_anchors(spec, rows)

    def body(carry, _):
        rows, x, ux, uy, uz, g, work, anch = carry
        cols, miss, out_slab, anch2 = F.fused_push_deposit(
            spec, anch, rows, x, jnp.zeros_like(x), jnp.zeros_like(x),
            ux, uy, uz, g, q, work, eb,
            interpret=jax.default_backend() == "cpu",
        )
        # feed positions/momenta back but RESET rows/anchors so the
        # state never drifts out of window over the scan
        return (
            rows, cols["x"], cols["ux"], cols["uy"], cols["uz"],
            cols["gamma"], cols["work"], anch,
        ), (jnp.sum(miss), out_slab[0, 0])

    @jax.jit
    def run(carry):
        return lax.scan(body, carry, None, length=args.steps)

    carry0 = (rows, x, u[:, 0], u[:, 1], u[:, 2], g, work, anchors)
    t0 = time.monotonic()
    out = jax.block_until_ready(run(carry0))
    compile_s = time.monotonic() - t0
    t0 = time.monotonic()
    out = jax.block_until_ready(run(carry0))
    elapsed = time.monotonic() - t0
    miss_total = float(jnp.sum(out[1][0]))
    print(
        f"N={n:.3g} W={spec.window} block={spec.block} steps={args.steps} "
        f"compile={compile_s:.1f}s run={elapsed:.3f}s "
        f"ms/step={1e3 * elapsed / args.steps:.3f} "
        f"ns/particle={1e9 * elapsed / args.steps / n:.3f} "
        f"miss={miss_total:.0f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
