"""Microbenchmark the QED step's building blocks on the attached device.

Times each suspect independently at bench-deck shapes so a single chip
session attributes the QED step cost (the 2026-08-19 r2d capture measured
emission-only at ~0.44 s/step and full QED at ~2.25 s/step at 2.1M
particles, vs 7.7 ms non-QED — these are latency-bound data-movement
costs, not FLOPs).

Usage: python tools/qed_micro.py [--n 2097152] [--ec 262144]
                                 [--cases sample,searchsorted,...]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, reps=5):
    import jax

    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2097152)
    ap.add_argument("--ec", type=int, default=262144)
    ap.add_argument("--nph", type=int, default=2621440)
    ap.add_argument("--cases", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from opal_tpu.qed import emission
    from opal_tpu.ops.fused import misfit_compact

    dev = jax.devices()[0]
    print(f"# device={dev.device_kind}", flush=True)
    n, ec, nph = args.n, args.ec, args.nph
    cases = args.cases.split(",") if args.cases != "all" else [
        "rate", "sample", "compact", "searchsorted", "gather_scatter",
        "segments",
    ]

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    f32 = jnp.float32

    if "rate" in cases:
        chi = jax.random.uniform(ks[0], (n,), f32, 0.005, 0.1)
        gam = jnp.full((n,), 1000.0, f32)
        ms = timeit(jax.jit(emission.rate), chi, gam)
        print(f"rate            n={n:>9}  {ms:8.2f} ms")

    if "sample" in cases:
        chi = jax.random.uniform(ks[0], (ec,), f32, 0.005, 0.1)
        gam = jnp.full((ec,), 1000.0, f32)
        r1 = jax.random.uniform(ks[1], (ec,), f32, 1e-6, 1.0)
        r2 = jax.random.uniform(ks[2], (ec,), f32, 1e-6, 1.0)
        r3 = jax.random.uniform(ks[3], (ec,), f32)
        ms = timeit(jax.jit(emission.sample), chi, gam, r1, r2, r3)
        print(f"sample          ec={ec:>8}  {ms:8.2f} ms")

    if "compact" in cases:
        mask = jax.random.bernoulli(ks[4], 0.01, (n,)).astype(f32)
        f = jax.jit(lambda m: misfit_compact(m, ec))
        ms = timeit(f, mask)
        print(f"misfit_compact  n={n:>9} cap={ec}  {ms:8.2f} ms")

    if "searchsorted" in cases:
        # the insert/compaction shape: cap consecutive-integer queries
        # into an N-long monotone array
        R = jnp.cumsum(jax.random.bernoulli(ks[4], 0.01, (nph,)).astype(jnp.int32))
        q = jnp.arange(1, ec + 1, dtype=jnp.int32)
        for method in ("scan", "scan_unrolled", "sort"):
            f = jax.jit(lambda R, q, m=method: jnp.searchsorted(R, q, method=m))
            try:
                ms = timeit(f, R, q)
                print(f"searchsorted[{method:>13}] N={nph} q={ec}  {ms:8.2f} ms")
            except Exception as e:  # scan_unrolled may blow compile
                print(f"searchsorted[{method:>13}] FAILED: {type(e).__name__}")
        # the absorb segment shape: n_ph queries into n_e sorted cells
        cells_e = jnp.sort(jax.random.randint(ks[5], (n,), 0, 16384))
        cells_p = jax.random.randint(ks[6], (nph,), 0, 16384)
        for method in ("scan", "sort"):
            f = jax.jit(lambda a, v, m=method: jnp.searchsorted(a, v, method=m))
            ms = timeit(f, cells_e, cells_p)
            print(f"seg searchsorted[{method:>5}] n_e={n} n_ph={nph}  {ms:8.2f} ms")
        # small-table variant: per-cell boundaries then a photon gather
        def seg_via_cells(a, v):
            bnd = jnp.searchsorted(a, jnp.arange(16385, dtype=a.dtype))
            return bnd[v]
        ms = timeit(jax.jit(seg_via_cells), cells_e, cells_p)
        print(f"seg via cell-bnd + gather                {ms:8.2f} ms")

    if "gather_scatter" in cases:
        col = jax.random.uniform(ks[5], (n,), f32)
        idx = jnp.sort(jax.random.randint(ks[6], (ec,), 0, n))
        g = jax.jit(lambda c, i: c[i])
        ms = timeit(g, col, idx)
        print(f"gather (ec from n) x1 col              {ms:8.2f} ms")
        vals = jax.random.uniform(ks[7], (ec,), f32)
        s = jax.jit(lambda c, i, v: c.at[i].set(v, mode="drop"))
        ms = timeit(s, col, idx, vals)
        print(f"scatter (ec into n) x1 col             {ms:8.2f} ms")

    if "segments" in cases:
        # the absorb candidate-walk row gather: (nw, B, 6) from (n, 6)
        et = jax.random.uniform(ks[5], (n, 6), f32)
        idx = jax.random.randint(ks[6], (ec, 32), 0, n)
        f = jax.jit(lambda t, i: t[i])
        ms = timeit(f, et, idx)
        print(f"walk row gather (ec x 32 x 6)          {ms:8.2f} ms")


if __name__ == "__main__":
    main()
