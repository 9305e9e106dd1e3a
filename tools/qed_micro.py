"""Microbenchmark the QED step's building blocks on the attached device.

Each case runs as a lax.scan with STATE FEEDBACK (outputs perturb the
next iteration's inputs) so XLA cannot hoist or overlap the work — the
plain timeit-style harness measured 200 MB gathers at "0.04 ms"
(loop-invariant code motion / async overlap; see BASELINE.md round-1
continuation-3 notes).  Timed as one compiled program of STEPS
iterations; reported per iteration.

Usage: python tools/qed_micro.py [--n 2097152] [--ec 262144]
                                 [--steps 20] [--cases a,b,...]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2097152)
    ap.add_argument("--ec", type=int, default=262144)
    ap.add_argument("--nph", type=int, default=2621440)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cases", default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from opal_tpu.qed import emission
    from opal_tpu.ops.fused import misfit_compact

    dev = jax.devices()[0]
    print(f"# device={dev.device_kind} steps={args.steps}", flush=True)
    n, ec, nph, steps = args.n, args.ec, args.nph, args.steps
    cases = args.cases.split(",") if args.cases != "all" else [
        "rate", "sample", "compact", "ss_scan", "ss_sort",
        "gather", "scatter", "walk",
    ]
    f32 = jnp.float32
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    def scan_time(name, body, carry0):
        @jax.jit
        def run(c):
            return lax.scan(body, c, None, length=steps)
        t0 = time.monotonic()
        out = jax.block_until_ready(run(carry0))
        comp = time.monotonic() - t0
        t0 = time.monotonic()
        out = jax.block_until_ready(run(carry0))
        el = time.monotonic() - t0
        print(f"{name:<28} {1e3 * el / steps:9.3f} ms/iter "
              f"(compile {comp:.1f}s)", flush=True)
        return out

    if "rate" in cases:
        chi0 = jax.random.uniform(ks[0], (n,), f32, 0.005, 0.1)
        gam = jnp.full((n,), 1000.0, f32)

        def body(chi, _):
            r = emission.rate(chi, gam)
            return chi * (1.0 + 1e-12 * jnp.tanh(r * 1e-18)), ()
        scan_time(f"rate n={n}", body, chi0)

    if "sample" in cases:
        chi0 = jax.random.uniform(ks[0], (ec,), f32, 0.005, 0.1)
        gam = jnp.full((ec,), 1000.0, f32)
        r1 = jax.random.uniform(ks[1], (ec,), f32, 1e-6, 1.0)
        r2 = jax.random.uniform(ks[2], (ec,), f32, 1e-6, 1.0)
        r3 = jax.random.uniform(ks[3], (ec,), f32)

        def body(carry, _):
            chi, r1c = carry
            o, th, cp = emission.sample(chi, gam, r1c, r2, r3)
            chi2 = jnp.clip(chi * (1.0 + 1e-10 * jnp.tanh(o)), 0.005, 0.1)
            r1n = jnp.clip(r1c * (1.0 + 1e-10 * jnp.tanh(th)), 1e-6, 1.0)
            return (chi2, r1n), ()
        scan_time(f"sample ec={ec}", body, (chi0, r1))

    if "compact" in cases:
        m0 = jax.random.bernoulli(ks[4], 0.01, (n,)).astype(f32)

        def body(m, _):
            tab, ovf = misfit_compact(m, ec)
            upd = jnp.zeros_like(m).at[jnp.clip(tab, 0, n - 1)].add(1e-12)
            return jnp.clip(m + upd, 0.0, 1.0), ()
        scan_time(f"misfit_compact n={n} cap={ec}", body, m0)

    if "ss_scan" in cases or "ss_sort" in cases:
        R0 = jnp.cumsum(
            jax.random.bernoulli(ks[4], 0.1, (nph,)).astype(jnp.int32)
        )
        q0 = jnp.arange(1, ec + 1, dtype=jnp.int32)
        for m in ("scan", "sort"):
            if f"ss_{m}" not in cases:
                continue

            def body(q, _, m=m):
                tab = jnp.searchsorted(R0, q, method=m).astype(jnp.int32)
                return jnp.clip(tab % nph, 1, nph), ()
            scan_time(f"searchsorted[{m}] N={nph} q={ec}", body, q0)

    if "gather" in cases:
        col = jax.random.uniform(ks[5], (n,), f32)
        idx0 = jnp.sort(jax.random.randint(ks[6], (ec,), 0, n))

        def body(idx, _):
            y = col[idx]
            return (idx + (y > 0.5).astype(jnp.int32)) % n, ()
        scan_time(f"gather ec={ec} from n={n}", body, idx0)

    if "scatter" in cases:
        col0 = jax.random.uniform(ks[5], (n,), f32)
        idx = jnp.sort(jax.random.randint(ks[6], (ec,), 0, n))
        vals = jax.random.uniform(ks[7], (ec,), f32)

        def body(col, _):
            col = col.at[idx].set(vals + col[0])
            return col, ()
        scan_time(f"scatter ec={ec} into n={n}", body, col0)

    if "walk" in cases:
        et = jax.random.uniform(ks[5], (n, 6), f32)
        idx0 = jax.random.randint(ks[6], (ec, 32), 0, n)

        def body(idx, _):
            rows = et[idx]  # (ec, 32, 6)
            return (idx + (rows[..., 0] > 0.5).astype(jnp.int32)) % n, ()
        scan_time(f"walk row gather ({ec}, 32, 6)", body, idx0)


if __name__ == "__main__":
    main()
