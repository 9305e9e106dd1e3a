"""Per-op attribution of the misfit fallback chain at bench shapes.

The phase ladder measures the whole chain (~1.07 ms/step at 8.4M rows,
cap 256 on v5e, r4); this microbench times the chain's op groups in a
chained scan (state feedback defeats loop-invariant hoisting):

  compact   misfit_compact (blocked cumsum at N + searchsorted at cap)
  takes     13 column takes at cap rows (mode=fill)
  push      fields_at + vay_push at cap rows
  deposit   unsorted scatter deposit at cap rows
  scatters  13 column scatters at cap rows (mode=drop)

Usage: python tools/misfit_micro.py [--particles 8.4e6] [--cap 256]
       [--steps 200] [--stages compact,takes,push,deposit,scatters]
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
    p.add_argument("--cap", type=int, default=256)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument(
        "--stages",
        default="compact,takes,push,deposit,scatters",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from opal_tpu import constants as const
    from opal_tpu.grid import HALO
    from opal_tpu.ops.deposit import deposit, deposit_onehot
    from opal_tpu.ops.fused import PAD, deposit_into_slab, misfit_compact
    from opal_tpu.ops.interp import fields_at
    from opal_tpu.ops.pusher import vay_push

    n = int(args.particles)
    cap = args.cap
    nx = args.nx
    dx = 500.0
    dt = 0.95 * dx / const.SPEED_OF_LIGHT
    n_slab = nx + 2 * HALO
    rng = np.random.default_rng(0)

    names = ["cell", "x", "y", "z", "ux", "uy", "uz", "gamma", "tau",
             "work", "prev_x", "chi", "weight"]
    cols0 = {
        nm: jnp.asarray(rng.random(n), jnp.float32) for nm in names
    }
    cols0["cell"] = jnp.asarray(rng.integers(0, nx, n), jnp.int32)
    cols0["gamma"] = cols0["gamma"] + 1.0
    miss0 = jnp.asarray((rng.random(n) < 200.0 / n), jnp.float32)
    E_slab = jnp.zeros((n_slab, 3), jnp.float32)
    B_slab = jnp.zeros((n_slab, 3), jnp.float32)
    J0 = jnp.zeros((n_slab, 3), jnp.float32)
    rho0 = jnp.zeros((n_slab,), jnp.float32)
    slab0 = jnp.zeros((n_slab + 2 * PAD, 16), jnp.float32)

    def chain(stages):
        stages = set(stages)

        def body(carry, _):
            cols, miss, J, rho, slab = carry
            if "compact" in stages:
                mtab, movf = misfit_compact(miss, cap)
            else:
                mtab = jnp.arange(cap, dtype=jnp.int32)
                movf = jnp.zeros((), jnp.int32)
            tk = lambda a, f: jnp.take(a, mtab, axis=0, mode="fill",
                                       fill_value=f)
            if "takes" in stages:
                m = {nm: tk(cols[nm], 0) for nm in names}
                m["gamma"] = tk(cols["gamma"], 1.0)
                m["tau"] = tk(cols["tau"], jnp.inf)
            else:
                m = {nm: cols[nm][:cap] for nm in names}
            m_u = jnp.stack([m["ux"], m["uy"], m["uz"]], axis=1)
            if "push" in stages:
                Ep, Bp = fields_at(
                    E_slab, B_slab, m["cell"].astype(jnp.int32) + HALO,
                    m["x"],
                )
                res = vay_push(
                    m["cell"].astype(jnp.int32), m["x"], m["y"], m["z"],
                    m_u, m["gamma"], m["tau"], m["work"], Ep, Bp, dx, dt,
                )
                fb = dict(
                    cell=res.cell, x=res.x, prev_x=res.prev_x, y=res.y,
                    z=res.z, ux=res.u[:, 0], uy=res.u[:, 1],
                    uz=res.u[:, 2], gamma=res.gamma, chi=res.chi,
                    tau=res.tau, work=res.work, weight=m["weight"],
                )
                vel = const.SPEED_OF_LIGHT * res.u / res.gamma[:, None]
            else:
                fb = dict(m)
                fb["cell"] = m["cell"].astype(jnp.int32)
                vel = m_u
            if "deposit" in stages:
                J, rho = deposit(
                    J, rho, fb["cell"] + HALO, fb["x"],
                    fb["prev_x"], m["weight"], vel, dx, dt,
                )
            if "deposit1h" in stages:
                J, rho = deposit_onehot(
                    J, rho, fb["cell"] + HALO, fb["x"],
                    fb["prev_x"], m["weight"], vel, dx, dt,
                )
            if "depositslab" in stages:
                slab = deposit_into_slab(
                    slab, fb["cell"] + HALO + PAD, fb["x"],
                    fb["prev_x"], m["weight"], vel, dx, dt,
                )
            # sub-part isolation stages (r4d: all three deposit
            # variants cost ~1.9 ms/step at 256 rows on v5e while
            # takes/scatters are free — find which piece pays)
            if "vals" in stages:
                # tap values only; scalar feedback, no reduction
                from opal_tpu.ops.deposit import _particle_values
                v15, _ = _particle_values(
                    fb["x"], fb["prev_x"], m["weight"], vel[:, 1],
                    vel[:, 2], dx, dt,
                )
                rho = rho + jnp.sum(v15) * 0
            if "matmul" in stages:
                # one-hot + MXU contraction, result NOT carried (sum
                # feeds a scalar leg): isolates the contraction from
                # the slab read-modify-write
                from opal_tpu.ops.deposit import _particle_values
                v15, _ = _particle_values(
                    fb["x"], fb["prev_x"], m["weight"], vel[:, 1],
                    vel[:, 2], dx, dt,
                )
                row = fb["cell"] + HALO + PAD
                nr = n_slab + 2 * PAD
                O = (row[:, None] == jnp.arange(nr, dtype=row.dtype)[None, :]
                     ).astype(v15.dtype)
                contrib = lax.dot_general(
                    O, v15, (((0,), (0,)), ((), ()))
                )
                rho = rho + jnp.sum(contrib) * 0
            if "slabadd" in stages:
                # carried-slab accumulate of a CHEAP tensor (no
                # matmul): isolates the carry read-modify-write
                slab = slab + jnp.float32(1e-30)
            if "scatters" in stages:
                sc = lambda a, v: a.at[mtab].set(
                    v.astype(a.dtype), mode="drop"
                )
                cols = {
                    nm: sc(cols[nm], fb[nm]) for nm in names
                }
            else:
                # feed SOMETHING back so nothing hoists
                cols = {**cols, "x": cols["x"] + movf.astype(jnp.float32) * 0}
            # state feedback: miss depends on x so the chain can't hoist
            miss = jnp.where(cols["x"] > 2.0, 1.0, miss)
            return (cols, miss, J, rho, slab), None

        def run(cols, miss, J, rho, slab):
            (cols, miss, J, rho, slab), _ = lax.scan(
                body, (cols, miss, J, rho, slab), None, length=args.steps
            )
            return cols["x"], miss, J, rho, slab

        return jax.jit(run)

    print(f"# n={n} cap={cap} steps={args.steps}", file=sys.stderr)
    results = {}
    ladder = args.stages.split(",")
    for k in range(len(ladder) + 1):
        stages = ladder[:k]
        label = "+".join(stages) if stages else "baseline"
        f = chain(stages)
        t0 = time.monotonic()
        out = f(cols0, miss0, J0, rho0, slab0)
        jax.block_until_ready(out)
        compile_s = time.monotonic() - t0
        t0 = time.monotonic()
        out = f(cols0, miss0, J0, rho0, slab0)
        jax.block_until_ready(out)
        ms = 1e3 * (time.monotonic() - t0) / args.steps
        results[label] = ms
        print(f"{label:45s} compile={compile_s:5.1f}s ms/step={ms:7.3f}",
              file=sys.stderr, flush=True)
    prev = None
    for label, ms in results.items():
        if prev is not None:
            print(f"  delta {label}: {ms - prev:+.3f} ms", file=sys.stderr)
        prev = ms


if __name__ == "__main__":
    main()
