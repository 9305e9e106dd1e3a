"""Hardware microbench: maintenance-sort strategies at bench scale.

The phase ladder attributes 2.28 ms/step to the sort phase (a
12-operand payload sort at 8.4M costs ~580 ms, amortized over the
resort cadence R=256; longer R loses more in edge-migration window
growth than it saves — r2g).  Candidates, all exact-equivalent:

  payload   lax.sort((key, p1..p11), num_keys=1)      (current)
  rowgather lax.sort((key, iota)) then packed[perm]   (one (n, 12)
            row-batched permutation gather — round-1 measured this
            2.7x slower at smaller shapes/old code; the QED work
            re-priced gathers as row-count-bound, so re-measure)
  colgather lax.sort((key, iota)) then 11 column gathers

Usage: python tools/sort_micro.py [--n 8388608] [--cols 11] [--steps 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8388608)
    ap.add_argument("--cols", type=int, default=11)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--cases", default="payload,rowgather,colgather")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    dev = jax.devices()[0]
    print(f"# device={dev.device_kind} n={args.n} cols={args.cols} "
          f"steps={args.steps}", flush=True)
    n, K = args.n, args.cols
    key = jax.random.PRNGKey(0)
    cols0 = jax.random.uniform(key, (n, K), jnp.float32)
    key0 = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 1024,
                              jnp.int32)

    def timed(name, body, carry0):
        @jax.jit
        def run(c):
            return lax.scan(body, c, None, length=args.steps)
        t0 = time.monotonic()
        out = jax.block_until_ready(run(carry0))
        comp = time.monotonic() - t0
        t0 = time.monotonic()
        out = jax.block_until_ready(run(carry0))
        el = time.monotonic() - t0
        print(f"{name:<12} {1e3 * el / args.steps:9.2f} ms/iter "
              f"(compile {comp:.1f}s)", flush=True)

    def perturb(skey, cols):
        # rotate the key so each iteration sorts fresh data
        return (skey + 7) % 1024, cols

    if "payload" in args.cases:
        def body(carry, _):
            skey, cols = carry
            out = lax.sort((skey, *(cols[:, i] for i in range(K))),
                           num_keys=1)
            return perturb(out[0], jnp.stack(out[1:], axis=1)), ()
        timed("payload", body, (key0, cols0))

    if "rowgather" in args.cases:
        def body(carry, _):
            skey, cols = carry
            sk, perm = lax.sort(
                (skey, jnp.arange(n, dtype=jnp.int32)), num_keys=1
            )
            return perturb(sk, cols[perm]), ()
        timed("rowgather", body, (key0, cols0))

    if "colgather" in args.cases:
        def body(carry, _):
            skey, cols = carry
            sk, perm = lax.sort(
                (skey, jnp.arange(n, dtype=jnp.int32)), num_keys=1
            )
            out = jnp.stack([cols[:, i][perm] for i in range(K)], axis=1)
            return perturb(sk, out), ()
        timed("colgather", body, (key0, cols0))


if __name__ == "__main__":
    main()
