"""Phase-level timing of the absorption pass at bench --qed shapes.

Times, each as a state-feedback lax.scan (outputs perturb next inputs
so XLA cannot hoist the work):

  full      absorb() end to end (presorted=False)
  sort8     the 8-operand pairing sort alone
  segtab    searchsorted segment tables + per-photon start/end gathers
  active    active-photon compaction (roll + misfit_compact + row gather)
  cand      per-cell candidate table build
  walk      the fori_loop candidate walk alone (prebuilt inputs)
  events    event application (kicks + bookkeeping + stimulated insert)
            measured as full - (sort8+segtab+active+cand+walk) residual

Usage: python tools/absorb_micro.py [--n 2097152] [--steps 10]
       [--candidates 64] [--block 32] [--active -1]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2097152)
    ap.add_argument("--nx", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--candidates", type=int, default=64)
    ap.add_argument("--block", type=int, default=32)
    ap.add_argument("--active", type=int, default=-1)
    ap.add_argument("--cases", default="all")
    ap.add_argument("--no-sorted-active", dest="sorted_active",
                    action="store_false", default=True,
                    help="A/B: rotation-scrambled active-set order")
    ap.add_argument("--ablate", default="",
                    help="comma list for SimOptions.debug_absorb_ablate "
                         "(walk,kicks,insert,scatter,book) applied to "
                         "the 'full' case")
    args = ap.parse_args()

    import os

    import jax

    # the site TPU hook ignores JAX_PLATFORMS for plain scripts: honor
    # an explicit cpu request so smoke runs cannot grab (and perturb)
    # the tunnel-attached chip
    envp = os.environ.get("JAX_PLATFORMS", "")
    if envp and "cpu" in envp.split(","):
        jax.config.update("jax_platforms", envp)
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from types import SimpleNamespace

    from opal_tpu import constants as const
    from opal_tpu.grid import GridGeometry, HALO
    from opal_tpu.interactions import absorb
    from opal_tpu.ops.fused import misfit_compact
    from opal_tpu.sim import SimOptions
    from opal_tpu.species import SpeciesSpec, _empty_fields, ParticleState

    dev = jax.devices()[0]
    n = args.n
    cap = int(n * 1.25)
    nx = args.nx
    npc = n // nx
    A = args.active if args.active >= 0 else max(4096, cap // 4)
    print(f"# device={dev.device_kind} n={n} cap={cap} nx={nx} "
          f"K={args.candidates} B={args.block} A={A}", flush=True)

    dx = 1.0e-8
    dt = 0.95 * dx / const.SPEED_OF_LIGHT
    geom = GridGeometry(nx=nx, dx=dx, xmin=0.0, n_devices=1)
    opt = SimOptions(
        dt=dt, photon_absorption=True, photon_emission=True,
        absorption_candidates=args.candidates,
        absorption_block=args.block,
        absorption_active_capacity=A,
        absorption_sorted_active=1 if args.sorted_active else 0,
        debug_absorb_ablate=args.ablate,
    )
    sim = SimpleNamespace(geom=geom, options=opt, specs=None)

    rng = np.random.RandomState(0)
    f32 = np.float32

    def mk(spec, count, photon):
        f = _empty_fields(spec, cap, f32)
        cells = rng.randint(0, geom.n_loc, count)
        f["cell"][:count] = np.sort(cells) if not photon else cells
        f["x"][:count] = rng.rand(count)
        f["weight"][:count] = 1e10
        f["alive"][:count] = True
        f["gamma"][:count] = 1000.0 if not photon else 50.0
        f["ux"][:count] = -1000.0 if not photon else -50.0
        f["chi"][:count] = 1.0 if not photon else 2.0
        if photon:
            f["tau_abs"][:] = 1e6  # no events: steady-state walk cost
            f["tau_st"][:] = 1e6
            f["birth_time"][:] = 0.0
        return ParticleState(**{
            k: (None if v is None else jnp.asarray(v)) for k, v in f.items()
        })

    e = mk(SpeciesSpec.electron(), n, False)
    ph = mk(SpeciesSpec.photon(), int(0.6 * cap), True)
    key = jax.random.key(1)

    def scan_time(name, body, carry0, steps):
        @jax.jit
        def run(c):
            return lax.scan(body, c, None, length=steps)
        t0 = time.monotonic()
        out = jax.block_until_ready(run(carry0))
        comp = time.monotonic() - t0
        t0 = time.monotonic()
        out = jax.block_until_ready(run(carry0))
        el = time.monotonic() - t0
        print(f"{name:<10} {1e3 * el / steps:9.3f} ms/iter "
              f"(compile {comp:.1f}s)", flush=True)
        return el / steps

    cases = (args.cases.split(",") if args.cases != "all"
             else ["full", "sort8", "segtab", "active", "cand", "walk"])

    pad = HALO
    n_cells = geom.n_loc + 2 * pad

    if "full" in cases:
        def body(carry, _):
            ee, pp = carry
            sp, _ovf, _d = absorb(
                sim, {"electron": ee, "photon": pp}, 0.0, key,
            )
            import dataclasses
            pp2 = dataclasses.replace(
                sp["photon"],
                tau_abs=sp["photon"].tau_abs + 1e-6,  # feedback
            )
            return (sp["electron"], pp2), None
        scan_time("full", body, (e, ph), args.steps)

    if "sort8" in cases:
        def body(carry, _):
            ck, g, ux, uy, uz, chi, w = carry
            out = lax.sort(
                (ck, jnp.arange(cap, dtype=jnp.int32), g, ux, uy, uz,
                 chi, w), num_keys=1,
            )
            return (out[0] ^ 1, out[2], out[3], out[4], out[5], out[6],
                    out[7]), None
        ck = jnp.where(e.alive, e.cell + pad, n_cells).astype(jnp.int32)
        scan_time("sort8", body,
                  (ck, e.gamma, e.ux, e.uy, e.uz, e.chi, e.weight),
                  args.steps)

    if "segtab" in cases:
        cells = jnp.arange(n_cells, dtype=jnp.int32)
        sorted_cells = jnp.sort(
            jnp.where(e.alive, e.cell + pad, n_cells).astype(jnp.int32))
        def body(carry, _):
            sc, pc = carry
            seg_start = jnp.searchsorted(sc, cells, side="left")
            seg_end = jnp.searchsorted(sc, cells, side="right")
            ps = seg_start[pc]
            pe = seg_end[pc]
            return (sc + (ps[0] % 2), (pc + pe[-1] % 2) % n_cells), None
        pc = jnp.clip(ph.cell + pad, 0, n_cells - 1)
        scan_time("segtab", body, (sorted_cells, pc), args.steps)

    if "active" in cases:
        def body(carry, _):
            has, = carry
            rot = jax.random.randint(key, (), 0, cap)
            atab, ovf = misfit_compact(
                jnp.roll(has, -rot).astype(jnp.float32), A)
            return (jnp.roll(has, atab[0] % 2),), None
        scan_time("active", body, (ph.alive,), args.steps)

    if "cand" in cases:
        sorted_cells = jnp.sort(
            jnp.where(e.alive, e.cell + pad, n_cells).astype(jnp.int32))
        e_table = jnp.stack(
            [e.gamma, e.ux, e.uy, e.uz, e.chi, e.weight], axis=-1)
        cells = jnp.arange(n_cells, dtype=jnp.int32)
        B = args.block
        nb = -(-args.candidates // B)
        def body(carry, _):
            et, = carry
            seg_start = jnp.searchsorted(sorted_cells, cells, side="left")
            seg_end = jnp.searchsorted(sorted_cells, cells, side="right")
            karr = jnp.arange(nb * B, dtype=jnp.int32)
            ci = seg_start[:, None] + karr[None, :]
            ok = (karr[None, :] < args.candidates) & (ci < seg_end[:, None])
            cand = et[jnp.clip(ci, 0, cap - 1)]
            cand = jnp.concatenate(
                [cand[..., :5],
                 jnp.where(ok, cand[..., 5], 0.0)[..., None],
                 ok.astype(cand.dtype)[..., None]], axis=-1)
            blocks = cand.reshape(n_cells, nb, B * 7)
            return (et + blocks[0, 0, 0] * 1e-30,), None
        scan_time("cand", body, (e_table,), args.steps)

    if "walk" in cases:
        from opal_tpu.qed import cross_sections
        B = args.block
        nb = -(-args.candidates // B)
        blocks = jnp.zeros((n_cells, nb, B * 7), jnp.float32)
        blocks = blocks.at[..., 0::7].set(1000.0)   # p0
        blocks = blocks.at[..., 1::7].set(-999.999) # px
        blocks = blocks.at[..., 4::7].set(1.0)      # chi_e
        blocks = blocks.at[..., 5::7].set(1e10)     # w
        blocks = blocks.at[..., 6::7].set(1.0)      # valid
        w_cell = jnp.clip(ph.cell + pad, 0, n_cells - 1)[:A]
        w_k4 = jnp.stack(
            [jnp.full((A,), 50.0), jnp.full((A,), -49.999),
             jnp.zeros((A,)), jnp.zeros((A,))], axis=1).astype(jnp.float32)
        w_chi = jnp.full((A,), 2.0, jnp.float32)
        cdt_dx = const.SPEED_OF_LIGHT * dt / dx

        def body(carry, _):
            tau_abs, tau_st = carry
            done = jnp.zeros(A, bool)
            def wbody(bi, c):
                ta, ts, dn = c
                blk = lax.dynamic_index_in_dim(blocks, bi, axis=1,
                                               keepdims=False)
                rows = blk[w_cell].reshape(A, B, 7)
                p4 = rows[..., 0:4]
                chi_e = rows[..., 4]
                w_e = rows[..., 5]
                valid = (~dn)[:, None] & (rows[..., 6] > 0.5)
                sa, _ = cross_sections.photon_absorption(
                    w_k4[:, None, :], p4, w_chi[:, None], chi_e)
                pa = jnp.where(valid, w_e * cdt_dx * sa, 0.0)
                ss, _ = cross_sections.stimulated_emission(
                    w_k4[:, None, :], p4, w_chi[:, None], chi_e)
                ps_ = jnp.where(valid, w_e * cdt_dx * ss, 0.0)
                ca = jnp.cumsum(pa, axis=1)
                cs = jnp.cumsum(ps_, axis=1)
                fire = valid & ((ta[:, None] - ca) < 0.0)
                ta = ta - ca[:, -1]
                ts = ts - cs[:, -1]
                dn = dn | jnp.any(fire, axis=1)
                return ta, ts, dn
            ta, ts, dn = lax.fori_loop(0, nb, wbody,
                                       (tau_abs, tau_st, done))
            return (ta + 1e6 * dn.astype(jnp.float32), ts), None
        scan_time("walk", body,
                  (jnp.full((A,), 1e6, jnp.float32),
                   jnp.full((A,), 1e6, jnp.float32)), args.steps)


if __name__ == "__main__":
    main()
