"""Raw-float energy-ledger closure for a QED emission deck.

The ``{i}_energy.dat`` files print 6 significant figures (reference
format parity, ``main.rs:23-42``), which quantizes a closure
measurement at the 1e-5 level.  This tool runs a deck through the same
build + stepping machinery as the CLI but computes the ledger from the
raw float energies:

    closure = |electron_loss - photon_gain| / photon_gain

over the full run window (deposition-off decks: the only other
electron energy channel is laser work, which nets ~0 over a complete
crossing).  Prints one JSON line.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/ledger_closure.py examples/colliding_beams.yaml \
        [--f64] [--devices 8] [--chunk 500]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--f64", action="store_true",
                   help="all-f64 parity mode (default: mixed precision)")
    p.add_argument("--chunk", type=int, default=500,
                   help="steps per compiled program")
    p.add_argument("--no-emission", action="store_true",
                   help="diagnostic: disable photon emission so the "
                        "only electron energy channel is laser work — "
                        "|dKE - work| isolates the PUSH's energy-"
                        "conservation defect from the emission path's")
    args = p.parse_args(argv)

    import jax

    env_platforms = os.environ.get("JAX_PLATFORMS", "")
    if env_platforms and "cpu" in env_platforms.split(","):
        jax.config.update("jax_platforms", env_platforms)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from opal_tpu.cli import build
    from opal_tpu.sim import counter_total

    import dataclasses

    sim, species, rp = build(
        Path(args.input), n_devices=args.devices,
        dtype=jnp.float64 if args.f64 else jnp.float32,
        field_dtype=jnp.float64,
    )
    if args.no_emission:
        sim.options = dataclasses.replace(
            sim.options, photon_emission=False, photon_absorption=False
        )
    total_steps = rp["total_steps"]
    E, B, J, rho = sim.init_fields()
    counters = sim.zero_counters()
    key = jax.random.key(rp.get("seed", 0))
    t = rp["tstart"]

    def energies(species):
        out = {
            name: sim.total_kinetic_energy(name, species[name])
            for name in sim.specs
        }
        # laser work channel: the electron work column integrates
        # q c (u.E) dt / gamma in J per real particle (electron.rs:
        # 278-280); with deposition off this is the only non-radiative
        # electron energy channel
        import numpy as np

        est = species["electron"]
        if est.work is not None:
            w = np.asarray(est.weight, np.float64)
            out["electron_work"] = float(
                np.sum(np.where(np.asarray(est.alive), w, 0.0)
                       * np.asarray(est.work, np.float64))
            )
        return out

    e0 = energies(species)
    t0 = time.monotonic()
    done = 0
    while done < total_steps:
        n = min(args.chunk, total_steps - done)
        key, sub = jax.random.split(key)
        out = sim.run(E, B, J, rho, species, float(t), sub, counters, n)
        E, B, J, rho, species, t, counters = out[:7]
        done += n
        print(f"# {done}/{total_steps} steps, "
              f"RT {time.monotonic() - t0:.0f}s", file=sys.stderr,
              flush=True)
    e1 = energies(species)

    lost = {k: counter_total(v) for k, v in counters.items()
            if k != "qed_deferred" and counter_total(v) > 0}
    e_loss = e0["electron"] - e1["electron"]
    ph_gain = e1.get("photon", 0.0) - e0.get("photon", 0.0)
    closure = abs(e_loss - ph_gain) / ph_gain if ph_gain > 0 else float("nan")
    # radiated = electron loss + net laser work; the residual against
    # the tracked photon energy is then the true numerical defect plus
    # any filtered-photon leak (photon_energy_min/angle_max discard
    # photons whose emitters recoiled — reference semantics,
    # interactions.rs:74-97)
    work = e1.get("electron_work", 0.0) - e0.get("electron_work", 0.0)
    closure_w = (
        abs(e_loss + work - ph_gain) / ph_gain if ph_gain > 0
        else float("nan")
    )
    # push-defect diagnostic: with emission off, dKE must equal the
    # work integral exactly; the residual is the push's own energy-
    # conservation defect at this precision (absolute J + relative to
    # the initial electron energy)
    push_defect_J = (-e_loss) - work
    print(json.dumps({
        "metric": "ledger-closure",
        "value": closure,
        "push_defect_J": push_defect_J,
        "push_defect_rel_e0": abs(push_defect_J) / e0["electron"],
        "closure_with_work": closure_w,
        "laser_work_J": work,
        "unit": "relative",
        "electron_loss_J": e_loss,
        "photon_gain_J": ph_gain,
        "electron_J": [e0["electron"], e1["electron"]],
        "photon_J": [e0.get("photon", 0.0), e1.get("photon", 0.0)],
        "em_field_J": sim.em_field_energy(E, B),
        "steps": total_steps,
        "losses": lost,
        "wall_s": round(time.monotonic() - t0, 1),
        "f64": bool(args.f64),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
