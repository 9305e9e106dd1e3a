"""Hardware-free Mosaic lowering regression tests.

JAX can cross-lower a program for the TPU platform on the CPU backend
(``.trace(...).lower(lowering_platforms=("tpu",))``), which runs the
full Pallas-to-Mosaic lowering without a chip.  These tests lower the
REAL step programs in the CLI's default mixed-precision mode (f32
particles + f64 fields under ``jax_enable_x64``) — the exact
configuration that crashed on hardware on 2026-08-19 with a
RecursionError through Mosaic's ``_convert_helper``: a Python-float
literal in ``jnp.where`` becomes a weak-f64 scalar under x64, its f32
conversion lands inside the jnp wrapper's sub-jaxpr, and Mosaic has no
f64->f32 cast.  ``ops/fused.py`` now pins kernel literals to f32
(``_ZERO``/``_ONE``); this test keeps that path covered for both
kernel layouts and the QED step shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opal_tpu import constants as const
from opal_tpu.fields import make_mesh
from opal_tpu.grid import GridGeometry
from opal_tpu.sim import SimOptions, Simulation
from opal_tpu.species import SpeciesSpec, initialize


def _mixed_sim(qed: bool, packed: bool):
    """A tiny mixed-precision sim exercising the fused Mosaic path."""
    dx = 500.0
    dt = 0.95 * dx / const.SPEED_OF_LIGHT
    geom = GridGeometry(nx=128, dx=dx, xmin=0.0, n_devices=1)
    opts = SimOptions(
        dt=dt,
        current_deposition=not qed,  # CB runs deposition-off
        photon_emission=qed,
        photon_absorption=False,
        photon_angle_max=50e-3 if qed else None,
        migration_capacity=256,
        emission_active_capacity=64 if qed else 0,
        fused_pusher=True,
        packed_fused=packed,
        fused_block=1024,
        fused_window=16,
        fused_resort_every=4,
        migration_every=1 if qed else 3,
    )
    espec = SpeciesSpec.electron()
    specs = {"electron": espec}
    if qed:
        specs["photon"] = SpeciesSpec.photon()
    sim = Simulation(
        geom, opts, specs, mesh=make_mesh(1),
        dtype=jnp.float32, field_dtype=jnp.float64,
    )
    drift = 2.5e-24 / (const.ELECTRON_MASS * const.SPEED_OF_LIGHT)
    est = initialize(
        espec, geom, 8,
        density=lambda x: np.full_like(x, 20.0),
        ux=lambda x, u, n: drift * np.sign(u - 0.5),
        uy=lambda x, u, n: np.zeros_like(x),
        uz=lambda x, u, n: np.zeros_like(x),
        dt=dt, capacity_per_device=2048, seed=0, dtype=np.float32,
    )
    species = {"electron": sim.shard_particles(est)}
    if qed:
        pst = initialize(
            SpeciesSpec.photon(), geom, 0, lambda x: x * 0,
            None, None, None, dt, 2048, seed=1, dtype=np.float32,
        )
        species["photon"] = sim.shard_particles(pst)
    E, B, J, rho = sim.init_fields()
    args = (E, B, J, rho, species, 0.0, jax.random.key(0),
            sim.zero_counters())
    return sim, args


def _lower_for_tpu(sim, args, nsteps):
    # force the Mosaic path (the sim would select interpret mode on the
    # CPU mesh), then cross-lower for the TPU platform
    sim._interpret = False

    def blockfn(E, B, J, rho, species, t0, key, counters):
        return sim.run(E, B, J, rho, species, t0, key, counters, nsteps)

    lowered = jax.jit(blockfn).trace(*args).lower(
        lowering_platforms=("tpu",)
    )
    text = lowered.as_text()
    assert "tpu_custom_call" in text  # the Mosaic kernel is really there
    return text


@pytest.mark.parametrize("packed", [True, False],
                         ids=["packed", "column"])
def test_mixed_precision_step_lowers_for_tpu(packed):
    """Default (mixed-precision) non-QED step, both kernel layouts."""
    sim, args = _mixed_sim(qed=False, packed=packed)
    _lower_for_tpu(sim, args, nsteps=8)


def test_mixed_precision_qed_step_lowers_for_tpu():
    """The colliding_beams step shape: emission-only QED, deposition
    off, lazy photon chi, column kernel, mixed precision."""
    sim, args = _mixed_sim(qed=True, packed=False)
    _lower_for_tpu(sim, args, nsteps=8)
