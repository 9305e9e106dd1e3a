"""Hardware-free Mosaic compile regression tests.

Two escalation levels, no chip needed for either:

1. **Cross-lowering** (``.lower(lowering_platforms=("tpu",))``): runs
   the Pallas-to-Mosaic *lowering*.  Caught the 2026-08-19
   RecursionError (weak-f64 literals inside kernel bodies under
   ``jax_enable_x64``) but NOT failures inside the Mosaic backend.

2. **Chipless AOT compile** via a ``v5e:1x1x1`` topology description
   (the same path the axon ``tpu_compile_helper`` runs): executes the
   full Mosaic pass pipeline.  This is what catches the two failures
   the 2026-08-19 hardware session hit AFTER lowering succeeded:
   (a) BlockSpec index maps whose ``0`` constants become i64 under
   x64 — ``failed to legalize operation 'func.func'`` on the
   ``transform_N`` functions (both user maps and the ones JAX
   synthesizes for whole-array ``BlockSpec(memory_space=VMEM)``);
   (b) scoped-VMEM stack OOMs (those are shape-dependent — see
   ``tools/aot_compile_check.py`` for compiling the exact bench/CLI
   shapes before a hardware session).

The configurations below mirror the CLI's default mixed-precision mode
(f32 particles + f64 fields under ``jax_enable_x64``) — the exact mode
that crashed on hardware — for both kernel layouts, the QED step
shape, and the MXU-gather variant.
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

pytestmark = pytest.mark.unit


def _v5e_topology():
    """A 1-chip v5e topology description, or None if this jaxlib/libtpu
    cannot create one (the AOT tests then fall back to lowering-only)."""
    import os

    os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
    os.environ.setdefault("TPU_SKIP_MDS_QUERY", "1")
    try:
        from jax.experimental import topologies

        return topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:1x1x1",
            chips_per_host_bounds=(1, 1, 1),
        )
    except Exception:
        return None


_TOPO = _v5e_topology()


def _mixed_sim(qed: bool, packed: bool, mxu_gather: bool = False,
               mesh_devices=None, subblocks: int = 1):
    """A tiny mixed-precision sim exercising the fused Mosaic path.
    ``mesh_devices`` switches the sim's mesh onto (abstract) topology
    devices for AOT compilation; data prep always happens on CPU."""
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
        mxu_gather=mxu_gather,
        fused_block=1024,
        fused_window=16,
        fused_subblocks=subblocks,
        fused_resort_every=4,
        migration_every=1 if qed else 3,
    )
    espec = SpeciesSpec.electron()
    specs = {"electron": espec}
    if qed:
        specs["photon"] = SpeciesSpec.photon()
    mk = lambda devs: Simulation(
        geom, opts, specs, mesh=make_mesh(1, devices=devs),
        dtype=jnp.float32, field_dtype=jnp.float64,
    )
    sim_cpu = mk(None)
    sim = mk(mesh_devices) if mesh_devices is not None else sim_cpu
    drift = 2.5e-24 / (const.ELECTRON_MASS * const.SPEED_OF_LIGHT)
    est = initialize(
        espec, geom, 8,
        density=lambda x: np.full_like(x, 20.0),
        ux=lambda x, u, n: drift * np.sign(u - 0.5),
        uy=lambda x, u, n: np.zeros_like(x),
        uz=lambda x, u, n: np.zeros_like(x),
        dt=dt, capacity_per_device=2048, seed=0, dtype=np.float32,
    )
    species = {"electron": sim_cpu.shard_particles(est)}
    if qed:
        pst = initialize(
            SpeciesSpec.photon(), geom, 0, lambda x: x * 0,
            None, None, None, dt, 2048, seed=1, dtype=np.float32,
        )
        species["photon"] = sim_cpu.shard_particles(pst)
    E, B, J, rho = sim_cpu.init_fields()
    args = (E, B, J, rho, species, 0.0, jax.random.key(0),
            sim_cpu.zero_counters())
    return sim, args


def _trace_for_tpu(sim, args, nsteps, device=None):
    # force the Mosaic path (the sim would select interpret mode on the
    # CPU mesh)
    sim._interpret = False

    def blockfn(E, B, J, rho, species, t0, key, counters):
        return sim.run(E, B, J, rho, species, t0, key, counters, nsteps)

    if device is None:
        return jax.jit(blockfn).trace(*args)
    from jax.sharding import SingleDeviceSharding

    sh = SingleDeviceSharding(device)
    aargs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(
            jnp.shape(x), jnp.asarray(x).dtype, sharding=sh
        ),
        args,
    )
    return jax.jit(blockfn).trace(*aargs)


def _check(qed: bool, packed: bool, mxu_gather: bool = False,
           subblocks: int = 1):
    """AOT-compile the step for v5e when the topology is available,
    else cross-lower only."""
    if _TOPO is not None:
        sim, args = _mixed_sim(
            qed, packed, mxu_gather, mesh_devices=_TOPO.devices,
            subblocks=subblocks,
        )
        traced = _trace_for_tpu(sim, args, 4, device=_TOPO.devices[0])
        traced.lower().compile()  # full Mosaic pipeline
        return
    sim, args = _mixed_sim(qed, packed, mxu_gather, subblocks=subblocks)
    text = _trace_for_tpu(sim, args, 4).lower(
        lowering_platforms=("tpu",)
    ).as_text()
    assert "tpu_custom_call" in text  # the Mosaic kernel is really there


@pytest.mark.parametrize("packed", [True, False],
                         ids=["packed", "column"])
def test_mixed_precision_step_compiles_for_tpu(packed):
    """Default (mixed-precision) non-QED step, both kernel layouts."""
    _check(qed=False, packed=packed)


def test_mixed_precision_qed_step_compiles_for_tpu():
    """The colliding_beams step shape: emission-only QED, deposition
    off, lazy photon chi, column kernel, mixed precision."""
    _check(qed=True, packed=False)


def test_mixed_precision_mxu_gather_step_compiles_for_tpu():
    """The MXU one-hot gather variant of the column kernel."""
    _check(qed=False, packed=False, mxu_gather=True)


def test_mixed_precision_subblocks_step_compiles_for_tpu():
    """The multi-block-per-program kernel (FusedSpec.subblocks)."""
    _check(qed=False, packed=False, subblocks=2)
