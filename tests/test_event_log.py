"""Per-event absorption/stimulated-emission records (the reference's
extra_absorption_output / extra_stimulated_emission_output stderr
dumps, ``interactions.rs:267-289``), staged through a fixed-capacity
device ring."""

import dataclasses
import io
import math
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opal_tpu.diagnostics.output import write_event_log
from opal_tpu.grid import GridGeometry
from opal_tpu.interactions import absorb
from opal_tpu.sim import SimOptions, Simulation
from opal_tpu.species import ParticleState, SpeciesSpec, _empty_fields


def _state(spec, n, **over):
    fields = _empty_fields(spec, n, np.float64)
    u = over.pop("u", None)
    if u is not None:
        u = np.asarray(u, np.float64)
        fields["ux"], fields["uy"], fields["uz"] = u[:, 0], u[:, 1], u[:, 2]
    fields.update(over)
    return ParticleState(
        **{
            k: (None if v is None else jnp.asarray(v))
            for k, v in fields.items()
        }
    )


def _pair(chi_g=2.0, chi_e=1.0, k0=0.1, gamma=10.0):
    geom = GridGeometry(nx=16, dx=1e-6, xmin=0.0, n_devices=1)
    u_e = -math.sqrt(gamma**2 - 1)
    e = _state(
        SpeciesSpec.electron(), 4,
        cell=np.array([3, 0, 0, 0], np.int32),
        weight=np.array([2.0e10, 0, 0, 0]),
        u=np.array([[u_e, 0, 0]] * 4),
        gamma=np.full(4, gamma),
        chi=np.full(4, chi_e),
        alive=np.array([True, False, False, False]),
    )
    ph = _state(
        SpeciesSpec.photon(), 8,
        cell=np.array([3] + [0] * 7, np.int32),
        weight=np.array([1.0e10] + [0] * 7),
        u=np.array([[k0, 0, 0]] * 8),
        gamma=np.full(8, k0),
        chi=np.full(8, chi_g),
        alive=np.array([True] + [False] * 7),
    )
    return geom, e, ph


def test_absorb_returns_event_records():
    geom, e, ph = _pair()
    ph = dataclasses.replace(
        ph, tau_abs=jnp.full(8, 1e-30), tau_st=jnp.full(8, 1e30),
        birth_time=jnp.zeros(8),
    )
    sim = SimpleNamespace(
        geom=geom,
        options=SimOptions(
            dt=1.0e-15, photon_absorption=True, extra_absorption_output=True
        ),
    )
    species, overflow, _, (rec, want) = absorb(
        sim, {"electron": e, "photon": ph}, 2.5e-15, jax.random.key(0)
    )
    want = np.asarray(want)
    assert want.sum() == 1 and want[0]
    row = np.asarray(rec)[0]
    # x in cell 3 of a 1e-6 grid; t; birth_time; chi_g; k; chi_e; p; kind
    assert 3e-6 <= row[0] <= 4e-6
    assert row[1] == 2.5e-15 and row[2] == 0.0
    assert row[3] == 2.0  # chi_gamma
    np.testing.assert_allclose(row[4:8], [0.1, 0.1, 0.0, 0.0])
    assert row[8] == 1.0  # chi_e
    assert row[13] == 1.0  # kind = absorbed


@pytest.mark.physics
def test_event_ring_through_sim_run(capsys):
    """The full scanned/shard_mapped step stages events into the ring
    and write_event_log drains them in the reference dump format."""
    geom = GridGeometry(nx=32, dx=1e-6, xmin=0.0, n_devices=4)
    opts = SimOptions(
        dt=1.0e-17, photon_absorption=True, photon_emission=False,
        extra_absorption_output=True, extra_stimulated_emission_output=True,
        event_log_capacity=16, migration_capacity=64,
        # photons keep their chi (no push-time recompute from the field)
        immobile_photons=True,
    )
    espec, pspec = SpeciesSpec.electron(), SpeciesSpec.photon()
    sim = Simulation(geom, opts, {"electron": espec, "photon": pspec})

    gamma = 10.0
    u_e = -math.sqrt(gamma**2 - 1)
    cap = 16
    e = _state(
        espec, 4 * cap,
        cell=np.full(4 * cap, 3, np.int32),
        weight=np.where(np.arange(4 * cap) % cap == 0, 2.0e10, 0.0),
        u=np.array([[u_e, 0, 0]] * (4 * cap)),
        gamma=np.full(4 * cap, gamma),
        chi=np.full(4 * cap, 1.0),
        alive=np.arange(4 * cap) % cap == 0,
    )
    ph = _state(
        pspec, 4 * cap,
        cell=np.full(4 * cap, 3, np.int32),
        weight=np.where(np.arange(4 * cap) % cap == 0, 1.0e10, 0.0),
        u=np.array([[0.1, 0, 0]] * (4 * cap)),
        gamma=np.full(4 * cap, 0.1),
        chi=np.full(4 * cap, 2.0),
        alive=np.arange(4 * cap) % cap == 0,
        tau_abs=np.full(4 * cap, 1e-30),
        tau_st=np.full(4 * cap, 1e30),
        birth_time=np.zeros(4 * cap),
    )
    species = {
        "electron": sim.shard_particles(e),
        "photon": sim.shard_particles(ph),
    }
    E, B, J, rho = sim.init_fields()
    # uniform B_z keeps the electrons' push-time chi nonzero:
    # chi_e ~ gamma c B / E_schwinger = 1 at B = E_s / (gamma c)
    from opal_tpu import constants as const

    b0 = const.CRITICAL_FIELD / (10.0 * const.SPEED_OF_LIGHT)
    B = jax.device_put(
        jnp.zeros_like(B).at[:, 2].set(b0), B.sharding
    )
    res = sim.run(
        E, B, J, rho, species, 0.0, jax.random.key(0), sim.zero_counters(), 2
    )
    assert len(res) == 8
    events = res[7]
    counts = np.asarray(events[1])
    assert counts.sum() == 4  # one absorption per device

    buf = io.StringIO()
    n = write_event_log(buf, events, opts)
    lines = buf.getvalue().strip().split("\n")
    assert n == 4 and len(lines) == 4
    assert all(line.endswith(" abs") for line in lines)
    assert all(len(line.split()) == 14 for line in lines)


def test_event_ring_overflow_is_counted():
    """A full ring counts drops and the writer surfaces the loss —
    drops are never silent (the reference dumps every event,
    ``interactions.rs:267-289``)."""
    opts = SimOptions(
        dt=1.0e-15, photon_absorption=True,
        extra_absorption_output=True, extra_stimulated_emission_output=True,
        event_log_capacity=4,
    )
    cap = 4
    # simulate two devices, both having seen 7 events into a 4-slot ring
    ring = np.zeros((2 * cap, 14))
    ring[:, 13] = 1.0  # kind = absorbed
    count = np.array([7, 7], np.int32)
    buf = io.StringIO()
    n = write_event_log(buf, (ring, count), opts)
    text = buf.getvalue()
    assert n == 2 * cap  # only the stored rows are written
    assert "overflow" in text and "6 events dropped" in text


@pytest.mark.physics
def test_event_ring_overflow_through_sim_run():
    """The scanned step keeps counting events past ring capacity."""
    geom = GridGeometry(nx=32, dx=1e-6, xmin=0.0, n_devices=4)
    opts = SimOptions(
        dt=1.0e-17, photon_absorption=True, photon_emission=False,
        extra_absorption_output=True, extra_stimulated_emission_output=True,
        event_log_capacity=2, migration_capacity=64,
        immobile_photons=True,
    )
    espec, pspec = SpeciesSpec.electron(), SpeciesSpec.photon()
    sim = Simulation(geom, opts, {"electron": espec, "photon": pspec})

    gamma = 10.0
    u_e = -math.sqrt(gamma**2 - 1)
    n = 16  # 4 alive pairs per device, ring capacity 2
    e = _state(
        espec, 4 * n,
        cell=np.tile(np.arange(4, dtype=np.int32) + 2, 4 * n // 4),
        weight=np.where(np.arange(4 * n) % 4 < 4, 2.0e10, 0.0),
        u=np.array([[u_e, 0, 0]] * (4 * n)),
        gamma=np.full(4 * n, gamma),
        chi=np.full(4 * n, 1.0),
        alive=np.full(4 * n, True),
    )
    ph = _state(
        pspec, 4 * n,
        cell=np.tile(np.arange(4, dtype=np.int32) + 2, 4 * n // 4),
        weight=np.full(4 * n, 1.0e10),
        u=np.array([[0.1, 0, 0]] * (4 * n)),
        gamma=np.full(4 * n, 0.1),
        chi=np.full(4 * n, 2.0),
        alive=np.full(4 * n, True),
        tau_abs=np.full(4 * n, 1e-30),
        tau_st=np.full(4 * n, 1e30),
        birth_time=np.zeros(4 * n),
    )
    species = {
        "electron": sim.shard_particles(e),
        "photon": sim.shard_particles(ph),
    }
    E, B, J, rho = sim.init_fields()
    from opal_tpu import constants as const

    b0 = const.CRITICAL_FIELD / (10.0 * const.SPEED_OF_LIGHT)
    B = jax.device_put(jnp.zeros_like(B).at[:, 2].set(b0), B.sharding)
    res = sim.run(
        E, B, J, rho, species, 0.0, jax.random.key(0), sim.zero_counters(), 2
    )
    events = res[7]
    counts = np.asarray(events[1])
    # every device absorbed more photons than the ring holds
    assert (counts > 2).any()
    buf = io.StringIO()
    write_event_log(buf, events, opts)
    assert "overflow" in buf.getvalue()
