"""First-crossing-wins semantics of the absorption candidate walk.

The reference scans a photon's cell-mates one at a time in store order,
decrementing the optical depth per pair and stopping at the first
crossing (``interactions.rs:244-258``); the repo walks the cell-sorted
segment in (nw, B) blocks with cumulative sums inside each block
(``interactions.py`` candidate walk).  These tests pin the exact event
placement: with identical cross sections and distinct weights the
cumulative probability is a pure weight cumsum, so the crossing
candidate — and the stop-at-event depth arithmetic — is known in
closed form, for block sizes that put the event inside the first
block, across a block boundary, and in a partial tail block."""

import dataclasses
import math
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opal_tpu import constants as const
from opal_tpu.grid import GridGeometry
from opal_tpu.interactions import absorb
from opal_tpu.qed import cross_sections
from opal_tpu.sim import SimOptions
from opal_tpu.species import ParticleState, SpeciesSpec, _empty_fields

CHI_G, CHI_E = 2.0, 1.0  # chi_g >= chi_e: stimulated emission forbidden
K0, GAMMA = 0.1, 10.0
W = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]) * 1e10
W_PH = 7.0e10


def _state(spec, n, **overrides):
    f = _empty_fields(spec, n, np.float64)
    u = overrides.pop("u", None)
    if u is not None:
        u = np.asarray(u, np.float64)
        f["ux"], f["uy"], f["uz"] = u[:, 0], u[:, 1], u[:, 2]
    for k, v in overrides.items():
        f[k] = v
    return ParticleState(**{
        k: (None if v is None else jnp.asarray(v)) for k, v in f.items()
    })


def _setup(tau_abs, block):
    geom = GridGeometry(nx=16, dx=1e-6, xmin=0.0, n_devices=1)
    sim = SimpleNamespace(
        geom=geom,
        options=SimOptions(
            dt=1.0e-15, photon_absorption=True, absorption_block=block
        ),
        specs=None,
    )
    u_e = -math.sqrt(GAMMA**2 - 1)
    n_e = 8
    e = _state(
        SpeciesSpec.electron(), n_e,
        cell=np.array([3] * 6 + [0, 0], np.int32),
        weight=np.concatenate([W, [0.0, 0.0]]),
        u=np.array([[u_e, 0, 0]] * n_e),
        gamma=np.full(n_e, GAMMA),
        chi=np.full(n_e, CHI_E),
        alive=np.array([True] * 6 + [False, False]),
    )
    ph = _state(
        SpeciesSpec.photon(), 8,
        cell=np.array([3] + [0] * 7, np.int32),
        weight=np.array([W_PH] + [0] * 7),
        u=np.array([[K0, 0, 0]] * 8),
        gamma=np.full(8, K0),
        chi=np.full(8, CHI_G),
        alive=np.array([True] + [False] * 7),
        tau_abs=np.full(8, tau_abs),
        tau_st=np.full(8, 1e30),
    )
    return sim, e, ph


def _per_weight_prob():
    """P_i / w_i: identical momenta make sigma common to all pairs."""
    k4 = np.array([K0, K0, 0.0, 0.0])
    p4 = np.array([GAMMA, -math.sqrt(GAMMA**2 - 1), 0.0, 0.0])
    sigma, valid = cross_sections.photon_absorption(k4, p4, CHI_G, CHI_E)
    assert bool(valid) and float(sigma) > 0.0
    cdt_dx = const.SPEED_OF_LIGHT * 1.0e-15 / 1e-6
    return float(sigma) * cdt_dx


@pytest.mark.parametrize("block", [2, 3, 8])
def test_event_lands_on_first_crossing_candidate(block):
    """tau_abs placed between cum P of candidates 3 and 4 (store
    order): the 4th alive electron — and only it — takes the kick."""
    s = _per_weight_prob()
    cum = np.cumsum(W) * s
    sim, e, ph = _setup(tau_abs=0.5 * (cum[2] + cum[3]), block=block)

    species, overflow, _ = absorb(
        sim, {"electron": e, "photon": ph}, 0.0, jax.random.key(0)
    )
    e2, ph2 = species["electron"], species["photon"]
    assert int(overflow) == 0
    assert int(jnp.sum(ph2.alive)) == 0  # absorbed

    du = np.asarray(e2.ux) - np.asarray(e.ux)
    hit = np.nonzero(np.abs(du) > 0)[0]
    assert list(hit) == [3], du
    # absorption kick: du = (w_ph / w_e) k (interactions.rs:322-326)
    assert du[3] == pytest.approx(W_PH / W[3] * K0, rel=1e-12)
    np.testing.assert_array_equal(np.asarray(e2.uy), np.asarray(e.uy))


@pytest.mark.parametrize("block", [2, 8])
def test_no_event_decrements_by_full_segment(block):
    """tau_abs above the segment total: no event, and the depth comes
    out lower by exactly the summed pair probabilities (the walk never
    re-examines or skips a candidate)."""
    s = _per_weight_prob()
    total = float(np.sum(W) * s)
    tau0 = 1.5 * total
    sim, e, ph = _setup(tau_abs=tau0, block=block)

    species, overflow, _ = absorb(
        sim, {"electron": e, "photon": ph}, 0.0, jax.random.key(0)
    )
    e2, ph2 = species["electron"], species["photon"]
    assert int(jnp.sum(ph2.alive)) == 1  # survived
    assert float(ph2.tau_abs[0]) == pytest.approx(tau0 - total, rel=1e-10)
    np.testing.assert_array_equal(np.asarray(e2.ux), np.asarray(e.ux))


@pytest.mark.parametrize("block", [2, 8])
def test_fallback_gather_path_equivalent(block, monkeypatch):
    """The large-grid fallback (per-photon transient gathers instead of
    the persistent per-cell candidate table — ADVICE r2 memory guard)
    must place the event and decrement depths identically."""
    import opal_tpu.interactions as I

    s = _per_weight_prob()
    cum = np.cumsum(W) * s
    results = {}
    for table_bytes in (I.CAND_TABLE_MAX_BYTES, 0):
        monkeypatch.setattr(I, "CAND_TABLE_MAX_BYTES", table_bytes)
        sim, e, ph = _setup(tau_abs=0.5 * (cum[2] + cum[3]), block=block)
        species, overflow, _ = I.absorb(
            sim, {"electron": e, "photon": ph}, 0.0, jax.random.key(0)
        )
        results[table_bytes] = (
            np.asarray(species["electron"].ux),
            np.asarray(species["photon"].tau_abs),
            np.asarray(species["photon"].alive),
            int(overflow),
        )
    a, b = results.values()
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_event_capacity_defers_not_loses():
    """More events than ``absorption_event_capacity`` in one step:
    exactly EVC fire (photon dies, electron kicked), the rest are
    DEFERRED — depths restored to pre-walk values, photon alive,
    counted in the deferred leg, zero losses.  The cap is what keeps
    the kick machinery in (EVC,)-row event space with no full-length
    conditional fallback (the r4 qed-8m VMEM-stack compile failure)."""
    geom = GridGeometry(nx=16, dx=1e-6, xmin=0.0, n_devices=1)
    sim = SimpleNamespace(
        geom=geom,
        options=SimOptions(
            dt=1.0e-15, photon_absorption=True,
            absorption_event_capacity=2,
        ),
        specs=None,
    )
    u_e = -math.sqrt(GAMMA**2 - 1)
    n = 8
    e = _state(
        SpeciesSpec.electron(), n,
        cell=np.arange(n, dtype=np.int32) % 4,
        weight=np.full(n, 1e10),
        u=np.array([[u_e, 0, 0]] * n),
        gamma=np.full(n, GAMMA),
        chi=np.full(n, CHI_E),
        alive=np.full(n, True),
    )
    # below the single-pair decrement (P ~ w s ~ 1e-15 here), so every
    # photon fires on its first candidate
    tau0 = 1e-10 * _per_weight_prob() * 1e10
    ph = _state(
        SpeciesSpec.photon(), n,
        cell=np.arange(n, dtype=np.int32) % 4,
        weight=np.full(n, W_PH),
        u=np.array([[K0, 0, 0]] * n),
        gamma=np.full(n, K0),
        chi=np.full(n, CHI_G),
        alive=np.full(n, True),
        tau_abs=np.full(n, tau0),
        tau_st=np.full(n, 1e30),
    )
    species, overflow, deferred = absorb(
        sim, {"electron": e, "photon": ph}, 0.0, jax.random.key(0)
    )
    e2, ph2 = species["electron"], species["photon"]
    assert int(overflow) == 0
    n_dead = n - int(jnp.sum(ph2.alive))
    assert n_dead == 2, "exactly EVC events fire"
    assert int(deferred) == n - 2, "the excess is deferred, not lost"
    # deferred photons keep their PRE-WALK depths exactly
    alive = np.asarray(ph2.alive)
    np.testing.assert_allclose(
        np.asarray(ph2.tau_abs)[alive], tau0, rtol=0
    )
    # exactly the fired events kicked their electrons
    du = np.asarray(e2.ux) - np.asarray(e.ux)
    assert np.count_nonzero(du) == 2
