"""Photon polarization state (reference: ``src/particle/photon.rs``
pol/basis fields, ``with_polarization_along``, ``helicity``)."""

import numpy as np
import pytest

from opal_tpu import polarization
from opal_tpu.species import ParticleState, SpeciesSpec, _empty_fields


def _photons(k_list):
    n = len(k_list)
    fields = _empty_fields(SpeciesSpec.photon(), n, np.float64)
    k_arr = np.asarray(k_list, np.float64)
    fields["ux"], fields["uy"], fields["uz"] = k_arr.T.copy()
    fields["gamma"] = np.sqrt(np.sum(k_arr**2, axis=-1))
    fields["alive"][:] = True
    return ParticleState(**fields)


def test_with_polarization_along_builds_right_handed_triad():
    st = _photons([[2.0, 0.0, 0.0], [0.0, 3.0, 0.0]])
    st = polarization.with_polarization_along(st, [0.0, 0.0, 5.0])
    basis = np.asarray(st.basis)
    # e1 = z-hat for both
    np.testing.assert_allclose(basis[:, 0:3], [[0, 0, 1], [0, 0, 1]], atol=1e-15)
    # e2 = k-hat x e1: x-hat x z-hat = -y-hat; y-hat x z-hat = x-hat
    np.testing.assert_allclose(basis[0, 3:6], [0, -1, 0], atol=1e-15)
    np.testing.assert_allclose(basis[1, 3:6], [1, 0, 0], atol=1e-15)
    # Jones vector (1, 0): fully polarized along e1
    np.testing.assert_allclose(np.asarray(st.pol), [[1, 0, 0, 0]] * 2)


def test_linear_polarization_projection():
    st = _photons([[1.0, 0.0, 0.0]])
    st = polarization.with_polarization_along(st, [0.0, 1.0, 0.0])
    # Malus: |e . d|^2 for linear polarization along y, k along x
    for ang in (0.0, 0.3, np.pi / 4, np.pi / 2):
        d = [0.0, np.cos(ang), np.sin(ang)]
        got = float(polarization.linear_polarization_along(st, d)[0])
        np.testing.assert_allclose(got, np.cos(ang) ** 2, atol=1e-14)


def test_helicity_of_circular_states():
    st = _photons([[1.0, 0.0, 0.0]] * 3)
    st = polarization.with_polarization_along(st, [0.0, 1.0, 0.0])
    # a+ = (1, -i)/sqrt(2): helicity |(a1 - i a2)/sqrt(2)|^2 = 1
    pol = np.asarray(st.pol).copy()
    s = 1.0 / np.sqrt(2.0)
    # a+ basis state e+ = (e1 + i e2)/sqrt(2): a = (1, i)/sqrt(2)
    pol[0] = [s, 0.0, 0.0, s]  # positive helicity
    pol[1] = [s, 0.0, 0.0, -s]  # negative helicity (a+ = 0)
    pol[2] = [1.0, 0.0, 0.0, 0.0]  # linear
    st = ParticleState(
        **{
            **{
                f: getattr(st, f)
                for f in (
                    "cell", "x", "prev_x", "y", "z", "weight",
                    "ux", "uy", "uz", "gamma",
                    "chi", "tau", "tau_abs", "tau_st", "work", "birth_time",
                    "alive", "basis",
                )
            },
            "pol": pol,
        }
    )
    h = np.asarray(polarization.helicity(st))
    np.testing.assert_allclose(h, [1.0, 0.0, 0.5], atol=1e-14)


@pytest.mark.physics
def test_emission_photons_carry_polarization_state(monkeypatch):
    """Emitted photons get pol = 0, basis = [k, k] (photon.rs:107-108)."""
    import jax
    import jax.numpy as jnp

    from opal_tpu import constants as const
    from opal_tpu.grid import GridGeometry
    from opal_tpu.interactions import emit_radiation
    from opal_tpu.sim import SimOptions
    from opal_tpu.species import initialize

    geom = GridGeometry(nx=8, dx=1e-6, xmin=0.0, n_devices=1)
    dt = 0.95 * geom.dx / const.SPEED_OF_LIGHT
    espec = SpeciesSpec.electron()
    e = initialize(
        espec, geom, 4,
        density=lambda x: np.full_like(x, 1.0e6),
        ux=lambda x, u, n: np.full_like(x, 1000.0),
        uy=lambda x, u, n: np.zeros_like(x),
        uz=lambda x, u, n: np.zeros_like(x),
        dt=dt, capacity_per_device=64, seed=0,
    )
    e = jax.tree_util.tree_map(jnp.asarray, e)
    # force every electron to emit this step
    import dataclasses

    e = dataclasses.replace(
        e,
        tau=jnp.where(e.alive, -1.0, jnp.inf),
        chi=jnp.where(e.alive, 0.5, 0.0),
    )
    ph = jax.tree_util.tree_map(
        jnp.asarray,
        ParticleState(**_empty_fields(SpeciesSpec.photon(), 64, np.float64)),
    )

    class FakeSim:
        options = SimOptions(dt=dt, photon_emission=True)
        pass

    sim = FakeSim()
    sim.geom = geom
    species, overflow, _ = emit_radiation(
        sim, {"electron": e, "photon": ph}, 0.0, jax.random.key(1)
    )
    ph2 = species["photon"]
    alive = np.asarray(ph2.alive)
    assert alive.sum() > 0 and int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(ph2.pol)[alive], 0.0)
    np.testing.assert_allclose(
        np.asarray(ph2.basis)[alive, 0:3], np.asarray(ph2.u)[alive]
    )
    np.testing.assert_allclose(
        np.asarray(ph2.basis)[alive, 3:6], np.asarray(ph2.u)[alive]
    )
