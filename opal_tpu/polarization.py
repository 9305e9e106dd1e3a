"""Photon polarization state and observables.

The reference stores a complex Jones vector ``pol: [Complex; 2]`` over
two transverse basis vectors ``basis: [Vec3; 2]`` per photon
(``src/particle/photon.rs:24-25``) and exposes

* ``with_polarization_along(dir)`` — set linear polarization along a
  direction (``photon.rs:277-286``),
* ``linear_polarization_along(dir)`` — |component|² of the polarization
  along a direction (``photon.rs:290-294``),
* ``helicity()`` — |a₊|² with a₊ = (a₁ − i a₂)/√2, the photon's
  ``spin_state`` (``photon.rs:299-302``, ``photon.rs:141-147``).

Here these are batched pure functions over the photon SoA: ``pol`` is
an (N, 4) real array ``[re a₁, im a₁, re a₂, im a₂]`` and ``basis`` an
(N, 6) array ``[e₁ | e₂]`` — complex numbers unpacked into pairs so every array is
a plain float pytree leaf (TPU-friendly; no complex dtype needed on the
hot path, which never touches these fields).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .species import ParticleState

_TINY = 1.0e-300


def _normalize(v):
    n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), _TINY))
    return v / n


def with_polarization_along(state: ParticleState, direction) -> ParticleState:
    """Linearly polarize every photon along ``direction`` (a (3,) or
    (N, 3) array, need not be normalized) — ``photon.rs:277-286``.

    ``basis[0] = dir / |dir|``; ``basis[1] = (k × basis[0]) / |·|`` so
    that (k, e₁, e₂) is a right-handed triad; Jones vector (1, 0).
    """
    if state.pol is None or state.basis is None:
        raise ValueError("species does not carry polarization state")
    n = state.pol.shape[0]
    dtype = state.pol.dtype
    e1 = jnp.broadcast_to(
        _normalize(jnp.asarray(direction, dtype)), (n, 3)
    )
    e2 = _normalize(jnp.cross(state.u, e1))
    basis = jnp.concatenate([e1, e2], axis=1)
    pol = jnp.zeros((n, 4), dtype).at[:, 0].set(1.0)
    return dataclasses.replace(state, pol=pol, basis=basis)


def linear_polarization_along(state: ParticleState, direction):
    """|polarization component along ``direction``|² per photon
    (``photon.rs:290-294``).  ``direction`` is normalized first."""
    if state.pol is None or state.basis is None:
        raise ValueError("species does not carry polarization state")
    d = _normalize(jnp.asarray(direction, state.pol.dtype))
    d1 = jnp.sum(d * state.basis[:, 0:3], axis=-1)
    d2 = jnp.sum(d * state.basis[:, 3:6], axis=-1)
    re = state.pol[:, 0] * d1 + state.pol[:, 2] * d2
    im = state.pol[:, 1] * d1 + state.pol[:, 3] * d2
    return re * re + im * im


def helicity(state: ParticleState):
    """|a₊|² with a₊ = (a₁ − i a₂)/√2 (``photon.rs:299-302``); the
    photon ``spin_state`` (``photon.rs:141-147``)."""
    if state.pol is None:
        raise ValueError("species does not carry polarization state")
    re1, im1, re2, im2 = (state.pol[:, i] for i in range(4))
    # a1 - i a2 = (re1 + im2) + i (im1 - re2)
    re = re1 + im2
    im = im1 - re2
    return 0.5 * (re * re + im * im)
