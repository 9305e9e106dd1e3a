"""3-vector algebra over a trailing (..., 3) axis.

The reference's ``Vec3`` struct (``src/particle/vec3.rs:10-143``)
becomes a module of batched array functions: vectors are rows of any
array whose last axis has length 3, so every operation maps over whole
particle populations at once.  ``+ - *`` are plain jnp arithmetic; the
named helpers below cover the rest of the reference's surface
(dot/cross via jnp, norm/normalize, orthogonal, rotate_around).
"""

from __future__ import annotations

import jax.numpy as jnp

_TINY = 1.0e-300

dot = lambda a, b: jnp.sum(a * b, axis=-1)
cross = jnp.cross


def norm_sqr(v):
    """|v|² (``vec3.rs:102-104``)."""
    return jnp.sum(v * v, axis=-1)


def norm(v):
    return jnp.sqrt(norm_sqr(v))


def normalize(v):
    """v / |v| (``vec3.rs:106-110``)."""
    return v / jnp.maximum(norm(v), _TINY)[..., None]


def orthogonal(v):
    """A unit vector orthogonal to ``v`` (``vec3.rs:120-127``): built
    from the two largest components so it is well-conditioned."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    use_xy = jnp.abs(x) > jnp.abs(z)
    perp = jnp.where(
        use_xy[..., None],
        jnp.stack([-y, x, jnp.zeros_like(x)], axis=-1),
        jnp.stack([jnp.zeros_like(x), -z, y], axis=-1),
    )
    return normalize(perp)


def rotate_around(v, axis, theta):
    """Rodrigues rotation of ``v`` about the unit vector ``axis`` by
    angle ``theta`` (``vec3.rs:129-143``)."""
    theta = jnp.asarray(theta)
    s = jnp.sin(theta)[..., None]
    c = jnp.cos(theta)[..., None]
    axis_dot_v = jnp.sum(axis * v, axis=-1, keepdims=True)
    return v * c + jnp.cross(axis, v) * s + axis * axis_dot_v * (1.0 - c)
