"""Vec3 algebra (reference unit tests: ``src/particle/vec3.rs:146-169``)."""

import numpy as np

from opal_tpu import vec3


def test_orthogonal_is_orthogonal_and_unit():
    rng = np.random.default_rng(0)
    v = rng.standard_normal((100, 3))
    o = np.asarray(vec3.orthogonal(v))
    np.testing.assert_allclose(np.sum(o * v, axis=-1), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.sum(o * o, axis=-1), 1.0, rtol=1e-12)


def test_rotate_around_quarter_turn():
    # x-hat rotated pi/2 about z-hat -> y-hat
    v = np.array([[1.0, 0.0, 0.0]])
    z = np.array([[0.0, 0.0, 1.0]])
    got = np.asarray(vec3.rotate_around(v, z, np.asarray([np.pi / 2])))
    np.testing.assert_allclose(got, [[0.0, 1.0, 0.0]], atol=1e-15)


def test_rotate_preserves_norm_and_axis_component():
    rng = np.random.default_rng(1)
    v = rng.standard_normal((50, 3))
    axis = np.asarray(vec3.normalize(rng.standard_normal((50, 3))))
    th = rng.uniform(0, 2 * np.pi, 50)
    r = np.asarray(vec3.rotate_around(v, axis, th))
    np.testing.assert_allclose(
        np.asarray(vec3.norm(r)), np.asarray(vec3.norm(v)), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.sum(r * axis, -1), np.sum(v * axis, -1), rtol=1e-10, atol=1e-12
    )


def test_dot_cross_identities():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((20, 3))
    b = rng.standard_normal((20, 3))
    c = np.asarray(vec3.cross(a, b))
    np.testing.assert_allclose(np.sum(c * a, -1), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.sum(c * b, -1), 0.0, atol=1e-12)
    # |a x b|^2 + (a.b)^2 = |a|^2 |b|^2
    np.testing.assert_allclose(
        np.asarray(vec3.norm_sqr(c)) + np.asarray(vec3.dot(a, b)) ** 2,
        np.asarray(vec3.norm_sqr(a)) * np.asarray(vec3.norm_sqr(b)),
        rtol=1e-12,
    )
