"""Config-parser tests, modelled on the reference's
(``src/setup.rs:440-493``)."""

import math

import numpy as np
import pytest

from opal_tpu.config import Config, ConfigError
from opal_tpu.expression import Expression, build_context
from opal_tpu import constants as const

TEXT = """
control:
  dx: 0.001
  nx: 4000
  ne: sin(a * x)
  ib: a * b^3

extra:
  dx: 160

constants:
  a: 2.0 * pi
  b: 17.0
"""


def make_config():
    cfg = Config.from_string(TEXT)
    cfg.with_context("constants")
    return cfg


def test_plain_f64():
    assert make_config().read_f64("control", "dx") == 0.001


def test_plain_usize():
    assert make_config().read_usize("control", "nx") == 4000


def test_math_expr():
    ib = make_config().read_f64("control", "ib")
    assert ib == pytest.approx(2.0 * math.pi * 17.0**3, rel=1e-15)


def test_int_to_f64():
    assert make_config().read_f64("extra", "dx") == 160.0


def test_func_of_one_var():
    ne = make_config().func("control", "ne", "x")
    assert float(ne(0.6)) == pytest.approx(math.sin(2.0 * math.pi * 0.6), rel=1e-12)


def test_func_vectorized():
    """Compiled expressions evaluate elementwise over arrays."""
    ne = make_config().func("control", "ne", "x")
    xs = np.linspace(0.0, 1.0, 17)
    np.testing.assert_allclose(
        np.asarray(ne(xs)), np.sin(2.0 * math.pi * xs), rtol=1e-12, atol=1e-14
    )


def test_missing_section():
    with pytest.raises(ConfigError):
        make_config().read_f64("nothere", "dx")


def test_missing_field():
    with pytest.raises(ConfigError):
        make_config().read_f64("control", "nothere")


def test_contains():
    cfg = make_config()
    assert cfg.contains("control")
    assert not cfg.contains("laser")


def test_power_right_assoc():
    ctx = build_context(None)
    assert float(Expression("2^3^2", ctx)()) == 512.0


def test_unary_minus_precedence():
    ctx = build_context(None)
    assert float(Expression("-2^2", ctx)()) == -4.0


def test_physics_constants_in_scope():
    ctx = build_context(None)
    assert float(Expression("me * c^2 / MeV", ctx)()) == pytest.approx(
        0.511, rel=1e-3
    )
    # 'e' is the elementary charge in opal's DSL, not Euler's number
    assert float(Expression("e", ctx)()) == const.ELEMENTARY_CHARGE


def test_step_and_gauss():
    ctx = build_context(None)
    step = Expression("step(x, 0.0, 1.0)", ctx, ("x",))
    assert float(step(0.5)) == 1.0
    assert float(step(-0.5)) == 0.0
    assert float(step(1.0)) == 0.0  # half-open interval
    g = Expression("gauss(x, 0.0, 1.0)", ctx, ("x",))
    assert float(g(0.0)) == 1.0
    assert float(g(1.0)) == pytest.approx(math.exp(-0.5), rel=1e-12)


def test_critical_density():
    ctx = build_context(None)
    omega = 2.0 * math.pi * const.SPEED_OF_LIGHT / 0.8e-6
    expected = (
        const.VACUUM_PERMITTIVITY
        * const.ELECTRON_MASS
        * omega**2
        / const.ELEMENTARY_CHARGE**2
    )
    got = float(Expression("critical(omega)", {**ctx, "omega": omega})())
    assert got == pytest.approx(expected, rel=1e-12)


def test_user_constants_from_expressions():
    cfg = Config.from_string(
        """
electrons:
  ne: drift * 2.0
constants:
  drift: 2.5e-24 / (me * c)
"""
    )
    cfg.with_context("constants")
    ne = cfg.func("electrons", "ne", "x")
    expected = 2.0 * 2.5e-24 / (const.ELECTRON_MASS * const.SPEED_OF_LIGHT)
    assert float(ne(0.0)) == pytest.approx(expected, rel=1e-12)


def test_two_stream_ux_expression():
    """The trickiest expression from examples/two_stream.yaml."""
    ctx = build_context({"drift_u": "2.5e-24 / (me * c)"})
    ux = Expression(
        "drift_u * (1.0 + 0.001 * nrand) * (2.0 * floor(urand - 0.5) + 1.0)",
        ctx,
        ("x", "urand", "nrand"),
    )
    drift = 2.5e-24 / (const.ELECTRON_MASS * const.SPEED_OF_LIGHT)
    # urand < 0.5 -> floor(urand-0.5) = -1 -> sign -1
    assert float(ux(0.0, 0.2, 0.0)) == pytest.approx(-drift, rel=1e-12)
    # urand >= 0.5 -> sign +1
    assert float(ux(0.0, 0.9, 0.0)) == pytest.approx(drift, rel=1e-12)


def test_multiline_yaml_block():
    """Folded-block laser profiles as in examples/colliding_beams.yaml."""
    cfg = Config.from_string(
        """
laser:
  Ey: >
   (a0*m*c*omega/e)
   *sin(omega*(t-x/c))
   *exp(-ln(2.0)*(omega*(t-x/c))^2/(2.0*pi^2*ncycles^2))
constants:
  a0: 20.0
  omega: 2*pi*c/0.8e-6
  ncycles: 4.0
"""
    )
    cfg.with_context("constants")
    ey = cfg.func2("laser", "Ey", ("t", "x"))
    val = float(ey(0.0, 0.0))
    assert val == 0.0  # sin(0) = 0
    val = float(ey(1.0e-15, 0.0))
    assert math.isfinite(val) and val != 0.0
