"""Native host-IO library parity: C++ paths must match the pure-Python
fallbacks bit-for-bit (text/FITS) or to f64 round-off (binning)."""

import os

import numpy as np
import pytest

from opal_tpu import native
from opal_tpu.diagnostics import fits
from opal_tpu.diagnostics.hgram import AUTO, LOG, BinSpec, generate_1d, generate_2d


def _have_native():
    return native.lib() is not None


pytestmark = pytest.mark.skipif(
    not _have_native(), reason="native library unavailable"
)


def test_text_table_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    rows = rng.standard_normal((57, 11)) * 10.0 ** rng.integers(-20, 20, (57, 11))
    rows[0, 0] = 0.0
    rows[1, 1] = -0.0

    native_path = tmp_path / "native.dat"
    assert native.write_text_table(native_path, rows)

    py_lines = [" ".join(f"{v:.17e}" for v in row) + "\n" for row in rows]
    assert native_path.read_text() == "".join(py_lines)


def test_fits_roundtrip_native(tmp_path, monkeypatch):
    rng = np.random.default_rng(1)
    data = rng.standard_normal((24, 16))
    keys = [("BUNIT", "1/(m.MeV/c)"), ("TOTAL", 123.456), ("OBJECT", "t")]

    p_native = tmp_path / "n.fits"
    fits.write_image(p_native, data, keys)

    monkeypatch.setenv("OPAL_TPU_NO_NATIVE", "1")
    # reset the module cache so the env var is honoured
    native._tried, native._lib = False, None
    p_py = tmp_path / "p.fits"
    fits.write_image(p_py, data, keys)
    native._tried, native._lib = False, None

    assert p_native.read_bytes() == p_py.read_bytes()
    out, hdr = fits.read_image(p_native)
    np.testing.assert_array_equal(out, data)
    assert hdr["TOTAL"] == 123.456


def _py_hist_1d(values, weights, name, unit, bspec, hspec="density"):
    os.environ["OPAL_TPU_NO_NATIVE"] = "1"
    native._tried, native._lib = False, None
    try:
        return generate_1d(values, weights, name, unit, bspec, hspec)
    finally:
        del os.environ["OPAL_TPU_NO_NATIVE"]
        native._tried, native._lib = False, None


def _py_hist_2d(*args, **kw):
    os.environ["OPAL_TPU_NO_NATIVE"] = "1"
    native._tried, native._lib = False, None
    try:
        return generate_2d(*args, **kw)
    finally:
        del os.environ["OPAL_TPU_NO_NATIVE"]
        native._tried, native._lib = False, None


@pytest.mark.parametrize("bspec", [AUTO, LOG, BinSpec("fixed-number", 32)])
def test_hist1d_matches_python(bspec):
    rng = np.random.default_rng(2)
    v = rng.lognormal(0.0, 2.0, 20000)
    v[::97] = np.inf  # non-finite entries are skipped, counted in total
    w = rng.random(20000)

    h_n = generate_1d(v, w, "energy", "MeV", bspec)
    h_p = _py_hist_1d(v, w, "energy", "MeV", bspec)
    assert h_n.bins == h_p.bins
    assert h_n.total == h_p.total
    np.testing.assert_allclose(h_n.cts, h_p.cts, rtol=1e-12, atol=1e-300)


def test_hist2d_matches_python():
    rng = np.random.default_rng(3)
    v0 = rng.standard_normal(5000)
    v1 = rng.lognormal(0.0, 1.0, 5000)
    w = rng.random(5000)

    h_n = generate_2d(
        v0, v1, w, ["x", "energy"], ["m", "MeV"], [AUTO, AUTO]
    )
    h_p = _py_hist_2d(
        v0, v1, w, ["x", "energy"], ["m", "MeV"], [AUTO, AUTO]
    )
    assert h_n.bins == h_p.bins
    np.testing.assert_allclose(h_n.cts, h_p.cts, rtol=1e-12, atol=1e-300)


def test_hist2d_degenerate_axis():
    v0 = np.full(100, 3.25)
    v1 = np.linspace(0, 1, 100)
    w = np.ones(100)
    h_n = generate_2d(v0, v1, w, ["x", "px"], ["m", "MeV/c"], [AUTO, AUTO])
    h_p = _py_hist_2d(v0, v1, w, ["x", "px"], ["m", "MeV/c"], [AUTO, AUTO])
    assert h_n.bins == h_p.bins
    np.testing.assert_allclose(h_n.cts, h_p.cts, rtol=1e-12)


def test_finite_minmax():
    v = np.array([np.nan, 3.0, -5.0, np.inf, 2.0])
    cnt, mn, mx = native.finite_minmax(v)
    assert (cnt, mn, mx) == (3, -5.0, 3.0)
