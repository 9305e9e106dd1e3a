"""Diagnostics tests: histogram semantics, FITS round-trip, output-spec
grammar, and the full CLI pipeline on a miniature configuration."""

import math
from pathlib import Path

import numpy as np
import pytest

from opal_tpu.diagnostics import fits
from opal_tpu.diagnostics.hgram import AUTO, LOG, BinSpec, generate_1d, generate_2d
from opal_tpu.diagnostics.output import parse_output_spec
from opal_tpu.diagnostics.progress import pretty_duration, simulation_time


def test_binspec_parse():
    assert BinSpec.parse("40").kind == "fixed-number"
    assert BinSpec.parse("0.5").kind == "fixed-size"
    assert BinSpec.parse("log").kind == "log"
    assert BinSpec.parse("auto").kind == "auto"
    assert BinSpec.parse("garbage").kind == "auto"


def test_hgram_1d_density_integrates_to_total():
    rng = np.random.default_rng(0)
    v = rng.normal(size=10000)
    w = rng.random(10000)
    h = generate_1d(v, w, "x", "m", AUTO)
    # density * bin width sums back to the binned weight; the sample at
    # exactly v == max falls into bin nbins and is dropped, as in the
    # reference (hgram.rs:242-244)
    assert h.cts.sum() * h.bin_sz[0] == pytest.approx(w.sum(), rel=1e-3)
    assert h.cts.sum() * h.bin_sz[0] <= w.sum()
    assert h.total == pytest.approx(w.sum())
    assert h.bins[0] == math.ceil(2 * 10000 ** (1 / 3))


def test_hgram_log_scaled_bin_correction():
    """Log-scaled density bins must recover the linear-space density:
    sum(cts_i * linear_width_i) == total weight."""
    rng = np.random.default_rng(1)
    v = np.exp(rng.uniform(0.0, 5.0, 20000))
    w = np.ones_like(v)
    h = generate_1d(v, w, "energy", "MeV", LOG)
    edges = np.exp(h.mins[0] + h.bin_sz[0] * np.arange(h.bins[0] + 1))
    widths = np.diff(edges)
    assert (h.cts * widths).sum() == pytest.approx(w.sum(), rel=1e-3)


def test_hgram_single_point():
    h = generate_2d([1.0], [2.0], [0.5], ["x", "y"], ["1", "1"], [AUTO, AUTO])
    assert h is not None
    assert h.bins == [1, 1]
    assert h.total == 0.5


def test_hgram_empty():
    assert generate_1d([], [], "x", "m", AUTO) is None
    assert generate_2d([], [], [], ["x", "y"], ["1", "1"], [AUTO, AUTO]) is None


def test_fits_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    v = rng.normal(size=5000)
    w = rng.random(5000)
    h = generate_1d(v, w, "px", "MeV/c", AUTO)
    path = tmp_path / "h.fits"
    fits.write_histogram(path, h)
    data, keys = fits.read_image(path)
    np.testing.assert_allclose(data, h.cts, rtol=0)
    assert keys["BITPIX"] == -64
    assert keys["NAXIS1"] == h.bins[0]
    assert keys["CNAME1"] == "px"
    assert keys["CUNIT1"] == "MeV/c"
    assert keys["TOTAL"] == pytest.approx(h.total, rel=1e-13)
    assert keys["DATAMAX"] == pytest.approx(h.cts.max(), rel=1e-13)
    # file is a whole number of 2880-byte blocks
    assert path.stat().st_size % 2880 == 0


def test_output_spec_grammar():
    axes, bspec, weight = parse_output_spec("x:px")
    assert axes == ["x", "px"] and bspec.kind == "auto" and weight == "weight"

    axes, bspec, weight = parse_output_spec("energy:(log;energy)")
    assert axes == ["energy"] and bspec.kind == "log" and weight == "energy"

    axes, bspec, weight = parse_output_spec("longitude:latitude:(energy)")
    assert axes == ["longitude", "latitude"] and weight == "energy"

    assert parse_output_spec("bogus") is None
    assert parse_output_spec("x:px:pz") is None


def test_time_formatting():
    # 2.6e-4 s = 260 microseconds (the reference's own test value,
    # setup.rs:487-492)
    assert simulation_time(2.6e-4) == "  260.00 μs"
    assert simulation_time(1.5e-6).endswith("μs")
    assert pretty_duration(3723) == "01:02:03"
    assert pretty_duration(90061) == "1d 01:01:01"


TWO_STREAM_MINI = """
control:
 dx: 500
 nx: 96
 xmin: 0.0
 start: 0.0
 end: 0.002
 current_deposition: true
 n_outputs: 2

qed:
 photon_emission: false
 photon_absorption: false

electrons:
 npc: 10
 ne: 20.0
 ux: drift_u * (1.0 + 0.001 * nrand) * (2.0 * floor(urand - 0.5) + 1.0)
 uy: 0.0
 uz: 0.0
 output: [x:px, energy]

ions:
 npc: 0

constants:
 drift_u: 2.5e-24 / (me * c)
"""


@pytest.mark.physics
def test_cli_end_to_end(tmp_path):
    from opal_tpu.cli import main

    cfg = tmp_path / "mini.yaml"
    cfg.write_text(TWO_STREAM_MINI)
    assert main([str(cfg), "--devices", "4"]) == 0

    for i in range(3):
        assert (tmp_path / f"{i}_grid.dat").exists()
        assert (tmp_path / f"{i}_energy.dat").exists()
        assert (tmp_path / f"{i}_electron_x-px.fits").exists()
        assert (tmp_path / f"{i}_electron_energy.fits").exists()

    # energy ledger parses and is self-consistent
    lines = (tmp_path / "2_energy.dat").read_text().splitlines()
    vals = dict(line.split() for line in lines)
    assert set(vals) == {"em_field", "electrons", "ions", "photons"}
    assert float(vals["electrons"]) > 0
    assert float(vals["ions"]) == 0.0

    # grid dump has 11 columns x nx rows
    rows = np.loadtxt(tmp_path / "2_grid.dat")
    assert rows.shape == (96, 11)
    # x column matches the configured grid
    np.testing.assert_allclose(rows[:, 0], np.arange(96) * 500.0)

    # histogram total equals the initial macro-weight total
    data, keys = fits.read_image(tmp_path / "2_electron_x-px.fits")
    assert keys["TOTAL"] == pytest.approx(96 * 10 * 20.0 * 500.0 / 10, rel=1e-12)
