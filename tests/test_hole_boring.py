"""Hole-boring system test: a miniature ``hole_boring``-style deck
(reference ``examples/hole_boring.yaml``; laser-driven overdense slab,
two mobile species) driven through the full CLI surface.

This covers what the analytic field tests cannot: the laser/absorbing
boundary pair selected from the input's ``laser:`` section
(``main.rs:95-101``), a two-species (electron + carbon ion) run with
ion Z/A handling (``ion.rs:236-241``), the replicated-field mode that
the CLI auto-selects for strongly nonuniform decks, and the
laser-to-plasma energy transfer showing up in the energy ledger."""

import numpy as np
import pytest

pytestmark = pytest.mark.physics

from opal_tpu.cli import main
from opal_tpu.diagnostics.fits import read_image

DECK = """\
control:
 dx: micro / 100
 nx: 800
 xmin: -2*micro
 start: -2.0e-6/c
 end: 3.0e-6/c
 current_deposition: true
 n_outputs: 2

qed:
 photon_emission: false
 photon_absorption: false

electrons:
 npc: 10
 ne: density * critical(omega) * step(x,xmin,xmax)
 ux: sqrt(kT/(m*c^2)) * nrand
 uy: sqrt(kT/(m*c^2)) * nrand
 uz: sqrt(kT/(m*c^2)) * nrand
 output: [x:px, x:p_perp]

ions:
 name: carbon
 npc: 10
 Z: Z
 A: A
 ni: density * critical(omega) * step(x,xmin,xmax) / Z
 ux: sqrt(kT/(A*mp*c^2)) * nrand
 uy: sqrt(kT/(A*mp*c^2)) * nrand
 uz: sqrt(kT/(A*mp*c^2)) * nrand
 output: [x:px]

laser:
 Ey: (a0*me*c*omega/e) * gauss_pulse_re(t,x,omega,sigma)
 Ez: (a0*me*c*omega/e) * gauss_pulse_im(t,x,omega,sigma)

constants:
 density: 4.0
 a0: 10.0
 omega: 2*pi*c/0.8e-6
 sigma: pi * 2.0 / sqrt(ln(2.0))
 kT: 500 * eV
 Z: 6.0
 A: 12.0
 xmin: 2.0 * micro
 xmax: 4.0 * micro
"""


def _energies(path):
    out = {}
    for line in path.read_text().splitlines():
        k, v = line.split()
        out[k] = float(v)
    return out


def test_hole_boring_cli(tmp_path, capsys):
    deck = tmp_path / "hb.yaml"
    deck.write_text(DECK)
    rc = main([str(deck), "--devices", "4"])
    assert rc == 0
    captured = capsys.readouterr()
    assert "buffer-overflow" not in captured.err
    # the slab fills 1/4 of the box: the CLI must pick the
    # replicated-field equal-count decomposition, not domain slabs
    assert "replicated fields" in captured.out

    e0 = _energies(tmp_path / "0_energy.dat")
    e2 = _energies(tmp_path / "2_energy.dat")
    for v in (*e0.values(), *e2.values()):
        assert np.isfinite(v)
    # photons off; both plasma species populated from t=0
    # ledger labels are FIXED (em_field/electrons/ions/photons)
    # whatever the species name — main.rs:36-39 parity; the custom
    # name only prefixes the FITS files
    assert e0["electrons"] > 0.0 and e0["ions"] > 0.0
    assert e0["photons"] == 0.0 and e2["photons"] == 0.0
    # t=0 predates the pulse reaching the box: field energy ~ 0, then
    # the injected pulse dominates everything else in the ledger
    assert e2["em_field"] > 100.0 * e0["em_field"]
    # a0=10 on an overdense slab: electrons heat far beyond thermal
    assert e2["electrons"] > 10.0 * e0["electrons"]
    # hole boring pushes the ions too (slowly — any measurable gain)
    assert e2["ions"] > e0["ions"]

    # grid dump carries the injected fields: nonzero Ey (col 7) and
    # Bz (col 10) somewhere in the box at the final output
    grid = np.loadtxt(tmp_path / "2_grid.dat")
    assert grid.shape == (800, 11)
    assert np.abs(grid[:, 6]).max() > 0.0
    assert np.abs(grid[:, 9]).max() > 0.0

    # both species' FITS histograms written and self-consistent
    img_e, hdr_e = read_image(str(tmp_path / "2_electron_x-px.fits"))
    assert np.isfinite(img_e).all() and img_e.sum() > 0
    img_p, hdr_p = read_image(str(tmp_path / "2_electron_x-p_perp.fits"))
    assert hdr_p["TOTAL"] == pytest.approx(hdr_e["TOTAL"], rel=1e-6)
    img_c, _ = read_image(str(tmp_path / "2_carbon_x-px.fits"))
    assert np.isfinite(img_c).all() and img_c.sum() > 0
