"""QED burst system test: a miniature ``colliding_beams``-style deck
(reference ``examples/colliding_beams.yaml``; emission driver
``src/particle/interactions.rs:45-107``) where the beam-pulse crossing
happens INSIDE the run window, driven through the full CLI surface.

This covers what the per-kernel QED tests cannot: the emission
machinery integrated into the scanned step — photon population growth,
the energy ledger, photon FITS output — with the electron energy loss
balancing the photon energy gain (radiation reaction on, so the only
other electron energy channel is laser work, which is small and
symmetric over a full crossing)."""

import numpy as np
import pytest

pytestmark = pytest.mark.physics

from opal_tpu.cli import main
from opal_tpu.diagnostics.fits import read_image

DECK = """\
control:
 dx: 0.01*micro
 nx: 800
 xmin: -1*micro
 start: -2.0e-6/c
 end: 3.0e-6/c
 current_deposition: false
 n_outputs: 2

qed:
 photon_emission: true
 photon_absorption: false

electrons:
 npc: 12
 ne: S * a0 * critical(omega) * step(x,xmin,xmax)
 ux: -1000.0 * (1.0 + 0.01 * nrand)
 uy: 0.0
 uz: 0.0
 output: [energy]

ions:
 npc: 0

photons:
 npc: 0
 output: [energy, x:energy]

laser:
 Ey: >
  (a0*m*c*omega/e)
  *sin(omega*(t-x/c))
  *exp(-ln(2.0)*(omega*(t-x/c))^2/(2.0*pi^2*ncycles^2))
 Ez: 0.0

constants:
 S: 1.0e-6
 a0: 20.0
 omega: 2*pi*c/0.8e-6
 ncycles: 4.0
 xmin: 4.0 * micro
 xmax: 5.0 * micro

tpu:
 photon_capacity: 32768
 absorption_candidates: 8
"""


def _energies(path):
    out = {}
    for line in path.read_text().splitlines():
        k, v = line.split()
        out[k] = float(v)
    return out


def test_colliding_burst_cli(tmp_path, capsys):
    deck = tmp_path / "burst.yaml"
    deck.write_text(DECK)
    rc = main([str(deck), "--devices", "4"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "buffer-overflow" not in err

    e0 = _energies(tmp_path / "0_energy.dat")
    e2 = _energies(tmp_path / "2_energy.dat")
    assert e0["photons"] == 0.0
    assert e0["electrons"] > 0.0

    # the burst fired: photons carry real energy by the end
    ph_gain = e2["photons"]
    e_loss = e0["electrons"] - e2["electrons"]
    assert ph_gain > 1e-3 * e0["electrons"]
    # radiated energy ledger: electron loss ~ photon gain (laser work
    # is the only other channel and is small over a full crossing)
    assert abs(e_loss - ph_gain) < 0.25 * ph_gain

    # photon spectra written and self-consistent
    img, hdr = read_image(str(tmp_path / "2_photon_energy.fits"))
    assert np.isfinite(img).all() and img.sum() > 0
    img2, hdr2 = read_image(str(tmp_path / "2_photon_x-energy.fits"))
    assert np.isfinite(img2).all() and img2.sum() > 0
    # bin heights are volume-normalized (dN/dE vs d2N/dxdE), so raw
    # sums differ; the macroweight TOTALs must agree exactly
    assert hdr2["TOTAL"] == pytest.approx(hdr["TOTAL"], rel=1e-6)
