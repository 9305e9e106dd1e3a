"""Deferral-fidelity oracle (VERDICT r4 item 7).

The QED machinery bounds its per-step working sets — emission
active-set (``emission_active_capacity``), photon-buffer insert
(``emission_insert_capacity``), absorption walk active-set
(``absorption_active_capacity``) and absorption events
(``absorption_event_capacity``).  Work beyond a bound is DEFERRED to a
later step and counted (never silently lost): tau stays negative and
the emitter samples later; a photon skips its walk for a step; an
absorption event applies next step.  The reference has no such bounds
(``interactions.rs:45-107, 291-317`` processes everything in-step).

The guarantee this test pins: under TRANSIENT overload — demand peaks
above the bound but the backlog drains while the driving field is
still present — a bounded run converges to the unbounded run's
observables at matched physical time.  The deck is the miniature
colliding-beams crossing of ``test_qed_burst``: the Gaussian pulse
makes emission demand peak at the crossing and fall on the pulse
tail, so a bound below the peak demand defers work for a few steps
near the peak and drains it on the falling edge, where chi is still
close to its peak value (residual: those photons sample a slightly
later, slightly different chi — a delay of physics, not a loss).

What deferral does NOT guarantee — and the API-level saturation
experiment behind this test demonstrated (builder's log, r5) — is
fidelity under SUSTAINED saturation: if demand exceeds the bound for
an entire field crossing, emission is rate-limited in time and a
backlog carried past the field edge samples at collapsed chi.  Sizing
rules (auto EC = capacity/32, floored at 4096) keep real decks far
from that regime; the qed_deferred backlog note in the CLI is the
operator's signal.
"""

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
 output: [energy]

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
%s
"""


def _energies(path):
    out = {}
    for line in path.read_text().splitlines():
        k, v = line.split()
        out[k] = float(v)
    return out


def _run(tmp_path, name, extra):
    d = tmp_path / name
    d.mkdir()
    deck = d / "burst.yaml"
    deck.write_text(DECK % extra)
    rc = main([str(deck), "--devices", "4"])
    assert rc == 0
    e = _energies(d / "2_energy.dat")
    img, hdr = read_image(str(d / "2_photon_energy.fits"))
    return e, np.asarray(img, np.float64), hdr


def test_bounded_burst_converges_to_unbounded(tmp_path, capsys):
    # unbounded-equivalent: auto sizing — demand never reaches the
    # auto bounds on this deck (no deferral backlog note printed)
    e_ref, spec_ref, hdr_ref = _run(tmp_path, "ref", "")
    err_ref = capsys.readouterr().err
    assert "buffer-overflow" not in err_ref

    # bounded: emission active-set and insert bound well below the
    # crossing's peak demand (calibrated so the backlog note appears
    # but the tail of the pulse drains it)
    e_bnd, spec_bnd, hdr_bnd = _run(
        tmp_path, "bnd",
        " emission_active_capacity: 8\n emission_insert_capacity: 8",
    )
    err_bnd = capsys.readouterr().err
    assert "buffer-overflow" not in err_bnd
    # the bounds actually bound: the bounded run reports a backlog
    assert "backlog" in err_bnd

    # photon POPULATION converges at matched physical time (count
    # statistics are Poisson-tight; measured residual +1.5% at EC=8
    # vs -10.6% under genuine saturation at EC=4 — the oracle
    # distinguishes transient deferral from rate-limiting)
    assert hdr_bnd["TOTAL"] == pytest.approx(hdr_ref["TOTAL"], rel=0.05)
    # radiated ENERGY is heavy-tailed (a deferred emitter redraws its
    # photon on a later step): run-to-run sampling noise alone is
    # ~10% on this deck, so the energy tolerance only excludes gross
    # saturation
    assert e_bnd["photons"] == pytest.approx(e_ref["photons"], rel=0.25)
    # (final electron energy inherits the radiated-energy sampling
    # noise: measured residual 0.8%)
    assert e_bnd["electrons"] == pytest.approx(
        e_ref["electrons"], rel=0.02
    )

    # spectral shape: L1 distance of normalized dN/dE histograms
    a = spec_ref / max(spec_ref.sum(), 1e-300)
    b = spec_bnd / max(spec_bnd.sum(), 1e-300)
    assert np.abs(a - b).sum() < 0.2
