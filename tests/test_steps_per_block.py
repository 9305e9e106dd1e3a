"""Watchdog chunking: ``tpu: steps_per_block`` splits an output block
into a loop of short compiled programs (guarding the tunnel device's
per-program wall-time kill, BASELINE.md 2026-08-19 bisect).

For a non-QED deck the step consumes no randomness, so the chunked
loop reproduces the single-program run up to summation-order noise:
each chunk opens with its own maintenance-sort/migration phase, so
particle order (and with it deposition summation order) regroups at
chunk boundaries — physics-identical, float-rounding different."""

import textwrap

import numpy as np
import pytest

from opal_tpu.cli import main

pytestmark = pytest.mark.unit

DECK = """\
control:
 dx: 500.0
 nx: 64
 xmin: 0.0
 start: 0.0
 end: 30 * 0.95 * 500.0 / c
 current_deposition: true
 n_outputs: 2

qed:
 photon_emission: false
 photon_absorption: false

electrons:
 npc: 8
 ne: 10.0
 ux: 0.1 * sin(2*pi*x/(64*500))
 uy: 0.0
 uz: 0.0
 output: [x]

ions:
 npc: 0

constants: {}

tpu:
 steps_per_block: %d
"""


def _run(tmp_path, spb):
    d = tmp_path / f"spb{spb}"
    d.mkdir()
    p = d / "in.yaml"
    p.write_text(textwrap.dedent(DECK % spb))
    assert main([str(p), "--devices", "4"]) == 0
    return d


def test_chunked_matches_single_program(tmp_path):
    ref = _run(tmp_path, -1)  # never split: one program per block
    chk = _run(tmp_path, 4)  # 15-step blocks -> 4 balanced chunks
    for i in range(3):
        g0 = np.loadtxt(ref / f"{i}_grid.dat")
        g1 = np.loadtxt(chk / f"{i}_grid.dat")
        scale = np.abs(g0).max(axis=0) + 1e-300  # per-column magnitude
        np.testing.assert_array_less(
            np.abs(g1 - g0).max(axis=0) / scale, 1e-4
        )
        for l0, l1 in zip(
            (ref / f"{i}_energy.dat").read_text().splitlines(),
            (chk / f"{i}_energy.dat").read_text().splitlines(),
        ):
            v0 = float(l0.split()[1])
            v1 = float(l1.split()[1])
            assert abs(v1 - v0) <= 1e-4 * abs(v0) + 1e-300, (l0, l1)
