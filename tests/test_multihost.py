"""Multi-process (multi-host) operation of the CLI.

The reference runs across nodes via MPI as a matter of course
(``src/main.rs:49``, ``README.md:40-50``).  The TPU framework's
analogue is ``jax.distributed.initialize`` + the same SPMD program over
a global mesh, with outputs all-gathered per process and written by
process 0 (``cli.py``).  This test actually EXECUTES that path on one
machine: 2 processes x 4 virtual CPU devices = the same 8-device mesh
the single-process suite uses, driven end-to-end through the CLI, and
the outputs are compared against a single-process 8-device run of the
identical deck.

The device-side RNG folds per *device* (``species.initialize_device``),
so the two runs sample identical particles and the outputs must agree
to float tolerance.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

DECK = """\
control:
 dx: 500
 nx: 96
 xmin: 0.0
 start: 0.0
 end: 1.0e-4
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
 output: x:px

ions:
 npc: 0

constants:
 drift_u: 2.5e-24 / (me * c)
"""


def _env(n_local_devices):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    env["PYTHONPATH"] = str(REPO)
    return env


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _read_outputs(d: Path):
    grid = np.loadtxt(d / "2_grid.dat")
    energy = {}
    for line in (d / "2_energy.dat").read_text().splitlines():
        k, v = line.split()
        energy[k] = float(v)
    return grid, energy


@pytest.mark.physics
def test_two_process_cli_matches_single_process(tmp_path):
    single = tmp_path / "single"
    multi = tmp_path / "multi"
    for d in (single, multi):
        d.mkdir()
        (d / "ts.yaml").write_text(DECK)

    # --- reference: one process, 8 virtual devices -------------------
    r = subprocess.run(
        [sys.executable, "-m", "opal_tpu", "ts.yaml", "--devices", "8"],
        cwd=single, env=_env(8), capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    # --- 2 processes x 4 devices over the same 8-device mesh ---------
    port = _free_port()
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "opal_tpu", "ts.yaml",
                "--devices", "8",
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2", "--process-id", str(rank),
            ],
            cwd=multi, env=_env(4),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rank {procs.index(p)}:\n{err[-2000:]}"
    # rank 0 announces the multi-host mode and owns the output files
    assert "[multi-host: 2 processes over 8 devices" in outs[0][1]
    assert "Output" in outs[0][0]
    assert "buffer-overflow" not in outs[0][1]

    grid_s, en_s = _read_outputs(single)
    grid_m, en_m = _read_outputs(multi)
    assert grid_m.shape == (96, 11)
    np.testing.assert_allclose(grid_m, grid_s, rtol=1e-6, atol=1e-30)
    for k in ("em_field", "electrons", "ions", "photons"):
        np.testing.assert_allclose(en_m[k], en_s[k], rtol=1e-6, atol=0.0)
    assert en_m["electrons"] > 0.0
