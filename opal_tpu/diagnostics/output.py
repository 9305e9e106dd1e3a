"""Simulation output: grid dumps, energy ledger, particle histograms.

File formats and naming mirror the reference so post-processing
pipelines carry over unchanged:

* ``{i}_grid.dat`` — 11 columns (x rho jx jy jz Ex Ey Ez Bx By Bz),
  all quantities interpolated to the cell left edge
  (``src/grid/yee.rs:749-781,815-835``).
* ``{i}_energy.dat`` — em_field / electrons / ions / photons totals in
  joules (``src/main.rs:23-42``).
* ``{i}_{species}_{spec}[.][_weight][_log].fits`` — distribution
  functions per output-spec string (``src/particle/mod.rs:383-568``),
  grammar ``f[:g][:(bspec;weight)]``.
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np

from .. import constants as const
from ..grid import GridGeometry
from ..species import ParticleState, SpeciesSpec
from . import fits
from .hgram import AUTO, BinSpec, generate_1d, generate_2d

_UNITS = {
    "x": "m", "r": "m", "energy": "MeV",
    "px": "MeV/c", "py": "MeV/c", "pz": "MeV/c", "p_perp": "MeV/c",
    "theta": "rad", "phi": "rad", "longitude": "rad", "latitude": "rad",
    "work": "J", "chi": "1", "helicity": "1",
}


def particle_quantity(
    name: str, spec: SpeciesSpec, st: ParticleState, geom: GridGeometry,
    capacity_per_device: int, replicated: bool = False,
):
    """Host-side accessor for one output quantity over all alive
    particles (``mod.rs:388-449``).  ``replicated``: cells are already
    global (replicated-field mode), so no per-device offset applies."""
    alive = np.asarray(st.alive)
    u = np.asarray(st.u)[alive]
    gamma = np.asarray(st.gamma)[alive]

    if spec.kind == "ion":
        p_unit = (spec.mass / const.ELECTRON_MASS) * const.ELECTRON_MASS_MEV
    else:
        p_unit = const.ELECTRON_MASS_MEV
    p = u * p_unit
    pmag = np.sqrt(np.sum(p * p, axis=-1))

    if name == "x":
        if replicated:
            g = np.asarray(st.cell)[alive]
        else:
            idx = np.flatnonzero(alive)
            dev = idx // capacity_per_device
            g = dev * geom.n_loc + np.asarray(st.cell)[alive]
        return geom.xmin + (g - geom.left_pad + np.asarray(st.x)[alive]) * geom.dx
    if name == "r":
        return np.hypot(np.asarray(st.y)[alive], np.asarray(st.z)[alive])
    if name == "energy":
        if spec.kind == "photon":
            return gamma * const.ELECTRON_MASS_MEV
        if spec.kind == "ion":
            u2 = np.sum(u * u, axis=-1)
            gamma_m1 = u2 / (1.0 + np.sqrt(1.0 + u2))
            return gamma_m1 * p_unit
        return gamma * const.ELECTRON_MASS_MEV
    if name == "px":
        return p[:, 0]
    if name == "py":
        return p[:, 1]
    if name == "pz":
        return p[:, 2]
    if name == "p_perp":
        return np.hypot(p[:, 1], p[:, 2])
    if name == "theta":
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.arccos(p[:, 0] / pmag)
    if name == "phi":
        return np.arctan2(p[:, 2], p[:, 1])
    if name == "longitude":
        return np.arctan2(p[:, 1], -p[:, 0])
    if name == "latitude":
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.arcsin(p[:, 2] / pmag)
    if name == "work":
        if st.work is None:
            return np.zeros(alive.sum())
        return np.asarray(st.work)[alive]
    if name == "chi":
        return np.asarray(st.chi)[alive]
    if name == "helicity":
        # the photon spin_state (photon.rs:141-147,299-302); the
        # reference defines it but never wires it into the output
        # grammar — exposed here as an extension
        if st.pol is None:
            return np.zeros(alive.sum())
        pol = np.asarray(st.pol)[alive]
        re = pol[:, 0] + pol[:, 3]
        im = pol[:, 1] - pol[:, 2]
        return 0.5 * (re * re + im * im)
    return None


def parse_output_spec(o: str):
    """Parse one output-spec string into (axes, bspec, weight)
    (``mod.rs:452-467``); returns None if not recognised."""
    ss = o.split(":")
    bspec, weight = AUTO, "weight"
    if len(ss) >= 2 and ss[-1].startswith("(") and ss[-1].endswith(")"):
        last = ss.pop()[1:-1]
        parts = last.split(";")
        if len(parts) == 1:
            weight = parts[0]
        elif len(parts) == 2:
            bspec, weight = BinSpec.parse(parts[0]), parts[1]
    if len(ss) not in (1, 2):
        return None
    if any(s not in _UNITS for s in ss):
        return None
    if weight not in ("weight", "auto", "energy"):
        return None
    return ss, bspec, weight


def write_particle_outputs(
    directory, index: int, spec: SpeciesSpec, st: ParticleState,
    geom: GridGeometry, capacity_per_device: int, replicated: bool = False,
):
    """Generate and write every requested distribution for a species
    (``mod.rs:451-566``)."""
    directory = Path(directory)
    for o in spec.output:
        parsed = parse_output_spec(o)
        if parsed is None:
            continue
        axes, bspec, weight = parsed

        values = [
            particle_quantity(a, spec, st, geom, capacity_per_device,
                              replicated)
            for a in axes
        ]
        weights = np.asarray(st.weight)[np.asarray(st.alive)]
        if weight == "energy":
            weights = weights * particle_quantity(
                "energy", spec, st, geom, capacity_per_device, replicated
            )

        if len(axes) == 1:
            h = generate_1d(values[0], weights, axes[0], _UNITS[axes[0]], bspec)
            stem = f"{index}_{spec.name}_{axes[0]}"
        else:
            h = generate_2d(
                values[0], values[1], weights, axes, [_UNITS[a] for a in axes],
                [bspec, bspec],
            )
            stem = f"{index}_{spec.name}_{axes[0]}-{axes[1]}"
        if weight != "weight":
            stem += f"_{weight}"
        if bspec.kind == "log":
            stem += "_log"
        if h is not None:
            fits.write_histogram(directory / f"{stem}.fits", h)


def write_event_log(stream, events, options) -> int:
    """Drain the per-device absorption/stimulated-emission event ring
    to ``stream`` in the reference's dump format
    (``interactions.rs:267-289``): ``x t birth_time chi_g k0 k1 k2 k3
    chi_e p0 p1 p2 p3 abs|stim``.  Returns the number of rows written.
    """
    ring, count = np.asarray(events[0]), np.asarray(events[1])
    n_dev = count.shape[0]
    cap = ring.shape[0] // max(n_dev, 1)
    written = 0
    dropped = 0
    for d in range(n_dev):
        # count is total events seen; the ring stores at most cap
        dropped += max(0, int(count[d]) - cap)
        rows = ring[d * cap : d * cap + min(int(count[d]), cap)]
        for r in rows:
            kind = "abs" if r[13] == 1.0 else "stim"
            if kind == "abs" and not options.extra_absorption_output:
                continue
            if kind == "stim" and not options.extra_stimulated_emission_output:
                continue
            head = " ".join(f"{v:.6e}" for v in r[:3])
            body = " ".join(f"{v:.3e}" for v in r[3:13])
            stream.write(f"{head} {body} {kind}\n")
            written += 1
    if dropped:
        stream.write(
            f"# WARNING: event ring overflow: {dropped} events dropped "
            f"(capacity {cap}/device; raise control:event_log_capacity)\n"
        )
    return written


def interpolate_grid(E, B, J, rho, geom: GridGeometry):
    """Interpolate all grid quantities to the cell left edge over the
    interior, host-side (``yee.rs:815-835``).

    Centred quantities (jx, Ex, By, Bz) average cells g-1 and g; edge
    quantities pass through.  For the first interior cell the left
    neighbour is the boundary-zone cell (non-periodic) or the wrapped
    last cell (periodic).
    """
    E = np.asarray(E)
    B = np.asarray(B)
    J = np.asarray(J)
    rho = np.asarray(rho)
    s, e = geom.interior_start, geom.interior_end

    def left(a):
        return np.roll(a, 1, axis=0)[s:e]

    out = np.zeros((geom.nx, 11))
    out[:, 0] = geom.interior_x()
    out[:, 1] = rho[s:e]
    out[:, 2] = 0.5 * (J[s:e, 0] + left(J)[:, 0])
    out[:, 3] = J[s:e, 1]
    out[:, 4] = J[s:e, 2]
    out[:, 5] = 0.5 * (E[s:e, 0] + left(E)[:, 0])
    out[:, 6] = E[s:e, 1]
    out[:, 7] = E[s:e, 2]
    out[:, 8] = B[s:e, 0]
    out[:, 9] = 0.5 * (B[s:e, 1] + left(B)[:, 1])
    out[:, 10] = 0.5 * (B[s:e, 2] + left(B)[:, 2])
    return out


def write_grid_data(directory, index: int, E, B, J, rho, geom: GridGeometry):
    rows = interpolate_grid(E, B, J, rho, geom)
    path = Path(directory) / f"{index}_grid.dat"
    from .. import native

    if native.write_text_table(path, rows):
        return
    with open(path, "w") as f:
        for row in rows:
            f.write(" ".join(f"{v:.17e}" for v in row) + "\n")


def write_energies(
    directory, index: int, field_energy: float, electron_energy: float,
    ion_energy: float, photon_energy: float,
):
    path = Path(directory) / f"{index}_energy.dat"
    with open(path, "w") as f:
        f.write(f"em_field {field_energy:.6e}\n")
        f.write(f"electrons {electron_energy:.6e}\n")
        f.write(f"ions {ion_energy:.6e}\n")
        f.write(f"photons {photon_energy:.6e}\n")
