"""Feature-flag section of the input file (the reference's cargo
features, ``Cargo.toml:24-31``, as runtime booleans — SURVEY C22)."""

import textwrap

import numpy as np

from opal_tpu.cli import build


def _write(tmp_path, features=""):
    cfg = textwrap.dedent(
        """
        control:
          dx: 500
          nx: 32
          xmin: 0.0
          start: 0.0
          end: 0.001
          current_deposition: true
          n_outputs: 1

        qed:
          photon_emission: true
          photon_absorption: true

        {features}
        electrons:
          npc: 2
          ne: 20.0
          ux: 0.1
          uy: 0.0
          uz: 0.0
          output: [x]

        ions:
          npc: 0

        photons:
          npc: 0
          output: [energy]

        constants: {{}}
        """
    ).format(features=features)
    p = tmp_path / "in.yaml"
    p.write_text(cfg)
    return p


def test_default_features(tmp_path):
    sim, _, _ = build(_write(tmp_path), n_devices=4)
    assert sim.options.radiation_reaction
    assert sim.options.beaming
    assert sim.options.stimulated_emission
    assert not sim.options.immobile_photons


def test_features_section(tmp_path):
    feats = (
        "features:\n"
        "  no_radiation_reaction: true\n"
        "  no_beaming: true\n"
        "  no_stimulated_emission: true\n"
        "  immobile_photons: true\n"
    )
    sim, _, _ = build(_write(tmp_path, feats), n_devices=4)
    assert not sim.options.radiation_reaction
    assert not sim.options.beaming
    assert not sim.options.stimulated_emission
    assert sim.options.immobile_photons


def test_tpu_section_options(tmp_path):
    """Every documented ``tpu:`` tuning knob must actually reach
    SimOptions (docs/input.md §tpu)."""
    feats = (
        "tpu:\n"
        "  fused_misfit_capacity: 96\n"
        "  migration_capacity: 123\n"
        "  migration_every: 2\n"
        "  absorption_candidates: 17\n"
        "  absorption_active_capacity: 4096\n"
        "  packed_fused: 0\n"
    )
    sim, _, _ = build(_write(tmp_path, feats), n_devices=4)
    assert sim.options.fused_misfit_capacity == 96
    assert sim.options.migration_capacity == 123
    assert sim.options.migration_every == 2
    assert sim.options.absorption_candidates == 17
    assert sim.options.absorption_active_capacity == 4096
    assert not sim.options.packed_fused


def test_active_capacity_auto_defaults(tmp_path):
    """With no explicit tpu: override, the QED active-set compactions
    auto-size from the per-device species capacities (docs/input.md):
    emission = electron capacity / 8, absorption = photon capacity / 4,
    both floored at 4096."""
    sim, _, params = build(_write(tmp_path), n_devices=4)
    ecap = params["capacities"]["electron"]
    pcap = params["capacities"]["photon"]
    assert sim.options.emission_active_capacity == max(
        4096, -(-max(4096, ecap // 8) // 8) * 8
    )
    assert sim.options.absorption_active_capacity == max(
        4096, -(-max(4096, pcap // 4) // 8) * 8
    )
    # explicit 0 disables
    feats = (
        "tpu:\n"
        "  absorption_active_capacity: 0\n"
        "  emission_active_capacity: 0\n"
    )
    sim, _, _ = build(_write(tmp_path, feats), n_devices=4)
    assert sim.options.emission_active_capacity == 0
    assert sim.options.absorption_active_capacity == 0


def test_replicated_initial_photons(tmp_path):
    """Replicated mode with an initial photon population: pcap is
    per-device, so generation must not be capped at pcap TOTAL."""
    cfg = textwrap.dedent(
        """
        control:
          dx: 500
          nx: 64
          xmin: 0.0
          start: 0.0
          end: 0.001
          current_deposition: true
          n_outputs: 1

        qed:
          photon_emission: true
          photon_absorption: false

        electrons:
          npc: 8
          ne: 20.0 * step(x, 0.0, 8000.0)
          ux: 0.1
          uy: 0.0
          uz: 0.0
          output: [x]

        ions:
          npc: 0

        photons:
          npc: 50
          nph: 20.0 * step(x, 0.0, 8000.0)
          ux: 1.0
          uy: 0.0
          uz: 0.0
          output: [energy]

        constants: {}

        tpu:
          replicate_fields: 1
          photon_capacity: 256
        """
    )
    p = tmp_path / "in.yaml"
    p.write_text(cfg)
    sim, species, params = build(p, n_devices=4)
    assert params["replicated"]
    n_ph = int(np.asarray(species["photon"].alive).sum())
    # 16 cells x 50 per cell = 800 photons > the old pcap-total limit
    assert n_ph == 800
