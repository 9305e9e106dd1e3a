"""Checkpoint / resume.

The reference has **no** checkpointing: a run always restarts from
``t = start`` (``src/main.rs:185``; SURVEY §5).  This module adds the
minimal trivially-correct snapshot the survey recommends: every device
array of the simulation state (fields, all species SoAs, RNG key,
counters) plus the scalar clock, written as one ``.npz`` with a JSON
manifest.  Particle cell indices and block layouts are relative to the
device decomposition, so a snapshot must be resumed on the same device
count (enforced via the manifest).

Format: ``checkpoint.npz`` with keys ``E B J rho t step key`` plus
``{species}/{field}`` and ``counter/{species}``; ``manifest`` holds a
JSON blob with a format version and the species list.
"""

from __future__ import annotations

import dataclasses
import io
import json
from pathlib import Path

import numpy as np

FORMAT_VERSION = 1
FILENAME = "checkpoint.npz"


def save(directory, step_index: int, t: float, E, B, J, rho, species,
         key, counters, n_devices: int | None = None) -> Path:
    """Snapshot the full simulation state.  All arrays are pulled to
    host; the write is atomic (tmp file + rename)."""
    import jax

    arrays: dict[str, np.ndarray] = {
        "E": np.asarray(E),
        "B": np.asarray(B),
        "J": np.asarray(J),
        "rho": np.asarray(rho),
        "key": np.asarray(jax.random.key_data(key)),
    }
    for name, st in species.items():
        for f in dataclasses.fields(st):
            a = getattr(st, f.name)
            if a is not None:
                arrays[f"{name}/{f.name}"] = np.asarray(a)
    for name, c in counters.items():
        arrays[f"counter/{name}"] = np.asarray(c)

    manifest = json.dumps(
        {
            "version": FORMAT_VERSION,
            "step": int(step_index),
            "t": float(t),
            "species": sorted(species.keys()),
            "n_devices": None if n_devices is None else int(n_devices),
        }
    )
    arrays["manifest"] = np.frombuffer(manifest.encode(), dtype=np.uint8)

    directory = Path(directory)
    tmp = directory / (FILENAME + ".tmp")
    buf = io.BytesIO()
    np.savez_compressed(buf, **arrays)
    tmp.write_bytes(buf.getvalue())
    path = directory / FILENAME
    tmp.replace(path)
    return path


def load(directory, sim):
    """Restore a snapshot onto ``sim``'s mesh.

    Returns ``(step_index, t, E, B, J, rho, species, key, counters)``.
    Raises FileNotFoundError / ValueError on missing or mismatched
    checkpoints.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .species import ParticleState

    path = Path(directory) / FILENAME
    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}

    manifest = json.loads(bytes(arrays.pop("manifest").tobytes()).decode())
    if manifest["version"] != FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format v{manifest['version']} != v{FORMAT_VERSION}"
        )
    if sorted(sim.specs.keys()) != manifest["species"]:
        raise ValueError(
            f"checkpoint species {manifest['species']} do not match the "
            f"configured {sorted(sim.specs.keys())}"
        )
    if arrays["E"].shape[0] != sim.geom.n_ext:
        raise ValueError(
            f"checkpoint grid has {arrays['E'].shape[0]} cells; "
            f"configuration expects {sim.geom.n_ext}"
        )
    ckpt_ndev = manifest.get("n_devices")
    if ckpt_ndev is not None and ckpt_ndev != sim.geom.n_devices:
        raise ValueError(
            f"checkpoint was written on {ckpt_ndev} devices; particle "
            f"block layout cannot be resumed on {sim.geom.n_devices}"
        )

    def put_field(a, ndim1=False):
        spec = P("x") if ndim1 else P("x", None)
        return jax.device_put(
            jnp.asarray(a), NamedSharding(sim.mesh, spec)
        )

    E = put_field(arrays["E"])
    B = put_field(arrays["B"])
    J = put_field(arrays["J"])
    rho = put_field(arrays["rho"], ndim1=True)

    species = {}
    for name in manifest["species"]:
        fields = {
            f.name: arrays.get(f"{name}/{f.name}")
            for f in dataclasses.fields(ParticleState)
        }
        species[name] = sim.shard_particles(ParticleState(**fields))

    itype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    counters = {
        name: jnp.asarray(arrays[f"counter/{name}"], itype)
        for name in manifest["species"]
    }
    key = jax.random.wrap_key_data(jnp.asarray(arrays["key"]))
    return (
        manifest["step"], manifest["t"], E, B, J, rho, species, key, counters
    )
