"""Checkpoint / resume.

The reference has **no** checkpointing: a run always restarts from
``t = start`` (``src/main.rs:185``; SURVEY §5).  This module adds the
minimal trivially-correct snapshot the survey recommends: every device
array of the simulation state (fields, all species SoAs, RNG key,
counters) plus the scalar clock, written as one ``.npz`` with a JSON
manifest.  Particle cell indices and block layouts are relative to the
device decomposition; resuming on a DIFFERENT device count or sharding
mode is supported — the manifest records the saved decomposition and
``load`` reshapes cell indices and re-partitions particle rows onto the
new one (``_reshard_species`` below).

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
         key, counters, n_devices: int | None = None,
         n_loc: int | None = None, replicated: bool = False) -> Path:
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
            "n_loc": None if n_loc is None else int(n_loc),
            "replicated": bool(replicated),
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
    new_ndev = sim.mesh.shape["x"]
    replicated = getattr(sim.options, "replicate_fields", False)
    ckpt_ndev = manifest.get("n_devices")
    ckpt_nloc = manifest.get("n_loc")
    was_replicated = bool(manifest.get("replicated", False))
    # a device-count change OR a sharding-mode flip (domain <->
    # replicated: the cell column switches between device-local and
    # global meaning) requires re-bucketing the particle rows
    reshard = (
        ckpt_ndev is not None and ckpt_ndev != new_ndev
    ) or was_replicated != replicated
    if reshard and (ckpt_nloc is None or ckpt_ndev is None):
        raise ValueError(
            "checkpoint lacks the recorded device layout "
            f"(n_devices={ckpt_ndev}, n_loc={ckpt_nloc}); cannot "
            f"reshard onto {new_ndev} devices "
            f"(replicated={replicated})"
        )

    def put_field(a, ndim1=False):
        if replicated:
            spec = P(None) if ndim1 else P(None, None)
        else:
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
        if reshard:
            fields = _reshard_species(
                fields, name, ckpt_ndev, new_ndev, ckpt_nloc,
                sim.geom.n_loc, sim.options,
                was_replicated, replicated,
            )
        species[name] = sim.shard_particles(ParticleState(**fields))

    # restore every saved counter (species losses + extras like
    # qed_deferred), and zero-fill counters the current configuration
    # expects but the (older) checkpoint lacks.  Counters are (2,)
    # int32 [hi, lo] base-2**30 pairs (sim.counter_add); legacy scalar
    # checkpoints are converted on load.
    counters = dict(sim.zero_counters())
    for k, a in arrays.items():
        if k.startswith("counter/"):
            name = k[len("counter/"):]
            a = np.asarray(a)
            if a.ndim == 0:
                v = int(a)
                a = np.array([v >> 30, v & ((1 << 30) - 1)], np.int32)
            counters[name] = jax.device_put(
                jnp.asarray(a, jnp.int32),
                NamedSharding(sim.mesh, P()),
            )
    key = jax.random.wrap_key_data(jnp.asarray(arrays["key"]))
    return (
        manifest["step"], manifest["t"], E, B, J, rho, species, key, counters
    )




def _reshard_species(fields, name, old_ndev, new_ndev, old_nloc, new_nloc,
                     options, was_replicated=False, now_replicated=False):
    """Re-chunk one species' per-device block layout onto a different
    device count and/or sharding mode, host-side (the resharding resume
    the reference never needed — it has no checkpoints at all,
    SURVEY §5).

    The cell column is device-local in domain mode and global in
    replicated mode, so rows are first lifted to their GLOBAL extended
    cell (g = old_dev * old_n_loc + cell, or just cell when the
    checkpoint was replicated) and then re-bucketed: by owning slab in
    domain mode, or into equal-count contiguous chunks (cells kept
    global) in replicated mode."""
    from .species import dead_default

    alive = np.asarray(fields["alive"])
    n_old = alive.shape[0]
    old_cap = n_old // max(old_ndev, 1)
    old_dev = np.arange(n_old) // max(old_cap, 1)
    cell = np.asarray(fields["cell"])
    is_photon = fields.get("tau_abs") is not None

    # global extended cell of every row
    g = cell if was_replicated else old_dev * old_nloc + cell
    alive_idx = np.flatnonzero(alive)
    if now_replicated:
        # equal-count contiguous chunks; cells stay global
        chunk = -(-alive_idx.size // new_ndev) if alive_idx.size else 0
        dev_of = (
            np.arange(alive_idx.size) // max(chunk, 1)
            if alive_idx.size else np.zeros(0, np.int64)
        )
        new_cell = g.astype(cell.dtype)
    else:
        dev_all = np.clip(g // new_nloc, 0, new_ndev - 1)
        new_cell = (g - dev_all * new_nloc).astype(cell.dtype)
        dev_of = dev_all[alive_idx]

    counts = np.bincount(dev_of, minlength=new_ndev)
    new_cap = int(counts.max()) if counts.size else 1
    new_cap = max(-(-new_cap * 5 // 4) // 128 * 128 + 128, 128)
    if options.fused_pusher and new_cap >= options.fused_block:
        blk = options.fused_block
        new_cap = -(-new_cap // blk) * blk

    order = np.argsort(dev_of, kind="stable")
    rows = alive_idx[order]
    slot = np.empty(rows.size, np.int64)
    start = 0
    for d in range(new_ndev):
        cnt = counts[d] if d < counts.size else 0
        slot[start : start + cnt] = np.arange(cnt)
        start += cnt
    dest = np.sort(dev_of, kind="stable") * new_cap + slot

    out = {}
    for fname, a in fields.items():
        if a is None:
            out[fname] = None
            continue
        a = np.asarray(a)
        new = np.full(
            (new_ndev * new_cap,) + a.shape[1:],
            dead_default(fname, is_photon), a.dtype,
        )
        src = new_cell if fname == "cell" else a
        new[dest] = src[rows]
        if fname == "alive":
            new = new.astype(bool)
            new[...] = False
            new[dest] = True
        out[fname] = new
    return out
