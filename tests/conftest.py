"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that the
multi-chip ``shard_map`` code paths (halo exchange, particle migration,
collective reductions) are exercised without TPU hardware — mirroring
how the reference's single-rank CI still runs the full MPI exchange
code path (reference: ``src/grid/yee.rs:365-381``).

Float64 is enabled globally: the physics parity targets (energy
conservation to 1e-6, QED rates to 1e-3) are defined in f64.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import pytest

# The axon TPU plugin pre-configures jax_platforms="axon,cpu"; tests must
# run on the virtual-device CPU backend regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: test shapes are deterministic, and on
# this single-core image the suite's wall time is dominated by XLA
# compiles — a warm cache cuts repeat unit-tier runs (the /verify path)
# by several-fold.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache-tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


def pytest_collection_modifyitems(items):
    """Every test not explicitly in the ``physics`` tier is ``unit``,
    so ``-m unit`` selects the fast tier without per-test annotations."""
    for item in items:
        if item.get_closest_marker("physics") is None:
            item.add_marker(pytest.mark.unit)
