"""opal_tpu: a TPU-native 1d3v particle-in-cell framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``opal`` strong-field-QED PIC code: relativistic particle pushes,
1D Yee/FDTD field solve, charge-conserving current deposition, quantum
synchrotron photon emission/absorption, and multi-chip domain
decomposition over a ``jax.sharding.Mesh`` with ``ppermute`` halo
exchange — all shape-stable and fused into a single scanned step.
"""

__version__ = "0.1.0"


def enable_x64() -> None:
    """Enable float64 globally.  The default precision for physics runs;
    call before any JAX computation."""
    import jax

    jax.config.update("jax_enable_x64", True)
