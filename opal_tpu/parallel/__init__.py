"""Multi-chip domain decomposition: mesh setup, ppermute halo exchange,
and particle migration over the ICI ring."""
