"""Domain-decomposition design tests (reference: grid/mod.rs:126-206)."""

import numpy as np

from opal_tpu.grid import GridGeometry, balanced_counts, load_imbalance


def test_balanced_counts_uniform_density():
    counts = balanced_counts(1000, 0.0, 1.0, 4, lambda x: np.ones_like(x))
    assert counts.sum() == 1000
    assert (counts >= 8).all()
    # uniform density: all tasks within a few cells of the even split
    assert np.abs(counts[:-1] - 250).max() <= 10


def test_balanced_counts_peaked_density():
    # density concentrated in [400, 600): tasks covering the peak get
    # fewer cells, the wings get more
    def ne(x):
        return np.where((x >= 400) & (x < 600), 10.0, 0.1)

    counts = balanced_counts(1000, 0.0, 1.0, 4, ne)
    assert counts.sum() == 1000
    assert (counts >= 8).all()
    edges = np.concatenate([[0], np.cumsum(counts)])
    # every task's share of the integral is near 1/4
    x = np.arange(1000, dtype=np.float64)
    w = ne(x)
    shares = [w[edges[i]:edges[i + 1]].sum() for i in range(4)]
    total = w.sum()
    for s in shares:
        assert 0.15 * total < s < 0.40 * total


def test_balanced_counts_min_subsize():
    # all density in the first cells: later tasks still get >= 8 cells
    def ne(x):
        return np.where(x < 50, 1.0, 0.0)

    counts = balanced_counts(1000, 0.0, 1.0, 8, ne)
    assert counts.sum() == 1000
    assert (counts >= 8).all()


def test_load_imbalance_uniform():
    geom = GridGeometry(nx=1024, dx=1.0, xmin=0.0, n_devices=8)
    r = load_imbalance(geom, lambda x: np.ones_like(x))
    assert abs(r - 1.0) < 1e-12


def test_load_imbalance_peaked():
    geom = GridGeometry(nx=1024, dx=1.0, xmin=0.0, n_devices=8)
    r = load_imbalance(
        geom, lambda x: np.where(x < 128, 1.0, 0.0)
    )
    assert abs(r - 8.0) < 1e-12
