"""Pure-numpy property tests for the IVF coarse quantizer (no Spark).

The quantizer underpins the IVF ANN index's determinism contract:
identical corpora must train identical centroids on any machine/run, and
every centroid must stay unit-norm (assignment-by-max-dot == max cosine
only holds for unit centroids).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from quicker_spark.operators.simsearch import ivf_nlist_for, train_ivf_centroids


def _sample(n: int, dim: int, seed_like: int) -> np.ndarray:
    """Deterministic pseudo-random matrix (no RNG state)."""
    i = np.arange(n * dim, dtype=np.float64).reshape(n, dim)
    return np.sin(i * 0.7 + seed_like) + 0.1


@settings(max_examples=25, deadline=None)
@given(n=st.integers(2, 200), dim=st.integers(2, 32),
       nlist=st.integers(1, 32), seed=st.integers(0, 10))
def test_centroids_unit_norm_and_clamped(n, dim, nlist, seed):
    C = train_ivf_centroids(_sample(n, dim, seed), nlist, iters=4)
    assert len(C) == min(nlist, n)
    norms = np.sqrt((C * C).sum(axis=1))
    assert np.allclose(norms, 1.0, atol=1e-9)
    assert np.isfinite(C).all()


@settings(max_examples=10, deadline=None)
@given(n=st.integers(4, 100), dim=st.integers(2, 16), seed=st.integers(0, 5))
def test_centroids_deterministic(n, dim, seed):
    V = _sample(n, dim, seed)
    C1 = train_ivf_centroids(V, 4)
    C2 = train_ivf_centroids(V.copy(), 4)
    assert np.array_equal(C1, C2)


def test_zero_rows_dropped_empty_raises():
    V = np.zeros((5, 8))
    with pytest.raises(ValueError):
        train_ivf_centroids(V, 2)
    V[0, 0] = 1.0  # one non-zero row survives
    C = train_ivf_centroids(V, 3)
    assert len(C) == 1


def test_nlist_sizing_law():
    assert ivf_nlist_for(100) == 4              # <= target -> lo
    assert ivf_nlist_for(1024 * 100) == 100     # ~n/target
    assert ivf_nlist_for(10**12) == 4096        # hi clamp
    # monotone non-decreasing in corpus size
    sizes = [ivf_nlist_for(n) for n in (10**3, 10**5, 10**7, 10**9)]
    assert sizes == sorted(sizes)
