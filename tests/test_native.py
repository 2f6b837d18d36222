"""Native C++ components vs reference oracles."""

import numpy as np
import pytest


def test_native_knn_matches_scipy():
    from scipy.spatial import cKDTree

    from gsjax.native import knn_mean_sq_dist

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(5000, 3)).astype(np.float32)
    got = knn_mean_sq_dist(pts, 3)
    d, _ = cKDTree(pts).query(pts, k=4, workers=-1)
    want = (d[:, 1:] ** 2).mean(axis=1).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_native_knn_small_inputs():
    from gsjax.native import knn_mean_sq_dist

    assert knn_mean_sq_dist(np.zeros((1, 3), np.float32)).tolist() == [0.0]
    out = knn_mean_sq_dist(
        np.array([[0, 0, 0], [1, 0, 0]], np.float32), k=3
    )
    np.testing.assert_allclose(out, [1.0, 1.0])
