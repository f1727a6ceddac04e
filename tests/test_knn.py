"""On-device kNN (ops/knn.py) vs scipy cKDTree ground truth."""

import numpy as np
import pytest

from triangle_splatting_tpu.ops import knn as K
from triangle_splatting_tpu.models.model_utils import (
    inter_point_distance_np, nearest_neighbor_np)


def ref_knn(points, k, group_size=None):
    n = points.shape[0]
    d = np.linalg.norm(points[:, None] - points[None, :], axis=-1) ** 2
    np.fill_diagonal(d, np.inf)
    if group_size is not None:
        g = np.arange(n) // group_size
        d[g[:, None] == g[None, :]] = np.inf
    idx = np.argsort(d, axis=1)[:, :k]
    return np.take_along_axis(d, idx, 1), idx


class TestKnn:
    @pytest.mark.parametrize("n,block", [(37, 8), (300, 64), (1000, 256)])
    def test_exact_vs_dense(self, n, block):
        rng = np.random.default_rng(n)
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        d2, idx = K.knn(pts, k=3, block=block)
        rd2, ridx = ref_knn(pts.astype(np.float64), 3)
        np.testing.assert_allclose(np.asarray(d2), rd2, rtol=1e-4, atol=1e-5)
        # indices can differ on exact ties only
        mismatch = np.asarray(idx) != ridx
        if mismatch.any():
            np.testing.assert_allclose(np.asarray(d2)[mismatch],
                                       rd2[mismatch], rtol=1e-4)

    def test_matches_host_kdtree(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(513, 3)).astype(np.float32)
        dev = np.asarray(K.inter_point_distance(pts, block=128))
        host = inter_point_distance_np(pts)
        np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)

    def test_valid_mask(self):
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(64, 3)).astype(np.float32)
        valid = np.arange(64) < 40
        d2, idx = K.knn(pts, valid, k=3, block=32)
        rd2, _ = ref_knn(pts[:40].astype(np.float64), 3)
        np.testing.assert_allclose(np.asarray(d2)[:40], rd2,
                                   rtol=1e-4, atol=1e-5)
        assert (np.asarray(idx)[:40] < 40).all()

    def test_nearest_neighbor_group_exclusion(self):
        rng = np.random.default_rng(2)
        pts = rng.normal(size=(90, 3)).astype(np.float32)   # 30 triangles
        dev = np.asarray(K.nearest_neighbor(pts, 3, block=32))
        host = nearest_neighbor_np(pts, 3)
        groups = np.arange(90) // 3
        assert (groups[dev] != groups).all()
        # same distance as host answer (index may differ on ties)
        d_dev = np.linalg.norm(pts - pts[dev], axis=-1)
        d_host = np.linalg.norm(pts - pts[host], axis=-1)
        np.testing.assert_allclose(d_dev, d_host, rtol=1e-4, atol=1e-5)

    def test_fewer_than_k_targets(self):
        pts = np.zeros((3, 3), np.float32)
        pts[1] = [1, 0, 0]
        d2, idx = K.knn(pts[:2], k=3, block=8)
        d2 = np.asarray(d2)
        assert np.isfinite(d2[:, 0]).all() and np.isinf(d2[:, 1:]).all()
        assert (np.asarray(idx)[:, 1:] == -1).all()
        msd = np.asarray(K.mean_sq_dist(pts[:2]))
        np.testing.assert_allclose(msd, [1 / 3, 1 / 3], rtol=1e-5)
