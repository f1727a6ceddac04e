"""Geometric mesh metrics (models/mesh_metrics.py): chamfer + F-score."""

import numpy as np
import pytest

from triangle_splatting_tpu.models.mesh_metrics import (
    chamfer_and_fscore, mesh_geometry_scores, sample_triangle_soup)


def _square(z=0.0, shift=(0.0, 0.0), size=1.0):
    """Unit square in the z-plane as two triangles, (2, 3, 3)."""
    sx, sy = shift
    a = np.array([0, 0, z]); b = np.array([size, 0, z])
    c = np.array([size, size, z]); d = np.array([0, size, z])
    tri = np.stack([np.stack([a, b, c]), np.stack([a, c, d])]).astype(np.float32)
    tri[..., 0] += sx
    tri[..., 1] += sy
    return tri


class TestSampling:
    def test_samples_lie_on_surface(self):
        tri = _square(z=0.25)
        pts = sample_triangle_soup(tri, 500, seed=1)
        assert pts.shape == (500, 3)
        np.testing.assert_allclose(pts[:, 2], 0.25, atol=1e-6)
        assert (pts[:, 0] >= -1e-6).all() and (pts[:, 0] <= 1 + 1e-6).all()
        assert (pts[:, 1] >= -1e-6).all() and (pts[:, 1] <= 1 + 1e-6).all()

    def test_area_weighting(self):
        """A triangle with 4x the area must draw ~4x the samples."""
        small = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
        big = small * 2.0 + 10.0           # area x4, displaced
        soup = np.concatenate([small, big])
        pts = sample_triangle_soup(soup, 4000, seed=0)
        frac_big = (pts[:, 0] > 5).mean()
        assert 0.72 < frac_big < 0.88, frac_big

    def test_empty_soup_raises(self):
        with pytest.raises(ValueError):
            sample_triangle_soup(np.zeros((0, 3, 3)), 10)


class TestChamferFscore:
    def test_identical_mesh(self):
        tri = _square()
        scores = mesh_geometry_scores(tri, tri, n_samples=2000, tau=0.05)
        # different sample draws of the same surface: chamfer ~ the mean
        # nearest-sample spacing (~ sqrt(area/n) ~ 0.02), F-score ~ 1
        assert scores["chamfer"] < 0.08, scores
        assert scores["fscore"] > 0.97, scores

    def test_translated_plane_distance(self):
        """Two parallel unit squares 0.3 apart: each directed chamfer is
        ~0.3 (nearest point on the other plane is the normal projection)."""
        a = sample_triangle_soup(_square(z=0.0), 1500, seed=0)
        b = sample_triangle_soup(_square(z=0.3), 1500, seed=1)
        scores = chamfer_and_fscore(a, b, tau=0.1)
        assert abs(scores["chamfer_a2b"] - 0.3) < 0.02, scores
        assert abs(scores["chamfer_b2a"] - 0.3) < 0.02, scores
        assert scores["fscore"] == 0.0        # nothing within tau=0.1
        scores_loose = chamfer_and_fscore(a, b, tau=0.35)
        assert scores_loose["fscore"] > 0.99

    def test_partial_overlap_precision_recall(self):
        """Prediction covers half the GT: recall ~ precision-of-half."""
        gt = np.concatenate([_square(shift=(0, 0)), _square(shift=(2, 0))])
        pred = _square(shift=(0, 0))
        scores = mesh_geometry_scores(pred, gt, n_samples=2000, tau=0.05)
        assert scores["precision"] > 0.95, scores        # pred is all on GT
        assert 0.4 < scores["recall"] < 0.6, scores      # half of GT covered
        assert scores["chamfer_b2a"] > 0.3               # far square's cost

    def test_unequal_sample_counts_rejected(self):
        from triangle_splatting_tpu.models.mesh_metrics import nn_dists_cross
        with pytest.raises(ValueError, match="equal"):
            nn_dists_cross(np.zeros((10, 3), np.float32),
                           np.zeros((11, 3), np.float32))
