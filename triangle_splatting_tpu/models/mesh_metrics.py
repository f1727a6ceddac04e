"""Geometric mesh-quality metrics: chamfer distance + F-score.

The reference's headline claim is MESH quality (triangle-splatting README:
"state-of-the-art mesh reconstruction"), judged in its paper by geometry
metrics (chamfer / F-score against the ground-truth surface) — but the
reference repo itself never computes them in-tree (its eval stops at
PSNR/SSIM of re-rendered images, trainers/trainer_utils.py:327-360). This
framework's synthetic pipeline HAS the ground-truth triangle soup by
construction, so the solidify endpoint can be scored geometrically:
``tools/full_run.py --mesh`` samples the exported GLB and the GT soup and
prints both metrics.

TPU-native implementation: area-weighted surface sampling (host numpy,
init-time cost) + the repo's own exact MXU-tiled brute-force kNN
(``ops/knn.py``, the simple-knn replacement) for the two nearest-neighbor
sweeps — sets A and B are concatenated with ``group_size`` masking so one
kNN call yields both directions.
"""

from __future__ import annotations

import numpy as np


def sample_triangle_soup(vertex: np.ndarray, n_samples: int,
                         seed: int = 0) -> np.ndarray:
    """Area-weighted uniform surface samples of a triangle soup.

    Args:
        vertex: (N, 3, 3) float triangle vertices.
        n_samples: number of surface points to draw.
    Returns:
        (n_samples, 3) float32 points.
    """
    v = np.asarray(vertex, np.float64)
    if v.shape[0] == 0:
        raise ValueError("cannot sample an empty triangle soup")
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    total = area.sum()
    if total <= 0:
        # fully degenerate soup — fall back to vertex centroids
        probs = np.full(v.shape[0], 1.0 / v.shape[0])
    else:
        probs = area / total
    rng = np.random.default_rng(seed)
    tri = rng.choice(v.shape[0], size=n_samples, p=probs)
    # uniform barycentric via the sqrt trick
    r1 = np.sqrt(rng.random(n_samples))
    r2 = rng.random(n_samples)
    w0 = 1.0 - r1
    w1 = r1 * (1.0 - r2)
    w2 = r1 * r2
    pts = (w0[:, None] * v[tri, 0] + w1[:, None] * v[tri, 1]
           + w2[:, None] * v[tri, 2])
    return pts.astype(np.float32)


def nn_dists_cross(pts_a: np.ndarray, pts_b: np.ndarray,
                   block: int = 1024) -> tuple[np.ndarray, np.ndarray]:
    """Euclidean nearest-neighbor distances A->B and B->A.

    One ``ops.knn.knn`` call over the concatenation with ``group_size``
    masking (requires |A| == |B|, which the samplers guarantee): each
    query's own set is excluded, so its 1-NN lands in the other set.
    """
    import jax.numpy as jnp
    from ..ops.knn import knn

    n = pts_a.shape[0]
    if pts_b.shape[0] != n:
        raise ValueError(f"need equal sample counts, got {n} vs "
                         f"{pts_b.shape[0]}")
    both = jnp.concatenate([jnp.asarray(pts_a, jnp.float32),
                            jnp.asarray(pts_b, jnp.float32)], axis=0)
    d2, _ = knn(both, k=1, group_size=n, block=block)
    d = np.sqrt(np.maximum(np.asarray(d2[:, 0]), 0.0))
    return d[:n], d[n:]


def chamfer_and_fscore(pts_a: np.ndarray, pts_b: np.ndarray,
                       tau: float = 0.05, block: int = 1024) -> dict:
    """Chamfer distance + F-score between two sampled point sets.

    Conventions (the ones the mesh-reconstruction literature the reference
    cites reports): ``chamfer = mean_a min_b ||a-b|| + mean_b min_a ||a-b||``
    (sum of the two directed means, euclidean); ``precision`` = fraction of
    A-points within ``tau`` of B, ``recall`` = fraction of B-points within
    ``tau`` of A, ``fscore`` = their harmonic mean.
    """
    d_ab, d_ba = nn_dists_cross(pts_a, pts_b, block=block)
    precision = float((d_ab <= tau).mean())
    recall = float((d_ba <= tau).mean())
    f = (2.0 * precision * recall / (precision + recall)
         if precision + recall > 0 else 0.0)
    return {
        "chamfer": float(d_ab.mean() + d_ba.mean()),
        "chamfer_a2b": float(d_ab.mean()),
        "chamfer_b2a": float(d_ba.mean()),
        "precision": precision,
        "recall": recall,
        "fscore": f,
        "tau": float(tau),
    }


def mesh_geometry_scores(vertex_pred: np.ndarray, vertex_gt: np.ndarray,
                         n_samples: int = 100_000, tau: float = 0.05,
                         seed: int = 0, block: int = 1024) -> dict:
    """Score a predicted triangle soup against the GT soup geometrically."""
    pa = sample_triangle_soup(vertex_pred, n_samples, seed=seed)
    pb = sample_triangle_soup(vertex_gt, n_samples, seed=seed + 1)
    return chamfer_and_fscore(pa, pb, tau=tau, block=block)
