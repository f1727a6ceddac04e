"""On-device exact k-nearest-neighbor queries (TPU-native simple-knn).

Replaces the reference ``simple-knn`` CUDA submodule:

- ``distCUDA2(points)`` = mean squared distance to the 3 nearest neighbors
  (simple_knn.cu:150-186, used for triangle init sizes) -> ``mean_sq_dist``
- ``nearestNeighbor(points, bs)`` = index of the nearest point outside the
  query's own group of ``bs`` consecutive points (simple_knn.cu:188-238,
  used for vertex regularization) -> ``nearest_neighbor``

The CUDA version prunes with Morton-ordered boxes — data-dependent control
flow that maps poorly to XLA. The TPU-native design is an exact tiled
brute force on the MXU instead: squared distances decompose as
``|q|^2 + |p|^2 - 2 q.p^T`` so each (block x block) tile is one matmul,
and a double ``lax.scan`` (rows x columns) keeps the working set VMEM-sized
while a running sorted top-k per query merges tile minima. All shapes are
static; dead/padded points are masked with +inf. For N up to a few 10^5
(point-cloud init, triangle vertices) this is bandwidth-trivial for the
MXU and far faster than a host KDTree roundtrip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_MM = dict(preferred_element_type=jnp.float32,
           precision=lax.Precision.HIGHEST)
_INF = jnp.float32(jnp.inf)


def _pad_rows(x, mult, fill):
    pad = (-x.shape[0]) % mult
    if pad:
        filler = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
        x = jnp.concatenate([x, filler], axis=0)
    return x


def _merge_tile(best_d, best_i, d, pi, k):
    """Merge the k smallest entries of distance tile ``d`` (B, C) into the
    running sorted (B, k) lists. Unrolled k times: extract the tile min,
    insertion-sort it in, knock the column out."""
    col = lax.broadcasted_iota(jnp.int32, d.shape, 1)
    for _ in range(k):
        dmin = jnp.min(d, axis=1)
        amin = jnp.argmin(d, axis=1).astype(jnp.int32)
        imin = pi[amin]
        d_cat = jnp.concatenate([best_d, dmin[:, None]], axis=1)
        i_cat = jnp.concatenate([best_i, imin[:, None]], axis=1)
        order = jnp.argsort(d_cat, axis=1)[:, :k]
        best_d = jnp.take_along_axis(d_cat, order, axis=1)
        best_i = jnp.take_along_axis(i_cat, order, axis=1)
        d = jnp.where(col == amin[:, None], _INF, d)
    return best_d, best_i


@functools.partial(jax.jit, static_argnames=("k", "group_size", "block"))
def knn(points: jnp.ndarray, valid: jnp.ndarray | None = None, *,
        k: int = 3, group_size: int | None = None,
        block: int = 1024) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN among valid points.

    Args:
        points: (N, 3) float positions.
        valid: optional (N,) bool; invalid points are excluded as targets
            (their own results are garbage — mask downstream).
        k: neighbors per query (self always excluded).
        group_size: if set, exclude targets in the query's own group of
            ``group_size`` consecutive indices (simple_knn.cu:188-238).
        block: static tile edge; tiles are (block, block) in VMEM.

    Returns:
        (d2, idx): (N, k) squared distances (inf if fewer than k valid
        targets) and (N, k) int32 neighbor indices (-1 where inf).
    """
    n0 = points.shape[0]
    block = min(block, max(8, 1 << (n0 - 1).bit_length()))
    pts = _pad_rows(points.astype(jnp.float32), block, 0.0)
    n = pts.shape[0]
    if valid is None:
        val = jnp.arange(n) < n0
    else:
        val = _pad_rows(valid.astype(bool), block, False)
        val = val & (jnp.arange(n) < n0)
    nb = n // block

    pr = pts.reshape(nb, block, 3)
    vr = val.reshape(nb, block)
    ir = jnp.arange(n, dtype=jnp.int32).reshape(nb, block)
    sq = jnp.sum(pr * pr, axis=-1)                       # (nb, block)

    def row_step(_, row):
        q, qv, qi, qsq = row

        def col_step(carry, colb):
            bd, bi = carry
            p, pv, pi, psq = colb
            d = qsq[:, None] + psq[None, :] - 2.0 * jnp.dot(q, p.T, **_MM)
            d = jnp.maximum(d, 0.0)
            ok = pv[None, :] & (qi[:, None] != pi[None, :])
            if group_size is not None:
                ok &= ((qi[:, None] // group_size)
                       != (pi[None, :] // group_size))
            d = jnp.where(ok, d, _INF)
            return _merge_tile(bd, bi, d, pi, k), None

        init = (jnp.full((block, k), _INF),
                jnp.full((block, k), -1, jnp.int32))
        (bd, bi), _ = lax.scan(col_step, init, (pr, vr, ir, sq))
        return None, (bd, bi)

    _, (d2, idx) = lax.scan(row_step, None, (pr, vr, ir, sq))
    return (d2.reshape(n, k)[:n0], idx.reshape(n, k)[:n0])


def mean_sq_dist(points, valid=None, k: int = 3, block: int = 1024):
    """``distCUDA2`` equivalent: mean squared distance to the k nearest
    neighbors, clamped at 1e-7 (reference models/model_utils.py:34-36)."""
    d2, _ = knn(points, valid, k=k, block=block)
    d2 = jnp.where(jnp.isfinite(d2), d2, 0.0)
    return jnp.maximum(jnp.mean(d2, axis=1), 1e-7)


def inter_point_distance(points, valid=None, k: int = 3, block: int = 1024):
    """sqrt of ``mean_sq_dist`` (reference inter_point_distance)."""
    return jnp.sqrt(mean_sq_dist(points, valid, k=k, block=block))


def nearest_neighbor(points, group_size: int, valid=None,
                     block: int = 1024):
    """Index of each point's nearest neighbor outside its own group of
    ``group_size`` consecutive points (``simple_knn.nearestNeighbor``,
    trainer_utils.py:339-346). Returns int32 (N,); -1 when no valid target.
    """
    _, idx = knn(points, valid, k=1, group_size=group_size, block=block)
    return idx[:, 0]
