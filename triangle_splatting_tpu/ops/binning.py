"""Tile binning: triangle -> (tile, depth)-sorted pair lists, pure XLA.

TPU-native replacement for the CUDA binning phase
(``diff-triangle-rasterization-2D/src/rasterizer.cu:37-99``):

  CUDA                                  here
  ----------------------------------    ----------------------------------
  cub InclusiveSum(tiles_touched)       jnp.cumsum
  D2H copy of num_rendered (sync!)      fixed budget ``max_pairs`` + overflow
  duplicateWithKeys kernel              scatter-max marker + cummax expansion
  cub radix sort (tile<<32|depth)       jax.lax.sort((tile, depth), stable)
  identifyTileRanges kernel             searchsorted over sorted tile ids

The variable ``num_rendered`` of the reference is hostile to XLA (dynamic
shapes + device->host sync, src/rasterizer.cu:186-192), so pairs live in a
fixed-capacity buffer: pairs beyond the budget are dropped and reported via
``overflow`` (callers size the budget from ``pairs_per_triangle`` and watch
the flag). Everything here is index bookkeeping — gradients do not flow
through it (the blend custom-VJP differentiates w.r.t. gathered pair data).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .projection import Preprocessed, RasterSettings


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Binning:
    """Sorted pair lists + per-tile ranges (all shapes static).

    The per-tile ranges are ``align``-aligned: tile t owns slots
    [tile_starts[t], tile_starts[t] + tile_counts[t]) and the next tile
    starts at the next multiple of ``align``. Alignment lets the blend
    kernel DMA lane-aligned (16, align) slabs out of the field-major pair
    buffer (Mosaic requires 128-lane-aligned slices). Padding slots have
    ``pair_valid == False``.
    """
    pair_tri: jax.Array       # (ma,) int32 — triangle id per sorted pair slot
    pair_valid: jax.Array     # (ma,) bool
    tile_starts: jax.Array    # (num_tiles + 1,) int32, align-multiples
    tile_counts: jax.Array    # (num_tiles,) int32 — real pairs per tile
    num_pairs: jax.Array      # () int32 — pairs actually binned (<= max_pairs)
    overflow: jax.Array       # () bool — pair budget exceeded (pairs dropped)


def cummax(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.associative_scan(jnp.maximum, x)


def aligned_capacity(max_pairs: int, num_tiles: int, align: int) -> int:
    """Size of the aligned pair buffer for a given raw-pair budget."""
    return max_pairs + align * num_tiles


def bin_triangles(prep: Preprocessed, settings: RasterSettings,
                  max_pairs: int, align: int = 128) -> Binning:
    """Expand triangles into depth-sorted per-tile pair lists."""
    P = prep.depth.shape[0]
    grid_w = settings.grid_w
    num_tiles = settings.num_tiles

    counts = prep.tiles_touched.astype(jnp.int32)            # (P,)
    offsets = jnp.cumsum(counts) - counts                    # exclusive
    total = offsets[-1] + counts[-1] if P > 0 else jnp.int32(0)
    num_pairs = jnp.minimum(total, max_pairs)
    overflow = total > max_pairs

    # Expand: marker scatter-max of (tri+1) at each triangle's first pair
    # slot, then cummax-1 gives the owning triangle of every pair slot.
    has_pairs = counts > 0
    scatter_idx = jnp.where(has_pairs, offsets, max_pairs)   # dropped if ==max
    markers = jnp.zeros((max_pairs,), jnp.int32).at[scatter_idx].max(
        jnp.where(has_pairs, jnp.arange(P, dtype=jnp.int32) + 1, 0),
        mode="drop")
    tri = cummax(markers) - 1                                # (max_pairs,)
    pair_idx = jnp.arange(max_pairs, dtype=jnp.int32)
    valid = (pair_idx < num_pairs) & (tri >= 0)
    tri_safe = jnp.clip(tri, 0, P - 1)

    # Tile coordinate of each pair: row-major walk of the triangle's rect.
    within = pair_idx - offsets[tri_safe]
    rmin = prep.rect_min[tri_safe]                           # (max_pairs, 2)
    rw = jnp.maximum(prep.rect_max[tri_safe, 0] - rmin[:, 0], 1)
    tile_x = rmin[:, 0] + within % rw
    tile_y = rmin[:, 1] + within // rw
    tile_id = jnp.where(valid, tile_y * grid_w + tile_x, num_tiles)

    # Sort by (tile, view depth); stable => ties keep pair generation order
    # (triangle index order), matching the reference's stable radix sort over
    # tile<<32|float_bits(depth) keys (src/rasterizer.cu:59-74).
    depth = jnp.where(valid, prep.depth[tri_safe], jnp.inf)
    sorted_tile, _, sorted_tri, sorted_valid = jax.lax.sort(
        (tile_id.astype(jnp.int32), depth, tri_safe, valid),
        dimension=0, num_keys=2, is_stable=True)

    # Per-tile ranges via binary search on the sorted tile ids.
    boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    raw_starts = jnp.searchsorted(sorted_tile, boundaries, side="left").astype(jnp.int32)
    tile_counts = raw_starts[1:] - raw_starts[:-1]               # (num_tiles,)

    # Re-lay pairs so every tile's range starts on an ``align`` boundary.
    ma = aligned_capacity(max_pairs, num_tiles, align)
    padded = ((tile_counts + align - 1) // align) * align
    astarts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(padded).astype(jnp.int32)])
    t_clip = jnp.clip(sorted_tile, 0, num_tiles - 1)
    shift = astarts[t_clip] - raw_starts[t_clip]
    new_pos = jnp.where(sorted_valid,
                        jnp.arange(max_pairs, dtype=jnp.int32) + shift, ma)
    pair_tri = jnp.zeros((ma,), jnp.int32).at[new_pos].set(sorted_tri, mode="drop")
    pair_valid = jnp.zeros((ma,), bool).at[new_pos].set(sorted_valid, mode="drop")

    return Binning(pair_tri=pair_tri, pair_valid=pair_valid,
                   tile_starts=astarts, tile_counts=tile_counts,
                   num_pairs=num_pairs.astype(jnp.int32), overflow=overflow)
