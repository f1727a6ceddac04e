"""Tile binning: triangle -> (tile, depth)-sorted pair lists, pure XLA.

TPU-native replacement for the CUDA binning phase
(``diff-triangle-rasterization-2D/src/rasterizer.cu:37-99``):

  CUDA                                  here
  ----------------------------------    ----------------------------------
  cub InclusiveSum(tiles_touched)       jnp.cumsum
  D2H copy of num_rendered (sync!)      fixed budget ``max_pairs`` + overflow
  duplicateWithKeys kernel              scatter-max marker + cummax expansion
  cub radix sort (tile<<32|depth)       jax.lax.sort on ONE fused int32 key
  identifyTileRanges kernel             searchsorted over sorted keys

Performance notes (v5e measurements): TPU gathers/scatters/sorts cost
~5-10 ms per MA-sized op, so the design minimizes the number of MA-sized
index ops: one table gather (per-triangle rect/depth data packed into one
matrix), one single-key sort with a single payload (validity is encoded in
the key), one relayout scatter whose per-pair shift is computed with scans
instead of table gathers.

The sort key packs ``tile_id`` above a *quantized* depth:
``key = tile << depth_bits | quantize(depth)``. Ties within a quantization
bucket keep pair-generation (triangle-index) order — deterministic; the
oracle quantizes identically so parity is exact.

The variable ``num_rendered`` of the reference is hostile to XLA (dynamic
shapes + device->host sync, src/rasterizer.cu:186-192), so pairs live in a
fixed-capacity buffer: pairs beyond the budget are dropped and reported via
``overflow``. Gradients do not flow through binning.
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

    Per-tile ranges are ``align``-aligned: tile t owns slots
    [tile_starts[t], tile_starts[t] + tile_counts[t]); the next tile starts
    at the next multiple of ``align`` (lane-aligned DMA slabs in the blend
    kernel). Padding slots have ``pair_tri == -1``.
    """
    pair_tri: jax.Array       # (ma,) int32 — triangle id per slot, -1 if empty
    pair_valid: jax.Array     # (ma,) bool
    tri_offsets: jax.Array    # (P + 1,) int32 — exclusive cumsum of
    #                           tiles_touched. The pack backward sorts the
    #                           pair-gradient columns by owning triangle;
    #                           triangle t's pairs then occupy exactly
    #                           [tri_offsets[t], tri_offsets[t+1]) (any
    #                           within-triangle order — the segment sum
    #                           doesn't care). Exact even under overflow:
    #                           the budget clip drops a SUFFIX of the raw
    #                           stream, which min(tri_offsets, num_pairs)
    #                           encodes exactly (verified on-chip vs the
    #                           scatter-add transpose, tools/pack_bwd_parity.py).
    tile_starts: jax.Array    # (num_tiles + 1,) int32, align-multiples
    tile_counts: jax.Array    # (num_tiles,) int32 — real pairs per tile
    num_pairs: jax.Array      # () int32 — pairs actually binned (<= max_pairs)
    overflow: jax.Array       # () bool — pair budget exceeded (pairs dropped)
    pack_perm: jax.Array | None = None
    #                           (ma,) int32 or None — OWNER-ORDER gather map
    #                           for the pack backward: pack_perm[j] is the
    #                           aligned slot holding raw pair j (triangle-
    #                           major: exactly the [tri_offsets[t],
    #                           tri_offsets[t+1]) layout the segment
    #                           reduction needs), entries >= num_pairs point
    #                           at empty slots. Computed in the FORWARD
    #                           phase (the permutation is a pure function of
    #                           binning, independent of cotangents) so the
    #                           backward applies one row GATHER instead of
    #                           re-deriving the order with a (1 + live_rows)-
    #                           payload sort of the cotangents. Requested
    #                           via ``compute_pack_perm``.


def cummax(x: jnp.ndarray) -> jnp.ndarray:
    # lax.cummax (the primitive), NOT lax.associative_scan(jnp.maximum):
    # the generic associative_scan unrolls log(n) concat/slice layers whose
    # XLA compile time grows superlinearly in n — measured compile-ONLY at
    # the r5 scale rehearsal: 234 s at 2M elements (and effectively hung at
    # 16M), vs seconds for the primitive at any size. This was the entire
    # "pair-buffer compile cliff" (PERF.md r5 scale section); runtime is
    # equivalent at bench scale.
    return jax.lax.cummax(x, axis=0)


def aligned_capacity(max_pairs: int, num_tiles: int, align: int) -> int:
    """Size of the aligned pair buffer for a given raw-pair budget.

    Per-tile alignment wastes up to ``align - 1`` slots per tile
    (``num_tiles * align`` bound), and the blend kernels stream SLAB-sized
    compute slabs (a multiple of ``align``, pallas/blend.py) from
    ``align``-aligned tile starts, so the last tile's final slab may
    read/write up to ``SLAB - align`` slots past its aligned end — the tail
    pad is derived from the actual SLAB/ALIGN ratio so raising SLAB cannot
    silently under-allocate.
    """
    from .pallas.blend import ALIGN as BLEND_ALIGN, SLAB as BLEND_SLAB
    overrun = BLEND_SLAB - align if align == BLEND_ALIGN else BLEND_SLAB
    return max_pairs + align * num_tiles + max(overrun, align)


def depth_bits_for(num_tiles: int) -> int:
    """Depth-quantization bits so (tile+1, depth) packs into int32."""
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    return min(24, 30 - tile_bits)


def quantize_depth(depth: jnp.ndarray, valid: jnp.ndarray, bits: int):
    """Rank-preserving quantization of view depths to ``bits`` bits."""
    lo = jnp.min(jnp.where(valid, depth, jnp.inf))
    hi = jnp.max(jnp.where(valid, depth, -jnp.inf))
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    hi = jnp.where(hi > lo, hi, lo + 1.0)
    maxq = (1 << bits) - 1
    q = (depth - lo) / (hi - lo) * maxq
    return jnp.clip(q, 0, maxq).astype(jnp.int32)


def bin_triangles(prep: Preprocessed, settings: RasterSettings,
                  max_pairs: int, align: int = 128,
                  interpret: bool = False,
                  compute_pack_perm: bool = False) -> Binning:
    """Expand triangles into depth-sorted per-tile pair lists."""
    P = prep.depth.shape[0]
    grid_w = settings.grid_w
    num_tiles = settings.num_tiles
    dbits = depth_bits_for(num_tiles)

    counts = prep.tiles_touched.astype(jnp.int32)            # (P,)
    offsets = jnp.cumsum(counts) - counts                    # exclusive
    total = offsets[-1] + counts[-1] if P > 0 else jnp.int32(0)
    num_pairs = jnp.minimum(total, max_pairs)
    # total < 0: the int32 cumsum wrapped (> 2^31 demanded pairs, a
    # degenerate scene) — that IS an overflow; without the check the flag
    # stays False and the frame silently renders empty.
    overflow = (total > max_pairs) | (total < 0)

    # Per-triangle key constants. The pair key decomposes affinely in the
    # two per-pair unknowns (within, q):
    #   key = ((rminy + q) * grid_w + rminx + within - q * rw) << dbits
    #         | depth_q
    #       = K0 + (within << dbits) + q * A
    #   K0  = (rminy * grid_w + rminx) << dbits | depth_q
    #   A   = (grid_w - rw) << dbits
    # (exact: depth_q < 2^dbits so the | is +, all terms are nonnegative
    # and partial sums are bounded by the final key < 2^31 by
    # depth_bits_for). The four columns ride ONE (MP,4) row gather — 1-D
    # per-column gathers measured +8 ms end to end (r3, matching the r2
    # "two 1-D gathers price ~2x one row gather" negative result) — and
    # are extracted through an explicit transpose behind an
    # optimization_barrier: slicing the gather output directly makes XLA
    # emit 1-D T(1024)-layout column fusions priced at ~1.4 ms @400k pairs
    # (profile r3, binning.py:146).
    depth_q = quantize_depth(prep.depth, prep.valid, dbits)
    rw_t = jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1)
    base = prep.rect_min[:, 1] * grid_w + prep.rect_min[:, 0]
    K0_t = (base << dbits) | depth_q
    A_t = (grid_w - rw_t) << dbits

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

    # The per-pair arithmetic below runs on (MP/128, 128) 2-D views: XLA
    # lays out large 1-D int arrays at 1-sublane vreg occupancy, making the
    # elementwise chain ~8x slower than the same ops on a 2-D shape
    # (measured 1.36 ms for this fusion @400k pairs in 1-D).
    def c2(x):
        # rasterize.py rounds max_pairs up to SLAB (128); keep a 1-D
        # fallback for direct callers with odd budgets.
        return x.reshape(-1, 128) if max_pairs % 128 == 0 else x

    tbl = jnp.stack([offsets, rw_t, K0_t, A_t], axis=1)      # (P, 4) int32
    row = tbl[tri_safe]                                      # ONE gather (MP,4)
    rowT = jax.lax.optimization_barrier(row.T)               # (4, MP)

    within = c2(pair_idx) - c2(rowT[0])
    rw = c2(rowT[1])
    # within // rw as f32 math: int32 divide is a ~30-op software sequence
    # on the VPU; ``within`` < num_tiles (a rect is clipped to the grid)
    # and rw >= 1, so (within + 0.5) / rw sits >= 0.5/rw away from every
    # integer while the f32 rounding error is ~within * 2^-23 — floor is
    # exact whenever num_tiles * grid_w < 2^22 (any realistic image;
    # guarded statically).
    if num_tiles * max(grid_w, settings.grid_h) < (1 << 22):
        q = jnp.floor((within.astype(jnp.float32) + 0.5)
                      / rw.astype(jnp.float32)).astype(jnp.int32)
    else:
        q = within // rw

    # ONE fused int32 key; validity is encoded (sentinel tile sorts last).
    # Tail slots compute garbage (int32 wraparound is fine) — discarded by
    # the select, exactly like the old tile_x/tile_y form.
    key = c2(rowT[2]) + (within << dbits) + q * c2(rowT[3])
    key = jnp.where(c2(valid), key, num_tiles << dbits).reshape(-1)
    if compute_pack_perm:
        # Carry the RAW pair index through the sort (payloads beyond the
        # first are ~0.13 ms each @480k — PERF.md cost model) so the
        # owner-order permutation can be recovered below: the raw stream IS
        # triangle-major (triangle t generated pairs [offsets[t],
        # offsets[t] + counts[t]) before sorting).
        sorted_key, sorted_tri, sorted_raw = jax.lax.sort(
            (key, tri_safe, pair_idx), num_keys=1, is_stable=True)
    else:
        sorted_key, sorted_tri = jax.lax.sort((key, tri_safe), num_keys=1,
                                              is_stable=True)

    # Per-tile ranges via binary search on the sorted keys.
    boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32) << dbits
    raw_starts = jnp.searchsorted(sorted_key, boundaries, side="left").astype(jnp.int32)
    tile_counts = raw_starts[1:] - raw_starts[:-1]           # (num_tiles,)

    # Re-lay pairs so every tile's range starts on an ``align`` boundary —
    # a monotone per-tile-shift stream, done by the windowed Pallas kernel
    # (the XLA scatter equivalent measured 2.34 ms @480k pairs; see
    # pallas/streams.py and PERF.md).
    from .pallas.streams import relayout_pairs
    ma = aligned_capacity(max_pairs, num_tiles, align)
    padded = ((tile_counts + align - 1) // align) * align
    astarts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(padded).astype(jnp.int32)])
    pair_tri = relayout_pairs(sorted_tri, raw_starts, astarts, tile_counts,
                              ma, interpret=interpret)

    pack_perm = None
    if compute_pack_perm:
        # Aligned slot -> raw pair index (a second relayout stream, ~0.06 ms
        # measured for the kernel), then invert with ONE 2-operand sort:
        # position j of the sorted pair gets the aligned slot of raw pair j.
        # Sentinel-keyed empty slots sort to the tail (>= num_pairs), where
        # the segment bounds never reach and the reduction's nvalid select
        # zeroes the gathered garbage.
        pair_raw = relayout_pairs(sorted_raw, raw_starts, astarts,
                                  tile_counts, ma, interpret=interpret)
        inv_key = jnp.where(pair_raw >= 0, pair_raw, jnp.int32(2 ** 30))
        _, pack_perm = jax.lax.sort(
            (inv_key, jnp.arange(ma, dtype=jnp.int32)), num_keys=1,
            is_stable=True)

    # reuse `total` so the int32-wrap overflow reasoning above stays the
    # single place this sum is defined
    tri_offsets = jnp.concatenate([offsets, jnp.reshape(total, (1,))])
    return Binning(pair_tri=pair_tri, pair_valid=pair_tri >= 0,
                   tri_offsets=tri_offsets,
                   tile_starts=astarts, tile_counts=tile_counts,
                   num_pairs=num_pairs.astype(jnp.int32), overflow=overflow,
                   pack_perm=pack_perm)
