"""Pallas streaming data-movement kernels for the pair pipeline.

XLA's TPU gather/scatter lowerings price per ROW at ~1-2% of HBM bandwidth
(PERF.md cost model: 6.6 ms for a 400k-row scatter-add that moves 30 MB),
so the binning/pack data movement around the blend kernels — all monotone
streams — is reimplemented here as windowed Pallas kernels: per output
slab, the source positions of a monotone index map advance at most as fast
as the output cursor, so a fixed-size source window DMA'd per slab covers
every output chunk, and within a chunk the map is a constant shift
(realized as a dynamic lane rotate + row select, no per-element gather).

Kernels:

``relayout_pairs`` — the tile-aligned re-layout of the sorted pair stream
(binning.py), replacing an XLA scatter measured at 2.0-2.3 ms @480k pairs.

``segment_reduce_pairs`` — contiguous-segment row reduction for the
pack-gather backward (rasterize.py): after the per-pair gradient columns
are sorted by owning triangle (so triangle t's pairs occupy exactly
[tri_offsets[t], tri_offsets[t+1])), sums each triangle's columns into one
output column. Replaces the XLA (MA,16)->(P,16) scatter-add measured at
6.15 ms @480k pairs (whole backward path: sort 2.9 + kernel, nets -2.2 ms
end to end).

``segment_reduce_stats`` — the same contiguous-segment structure for the
per-triangle contribution statistics (``contrib_sum`` += alpha*T,
``contrib_max`` = max alpha*T — the reference's forward-kernel atomics,
2D/src/forward.cu:320-330): one pass computes the segment SUM of one
column (MXU one-hot matmul) and the segment MAX of another (VPU masked
max; contributions are >= 0 so the identity is 0). Replaces the
jax.ops.segment_sum + segment_max pair, which XLA lowers as two
per-row-priced scatters over the whole pair buffer.

relayout map detail: out[astart[t] + j] = src[rawstart[t] + j] has
per-tile constant shift delta[t] = astart[t] - rawstart[t] >= 0,
nondecreasing in t, so source positions within a 16-chunk (2048-pair)
output slab span <= 2048 positions. The source window is DMA'd manually
(``make_async_copy`` from an ANY-space ref) because its start is
data-dependent: starts are quantized to 8 rows (1024 elements) to keep the
dynamic slice tile-aligned, and the window is 24 rows (3072 entries) to
cover quantization slack (1023) + slab span (2048) < 3072.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
CHUNKS_PER_SLAB = 16                       # 2048 outputs per grid step
SLAB_OUT = CHUNKS_PER_SLAB * LANE
WIN_ROWS = 24                              # 3072-entry source window:
#                                            1023 (8-row start quantization)
#                                            + 2048 (slab span) + 1 <= 3072
WIN_QUANT = 8                              # window starts on 8-row (1024-
#                                            entry) boundaries: Mosaic DMAs
#                                            slice int32 HBM at (8,128)
#                                            tile granularity


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _relayout_kernel(chunk_src, chunk_vcnt, slab_row,    # scalar prefetch
                     src_hbm,                            # (R, 128) in ANY
                     out_ref,                            # (16, 128) out slab
                     win, sem):                          # VMEM scratch + DMA
    i = pl.program_id(0)
    row0 = pl.multiple_of(slab_row[i], WIN_QUANT)
    pltpu.make_async_copy(src_hbm.at[pl.ds(row0, WIN_ROWS)], win, sem).start()
    base = slab_row[i] * LANE
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (WIN_ROWS, 1), 0)
    pltpu.make_async_copy(src_hbm.at[pl.ds(row0, WIN_ROWS)], win, sem).wait()
    w = win[:, :]

    for k in range(CHUNKS_PER_SLAB):
        c = i * CHUNKS_PER_SLAB + k
        r = jnp.clip(chunk_src[c] - base, 0, (WIN_ROWS - 1) * LANE)
        row = r // LANE
        sh = r % LANE
        # Rows ``row`` and ``row+1`` of the window via masked sums (the
        # row index is traced; VMEM has no vector gather).
        sel_a = (row_iota == row).astype(jnp.int32)
        sel_b = (row_iota == row + 1).astype(jnp.int32)
        a = jnp.sum(w * sel_a, axis=0, keepdims=True)        # (1, 128)
        b = jnp.sum(w * sel_b, axis=0, keepdims=True)
        # out[l] = win_flat[r + l]: lane-rotate both rows left by sh, take
        # row ``row`` for l < 128 - sh and row+1 beyond.
        a = pltpu.roll(a, -sh, 1)
        b = pltpu.roll(b, -sh, 1)
        y = jnp.where(lane < LANE - sh, a, b)
        y = jnp.where(lane < chunk_vcnt[c], y, -1)
        out_ref[k:k + 1, :] = y


def relayout_pairs(sorted_tri: jax.Array, raw_starts: jax.Array,
                   astarts: jax.Array, tile_counts: jax.Array,
                   ma: int, *, interpret: bool = False) -> jax.Array:
    """Tile-aligned re-layout of the sorted pair stream.

    Args:
        sorted_tri: (MP,) int32 pair payloads in tile-sorted order,
            MP % 128 == 0.
        raw_starts: (T + 1,) int32 per-tile starts in sorted order.
        astarts: (T + 1,) int32 align-128 per-tile starts in the output.
        tile_counts: (T,) int32 real pairs per tile.
        ma: static output capacity (>= astarts[T]; multiple of 128).
    Returns:
        (ma,) int32 — out[astarts[t] + j] = sorted_tri[raw_starts[t] + j]
        for j < tile_counts[t], -1 elsewhere.
    """
    mp = sorted_tri.shape[0]
    assert mp % LANE == 0 and ma % LANE == 0
    n_chunks = ma // LANE
    n_slabs = pl.cdiv(n_chunks, CHUNKS_PER_SLAB)
    n_chunks_pad = n_slabs * CHUNKS_PER_SLAB

    # Per-chunk shift table (tiny: ma/128 entries of XLA arithmetic).
    cs = jnp.arange(n_chunks_pad, dtype=jnp.int32) * LANE
    tile = jnp.clip(jnp.searchsorted(astarts, cs, side="right").astype(
        jnp.int32) - 1, 0, tile_counts.shape[0] - 1)
    delta = astarts[:-1] - raw_starts[:-1]                   # (T,)
    chunk_src = jnp.clip(cs - delta[tile], 0, mp - 1)
    chunk_vcnt = jnp.clip(astarts[tile] + tile_counts[tile] - cs, 0, LANE)

    # Window DMAs may read up to WIN_ROWS rows past the last source row;
    # pad so every quantized window start stays in bounds.
    rows_src = mp // LANE
    rows_pad = _round_up(rows_src, WIN_QUANT) + WIN_ROWS
    slab_row = jnp.clip(
        (chunk_src[::CHUNKS_PER_SLAB] // (WIN_QUANT * LANE)) * WIN_QUANT,
        0, rows_pad - WIN_ROWS)
    src2d = jnp.concatenate(
        [sorted_tri, jnp.full((rows_pad * LANE - mp,), -1, jnp.int32)]
    ).reshape(rows_pad, LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_slabs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((CHUNKS_PER_SLAB, LANE),
                               lambda i, csrc, cvc, srow: (i, 0)),
        scratch_shapes=[pltpu.VMEM((WIN_ROWS, LANE), jnp.int32),
                        pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _relayout_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks_pad, LANE), jnp.int32),
        interpret=interpret,
    )(chunk_src, chunk_vcnt, slab_row, src2d)
    return out.reshape(-1)[:ma]


# ---------------------------------------------------------------------------
# segment_reduce_pairs — contiguous-segment column reduction (pack backward)
# ---------------------------------------------------------------------------

SEG_TB = 256       # output triangles (columns) per grid step: the 0/1
#                    membership mask costs (128, SEG_TB) VPU compares per
#                    window row — the kernel's dominant cost — while a
#                    block's source span is ~SEG_TB * pairs_per_triangle,
#                    so smaller blocks do ~proportionally less mask work
#                    (measured 1.46 -> ~0.6 ms @480k pairs vs SEG_TB=1024).
SEG_WR = 8         # window rows of 128 pairs each per inner DMA (1024 pairs)


def _split_hi_lo(v):
    """f32 -> three bf16 terms with hi + mid + lo = v to ~2^-24 relative.

    Three bf16 MXU passes replace a HIGHEST f32 matmul (6 passes) with
    below-f32-epsilon error — the 0/1 right operand is exact in bf16, so
    only the value splitting contributes (a 2-term split measured ~1e-4
    relative under segment-sum cancellation; 3 terms are exact to ulp).
    """
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _segment_reduce_kernel(blk_row0, blk_nwin, nvalid,   # scalar prefetch
                           starts, ends,                 # (1,1,TB) VMEM blocks
                           src_hbm,                      # (R, 16, 128) ANY
                           out_ref,                      # (16, TB) out block
                           win, sem):                    # VMEM scratch + DMA
    i = pl.program_id(0)
    r0 = blk_row0[i]
    s = starts[0]                               # (1, SEG_TB)
    e = ends[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

    def body(w, acc):
        row = r0 + w * SEG_WR
        cp = pltpu.make_async_copy(src_hbm.at[pl.ds(row, SEG_WR)], win, sem)
        cp.start()
        cp.wait()
        for r in range(SEG_WR):
            pos = (row + r) * LANE + lane                 # (128, 1) int32
            oh = ((pos >= s) & (pos < e)).astype(jnp.bfloat16)  # (128, TB)
            # Columns at/after nvalid may hold garbage (even NaN: the blend
            # backward's invalid-slot cotangents) — 0 * NaN = NaN would leak
            # through the one-hot matmul, so zero them on the value side
            # with a SELECT (a multiply would itself propagate NaN).
            ok = ((row + r) * LANE + lane_row) < nvalid[0]     # (1, 128)
            for part in _split_hi_lo(jnp.where(ok, win[r], 0.0)):
                acc = acc + jax.lax.dot_general(
                    part, oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return acc

    out_ref[:, :] = jax.lax.fori_loop(
        0, blk_nwin[i], body, jnp.zeros((16, SEG_TB), jnp.float32))


def segment_reduce_pairs(cols, starts: jax.Array, ends: jax.Array,
                         *, nvalid: jax.Array | None = None,
                         interpret: bool = False) -> jax.Array:
    """Sum contiguous column segments of a (16, M) stream into (16, P).

    Used by the pack-gather backward: after the per-pair gradient columns
    are sorted by owning triangle, triangle t owns the contiguous column
    range [starts[t], ends[t]) and its gradient is the sum of those
    columns. starts/ends are nondecreasing (segments are sorted and
    disjoint); empty segments yield zero columns.

    Per output block of SEG_TB triangles the source span [starts[t0],
    ends[t0+TB-1]) is covered by a dynamic number of SEG_WR-row windows
    (avg pairs/triangle ~3.5 so usually one); each window row contributes
    via one (16,128)x(128,TB) MXU accumulation whose right operand is the
    exact 0/1 segment-membership mask built from starts/ends — no
    per-element gather or scatter anywhere.

    Args:
        cols: list of 16 (M,) float32 arrays (the field rows), M % 128 == 0.
        starts: (P,) int32 segment starts into the M axis.
        ends: (P,) int32 segment ends; starts <= ends, both nondecreasing.
        nvalid: () int32 — columns at/after this index are treated as zero
            even when covered by a window (they may hold garbage/NaN).
            Defaults to M (all columns trusted). Columns in gaps BETWEEN
            segments below nvalid must be finite (they are masked by the
            one-hot weight, which does not stop NaN).
    Returns:
        (16, P) float32 segment sums.
    """
    assert len(cols) == 16
    m = cols[0].shape[0]
    p = starts.shape[0]
    assert m % LANE == 0
    rows_src = m // LANE
    r_pad = rows_src + SEG_WR
    p_pad = _round_up(max(p, SEG_TB), SEG_TB)
    n_blocks = p_pad // SEG_TB

    zpad = jnp.zeros((SEG_WR * LANE,), jnp.float32)
    src = jnp.stack(
        [jnp.concatenate([c, zpad]).reshape(r_pad, LANE) for c in cols],
        axis=1)                                          # (R, 16, 128)

    # (n_blocks, 1, SEG_TB) layout: a plain 1-D s32[p_pad] operand trips
    # Mosaic's layout verifier (XLA tiles large 1-D int arrays T(1024) while
    # a (SEG_TB,) block implies T(SEG_TB)), and a (n_blocks, SEG_TB) array
    # with (1, SEG_TB) blocks trips the sublane-divisibility rule (1 % 8).
    # With an explicit singleton second-minor dim the block's last two dims
    # (1, SEG_TB) equal/divide the array's — always verifiable.
    sp = jnp.concatenate(
        [starts, jnp.full((p_pad - p,), m, jnp.int32)]).astype(
            jnp.int32).reshape(n_blocks, 1, SEG_TB)
    ep = jnp.concatenate(
        [ends, jnp.full((p_pad - p,), m, jnp.int32)]).astype(
            jnp.int32).reshape(n_blocks, 1, SEG_TB)

    if nvalid is None:
        nvalid = jnp.int32(m)
    nvalid = jnp.asarray(nvalid, jnp.int32).reshape(1)

    blk_start = sp[:, 0, 0]                              # (n_blocks,)
    blk_end = ep[:, 0, -1]
    blk_row0 = jnp.clip(blk_start // LANE, 0, rows_src)
    blk_nwin = jnp.clip(
        (blk_end - blk_row0 * LANE + SEG_WR * LANE - 1) // (SEG_WR * LANE),
        0, (rows_src + SEG_WR - 1) // SEG_WR)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, SEG_TB), lambda i, r0, nw, nv: (i, 0, 0)),
            pl.BlockSpec((1, 1, SEG_TB), lambda i, r0, nw, nv: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((16, SEG_TB), lambda i, r0, nw, nv: (0, i)),
        scratch_shapes=[pltpu.VMEM((SEG_WR, 16, LANE), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _segment_reduce_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, p_pad), jnp.float32),
        interpret=interpret,
    )(blk_row0, blk_nwin, nvalid, sp, ep, src)
    return out[:, :p]


# ---------------------------------------------------------------------------
# segment_reduce_stats — contiguous-segment sum + max (contribution stats)
# ---------------------------------------------------------------------------


def _segment_stats_kernel(blk_row0, blk_nwin, nvalid,    # scalar prefetch
                          starts, ends,                  # (1,1,TB) VMEM blocks
                          src_hbm,                       # (R, 8, 128) ANY
                          out_ref,                       # (8, TB) out block
                          win, sem):                     # VMEM scratch + DMA
    i = pl.program_id(0)
    r0 = blk_row0[i]
    s = starts[0]                               # (1, SEG_TB)
    e = ends[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

    def body(w, carry):
        acc_sum, acc_max = carry
        row = r0 + w * SEG_WR
        cp = pltpu.make_async_copy(src_hbm.at[pl.ds(row, SEG_WR)], win, sem)
        cp.start()
        cp.wait()
        for r in range(SEG_WR):
            pos = (row + r) * LANE + lane                 # (128, 1) int32
            ohb = (pos >= s) & (pos < e)                  # (128, TB) bool
            ok = ((row + r) * LANE + lane_row) < nvalid[0]     # (1, 128)
            vals = jnp.where(ok, win[r], 0.0)             # (8, 128)
            oh16 = ohb.astype(jnp.bfloat16)
            for part in _split_hi_lo(vals):
                acc_sum = acc_sum + jax.lax.dot_general(
                    part, oh16, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (8, TB)
            # Segment max of row 1 (contributions >= 0; identity 0).
            mx = jnp.where(ohb, vals[1:2, :].T, 0.0)      # (128, TB)
            acc_max = jnp.maximum(acc_max, jnp.max(mx, axis=0, keepdims=True))
        return acc_sum, acc_max

    acc_sum, acc_max = jax.lax.fori_loop(
        0, blk_nwin[i], body,
        (jnp.zeros((8, SEG_TB), jnp.float32),
         jnp.zeros((1, SEG_TB), jnp.float32)))
    out_ref[0:1, :] = acc_sum[0:1, :]
    out_ref[1:2, :] = acc_max
    out_ref[2:, :] = jnp.zeros((6, SEG_TB), jnp.float32)


def segment_reduce_stats(sum_col: jax.Array, max_col: jax.Array,
                         starts: jax.Array, ends: jax.Array,
                         *, nvalid: jax.Array | None = None,
                         interpret: bool = False):
    """Segment SUM of ``sum_col`` and segment MAX of ``max_col`` (both >= 0).

    Same contract as :func:`segment_reduce_pairs`: segments are contiguous
    column ranges [starts[t], ends[t]) of the M axis, nondecreasing and
    disjoint; used after sorting per-pair contribution columns by owning
    triangle. Empty segments yield 0 for both reductions (the max identity
    is 0 — matches the reference's ``atomicMaxFloat`` over alpha*T >= 0
    initialized to zero, 2D/src/forward.cu:320-330 + auxiliary.h:350-356).

    Args:
        sum_col: (M,) f32, M % 128 == 0 — summed per segment.
        max_col: (M,) f32 — maxed per segment (values must be >= 0).
        starts / ends: (P,) int32 segment bounds.
        nvalid: () int32 — columns at/after this index are zeroed before
            either reduction (tail garbage guard).
    Returns:
        (sums, maxes): two (P,) f32 arrays.
    """
    m = sum_col.shape[0]
    p = starts.shape[0]
    assert m % LANE == 0
    rows_src = m // LANE
    r_pad = rows_src + SEG_WR
    p_pad = _round_up(max(p, SEG_TB), SEG_TB)
    n_blocks = p_pad // SEG_TB

    zpad = jnp.zeros((SEG_WR * LANE,), jnp.float32)
    zrow = jnp.zeros((r_pad, LANE), jnp.float32)
    src = jnp.stack(
        [jnp.concatenate([sum_col, zpad]).reshape(r_pad, LANE),
         jnp.concatenate([max_col, zpad]).reshape(r_pad, LANE),
         zrow, zrow, zrow, zrow, zrow, zrow], axis=1)    # (R, 8, 128)

    sp = jnp.concatenate(
        [starts, jnp.full((p_pad - p,), m, jnp.int32)]).astype(
            jnp.int32).reshape(n_blocks, 1, SEG_TB)
    ep = jnp.concatenate(
        [ends, jnp.full((p_pad - p,), m, jnp.int32)]).astype(
            jnp.int32).reshape(n_blocks, 1, SEG_TB)

    if nvalid is None:
        nvalid = jnp.int32(m)
    nvalid = jnp.asarray(nvalid, jnp.int32).reshape(1)

    blk_start = sp[:, 0, 0]
    blk_end = ep[:, 0, -1]
    blk_row0 = jnp.clip(blk_start // LANE, 0, rows_src)
    blk_nwin = jnp.clip(
        (blk_end - blk_row0 * LANE + SEG_WR * LANE - 1) // (SEG_WR * LANE),
        0, (rows_src + SEG_WR - 1) // SEG_WR)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, SEG_TB), lambda i, r0, nw, nv: (i, 0, 0)),
            pl.BlockSpec((1, 1, SEG_TB), lambda i, r0, nw, nv: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, SEG_TB), lambda i, r0, nw, nv: (0, i)),
        scratch_shapes=[pltpu.VMEM((SEG_WR, 8, LANE), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _segment_stats_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, p_pad), jnp.float32),
        interpret=interpret,
    )(blk_row0, blk_nwin, nvalid, sp, ep, src)
    return out[0, :p], out[1, :p]
