"""Pallas streaming data-movement kernels for the pair pipeline.

XLA's TPU gather/scatter lowerings price per ROW at ~1-2% of HBM bandwidth
(PERF.md cost model: 6.6 ms for a 400k-row scatter-add that moves 30 MB),
so the binning/pack data movement around the blend kernels — all monotone
streams — is reimplemented here as windowed Pallas kernels: per output
slab, the source positions of a monotone index map advance at most as fast
as the output cursor, so a fixed-size source window DMA'd per slab covers
every output chunk, and within a chunk the map is a constant shift
(realized as a dynamic lane rotate + row select, no per-element gather).

First kernel: ``relayout_pairs`` — the tile-aligned re-layout of the
sorted pair stream (binning.py), replacing an XLA scatter measured at
2.0-2.3 ms @480k pairs. The map out[astart[t] + j] = src[rawstart[t] + j]
has per-tile constant shift delta[t] = astart[t] - rawstart[t] >= 0,
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
