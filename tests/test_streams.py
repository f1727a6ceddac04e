"""Pallas streaming data-movement kernels vs their XLA scatter references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triangle_splatting_tpu.ops.pallas.streams import (relayout_pairs,
                                                       segment_reduce_pairs,
                                                       segment_reduce_stats)


def xla_reference(sorted_tri, raw_starts, astarts, tile_counts, ma):
    out = np.full((ma,), -1, np.int32)
    T = tile_counts.shape[0]
    for t in range(T):
        c = int(tile_counts[t])
        out[int(astarts[t]):int(astarts[t]) + c] = \
            sorted_tri[int(raw_starts[t]):int(raw_starts[t]) + c]
    return out


def make_case(rng, T, max_pairs, empty_frac=0.3):
    counts = rng.integers(0, 400, T).astype(np.int32)
    counts[rng.random(T) < empty_frac] = 0
    total = counts.sum()
    while total > max_pairs:          # keep the prefix-valid invariant
        counts = counts // 2
        total = counts.sum()
    raw = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    padded = ((counts + 127) // 128) * 128
    ast = np.concatenate([[0], np.cumsum(padded)]).astype(np.int32)
    sorted_tri = np.full((max_pairs,), -7, np.int32)
    sorted_tri[:total] = rng.integers(0, 1 << 20, total)
    return sorted_tri, raw, ast, counts


class TestRelayoutPairs:
    @pytest.mark.parametrize("seed,T,mp", [(0, 25, 128 * 90),
                                           (1, 625, 128 * 400),
                                           (2, 4, 128 * 8),
                                           (3, 1, 128)])
    def test_matches_reference(self, seed, T, mp):
        rng = np.random.default_rng(seed)
        sorted_tri, raw, ast, counts = make_case(rng, T, mp)
        ma = ((int(ast[-1]) + 127) // 128) * 128 + 256    # tail slack
        got = relayout_pairs(jnp.asarray(sorted_tri), jnp.asarray(raw),
                             jnp.asarray(ast), jnp.asarray(counts), ma,
                             interpret=True)
        want = xla_reference(sorted_tri, raw, ast, counts, ma)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_all_empty(self):
        T, mp = 16, 128 * 4
        sorted_tri = np.full((mp,), -7, np.int32)
        raw = np.zeros((T + 1,), np.int32)
        ast = np.zeros((T + 1,), np.int32)
        counts = np.zeros((T,), np.int32)
        got = relayout_pairs(jnp.asarray(sorted_tri), jnp.asarray(raw),
                             jnp.asarray(ast), jnp.asarray(counts), 512,
                             interpret=True)
        assert (np.asarray(got) == -1).all()

    def test_dense_single_tile(self):
        """One tile owning every pair (the giant-splat worst case)."""
        mp = 128 * 40
        rng = np.random.default_rng(5)
        sorted_tri = rng.integers(0, 1 << 20, mp).astype(np.int32)
        raw = np.array([0, mp], np.int32)
        ast = np.array([0, mp], np.int32)
        counts = np.array([mp], np.int32)
        got = relayout_pairs(jnp.asarray(sorted_tri), jnp.asarray(raw),
                             jnp.asarray(ast), jnp.asarray(counts), mp,
                             interpret=True)
        np.testing.assert_array_equal(np.asarray(got), sorted_tri)

    def test_jit_and_grad_safety(self):
        """Compiles under jit; int outputs are non-differentiable pass-through."""
        rng = np.random.default_rng(9)
        sorted_tri, raw, ast, counts = make_case(rng, 25, 128 * 90)
        ma = ((int(ast[-1]) + 127) // 128) * 128 + 128
        f = jax.jit(lambda s: relayout_pairs(
            s, jnp.asarray(raw), jnp.asarray(ast), jnp.asarray(counts), ma,
            interpret=True), static_argnums=())
        got = f(jnp.asarray(sorted_tri))
        want = xla_reference(sorted_tri, raw, ast, counts, ma)
        np.testing.assert_array_equal(np.asarray(got), want)


def segment_reference(data, starts, ends):
    P = starts.shape[0]
    out = np.zeros((16, P), np.float32)
    for t in range(P):
        out[:, t] = data[:, starts[t]:ends[t]].sum(axis=1)
    return out


class TestSegmentReducePairs:
    def _run(self, data, starts, ends):
        return np.asarray(segment_reduce_pairs(
            [jnp.asarray(r) for r in data],
            jnp.asarray(starts, jnp.int32), jnp.asarray(ends, jnp.int32),
            interpret=True))

    @pytest.mark.parametrize("seed,M,P,maxlen", [
        (0, 128 * 37, 700, 12),        # typical: ~3.5 pairs/segment
        (1, 128 * 8, 2000, 1),         # many empty + length-1 segments
        (2, 128 * 64, 9, 2000),        # few giant segments (multi-window)
        (3, 128, 1, 128),              # single segment spanning everything
    ])
    def test_matches_reference(self, seed, M, P, maxlen):
        rng = np.random.default_rng(seed)
        counts = rng.integers(0, maxlen + 1, P)
        offs = np.minimum(np.concatenate([[0], np.cumsum(counts)]), M)
        starts, ends = offs[:-1], offs[1:]
        data = rng.normal(size=(16, M)).astype(np.float32)
        got = self._run(data, starts, ends)
        want = segment_reference(data, starts, ends)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-5)

    def test_all_empty(self):
        M, P = 256, 100
        data = np.ones((16, M), np.float32)
        starts = ends = np.full((P,), M, np.int32)
        assert (self._run(data, starts, ends) == 0).all()

    def test_nan_tail_masked_by_nvalid(self):
        """Garbage (NaN) columns at/after nvalid inside a DMA'd window must
        not leak into segment sums (the blend backward's invalid-slot
        cotangents are NaN; 0 * NaN = NaN through a plain one-hot matmul)."""
        M, P, nvalid = 128 * 4, 64, 100
        rng = np.random.default_rng(1)
        data = rng.normal(size=(16, M)).astype(np.float32)
        data[:, nvalid:] = np.nan
        counts = np.full(P, 2)
        offs = np.minimum(np.concatenate([[0], np.cumsum(counts)]), nvalid)
        starts, ends = offs[:-1].astype(np.int32), offs[1:].astype(np.int32)
        got = np.asarray(segment_reduce_pairs(
            [jnp.asarray(r) for r in data], jnp.asarray(starts),
            jnp.asarray(ends), nvalid=jnp.int32(nvalid), interpret=True))
        clean = np.where(np.isnan(data), 0.0, data)
        want = segment_reference(clean, starts, ends)
        assert np.isfinite(got).all()
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-5)

    def test_block_boundary_segment(self):
        """A segment crossing the 512-triangle output block boundary's
        source window (block 1 starts mid-way into the stream)."""
        rng = np.random.default_rng(7)
        M, P = 128 * 16, 600
        counts = np.zeros(P, np.int64)
        counts[500] = 900            # one fat segment near the block edge
        counts[510:560] = 20
        offs = np.minimum(np.concatenate([[0], np.cumsum(counts)]), M)
        starts, ends = offs[:-1], offs[1:]
        data = rng.normal(size=(16, M)).astype(np.float32)
        np.testing.assert_allclose(self._run(data, starts, ends),
                                   segment_reference(data, starts, ends),
                                   rtol=2e-6, atol=2e-5)


class TestSegmentReduceStats:
    def _run(self, sum_col, max_col, starts, ends, nvalid=None):
        s, m = segment_reduce_stats(
            jnp.asarray(sum_col), jnp.asarray(max_col),
            jnp.asarray(starts, jnp.int32), jnp.asarray(ends, jnp.int32),
            nvalid=None if nvalid is None else jnp.int32(nvalid),
            interpret=True)
        return np.asarray(s), np.asarray(m)

    @pytest.mark.parametrize("seed,M,P,maxlen", [
        (0, 128 * 37, 700, 12),        # typical: ~3.5 pairs/segment
        (1, 128 * 8, 2000, 1),         # many empty + length-1 segments
        (2, 128 * 64, 9, 2000),        # few giant segments (multi-window)
        (3, 128, 1, 128),              # single segment spanning everything
    ])
    def test_matches_reference(self, seed, M, P, maxlen):
        rng = np.random.default_rng(seed)
        counts = rng.integers(0, maxlen + 1, P)
        offs = np.minimum(np.concatenate([[0], np.cumsum(counts)]), M)
        starts, ends = offs[:-1], offs[1:]
        sum_col = rng.normal(size=M).astype(np.float32)
        max_col = rng.uniform(0.0, 1.0, M).astype(np.float32)
        got_s, got_m = self._run(sum_col, max_col, starts, ends)
        want_s = np.array([sum_col[a:b].sum() for a, b in zip(starts, ends)],
                          np.float32)
        want_m = np.array(
            [max_col[a:b].max() if b > a else 0.0
             for a, b in zip(starts, ends)], np.float32)
        np.testing.assert_allclose(got_s, want_s, rtol=2e-6, atol=2e-5)
        np.testing.assert_allclose(got_m, want_m, rtol=0, atol=0)

    def test_empty_segments_zero_identity(self):
        M, P = 256, 100
        ones = np.ones(M, np.float32)
        starts = ends = np.full((P,), M, np.int32)
        got_s, got_m = self._run(ones, ones, starts, ends)
        assert (got_s == 0).all() and (got_m == 0).all()

    def test_nvalid_tail_guard(self):
        M, P, nvalid = 128 * 4, 64, 100
        rng = np.random.default_rng(1)
        sum_col = rng.normal(size=M).astype(np.float32)
        max_col = rng.uniform(0.0, 1.0, M).astype(np.float32)
        sum_col[nvalid:] = np.nan
        max_col[nvalid:] = np.nan
        counts = np.full(P, 2)
        offs = np.minimum(np.concatenate([[0], np.cumsum(counts)]), nvalid)
        starts, ends = offs[:-1], offs[1:]
        got_s, got_m = self._run(sum_col, max_col, starts, ends, nvalid)
        assert np.isfinite(got_s).all() and np.isfinite(got_m).all()

    def test_matches_xla_segment_ops_on_real_binning(self):
        """End-to-end: rasterize's contrib stats equal the plain
        jax.ops.segment_sum / segment_max formulation they replaced."""
        from triangle_splatting_tpu.ops.binning import bin_triangles
        from triangle_splatting_tpu.ops.projection import (RasterSettings,
                                                           preprocess_2d)
        from triangle_splatting_tpu.ops.rasterize import _contrib_stats
        from triangle_splatting_tpu.utils.testing import (make_camera,
                                                          make_random_scene)
        P = 300
        settings = RasterSettings(image_width=160, image_height=96)
        cam = make_camera(160, 96, 60.0)
        s = make_random_scene(P, seed=11)
        prep = preprocess_2d(jnp.asarray(s["vertex"]), jnp.zeros((P, 2)),
                             jnp.asarray(s["rgb"]), cam.world_view,
                             cam.full_proj, cam.tan_fovx, cam.tan_fovy,
                             settings)
        binning = bin_triangles(prep, settings, max_pairs=128 * 24,
                                interpret=True)
        ma = binning.pair_tri.shape[0]
        rng = np.random.default_rng(3)
        pc = jnp.asarray(rng.uniform(0.0, 1.0, (2, ma)).astype(np.float32))

        got_s, got_m = _contrib_stats(pc, binning, P, interpret=True)

        seg = jnp.where(binning.pair_valid, binning.pair_tri, P)
        want_s = jax.ops.segment_sum(pc[0], seg, num_segments=P + 1)[:P]
        want_m = jnp.maximum(
            jax.ops.segment_max(pc[1], seg, num_segments=P + 1)[:P], 0.0)
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                                   rtol=2e-6, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                                   rtol=0, atol=0)


class TestPackBackward:
    def test_pack_vjp_matches_scatter_add(self):
        """The sort + segment-reduce backward equals the plain scatter-add
        transpose of the pack gather."""
        import jax.numpy as jnp
        from triangle_splatting_tpu.ops.binning import bin_triangles
        from triangle_splatting_tpu.ops.projection import (RasterSettings,
                                                           preprocess_2d)
        from triangle_splatting_tpu.ops.rasterize import (pack_pair_fields,
                                                          triangle_field_matrix)
        from triangle_splatting_tpu.utils.testing import (make_camera,
                                                          make_random_scene)
        P = 300
        settings = RasterSettings(image_width=160, image_height=96)
        cam = make_camera(160, 96, 60.0)
        s = make_random_scene(P, seed=11)
        prep = preprocess_2d(jnp.asarray(s["vertex"]), jnp.zeros((P, 2)),
                             jnp.asarray(s["rgb"]), cam.world_view,
                             cam.full_proj, cam.tan_fovx, cam.tan_fovy,
                             settings)
        binning = bin_triangles(prep, settings, max_pairs=128 * 24,
                                interpret=True)
        fmat = triangle_field_matrix(prep, jnp.asarray(s["opacity"])[:, 0]
                                     if np.asarray(s["opacity"]).ndim == 2
                                     else jnp.asarray(s["opacity"]))
        rng = np.random.default_rng(3)
        ct = jnp.asarray(rng.normal(size=(16, binning.pair_tri.shape[0]))
                         .astype(np.float32))

        _, vjp = jax.vjp(
            lambda f: pack_pair_fields(f, binning, True), fmat)
        got = np.asarray(vjp(ct)[0])

        # Reference: explicit transpose of [gather; mask; transpose].
        d_rows = np.where(np.asarray(binning.pair_valid)[:, None],
                          np.asarray(ct).T, 0.0)
        want = np.zeros((P, 16), np.float32)
        np.add.at(want, np.maximum(np.asarray(binning.pair_tri), 0), d_rows)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_pack_vjp_live_rows_slicing(self):
        """live_rows < 16 must reproduce the full-16 backward when the
        cotangent's trailing rows are zero (the rich_info=False contract:
        the blend backward emits structural zeros there)."""
        import jax.numpy as jnp
        from triangle_splatting_tpu.ops.binning import bin_triangles
        from triangle_splatting_tpu.ops.projection import (RasterSettings,
                                                           preprocess_2d)
        from triangle_splatting_tpu.ops.rasterize import (pack_pair_fields,
                                                          triangle_field_matrix)
        from triangle_splatting_tpu.utils.testing import (make_camera,
                                                          make_random_scene)
        P = 300
        settings = RasterSettings(image_width=160, image_height=96)
        cam = make_camera(160, 96, 60.0)
        s = make_random_scene(P, seed=11)
        prep = preprocess_2d(jnp.asarray(s["vertex"]), jnp.zeros((P, 2)),
                             jnp.asarray(s["rgb"]), cam.world_view,
                             cam.full_proj, cam.tan_fovx, cam.tan_fovy,
                             settings)
        binning = bin_triangles(prep, settings, max_pairs=128 * 24,
                                interpret=True)
        opac = np.asarray(s["opacity"])
        opac = opac[:, 0] if opac.ndim == 2 else opac
        fmat = triangle_field_matrix(prep, jnp.asarray(opac))
        rng = np.random.default_rng(7)
        for live in (10, 11, 13, 14):
            ct = rng.normal(size=(16, binning.pair_tri.shape[0])) \
                .astype(np.float32)
            ct[live:] = 0.0                       # the rich=False contract
            ct = jnp.asarray(ct)
            _, vjp_full = jax.vjp(
                lambda f: pack_pair_fields(f, binning, True, 16), fmat)
            _, vjp_live = jax.vjp(
                lambda f: pack_pair_fields(f, binning, True, live), fmat)
            np.testing.assert_allclose(
                np.asarray(vjp_live(ct)[0]), np.asarray(vjp_full(ct)[0]),
                rtol=0, atol=0, err_msg=f"live_rows={live}")


class TestAlignedCapacity:
    """Pins the aligned-pair-buffer sizing contract between binning and the
    blend kernels (blend.py streams SLAB-sized compute slabs from
    ALIGN-aligned tile starts and may read/write up to SLAB - ALIGN slots
    past the last tile's aligned end)."""

    def test_covers_worst_case_layout(self):
        from triangle_splatting_tpu.ops.binning import aligned_capacity
        from triangle_splatting_tpu.ops.pallas import blend

        align = blend.ALIGN
        for num_tiles in (1, 7, 625):
            for max_pairs in (align, 1000, 128 * 24):
                cap = aligned_capacity(max_pairs, num_tiles, align)
                # Adversarial layout: every tile holds 1 pair -> each costs
                # a full ALIGN block; remaining budget lands in the last
                # tile, whose final slab can overrun SLAB - ALIGN slots.
                per_tile_waste = num_tiles * align
                worst = max_pairs + per_tile_waste - num_tiles \
                    + max(blend.SLAB - align, 0)
                assert cap >= worst, (num_tiles, max_pairs, cap, worst)

    def test_pad_tracks_slab_growth(self, monkeypatch):
        """Raising blend.SLAB must grow the derived tail pad (the original
        +1-block pad silently under-allocated for SLAB > 2 * ALIGN)."""
        from triangle_splatting_tpu.ops import binning
        from triangle_splatting_tpu.ops.pallas import blend

        base = binning.aligned_capacity(1000, 10, blend.ALIGN)
        monkeypatch.setattr(blend, "SLAB", blend.ALIGN * 8)
        grown = binning.aligned_capacity(1000, 10, blend.ALIGN)
        assert grown - base >= blend.ALIGN * 8 - max(blend.SLAB,
                                                     blend.ALIGN * 2)
        # and the overrun region is fully inside the pad
        assert grown >= 1000 + 10 * blend.ALIGN + (blend.ALIGN * 8
                                                   - blend.ALIGN)


class TestSlabSplit:
    """FWD_SLAB and BWD_SLAB are tuned independently (the r4 sweep); the
    kernels must stay correct when they differ. Runs a small forward +
    backward with the backward slab doubled, against the unmodified
    baseline."""

    @pytest.mark.slow
    def test_unequal_slabs_match_baseline(self, monkeypatch):
        from triangle_splatting_tpu.ops import rasterize as rz
        from triangle_splatting_tpu.ops.pallas import blend
        from triangle_splatting_tpu.ops.projection import RasterSettings
        from triangle_splatting_tpu.utils.testing import (make_camera,
                                                          make_random_scene)

        P = 200
        settings = RasterSettings(image_width=160, image_height=96)
        cam = make_camera(160, 96, 60.0)
        s = make_random_scene(P, seed=5)
        v = jnp.asarray(s["vertex"])
        o = jnp.asarray(s["opacity"])
        c = jnp.asarray(s["rgb"])

        def loss(vertex, opacity, rgb):
            out = rz.rasterize(vertex, opacity, None, cam, settings,
                               colors=rgb, interpret=True)
            color = out["render"] if isinstance(out, dict) else out.color
            return jnp.sum(color ** 2) + jnp.sum(color * 0.3)

        base_val, base_grads = jax.value_and_grad(loss, (0, 1, 2))(v, o, c)

        monkeypatch.setattr(blend, "BWD_SLAB", blend.BWD_SLAB * 2)
        monkeypatch.setattr(blend, "SLAB",
                            max(blend.FWD_SLAB, blend.BWD_SLAB))
        got_val, got_grads = jax.value_and_grad(loss, (0, 1, 2))(v, o, c)

        np.testing.assert_allclose(float(got_val), float(base_val),
                                   rtol=1e-6)
        for g0, g1 in zip(base_grads, got_grads):
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                       rtol=5e-4, atol=5e-6)
