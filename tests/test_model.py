"""Triangle model: params, Adam semantics, adaptive density control."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from dataclasses import replace

from triangle_splatting_tpu.models import triangle as M
from triangle_splatting_tpu.utils.testing import make_camera, make_random_scene


CFG = M.ModelConfig(max_sh_degree=1)


def make_model(n=32, seed=0, capacity=None):
    s = make_random_scene(n, seed=seed)
    params, state = M.create_from_points(s["vertex"].mean(1), s["rgb"], None,
                                         CFG, init_opacity=0.3,
                                         capacity=capacity)
    opt = M.AdamState.create(params)
    return params, state, opt


class TestParams:
    def test_create_shapes(self):
        params, state, _ = make_model(32)
        assert params.capacity == 256      # rounded up
        assert int(state.alive.sum()) == 32
        assert params.vertex.shape == (256, 3, 3)
        assert params.f_rest.shape == (256, 3, 3)   # (1+1)^2-1 = 3 coeffs

    def test_opacity_init(self):
        params, state, _ = make_model(8)
        alive = np.asarray(state.alive)
        op = np.asarray(M.get_opacity(params))[alive]
        np.testing.assert_allclose(op, 0.3, atol=1e-5)

    def test_scaling_positive(self):
        params, state, _ = make_model(8)
        s = np.asarray(M.get_scaling(params))[np.asarray(state.alive)]
        assert (s > 0).all()

    def test_gamma_rescale_ratio(self):
        # gamma=1: 1/sqrt(2^1 * 1 * Gamma(1)) = 1/sqrt(2)
        r = float(M.gamma_rescale_ratio(1.0))
        assert abs(r - 1 / np.sqrt(2)) < 1e-5
        # monotone-ish toward 1 as gamma grows (b -> 0)
        assert float(M.gamma_rescale_ratio(50.0)) > r

    def test_back_culling_duplicates(self):
        s = make_random_scene(8, seed=1)
        cfg = M.ModelConfig(max_sh_degree=0, back_culling=True)
        params, state = M.create_from_points(s["vertex"].mean(1), s["rgb"],
                                             None, cfg)
        assert int(state.alive.sum()) == 16
        v = np.asarray(params.vertex)
        np.testing.assert_allclose(v[0], v[8][::-1], atol=1e-6)  # flipped winding


class TestAdam:
    def test_matches_torch_semantics(self):
        """m_hat/(sqrt(v_hat)+eps) with eps outside the sqrt, eps=1e-15."""
        params, state, opt = make_model(8)
        g = jax.tree_util.tree_map(
            lambda x: None if x is None else jnp.ones_like(x), params)
        lrs = {"vertex": np.float32(0.1), "opacity": np.float32(0.0),
               "f_dc": np.float32(0.0), "f_rest": np.float32(0.0),
               "affine": np.float32(0.0)}
        p0 = np.asarray(params.vertex)
        params2, opt2 = M.adam_update(params, opt, g, lrs)
        # First step: m_hat = g, v_hat = g^2 -> update = g/|g| = 1
        np.testing.assert_allclose(np.asarray(params2.vertex), p0 - 0.1,
                                   rtol=1e-5, atol=1e-6)
        assert int(opt2.step) == 1

    def test_zero_moments(self):
        params, state, opt = make_model(8)
        g = jax.tree_util.tree_map(
            lambda x: None if x is None else jnp.ones_like(x), params)
        lrs = {k: np.float32(0.01) for k in
               ("vertex", "opacity", "f_dc", "f_rest", "affine")}
        _, opt = M.adam_update(params, opt, g, lrs)
        mask = jnp.zeros(params.capacity, bool).at[0].set(True)
        opt2 = M.zero_moments(opt, mask)
        assert float(jnp.abs(opt2.m.vertex[0]).max()) == 0
        assert float(jnp.abs(opt2.m.vertex[1]).max()) > 0


class TestADC:
    def test_prune(self):
        params, state, opt = make_model(16)
        mask = jnp.zeros(params.capacity, bool).at[3].set(True)
        params, opt, state = M.prune(params, opt, state, mask)
        assert not bool(state.alive[3])
        assert int(state.alive.sum()) == 15

    def test_opacity_pruning_threshold(self):
        params, state, opt = make_model(16)
        # opacity is 0.3 everywhere; threshold 0.5 prunes all alive
        params, opt, state, n = M.opacity_pruning(params, opt, state, 0.5)
        assert int(n) == 16
        assert int(state.alive.sum()) == 0

    def test_opacity_clipping(self):
        params, state, opt = make_model(16)
        params, opt, state, n = M.opacity_clipping(params, opt, state, 0.2)
        assert int(n) == 16
        alive = np.asarray(state.alive)
        assert np.allclose(np.asarray(params.opacity)[alive], 10.0)

    def test_scale_clipping(self):
        params, state, opt = make_model(16)
        s0 = np.asarray(M.get_scaling(params))
        target = float(np.median(s0[np.asarray(state.alive)]))
        params, opt, state, n = M.scale_clipping(params, opt, state, target)
        s1 = np.asarray(M.get_scaling(params))[np.asarray(state.alive)]
        assert (s1 <= target * 1.001).all()
        assert int(n) > 0

    def test_opacity_reset(self):
        params, state, opt = make_model(16)
        params, opt, state = M.opacity_reset(params, opt, state, 0.1)
        alive = np.asarray(state.alive)
        op = np.asarray(M.get_opacity(params))[alive]
        np.testing.assert_allclose(op, 0.1, atol=1e-5)

    def test_densify_clone_and_split(self):
        params, state, opt = make_model(16)
        C = params.capacity
        # mark half the triangles as high-gradient with enough views
        state = replace(state,
                        gradient_accum=jnp.where(jnp.arange(C) < 8, 100.0, 0.0),
                        gradient_denom=jnp.where(state.alive, 10.0, 0.0))
        scaling = M.get_scaling(params)
        thr = float(jnp.sort(scaling[:16])[8])  # half clone, half split
        params, opt, state, n, overflow = M.densify(
            params, opt, state, np.float32(0.1), 1, np.float32(thr))
        assert int(n) == 8
        assert not bool(overflow)
        # clones: +1 row each; splits: +2 rows, -1 original
        # alive count = 16 + n_clone + n_split
        assert int(state.alive.sum()) > 16

    def test_densify_split_geometry(self):
        """A split triangle's two halves tile the original."""
        params, state, opt = make_model(4)
        C = params.capacity
        state = replace(state,
                        gradient_accum=jnp.where(jnp.arange(C) == 0, 100.0, 0.0),
                        gradient_denom=jnp.where(state.alive, 10.0, 0.0))
        v_orig = np.asarray(params.vertex[0])
        params, opt, state, n, _ = M.densify(
            params, opt, state, np.float32(0.1), 1, np.float32(0.0))  # force split
        assert int(n) == 1
        assert not bool(state.alive[0])          # original pruned
        # two new rows share the original's longest-side midpoint
        alive_rows = np.asarray(params.vertex)[np.asarray(state.alive)]
        new_rows = [r for r in alive_rows
                    if not any(np.allclose(r, np.asarray(params.vertex[i]), atol=1e-6)
                               for i in range(1, 4))]
        assert len(new_rows) == 2
        total_area = 0.0
        for r in new_rows:
            total_area += 0.5 * np.linalg.norm(np.cross(r[1] - r[0], r[2] - r[0]))
        orig_area = 0.5 * np.linalg.norm(
            np.cross(v_orig[1] - v_orig[0], v_orig[2] - v_orig[0]))
        np.testing.assert_allclose(total_area, orig_area, rtol=1e-4)

    def test_densify_overflow_reported(self):
        params, state, opt = make_model(16, capacity=256)
        state = replace(state, alive=jnp.ones(256, bool),
                        gradient_accum=jnp.full(256, 100.0),
                        gradient_denom=jnp.full(256, 10.0))
        params, opt, state, n, overflow = M.densify(
            params, opt, state, np.float32(0.1), 1, np.float32(1e9))
        assert bool(overflow)

    def test_densify_overflow_never_loses_geometry(self):
        """SPLITS whose replacement halves were dropped (capacity full) must
        keep their originals alive — overflow may defer growth, never delete
        triangles."""
        params, state, opt = make_model(16, capacity=256)
        n0 = 256
        state = replace(state, alive=jnp.ones(n0, bool),
                        gradient_accum=jnp.full(n0, 100.0),
                        gradient_denom=jnp.full(n0, 10.0))
        # threshold 0 -> every triangle wants to SPLIT, zero dead slots
        params, opt, state, n, overflow = M.densify(
            params, opt, state, np.float32(0.1), 1, np.float32(0.0))
        assert bool(overflow)
        assert int(state.alive.sum()) == n0       # nothing vanished

    def test_contribution_pruning(self):
        params, state, opt = make_model(32)
        C = params.capacity
        contrib = jnp.where(state.alive, jnp.arange(C, dtype=jnp.float32), 0)
        state = replace(state, contrib_sum=contrib, contrib_max=contrib,
                        contrib_denom=jnp.where(state.alive, 5.0, 0.0))
        params, opt, state, n = M.contribution_pruning(
            params, opt, state, min_view_count=1, target_point_num=16,
            prune_ratio=np.float32(1.0), max_prune_ratio=np.float32(1.0),
            contrib_max_ratio=np.float32(0.5))
        # lowest-contribution rows pruned first
        assert int(n) > 0
        alive = np.asarray(state.alive)
        assert not alive[0] and not alive[1]

    def test_update_statistics(self):
        params, state, opt = make_model(8)
        C = params.capacity
        g = jnp.ones((C, 2))
        radii = jnp.full((C,), 5, jnp.int32)
        vis = state.alive
        state2 = M.update_statistics(state, g, radii, jnp.full(C, 0.5),
                                     jnp.full(C, 0.25), vis)
        alive = np.asarray(vis)
        np.testing.assert_allclose(np.asarray(state2.gradient_accum)[alive],
                                   np.sqrt(2), rtol=1e-6)
        assert np.asarray(state2.max_radii2d)[alive].max() == 5
        assert np.asarray(state2.contrib_denom)[~alive].max() == 0


class TestForward:
    def test_forward_oracle(self):
        params, state, opt = make_model(32)
        cam = make_camera(32, 32)
        from triangle_splatting_tpu.ops.projection import RasterSettings
        settings = RasterSettings(image_width=32, image_height=32, max_sh_degree=1)
        pkg = M.forward(params, state, cam, jnp.ones(3), CFG, settings,
                        impl="oracle")
        assert pkg["render"].shape == (3, 32, 32)
        assert np.isfinite(np.asarray(pkg["render"])).all()
        # dead slots are never visible
        assert not np.asarray(pkg["visible_mask"])[~np.asarray(state.alive)].any()

    def test_ste_binarizes_opacity(self):
        params, state, opt = make_model(16)
        cfg = M.ModelConfig(max_sh_degree=1, ste_threshold=0.5)
        cam = make_camera(32, 32)
        from triangle_splatting_tpu.ops.projection import RasterSettings
        settings = RasterSettings(image_width=32, image_height=32, max_sh_degree=1)
        # opacity 0.3 < 0.5 -> STE forward value 0 -> nothing rendered
        pkg = M.forward(params, state, cam, jnp.zeros(3), cfg, settings,
                        impl="oracle")
        assert float(jnp.abs(pkg["render"]).max()) == 0.0

    def test_render_up_scale(self):
        """Supersample + bilinear downsample (VanillaTS_model.py:625-656):
        same image size out, values close to the direct render."""
        from triangle_splatting_tpu.ops.projection import RasterSettings
        params, state, opt = make_model(32)
        cam = make_camera(32, 32)
        settings = RasterSettings(image_width=32, image_height=32,
                                  max_sh_degree=1)
        base = M.forward(params, state, cam, jnp.ones(3), CFG, settings,
                         impl="oracle")
        cfg_up = M.ModelConfig(max_sh_degree=1, render_up_scale=2)
        up = M.forward(params, state, cam, jnp.ones(3), cfg_up, settings,
                       impl="oracle")
        assert up["render"].shape == base["render"].shape
        assert up["depth"].shape == base["depth"].shape
        # antialiased result stays close to the direct render on a smooth
        # scene (identical up to resampling)
        diff = float(jnp.abs(up["render"] - base["render"]).mean())
        assert diff < 0.05, diff
        assert float(jnp.abs(up["render"] - base["render"]).max()) > 0

    def test_color_affine(self):
        """Per-view affine color correction (VanillaTS_model.py:678-683)."""
        from triangle_splatting_tpu.ops.projection import RasterSettings
        params, state, opt = make_model(32)
        W3 = np.tile(np.eye(3, dtype=np.float32) * 0.5, (4, 1, 1))
        b3 = np.full((4, 3), 0.1, np.float32)
        params = replace(params, affine_weight=jnp.asarray(W3),
                         affine_bias=jnp.asarray(b3))
        cfg_aff = M.ModelConfig(max_sh_degree=1, use_color_affine=True)
        cam = make_camera(32, 32)
        settings = RasterSettings(image_width=32, image_height=32,
                                  max_sh_degree=1)
        pkg = M.forward(params, state, cam, jnp.ones(3), cfg_aff, settings,
                        impl="oracle")
        expected = jnp.clip(pkg["render_original"] * 0.5 + 0.1, 0, 1)
        np.testing.assert_allclose(np.asarray(pkg["render"]),
                                   np.asarray(expected), atol=1e-6)
        # eval path disables the correction (apply_color_affine=False)
        pkg2 = M.forward(params, state, cam, jnp.ones(3), cfg_aff, settings,
                         impl="oracle", apply_color_affine=False)
        np.testing.assert_allclose(np.asarray(pkg2["render"]),
                                   np.asarray(pkg["render_original"]),
                                   atol=1e-6)


class TestInsideMaskTraced:
    def test_bbox_traced_under_jit(self):
        # the trainer jits contribution_pruning with scene_bbox as a traced
        # argument; get_inside_mask must not call numpy on it
        import jax
        from triangle_splatting_tpu.models.model_utils import get_inside_mask
        pts = jnp.asarray(np.linspace(-1, 1, 30).reshape(10, 3).astype(np.float32))
        for bbox in (np.array([-0.5, -0.5, 0.5, 0.5], np.float32),
                     np.array([-0.5, -0.5, -0.5, 0.5, 0.5, 0.5], np.float32)):
            m_jit = jax.jit(get_inside_mask)(pts, bbox)
            m_eager = get_inside_mask(np.asarray(pts), bbox)
            np.testing.assert_array_equal(m_jit, m_eager)


class TestAdamLrGroups:
    def test_affine_groups_use_affine_lr(self):
        """affine_weight/affine_bias share lrs['affine']; a genuinely
        unknown group without an lr fails loudly."""
        params, state, opt = make_model(8)
        params = M.setup_color_affine(params, 4)
        opt = M.AdamState.create(params)
        g = jax.tree_util.tree_map(
            lambda x: None if x is None else jnp.ones_like(x), params)
        lrs = {k: np.float32(0.01) for k in
               ("vertex", "opacity", "f_dc", "f_rest", "affine")}
        p2, o2 = M.adam_update(params, opt, g, lrs)
        assert np.abs(np.asarray(p2.affine_weight)
                      - np.asarray(params.affine_weight)).max() > 0

        import pytest
        with pytest.raises(KeyError, match="affine"):
            M.adam_update(params, opt, g, {k: np.float32(0.01) for k in
                                           ("vertex", "opacity", "f_dc",
                                            "f_rest")})


class TestAdaptPairBudget:
    """Need-based pair-budget quantization (adc_utils.adapt_pair_budget) —
    the static-XLA stand-in for the reference's exact binning reallocation
    (diff-triangle-rasterization-2D rasterizer_impl resize-on-demand)."""

    def test_overflow_doubles_capped(self):
        from triangle_splatting_tpu.trainers.adc_utils import adapt_pair_budget
        assert adapt_pair_budget(4.0, 100, 100, True) == 8.0
        assert adapt_pair_budget(20.0, 100, 100, True) == 32.0
        assert adapt_pair_budget(32.0, 100, 100, True) == 32.0

    def test_shrinks_to_need_with_margin(self):
        from triangle_splatting_tpu.trainers.adc_utils import adapt_pair_budget
        # 270k pairs over 100k primitives: need = 1.3 * 2.7 = 3.51 -> 3.5,
        # and 3.5 < 0.5 * 8.0 clears the hysteresis gate
        assert adapt_pair_budget(8.0, 270_000, 100_000, False) == 3.5

    def test_hysteresis_no_small_shrinks(self):
        from triangle_splatting_tpu.trainers.adc_utils import adapt_pair_budget
        # need 3.5 is NOT < 0.5 * 6.0 -> keep the current budget (an eager
        # shrink during densification is often undone by an overflow
        # doubling two recompiles later — see adapt_pair_budget docstring)
        assert adapt_pair_budget(6.0, 270_000, 100_000, False) == 6.0
        assert adapt_pair_budget(4.0, 270_000, 100_000, False) == 4.0

    def test_floor_and_none_used(self):
        from triangle_splatting_tpu.trainers.adc_utils import adapt_pair_budget
        assert adapt_pair_budget(6.0, 10, 100_000, False) == 2.0
        assert adapt_pair_budget(6.0, None, 100_000, False) == 6.0


class TestGridSampling:
    """grid_sampling / grid_size_search (reference model_utils.py:97-153) —
    the flat-key encoding must reproduce row-wise-unique voxelization."""

    def _oracle(self, pts, cols, nrms, g):
        voxel = np.floor(pts / g).astype(np.int64)
        uniq, inverse = np.unique(voxel, axis=0, return_inverse=True)
        m = uniq.shape[0]
        out = []
        for x in (pts, cols, nrms):
            acc = np.zeros((m, x.shape[1]))
            np.add.at(acc, inverse.ravel(), x)
            cnt = np.bincount(inverse.ravel(), minlength=m)[:, None]
            out.append((acc / cnt).astype(np.float32))
        return out

    def test_matches_row_unique_oracle(self):
        from triangle_splatting_tpu.models.model_utils import grid_sampling
        rng = np.random.default_rng(3)
        pts = (rng.random((5000, 3)) * 20 - 10).astype(np.float32)
        cols = rng.random((5000, 3)).astype(np.float32)
        nrms = rng.random((5000, 3)).astype(np.float32)
        got = grid_sampling(pts, cols, nrms, 0.7)
        want = self._oracle(pts, cols, nrms, 0.7)
        # voxel sets are identical; means may be ordered differently only
        # if the key orderings differ — sort both by position for comparison
        for g, w in zip(got, want):
            assert g.shape == w.shape
        order_g = np.lexsort(got[0].T)
        order_w = np.lexsort(want[0].T)
        for g, w in zip(got, want):
            np.testing.assert_allclose(g[order_g], w[order_w], atol=1e-5)

    def test_grid_size_search_hits_target(self):
        from triangle_splatting_tpu.models.model_utils import (
            _flat_voxel_keys, grid_size_search)
        rng = np.random.default_rng(4)
        pts = (rng.random((20000, 3)) * 100).astype(np.float32)
        g = grid_size_search(pts, 3000)
        count = np.unique(_flat_voxel_keys(pts, g)).shape[0]
        assert abs(count - 3000) <= 0.1 * 3000

    def test_fine_grid_overflow_fallback(self):
        from triangle_splatting_tpu.models.model_utils import _flat_voxel_keys
        rng = np.random.default_rng(5)
        pts = (rng.random((1000, 3)) * 4e6).astype(np.float32)
        keys = _flat_voxel_keys(pts, 1e-3)   # dims ~4e9 per axis -> records
        assert np.unique(keys).shape[0] == 1000
