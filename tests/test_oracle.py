"""Oracle rasterizer semantics: preprocess + dense blend.

These tests pin the math of the TPU build to the reference kernel semantics
(diff-triangle-rasterization-2D/src/forward.cu) via closed-form cases.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from triangle_splatting_tpu.ops.projection import RasterSettings, preprocess_2d, ndc2pix
from triangle_splatting_tpu.ops.oracle import blend_oracle
from triangle_splatting_tpu.utils.testing import make_camera, make_random_scene


SETTINGS = RasterSettings(image_width=64, image_height=64)


def run_prep(vertex, rgb, cam, settings=SETTINGS):
    P = vertex.shape[0]
    return preprocess_2d(
        jnp.asarray(vertex), jnp.zeros((P, 2), jnp.float32), jnp.asarray(rgb),
        cam.world_view, cam.full_proj, cam.tan_fovx, cam.tan_fovy, settings)


class TestPreprocess:
    def test_centroid_projection(self):
        cam = make_camera(64, 64, 60.0)
        scene = make_random_scene(16, seed=0)
        prep = run_prep(scene["vertex"], scene["rgb"], cam)
        # Independent NDC math: x_ndc = x / (z * tan_fov)
        c = scene["vertex"].mean(axis=1)
        t = float(cam.tan_fovx)
        x_ndc = c[:, 0] / (c[:, 2] * t)
        y_ndc = c[:, 1] / (c[:, 2] * t)
        cx = ((x_ndc + 1) * 64 - 1) * 0.5
        cy = ((y_ndc + 1) * 64 - 1) * 0.5
        got_c = (np.asarray(prep.v1_2d) + np.asarray(prep.v2_2d) + np.asarray(prep.v3_2d)) / 3
        # The linearized projection keeps the centroid exact; the 0.5 px
        # low-pass dilation of each vertex shifts the vertex mean by at most
        # 0.5 px (mean of three 0.5px outward unit offsets).
        np.testing.assert_allclose(got_c[:, 0], cx, atol=0.5)
        np.testing.assert_allclose(got_c[:, 1], cy, atol=0.5)

    def test_behind_camera_culled(self):
        cam = make_camera()
        v = np.array([[[0, 0, -5], [1, 0, -5], [0, 1, -5]]], np.float32)
        prep = run_prep(v, np.ones((1, 3), np.float32), cam)
        assert not bool(prep.valid[0])
        assert int(prep.tiles_touched[0]) == 0 and int(prep.radii[0]) == 0

    def test_degenerate_culled(self):
        cam = make_camera()
        v = np.array([[[0, 0, 5], [0, 0, 5], [0, 0, 5]]], np.float32)
        prep = run_prep(v, np.ones((1, 3), np.float32), cam)
        assert not bool(prep.valid[0])

    def test_back_culling(self):
        cam = make_camera()
        # Winding determines the sign of screen area; with the flipped camera
        # coordinates a front face has area2 < 0 (src/forward.cu:139-144).
        v_front = np.array([[[0, 0.3, 5], [0.3, -0.3, 5], [-0.3, -0.3, 5]]], np.float32)
        v_back = v_front[:, ::-1, :].copy()
        s_bc = RasterSettings(image_width=64, image_height=64, back_culling=True)
        p_front = run_prep(v_front, np.ones((1, 3), np.float32), cam, s_bc)
        p_back = run_prep(v_back, np.ones((1, 3), np.float32), cam, s_bc)
        assert bool(p_front.valid[0]) != bool(p_back.valid[0])

    def test_rect_covers_triangle(self):
        cam = make_camera()
        scene = make_random_scene(32, seed=1)
        prep = run_prep(scene["vertex"], scene["rgb"], cam)
        v = np.stack([prep.v1_2d, prep.v2_2d, prep.v3_2d], 1)  # (P,3,2)
        tw, th = SETTINGS.tile_w, SETTINGS.tile_h
        for i in range(32):
            if not bool(prep.valid[i]):
                continue
            lo = np.asarray(prep.rect_min[i]) * [tw, th]
            hi = np.asarray(prep.rect_max[i]) * [tw, th]
            vmin = np.clip(v[i].min(0), 0, 64)
            vmax = np.clip(v[i].max(0), 0, 64)
            assert (lo <= vmin + 1e-3).all(), i
            assert (hi >= np.minimum(vmax, 64) - np.array([tw, th])).all(), i

    def test_depth_is_view_z(self):
        cam = make_camera()
        scene = make_random_scene(8, seed=2)
        prep = run_prep(scene["vertex"], scene["rgb"], cam)
        np.testing.assert_allclose(
            np.asarray(prep.depth), scene["vertex"].mean(1)[:, 2], rtol=1e-5)


class TestBlendOracle:
    def _render(self, scene, cam=None, gamma=1.0, bg=0.0, settings=SETTINGS):
        cam = cam or make_camera(settings.image_width, settings.image_height)
        prep = run_prep(scene["vertex"], scene["rgb"], cam, settings)
        return blend_oracle(prep, jnp.asarray(scene["opacity"]), gamma,
                            jnp.full((3,), bg, jnp.float32), 100.0, settings), prep

    def test_background_only(self):
        scene = make_random_scene(4, seed=0, xy_extent=100.0, z_range=(3.0, 3.1))
        out, _ = self._render(scene, bg=0.25)
        # Triangles far off screen: image is pure background.
        corner = np.asarray(out.color[:, 0, 0])
        np.testing.assert_allclose(corner, 0.25, atol=1e-6)
        assert float(out.final_T[0, 0]) == 1.0

    def test_single_triangle_centroid_alpha(self):
        # Large triangle centered on screen; at the centroid ecc=0 so
        # alpha = opacity exactly; check a pixel near the projected centroid.
        v = np.array([[[0.0, 0.8, 4.0], [0.7, -0.4, 4.0], [-0.7, -0.4, 4.0]]], np.float32)
        scene = dict(vertex=v, opacity=np.array([0.7], np.float32),
                     rgb=np.array([[1.0, 0.5, 0.2]], np.float32))
        out, prep = self._render(scene, bg=0.0)
        c2d = (np.asarray(prep.v1_2d[0]) + np.asarray(prep.v2_2d[0]) + np.asarray(prep.v3_2d[0])) / 3
        px, py = int(round(c2d[0])), int(round(c2d[1]))
        got = np.asarray(out.color[:, py, px])
        # alpha ~= 0.7 (ecc ~ 0 near centroid), color = alpha * rgb
        np.testing.assert_allclose(got, 0.7 * np.array([1.0, 0.5, 0.2]), atol=0.02)
        assert abs(float(out.final_T[py, px]) - 0.3) < 0.02

    def test_compositing_two_triangles(self):
        # Two stacked triangles; front one at z=4, back at z=5.
        base = np.array([[[0.0, 0.8, 1.0], [0.7, -0.4, 1.0], [-0.7, -0.4, 1.0]]], np.float32)
        v = np.concatenate([base * np.array([4, 4, 4]), base * np.array([5, 5, 5])], 0)
        scene = dict(vertex=v, opacity=np.array([0.5, 0.5], np.float32),
                     rgb=np.array([[1, 0, 0], [0, 1, 0]], np.float32))
        out, prep = self._render(scene, bg=0.0)
        c2d = (np.asarray(prep.v1_2d[0]) + np.asarray(prep.v2_2d[0]) + np.asarray(prep.v3_2d[0])) / 3
        px, py = int(round(c2d[0])), int(round(c2d[1]))
        got = np.asarray(out.color[:, py, px])
        # front contributes 0.5*red, back 0.5*0.5*green
        np.testing.assert_allclose(got, [0.5, 0.25, 0.0], atol=0.03)

    def test_gamma_hardens_falloff(self):
        scene = make_random_scene(1, seed=3, size_range=(0.5, 0.5), z_range=(4.0, 4.0))
        out1, prep = self._render(scene, gamma=1.0)
        out50, _ = self._render(scene, gamma=50.0)
        # With gamma=50, alpha inside (ecc<1) ~= opacity, outside ~= 0:
        # the footprint-summed alpha differs from gamma=1's smooth tail.
        a1 = 1.0 - np.asarray(out1.final_T)
        a50 = 1.0 - np.asarray(out50.final_T)
        inside_sharper = (a50.max() >= a1.max() - 1e-3)
        assert inside_sharper
        # gamma=50 support is strictly the ecc<=~1 core: fewer touched pixels.
        assert (a50 > 0.01).sum() <= (a1 > 0.01).sum()

    def test_early_termination_freezes_T(self):
        # 60 opaque stacked triangles: T crosses 1e-4 and must freeze.
        base = np.array([[[0.0, 0.8, 1.0], [0.7, -0.4, 1.0], [-0.7, -0.4, 1.0]]], np.float32)
        vs = np.concatenate([base * (4 + 0.01 * i) for i in range(60)], 0)
        scene = dict(vertex=vs, opacity=np.full(60, 0.9, np.float32),
                     rgb=np.tile(np.array([[1, 1, 1]], np.float32), (60, 1)))
        out, prep = self._render(scene)
        c2d = (np.asarray(prep.v1_2d[0]) + np.asarray(prep.v2_2d[0]) + np.asarray(prep.v3_2d[0])) / 3
        px, py = int(round(c2d[0])), int(round(c2d[1]))
        T = float(out.final_T[py, px])
        # after k hits: T = 0.1^k; crossing at k=4 (1e-4), frozen there
        assert T <= 1e-4 and T > 1e-6
        assert int(out.n_contrib[py, px]) < 60

    def test_contrib_stats(self):
        scene = make_random_scene(32, seed=4)
        out, prep = self._render(scene)
        cs = np.asarray(out.contrib_sum)
        cm = np.asarray(out.contrib_max)
        assert (cs >= cm - 1e-6).all()
        assert (cm <= 0.99 + 1e-6).all()
        valid = np.asarray(prep.valid)
        assert (cs[~valid] == 0).all()

    def test_gradients_finite(self):
        scene = make_random_scene(16, seed=5)
        cam = make_camera()
        target = jnp.zeros((3, 64, 64))

        def loss_fn(vertex, opacity, rgb):
            prep = preprocess_2d(vertex, jnp.zeros((16, 2)), rgb,
                                 cam.world_view, cam.full_proj,
                                 cam.tan_fovx, cam.tan_fovy, SETTINGS)
            out = blend_oracle(prep, opacity, 1.0, jnp.zeros(3), 10.0, SETTINGS)
            return jnp.abs(out.color - target).mean()

        g = jax.grad(loss_fn, argnums=(0, 1, 2))(
            jnp.asarray(scene["vertex"]), jnp.asarray(scene["opacity"]),
            jnp.asarray(scene["rgb"]))
        for gi in g:
            assert np.isfinite(np.asarray(gi)).all()
        assert float(jnp.abs(g[0]).max()) > 0  # vertex grads flow

    def test_center2d_grad_is_vertex_grad_sum(self):
        """The center2D dummy input receives the sum of screen-vertex grads
        (reference src/backward.cu:261-262 semantics)."""
        scene = make_random_scene(8, seed=6)
        cam = make_camera()

        def loss_fn(c2d):
            prep = preprocess_2d(jnp.asarray(scene["vertex"]), c2d,
                                 jnp.asarray(scene["rgb"]), cam.world_view,
                                 cam.full_proj, cam.tan_fovx, cam.tan_fovy, SETTINGS)
            out = blend_oracle(prep, jnp.asarray(scene["opacity"]), 1.0,
                               jnp.zeros(3), 10.0, SETTINGS)
            return (out.color ** 2).mean()

        g = jax.grad(loss_fn)(jnp.zeros((8, 2)))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0
