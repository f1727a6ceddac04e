"""Independent ray tracer (ops/raytrace.py) vs analytic geometry and vs the
splatting family at the opaque endpoint."""

import numpy as np
import jax.numpy as jnp

from triangle_splatting_tpu.ops.projection import RasterSettings
from triangle_splatting_tpu.ops.raytrace import raytrace_soup
from triangle_splatting_tpu.utils.testing import make_camera, make_random_scene


class TestAnalytic:
    def test_square_hit_depth_and_coverage(self):
        """Axis-aligned square at z=5 in front of the identity camera:
        analytic hit mask (|x|,|y| <= s on the plane) and depth == 5."""
        W = 64
        cam = make_camera(W, W, fov_deg=60.0)
        s = 1.0
        a = [-s, -s, 5.0]; b = [s, -s, 5.0]; c = [s, s, 5.0]; d = [-s, s, 5.0]
        tri = jnp.asarray([[a, b, c], [a, c, d]], jnp.float32)
        rgb = jnp.asarray([[1.0, 0.0, 0.0]] * 2)
        settings = RasterSettings(image_width=W, image_height=W)
        out = raytrace_soup(tri, rgb, cam, settings,
                            background=jnp.zeros(3))
        hit = np.asarray(out["hit"])
        depth = np.asarray(out["depth"])
        # analytic: ray (rx, ry, 1) * t hits z=5 at t=5; inside iff
        # |5*rx| <= s and |5*ry| <= s
        tfx = float(cam.tan_fovx)
        px = np.arange(W)[None, :].repeat(W, 0).astype(np.float64)
        py = np.arange(W)[:, None].repeat(W, 1).astype(np.float64)
        rx = tfx * (2 * px - W + 1) / W
        ry = tfx * (2 * py - W + 1) / W
        expect = (np.abs(5 * rx) <= s) & (np.abs(5 * ry) <= s)
        # edge pixels can flip either way on the shared diagonal/border
        assert (hit != expect).mean() < 0.02
        np.testing.assert_allclose(depth[hit], 5.0, rtol=1e-5)
        col = np.asarray(out["render"])
        assert (col[0][hit] == 1.0).all() and (col[1][hit] == 0.0).all()

    def test_nearest_hit_zbuffer(self):
        """Two stacked squares: the nearer one must win every shared pixel
        (per-PIXEL z-buffer — the property the MeshRenderer's per-triangle
        depth sort only approximates)."""
        W = 32
        cam = make_camera(W, W)
        def sq(z, s):
            a = [-s, -s, z]; b = [s, -s, z]; c = [s, s, z]; d = [-s, s, z]
            return [[a, b, c], [a, c, d]]
        tri = jnp.asarray(sq(6.0, 2.0) + sq(4.0, 0.5), jnp.float32)
        rgb = jnp.asarray([[1, 0, 0]] * 2 + [[0, 1, 0]] * 2, jnp.float32)
        settings = RasterSettings(image_width=W, image_height=W)
        out = raytrace_soup(tri, rgb, cam, settings)
        depth = np.asarray(out["depth"])
        center = depth[W // 2, W // 2]
        assert abs(center - 4.0) < 1e-5, center
        col = np.asarray(out["render"])
        assert col[1, W // 2, W // 2] == 1.0       # green (near) wins
        assert col[0, 2, 2] == 0.0 and col[1, 2, 2] == 0.0  # background

    def test_order_independence(self):
        """Z-buffering is order-independent; compositing is not — permuting
        the soup must not change the image."""
        W = 48
        cam = make_camera(W, W)
        s = make_random_scene(60, seed=5)
        tri = jnp.asarray(s["vertex"])
        rgb = jnp.asarray(s["rgb"])
        settings = RasterSettings(image_width=W, image_height=W)
        a = raytrace_soup(tri, rgb, cam, settings)
        perm = np.random.default_rng(0).permutation(60)
        b = raytrace_soup(tri[perm], rgb[perm], cam, settings)
        np.testing.assert_allclose(np.asarray(a["render"]),
                                   np.asarray(b["render"]), atol=1e-6)


class TestVsSplattingFamily:
    def test_matches_gamma50_rasterizer_away_from_edges(self):
        """Opaque scene through the production 3D rasterizer at gamma=50 vs
        the ray tracer: identical except the sub-pixel edge ring and
        per-triangle-vs-per-pixel depth ties — budgeted as a small fraction
        of differing pixels, NOT a uniform epsilon (the two algorithms
        share no code; agreement is the independence check)."""
        from triangle_splatting_tpu.ops.rasterize import rasterize
        W = 96
        cam = make_camera(W, W)
        s = make_random_scene(80, seed=11, size_range=(0.3, 0.6))
        tri = jnp.asarray(s["vertex"])
        rgb = jnp.asarray(s["rgb"])
        opac = jnp.ones(80)
        settings = RasterSettings(image_width=W, image_height=W,
                                  rasterizer_type="3D", back_culling=False)
        rast = rasterize(tri, opac, None, cam, settings, gamma=50.0,
                         background=jnp.ones(3), bg_depth=20.0, colors=rgb)
        rt = raytrace_soup(tri, rgb, cam, settings,
                           background=jnp.ones(3))
        diff = np.abs(np.asarray(rast["render"]) - np.asarray(rt["render"]))
        frac_off = (diff.max(axis=0) > 0.15).mean()
        assert frac_off < 0.06, frac_off
        # interior pixels of both agree tightly
        assert np.median(diff) < 1e-3

    def test_mesh_renderer_glb_roundtrip(self, tmp_path):
        """Export a soup to GLB, render via MeshRenderer (splatting family)
        and via the ray tracer (independent); images must agree away from
        edges — the de-circularized check of the GLB export + renderer."""
        from triangle_splatting_tpu.models.raw_triangle import RawTriangle
        from triangle_splatting_tpu.ops.sh import RGB2SH, SH2RGB
        from triangle_splatting_tpu.renderer.mesh_renderer import MeshRenderer
        W = 64
        cam = make_camera(W, W)
        s = make_random_scene(50, seed=3, size_range=(0.3, 0.6))
        raw = RawTriangle(vertex=s["vertex"],
                          opacity=np.full((50, 1), 8.0, np.float32),
                          shs=RGB2SH(s["rgb"]))
        glb = str(tmp_path / "m.glb")
        raw.saveGLB(glb)

        mr = MeshRenderer(cam, bg_color=(1, 1, 1))
        img_mr = np.asarray(mr.render(mesh_path=glb)["render"])

        back = RawTriangle(glb_path=glb)
        cols = jnp.asarray(np.clip(SH2RGB(back.shs[:, :3]), 0, 1))
        settings = RasterSettings(image_width=W, image_height=W)
        img_rt = np.asarray(raytrace_soup(
            jnp.asarray(back.vertex), cols, cam, settings,
            background=jnp.ones(3))["render"])
        diff = np.abs(img_mr - img_rt)
        assert (diff.max(axis=0) > 0.15).mean() < 0.08, \
            (diff.max(axis=0) > 0.15).mean()
        assert np.median(diff) < 2e-2
