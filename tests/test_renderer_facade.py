"""Renderer facade layer (reference src/diff_recon/renderer/).

TriangleRenderer / GaussianRenderer mirror renderer/{triangle,gaussian}
_renderer.py output packages and must agree with the functional ops they
wrap; MeshRenderer fills the KaolinRenderer slot (opaque mesh comparison
renders, kaolin_renderer.py:8-72).
"""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

import triangle_splatting_tpu as tst
from triangle_splatting_tpu.ops.projection import RasterSettings
from triangle_splatting_tpu.ops.rasterize import rasterize
from triangle_splatting_tpu.utils.testing import make_camera, make_random_scene

CAM = make_camera(64, 64)


class TestTriangleRendererFacade:
    @pytest.mark.slow
    def test_matches_functional_api(self):
        scene = make_random_scene(40, seed=3)
        r = tst.TriangleRenderer(CAM, rasterizer_type="2D", rich_info=True,
                                 gamma=2.0, sh_degree=0)
        out = r.render(scene["vertex"], scene["sh_dc"], None, scene["opacity"])
        ref = rasterize(scene["vertex"], scene["opacity"], scene["sh_dc"],
                        CAM, RasterSettings(image_width=64, image_height=64,
                                            rich_info=True, max_sh_degree=0,
                                            rasterizer_type="2D"),
                        gamma=2.0)
        np.testing.assert_allclose(out["render"], ref["render"], atol=1e-6)
        np.testing.assert_allclose(out["depth"], ref["depth"], atol=1e-6)
        assert out["center2D"].shape == (40, 2)

    @pytest.mark.slow
    def test_non_rich_drops_keys(self):
        scene = make_random_scene(10, seed=4)
        r = tst.TriangleRenderer(CAM, rasterizer_type="3D", rich_info=False)
        out = r.render(scene["vertex"], scene["sh_dc"], None, scene["opacity"])
        assert "render" in out and "radii" in out and "center2D" in out
        assert "depth" not in out and "contrib_sum" not in out

    @pytest.mark.slow
    def test_center2d_gradient_hook(self):
        # The reference reads dL/dcenter2D off the dummy tensor
        # (renderer/triangle_renderer.py:66-67); here it is a real argument.
        scene = make_random_scene(25, seed=5)
        r = tst.TriangleRenderer(CAM, rasterizer_type="2D", rich_info=True)

        def loss(c2d):
            return r.render(scene["vertex"], scene["sh_dc"], None,
                            scene["opacity"], center2d=c2d)["render"].sum()

        g = jax.grad(loss)(jnp.zeros((25, 2)))
        assert g.shape == (25, 2) and np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_bad_rasterizer_type(self):
        import pytest
        with pytest.raises(ValueError):
            tst.TriangleRenderer(CAM, rasterizer_type="4D")


class TestGaussianRendererFacade:
    def _scene(self, n=30, seed=7):
        rng = np.random.default_rng(seed)
        xyz = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1.5, 1.5, n),
                        rng.uniform(3.0, 6.0, n)], -1).astype(np.float32)
        scale = rng.uniform(0.05, 0.2, (n, 3)).astype(np.float32)
        q = rng.normal(size=(n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
        sh = rng.uniform(0, 1, (n, 1, 3)).astype(np.float32)
        return xyz, scale, q, opac, sh

    @pytest.mark.slow
    def test_render_and_radii(self):
        xyz, scale, q, opac, sh = self._scene()
        r = tst.GaussianRenderer(CAM, rich_info=True, sh_degree=0)
        out = r.render(xyz, sh, None, opac, scale, q)
        assert out["render"].shape == (3, 64, 64)
        assert np.isfinite(np.asarray(out["render"])).all()
        radii = r.get_radii(xyz, scale, q)
        np.testing.assert_array_equal(radii, out["radii"])
        assert (np.asarray(radii) > 0).any()

    def test_in_frustum(self):
        r = tst.GaussianRenderer(CAM)
        pts = np.array([[0.0, 0.0, 5.0],     # in front
                        [0.0, 0.0, -5.0],    # behind
                        [0.0, 0.0, 0.1]],    # closer than 0.2
                       np.float32)
        vis = np.asarray(r.in_frustum(pts))
        assert vis.tolist() == [True, False, False]


class TestMeshRenderer:
    def test_opaque_triangle_covers(self):
        # One big triangle straight ahead: opaque red fill, mask ~1 at the
        # center, background elsewhere.
        tri = np.array([[[0.0, 2.0, 4.0], [-2.0, -1.5, 4.0],
                         [2.0, -1.5, 4.0]]], np.float32)
        vertices = tri.reshape(-1, 3)
        faces = np.arange(3).reshape(1, 3)
        colors = np.array([[1.0, 0.0, 0.0]], np.float32)
        r = tst.MeshRenderer(CAM, bg_color=(0.0, 0.0, 1.0))
        out = r.render(vertices=vertices, faces=faces, faces_color=colors)
        img = np.asarray(out["render"])
        mask = np.asarray(out["mask"])
        cy, cx = 32, 32
        assert mask[0, cy, cx] > 0.95
        assert img[0, cy, cx] > 0.9 and img[2, cy, cx] < 0.1
        assert img[2, 0, 0] > 0.9          # corner shows blue background
        assert mask[0, 0, 0] < 0.05

    def test_depth_ordering(self):
        # Two stacked triangles: the nearer one wins the covered pixel.
        def tri_at(z):
            return np.array([[0.0, 2.0, z], [-2.0, -1.5, z], [2.0, -1.5, z]],
                            np.float32)
        vertices = np.concatenate([tri_at(4.0), tri_at(8.0)], axis=0)
        faces = np.arange(6).reshape(2, 3)
        colors = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
        r = tst.MeshRenderer(CAM)
        out = r.render(vertices=vertices, faces=faces, faces_color=colors)
        img = np.asarray(out["render"])
        assert img[0, 32, 32] > 0.9 and img[1, 32, 32] < 0.1
        # Composited depth carries the alpha-clamp residuals: 0.99*4 +
        # 0.99*0.01*8 + ~1e-4*bg_depth(5000) ≈ 4.54 (src/forward.cu:311-334).
        d = np.asarray(out["depth"])
        assert abs(d[32, 32] - (0.99 * 4.0 + 0.0099 * 8.0 + 1e-4 * 5000)) < 0.1

    def test_glb_roundtrip(self, tmp_path):
        # saveGLB → MeshRenderer(mesh_path=...) renders the mesh colors.
        from triangle_splatting_tpu.models.raw_triangle import RawTriangle
        from triangle_splatting_tpu.ops.sh import RGB2SH
        tri = np.array([[[0.0, 2.0, 4.0], [-2.0, -1.5, 4.0],
                         [2.0, -1.5, 4.0]]], np.float32)
        raw = RawTriangle(vertex=tri,
                          opacity=np.full((1, 1), 10.0, np.float32),
                          shs=RGB2SH(np.array([[0.9, 0.1, 0.1]], np.float32)))
        path = str(tmp_path / "mesh.glb")
        raw.saveGLB(path)
        r = tst.MeshRenderer(CAM)
        out = r.render(mesh_path=path)
        img = np.asarray(out["render"])
        assert img[0, 32, 32] > 0.7 and img[1, 32, 32] < 0.3
