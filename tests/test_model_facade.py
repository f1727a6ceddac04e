"""Object-style model facade (models/facade.py) — the reference's exported
model classes (diff_recon/__init__.py:10-12) over the functional cores."""

import numpy as np
import jax.numpy as jnp
import pytest

import triangle_splatting_tpu as ts
from triangle_splatting_tpu.utils.config import dict_to_config
from triangle_splatting_tpu.utils.testing import make_camera, make_random_scene


def _pcd(n=80, seed=0):
    from triangle_splatting_tpu.models.point_cloud import PointCloud
    rng = np.random.default_rng(seed)
    pts = (rng.random((n, 3), np.float32) - 0.5) * 2
    pts[:, 2] += 4.0
    cols = rng.random((n, 3), np.float32)
    nrm = np.tile(np.array([0, 0, 1], np.float32), (n, 1))
    return PointCloud(points=pts, colors=cols, normals=nrm)


class TestVanillaTSModelFacade:
    def test_create_forward_io_roundtrip(self, tmp_path):
        cfg = dict_to_config({"max_sh_degree": 1})
        m = ts.VanillaTSModel(cfg, impl="oracle")
        m.create_from_pcd(_pcd(), init_opacity=0.4)
        assert m.point_count == 80

        cam = make_camera(48, 48)
        pkg = m.forward(cam, background=jnp.ones(3))
        img = np.asarray(pkg["render"])
        assert img.shape == (3, 48, 48)
        assert np.isfinite(img).all()
        assert img.std() > 0                      # something rendered

        m.savePLY(tmp_path / "m.ply")
        m2 = ts.VanillaTSModel(cfg, impl="oracle").loadPLY(tmp_path / "m.ply")
        assert m2.point_count == m.point_count
        img2 = np.asarray(m2.forward(cam, background=jnp.ones(3))["render"])
        np.testing.assert_allclose(img, img2, atol=1e-5)

    def test_glb_roundtrip_and_gamma(self, tmp_path):
        cfg = dict_to_config({"max_sh_degree": 0})
        m = ts.VanillaTSModel(cfg, impl="oracle")
        m.create_from_pcd(_pcd(40), init_opacity=0.9)
        m.saveGLB(tmp_path / "m.glb")
        m2 = ts.VanillaTSModel(cfg, impl="oracle").loadGLB(tmp_path / "m.glb")
        assert m2.point_count > 0
        m2.set_gamma(50.0)
        img = np.asarray(m2.forward(make_camera(32, 32))["render"])
        assert np.isfinite(img).all()


class TestVanillaGSModelFacade:
    def test_f_rest_ply_roundtrip_channel_major(self, tmp_path):
        """Nonzero SH rest bands survive a save/load roundtrip bit-exact
        (3DGS stores f_rest channel-major; the writer must transpose)."""
        from dataclasses import replace
        cfg = dict_to_config({"max_sh_degree": 2})
        m = ts.VanillaGSModel(cfg, impl="oracle")
        m.create_from_pcd(_pcd(30), init_opacity=0.5)
        rng = np.random.default_rng(5)
        m.params = replace(
            m.params, f_rest=jnp.asarray(
                rng.standard_normal(m.params.f_rest.shape).astype(np.float32)))
        m.savePLY(tmp_path / "g.ply")
        m2 = ts.VanillaGSModel(cfg, impl="oracle").loadPLY(tmp_path / "g.ply")
        alive = np.asarray(m.state.alive)
        np.testing.assert_allclose(
            np.asarray(m.params.f_rest)[alive],
            np.asarray(m2.params.f_rest)[np.asarray(m2.state.alive)],
            rtol=1e-6)

    def test_create_forward_ply_roundtrip(self, tmp_path):
        cfg = dict_to_config({"max_sh_degree": 1})
        m = ts.VanillaGSModel(cfg, impl="oracle")
        m.create_from_pcd(_pcd(), init_opacity=0.5)
        cam = make_camera(32, 32)
        img = np.asarray(m.forward(cam, background=jnp.ones(3))["render"])
        assert np.isfinite(img).all() and img.std() > 0

        m.savePLY(tmp_path / "g.ply")
        m2 = ts.VanillaGSModel(cfg, impl="oracle").loadPLY(tmp_path / "g.ply")
        assert m2.point_count == m.point_count
        img2 = np.asarray(m2.forward(cam, background=jnp.ones(3))["render"])
        np.testing.assert_allclose(img, img2, atol=1e-5)


class TestScaffoldGSModelFacade:
    def test_create_and_forward(self):
        cfg = dict_to_config({"feat_dim": 8, "hidden_dim": 16, "n_offsets": 3})
        m = ts.ScaffoldGSModel(cfg, impl="oracle")
        m.create_from_pcd(_pcd(60), voxel_size=0.2)
        assert m.anchor_count > 0
        img = np.asarray(m.forward(make_camera(32, 32),
                                   background=jnp.ones(3))["render"])
        assert np.isfinite(img).all()


class TestReferenceExportSurface:
    def test_all_reference_exports_resolve(self):
        """Every symbol the reference re-exports at its package root
        (src/diff_recon/__init__.py:1-20) resolves here."""
        for name in ("VanillaGSTrainer", "VanillaTSTrainer",
                     "ScaffoldGSTrainer", "ColmapDatasetFactory",
                     "BaseDatasetFactory", "QijingDatasetFactory",
                     "NerfSyntheticDatasetFactory", "MatrixCityDatasetFactory",
                     "VanillaGSModel", "VanillaTSModel", "ScaffoldGSModel",
                     "RawGaussian", "RawTriangle", "loadConfig", "Config",
                     "run_exp_with_args", "run_exp", "stdout_logger",
                     "OSSHandler"):
            assert getattr(ts, name) is not None, name
